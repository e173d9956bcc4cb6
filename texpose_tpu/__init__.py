"""texpose_tpu — a TPU-native (JAX/XLA/Pallas) framework for self-supervised
6D-object-pose texture learning, providing the full capability surface of the
reference TexPose codebase (CVPR 2023) re-designed for TPU hardware.

Layer map (bottom → top):
  geometry/   pure-JAX pose algebra, ray generation, AABB intersection
  ops/        positional encoding, volume compositing, grid-sample, color, SSIM
  nn/         functional networks: NeRF fields, discriminator, VGG features
  sampling/   patch/ray samplers (explicit PRNG keys)
  data/       host-side BOP data pipeline + fixtures
  raster/     mesh rasterization (JAX soft-raster + native C++ host raster)
  models/     training engines (pretrain / env / texture-GAN)
  parallel/   device-mesh sharding of the ray axis and data axis
  kernels/    Pallas TPU kernels for the hot render path
  utils/      config, checkpointing, logging, metrics
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS=cpu against site plugins that override it (e.g. the
# axon TPU plugin's sitecustomize register()): the env var alone can lose
# the platform race, silently routing "CPU" subprocesses (tests, fleet
# children) onto the real TPU.  jax.config.update wins if applied before
# first device use — importing texpose_tpu is always early enough in our
# CLIs.  No-op when jax is already initialized on the requested platform.
import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - backend already initialized
        # The update can fail only after backend init; verify we actually
        # ended up on CPU — silently proceeding on TPU re-introduces the
        # silent-TPU-training / tunnel-wedge hazard this hook prevents.
        _backend = _jax.default_backend()
        if _backend != "cpu":
            raise RuntimeError(
                f"JAX_PLATFORMS=cpu requested but jax is already "
                f"initialized on backend {_backend!r}; import texpose_tpu "
                f"before any jax device use")
