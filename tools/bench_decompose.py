"""Dev utility: decompose the texture-GAN step cost on the current backend."""

import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *args, n=100):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def main():
    from texpose_tpu.utils.config import load_yaml, process_options
    from texpose_tpu.models.texture_gan import (TextureGANEngine,
                                                render_patch,
                                                sample_patch_images)
    from texpose_tpu.sampling.patch import flex_patch_coords
    from texpose_tpu.nn.discriminator import apply_discriminator
    from texpose_tpu.nn.vgg import perceptual_loss_pairs

    cache = os.path.join(tempfile.gettempdir(), "texpose_bench_fixture_v1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_yaml(os.path.join(here, "configs", "nerf_lm_adapt_gan.yaml"))
    cfg.yaml = "x"
    cfg = process_options(cfg)
    cfg.data.root = cache
    cfg.data.splits_root = os.path.join(cache, "splits")
    cfg.data.object = "ball"
    cfg.nerf.depth.box_source = "pred_box_init_calib"
    cfg.output_root = os.path.join(tempfile.gettempdir(), "texpose_prof")
    cfg = process_options(cfg)
    cfg.max_iter = 100000

    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    key = jax.random.PRNGKey(0)
    B = int(cfg.batch_size)
    batch = jax.tree_util.tree_map(lambda x: x[:B], eng.train_batch)
    coords, scales = flex_patch_coords(key, B, int(cfg.patch_size))
    lt = eng.state["latents"]["trans"][:B]
    ll = eng.state["latents"]["light"][:B]
    params = eng.state["params"]["nerf"]
    trunk = params["mlp_feat"]
    heads = {k: v for k, v in params.items() if k != "mlp_feat"}
    p05 = jnp.asarray(0.5)

    def render(pr):
        return render_patch(pr, cfg, batch["pose_init"], batch["intr"],
                            coords, batch["z_near"], batch["z_far"], lt, ll,
                            key, p05, "train", compute_dtype=jnp.bfloat16)

    fwd = jax.jit(lambda pr: render(pr)["rgb"])
    print("render fwd:", timeit(fwd, params), "ms", flush=True)

    def rloss(h):
        out = render(dict(h, mlp_feat=trunk))
        return (out["rgb"] ** 2).mean() + out["uncert"].mean() \
            + out["trans_density_mean"]

    g = jax.jit(jax.grad(rloss))
    print("render grad(heads):", timeit(g, heads), "ms", flush=True)

    # render loss with the real uncert-weighted term
    sup = sample_patch_images(cfg, batch, coords)

    def rloss2(h):
        out = render(dict(h, mlp_feat=trunk))
        hw = int(cfg.patch_size)
        rgb = out["rgb"].reshape(B, hw, hw, 3).transpose(0, 3, 1, 2)
        unc = out["uncert"].reshape(B, hw, hw, 1).transpose(0, 3, 1, 2)
        m = sup["mask"]
        return (m * ((sup["image"] - rgb) ** 2 / unc ** 2)).sum() / \
            (m.sum() + 1e-5)

    g2 = jax.jit(jax.grad(rloss2))
    print("uncert-render grad(heads):", timeit(g2, heads), "ms", flush=True)

    # full step: the state is DONATED, so thread the returned state through
    holder = {"st": eng.state}

    def stepper():
        st2, loss = eng.step_fn(holder["st"], eng.train_batch)
        holder["st"] = st2
        return loss["all"]

    print("full step:", timeit(stepper), "ms", flush=True)


if __name__ == "__main__":
    main()
