"""Dev utility: isolate fused ST-field kernel fwd/bwd times from the
XLA glue around them (sampling, compositing, losses)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *a, n=100):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000


def main():
    from texpose_tpu.kernels.fused_st_field import fused_st_field
    from texpose_tpu.nn.fields import init_nerf_st
    from texpose_tpu.utils.config import Config, process_options

    cfg = process_options(Config({
        "arch": {
            "layers_feat": [None] + [256] * 8,
            "layers_rgb": [None, 256, 256, 256, 3],
            "layers_trans": [None, 256, 256, 256, 5],
            "skip": [4],
            "posenc": {"L_3D": 10, "L_view": 4},
            "density_activ": "softplus", "tf_init": True,
        },
        "nerf": {"view_dep": True, "N_latent_trans": 16,
                 "N_latent_light": 48, "density_noise_reg": None,
                 "depth": {"scale": 10, "range": [0, 3]}},
        "c2f": None, "data": {"image_size": [128, 128]},
    }))
    key = jax.random.PRNGKey(0)
    params = init_nerf_st(key, cfg)
    B, R, N = 8, 256, 64
    M = B * R * N
    pts = jax.random.normal(jax.random.PRNGKey(1), (M, 3))
    enc = jax.random.normal(jax.random.PRNGKey(2), (M, 27))
    ll = jax.random.normal(jax.random.PRNGKey(3), (B, 48))
    lt = jax.random.normal(jax.random.PRNGKey(4), (B, 16))
    aux3 = jnp.stack([jnp.asarray((2.0 ** np.arange(10)) * np.pi,
                                  jnp.float32), jnp.ones((10,))])
    heads = {"mlp_rgb": params["mlp_rgb"], "mlp_trans": params["mlp_trans"]}

    import sys as _sys
    # defaults mirror the production path (nn/fields.apply_nerf_st_raw);
    # tb=1024 x the default bwd subtiles OOMs scoped VMEM, and tf=1024
    # with the perm_last matmul-posenc weights OOMs scoped VMEM by 4M
    tf = int(_sys.argv[1]) if len(_sys.argv) > 1 else 512
    tb = int(_sys.argv[2]) if len(_sys.argv) > 2 else 512

    # pts/enc MUST be jit arguments: as closed-over constants the compiler
    # stages them into scoped VMEM wholesale (131072x27 f32 ~ 14M -> OOM)
    def fwd(h, lt_, ll_, pts_, enc_):
        rgb, dens, trans = fused_st_field(
            pts_, enc_, ll_, lt_, params["mlp_feat"], h, aux3, (4,), 10,
            R * N, tile_fwd=tf, tile_bwd=tb)
        return rgb, dens, trans

    jf = jax.jit(lambda h, p, e: fwd(h, lt, ll, p, e)[0].sum())
    print("kernel fwd:", timeit(jf, heads, pts, enc), "ms", flush=True)

    def loss(h, lt_, ll_, pts_, enc_):
        rgb, dens, trans = fwd(h, lt_, ll_, pts_, enc_)
        return (rgb ** 2).mean() + (trans ** 2).mean()

    jg = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    print("kernel fwd+bwd:", timeit(jg, heads, lt, ll, pts, enc), "ms",
          flush=True)

    # section timing: the trunk alone (fused_trunk kernel) — locates the
    # fwd bottleneck (trunk ≈59% of the padded MXU units; a much larger
    # share of measured time ⇒ issue-overhead-bound, int8 won't pay)
    if os.environ.get("BENCH_KERNELS_SECTIONS", "1") != "0":
        from texpose_tpu.kernels.fused_trunk import fused_trunk_forward
        tw = tuple(lp["w"] for lp in params["mlp_feat"])
        tb_ = tuple(lp["b"] for lp in params["mlp_feat"])
        for tile in (512, 1024, 2048):
            jt = jax.jit(lambda p: fused_trunk_forward(
                p, jnp.ones((10,)), tw, tb_, (4,), 10,
                compute_dtype=jnp.bfloat16, tile=tile)[0].sum())
            print(f"trunk-only fwd (tile {tile}):", timeit(jt, pts), "ms",
                  flush=True)


if __name__ == "__main__":
    main()
