"""Dev utility: interleaved A/B of the ST kernel with/without the
layer-outer trunk ILP form (TEXPOSE_ST_TRUNK_ILP).  Both variants are
jitted in ONE process and timed alternately over several rounds so the
documented tunnel drift (±30%) cancels out of the comparison.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *a, n=50):
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

    def fwd(h, lt_, ll_, pts_, enc_, kw):
        base = dict(tile_fwd=512, tile_bwd=512)
        base.update(kw)
        rgb, dens, trans = fused_st_field(
            pts_, enc_, ll_, lt_, params["mlp_feat"], h, aux3, (4,), 10,
            R * N, **base)
        return rgb, dens, trans

    def loss(h, lt_, ll_, pts_, enc_, kw):
        rgb, dens, trans = fwd(h, lt_, ll_, pts_, enc_, kw)
        return (rgb ** 2).mean() + (trans ** 2).mean()

    VARIANTS = {
        "base": {},
        "ilp": {"trunk_ilp": True},
        "fullblock": {"fullblock": True},
        "bwdfull": {"bwd_fullblock": True},
        "headsfull": {"heads_fullblock": True},
        "bothfull": {"bwd_fullblock": True, "heads_fullblock": True},
        "bwdsub1": {"subtiles_bwd": 1},
        "bwdsub4": {"subtiles_bwd": 4},
        "bwdt1024": {"tile_bwd": 1024, "subtiles_bwd": 2},
        "fwdsub2": {"subtiles_fwd": 2},
        "fwdsub8": {"subtiles_fwd": 8},
    }
    names = sys.argv[1:] or list(VARIANTS)

    def make(kw):
        return (jax.jit(lambda h, p, e: fwd(h, lt, ll, p, e, kw)[0].sum()),
                jax.jit(jax.grad(lambda h, lt_, ll_, p, e:
                                 loss(h, lt_, ll_, p, e, kw),
                                 argnums=(0, 1, 2))))

    variants = {n: make(VARIANTS[n]) for n in names}
    # warm both compiles before any timing
    for name, (jf, jg) in variants.items():
        jax.block_until_ready(jf(heads, pts, enc))
        jax.block_until_ready(jg(heads, lt, ll, pts, enc))
        print("compiled", name, flush=True)

    rounds = {n: {"fwd": [], "grad": []} for n in variants}
    for r in range(5):
        for name, (jf, jg) in variants.items():
            rounds[name]["fwd"].append(timeit(jf, heads, pts, enc))
            rounds[name]["grad"].append(timeit(jg, heads, lt, ll, pts, enc))
        print(f"round {r}: " + "  ".join(
            f"{n} fwd {rounds[n]['fwd'][-1]:.3f} grad "
            f"{rounds[n]['grad'][-1]:.3f}" for n in variants), flush=True)
    for name in variants:
        print(f"{name}: fwd median {np.median(rounds[name]['fwd']):.3f} ms, "
              f"grad median {np.median(rounds[name]['grad']):.3f} ms")


if __name__ == "__main__":
    main()
