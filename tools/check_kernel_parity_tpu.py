"""Dev utility: ON-HARDWARE parity of the fused Pallas paths vs plain XLA.

CPU tests run the kernels in interpreter mode; Mosaic-compiled behavior can
still diverge (CLAUDE.md lists several such traps).  This probe compares
VALUES and GRADIENTS of the fused coarse field (pretrain train path) and the
fused ST field+composite (texture train path) against the plain-XLA
implementations, all on the live TPU.  Run after any kernel change, before
trusting a quality run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _cfg(yaml_name):
    from texpose_tpu.utils.config import load_yaml, process_options
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_yaml(os.path.join(here, "configs", yaml_name))
    cfg.yaml = "x"
    return process_options(cfg)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def _tree_rel(ga, gb):
    la = jax.tree_util.tree_leaves(ga)
    lb = jax.tree_util.tree_leaves(gb)
    return max(_rel(x, y) for x, y in zip(la, lb))


def check_coarse():
    from texpose_tpu.nn.fields import init_nerf, apply_nerf
    cfg = _cfg("nerf_lm_pretrain.yaml")
    key = jax.random.PRNGKey(0)
    params = init_nerf(key, cfg)
    M = 4096
    pts = jax.random.uniform(jax.random.PRNGKey(1), (M, 3), minval=-1.0,
                             maxval=1.0)
    progress = jnp.asarray(0.5)

    def loss(params, fused):
        cfg.kernels = {"fused_coarse": fused, "fused_trunk": fused}
        rgb, dens = apply_nerf(params, cfg, pts, None, progress, mode="train")
        return (rgb ** 2).mean() + (dens ** 2).mean() * 1e-4

    for fused in (True, False):
        tag = "fused" if fused else "plain"
        v, g = jax.jit(jax.value_and_grad(
            lambda p: loss(p, fused)))(params)
        jax.block_until_ready(v)
        if fused:
            vf, gf = v, g
        else:
            vp, gp = v, g
        print(f"coarse {tag}: loss={float(v):.6f}")
    rv, rg = _rel(vf, vp), _tree_rel(gf, gp)
    print(f"coarse fused-vs-plain: value rel={rv:.2e} grad rel={rg:.2e}")
    return rv < 2e-2 and rg < 5e-2


def check_coarse_render():
    """Full pretrain render route on TPU: coarse MEGA (field+composite one
    kernel) vs two-kernel fused vs plain XLA, values + trunk/head grads."""
    from texpose_tpu.nn.fields import init_nerf
    from texpose_tpu.models.render import render_rays_nerf
    cfg = _cfg("nerf_lm_pretrain.yaml")
    key = jax.random.PRNGKey(0)
    params = init_nerf(key, cfg)
    B, R = 8, 512
    HW = int(cfg.data.image_size[0]) * int(cfg.data.image_size[1])
    cfg.H = int(cfg.data.image_size[0])
    cfg.W = int(cfg.data.image_size[1])
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    pose = jnp.tile(jnp.eye(3, 4)[None], (B, 1, 1))
    pose = pose.at[:, 2, 3].set(40.0)
    f = float(cfg.H) * 1.2
    intr = jnp.tile(jnp.asarray([[f, 0, cfg.W / 2], [0, f, cfg.H / 2],
                                 [0, 0, 1.0]])[None], (B, 1, 1))
    ray_idx = jax.random.randint(k1, (B, R), 0, HW)
    z_near = jnp.full((B, HW), 34.0)
    z_far = jnp.full((B, HW), 46.0)

    def loss(params, mode):
        fused = mode != "plain"
        cfg.kernels = {"fused_coarse": fused, "fused_composite": fused,
                       "fused_trunk": fused, "coarse_mega": mode == "mega"}
        out = render_rays_nerf(params, cfg, pose, intr, ray_idx, z_near,
                               z_far, k2, progress=jnp.asarray(0.5),
                               mode="train", compute_dtype=jnp.bfloat16)
        return ((out["rgb"] ** 2).mean() + (out["depth"] ** 2).mean() * 1e-3
                + out["opacity"].mean())

    res = {}
    for mode in ("mega", "fused", "plain"):
        v, g = jax.jit(jax.value_and_grad(
            lambda p: loss(p, mode)))(params)
        jax.block_until_ready(v)
        res[mode] = (v, g)
        print(f"coarse-render {mode}: loss={float(v):.6f}")
    ok = True
    vp, gp = res["plain"]
    for mode in ("mega", "fused"):
        vf, gf = res[mode]
        rv, rg = _rel(vf, vp), _tree_rel(gf, gp)
        print(f"coarse-render {mode}-vs-plain: value rel={rv:.2e} "
              f"grad rel={rg:.2e}")
        ok = ok and rv < 2e-2 and rg < 5e-2
    return ok


def check_st():
    from texpose_tpu.nn.fields import init_nerf_st
    from texpose_tpu.models.render import render_st_core
    cfg = _cfg("nerf_lm_adapt_gan.yaml")
    key = jax.random.PRNGKey(0)
    params = init_nerf_st(key, cfg)
    B, R, N = 8, 256, int(cfg.nerf.sample_intvs)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    center = jax.random.normal(k1, (B, R, 3))
    ray = jax.random.normal(k2, (B, R, 3)) * 0.1 + jnp.asarray([0., 0., 1.])
    near = jnp.full((B, R), 34.0)
    far = jnp.full((B, R), 46.0)
    lt = jax.random.normal(k3, (B, cfg.nerf.N_latent_trans)) * 0.1
    ll = jax.random.normal(k3, (B, cfg.nerf.N_latent_light)) * 0.1

    def loss(args, mode):
        heads, lt, ll = args
        fused = mode != "plain"
        cfg.kernels = {"fused_st": fused, "fused_composite": fused,
                       "fused_trunk": fused, "st_mega": mode == "mega"}
        p = dict(heads, mlp_feat=params["mlp_feat"])
        out = render_st_core(p, cfg, center, ray, near, far, lt, ll,
                             jax.random.PRNGKey(0), jnp.asarray(1.0),
                             "train", jnp.bfloat16, want_density=True)
        return (out["rgb"] ** 2).mean() + (out["rgb_static"] ** 2).mean() \
            + (out["uncert"] ** 2).mean() * 0.1 \
            + out["trans_density_mean"] * 1e-3

    heads = {k: v for k, v in params.items() if k != "mlp_feat"}
    res = {}
    for mode in ("mega", "fused", "plain"):
        v, g = jax.jit(jax.value_and_grad(
            lambda a: loss(a, mode)))((heads, lt, ll))
        jax.block_until_ready(v)
        res[mode] = (v, g)
        print(f"st {mode}: loss={float(v):.6f}")
    ok = True
    vp, gp = res["plain"]
    for mode in ("mega", "fused"):
        vf, gf = res[mode]
        rv, rg = _rel(vf, vp), _tree_rel(gf, gp)
        print(f"st {mode}-vs-plain: value rel={rv:.2e} grad rel={rg:.2e}")
        ok = ok and rv < 2e-2 and rg < 5e-2
    return ok


if __name__ == "__main__":
    ok = check_coarse()
    ok = check_coarse_render() and ok
    ok = check_st() and ok
    print("PARITY OK" if ok else "PARITY FAIL")
    sys.exit(0 if ok else 1)
