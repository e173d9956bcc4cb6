"""Fused coarse-composite kernel parity (interpreter mode): per-ray outputs
and gradients — INCLUDING density gradients, the pretrain trunk is trained —
must match ops/render.composite applied to the activated field outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from texpose_tpu.kernels.fused_composite_coarse import (
    fused_composite_coarse, fused_composite_coarse_available)
from texpose_tpu.ops.render import composite

pytestmark = pytest.mark.skipif(not fused_composite_coarse_available(),
                                reason="no pallas")


def _inputs(key, B=2, R=8, N=16):
    ks = jax.random.split(key, 4)
    rgb_raw = jax.random.normal(ks[0], (B * R * N, 3))
    dens_raw = jax.random.normal(ks[1], (B * R * N, 1)) * 2
    depth = jnp.sort(jax.random.uniform(ks[2], (B, R, N, 1),
                                        minval=2.0, maxval=6.0), axis=2)
    ray = jax.random.normal(ks[3], (B, R, 3))
    return rgb_raw, dens_raw, depth, ray


def _plain(rgb_raw, dens_raw, depth, ray, setbg_opaque=False):
    """The current XLA path: activations + composite (reference
    layers/nerf.py:117-134)."""
    B, R, N, _ = depth.shape
    sh = (B, R, N)
    rgb = jax.nn.sigmoid(rgb_raw).reshape(*sh, 3)
    dens = jax.nn.softplus(dens_raw[:, 0]).reshape(sh)
    out = composite(rgb, dens, depth, ray, setbg_opaque=setbg_opaque)
    return {k: out[k] for k in ("rgb", "depth", "opacity")}


@pytest.mark.parametrize("flat", [False, True])
def test_fused_composite_coarse_forward(key, flat):
    args = _inputs(key)
    ref = _plain(*args)
    out = fused_composite_coarse(*args, interpret=True, tile_rays=8,
                                 flat=flat)
    for k in ("rgb", "depth", "opacity"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=2e-5, err_msg=k)


@pytest.mark.parametrize("flat", [False, True])
def test_fused_composite_coarse_gradients(key, flat):
    args = _inputs(key)

    def loss_of(fn):
        def loss(rgb_raw, dens_raw):
            out = fn(rgb_raw, dens_raw, *args[2:])
            return (out["rgb"].sum() + 2 * (out["depth"] ** 2).mean()
                    + 0.5 * out["opacity"].sum())
        return loss

    g_ref = jax.grad(loss_of(_plain), argnums=(0, 1))(args[0], args[1])
    g_out = jax.grad(
        loss_of(lambda *a: fused_composite_coarse(*a, interpret=True,
                                                  tile_rays=8, flat=flat)),
        argnums=(0, 1))(args[0], args[1])
    np.testing.assert_allclose(np.asarray(g_out[0]), np.asarray(g_ref[0]),
                               atol=3e-5, err_msg="d rgb_raw")
    np.testing.assert_allclose(np.asarray(g_out[1]), np.asarray(g_ref[1]),
                               atol=3e-5, err_msg="d dens_raw")


def test_fused_coarse_render_route_matches_plain(key, monkeypatch):
    """The render_rays_nerf fused route (field kernel -> coarse composite
    kernel, TEXPOSE_FUSED_INTERPRET=1) must match the plain XLA path,
    including setbg_opaque's XLA epilogue and trunk/head gradients."""
    monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
    from texpose_tpu.utils.config import Config, process_options
    from texpose_tpu.nn.fields import init_nerf
    from texpose_tpu.models.render import render_rays_nerf

    cfg = process_options(Config({
        "arch": {
            "layers_feat": [None] + [32] * 4,
            "layers_rgb": [None, 32, 3],
            "skip": [2],
            "posenc": {"L_3D": 4, "L_view": None},
            "density_activ": "softplus", "tf_init": True,
        },
        "nerf": {"view_dep": False, "density_noise_reg": None,
                 "sample_intvs": 8, "sample_stratified": False,
                 "setbg_opaque": True,
                 "depth": {"param": "metric", "scale": 1,
                           "range": [0, 3]}},
        "c2f": None, "camera": {"ndc": False},
        "data": {"image_size": [16, 16]},
    }))
    cfg.H = cfg.W = 16
    params = {"nerf": init_nerf(key, cfg)}
    B, R = 2, 32
    ks = jax.random.split(key, 4)
    pose = jnp.tile(jnp.eye(3, 4)[None], (B, 1, 1))
    pose = pose.at[:, 2, 3].set(2.0)
    intr = jnp.tile(jnp.asarray([[20.0, 0, 8], [0, 20.0, 8],
                                 [0, 0, 1]])[None], (B, 1, 1))
    ray_idx = jax.random.randint(ks[0], (B, R), 0, 256)
    z_near = jnp.full((B, 256), 0.5)
    z_far = jnp.full((B, 256), 3.0)

    def run(p, fused):
        monkeypatch.setitem(cfg.setdefault("kernels", {}),
                            "fused_coarse", fused)
        monkeypatch.setitem(cfg["kernels"], "fused_composite", fused)
        out = render_rays_nerf(p["nerf"], cfg, pose, intr, ray_idx,
                               z_near, z_far, ks[1], progress=jnp.asarray(
                                   0.5), mode="train",
                               compute_dtype=jnp.float32)
        return out

    out_f = run(params, True)
    out_p = run(params, False)
    for k in ("rgb", "depth", "opacity"):
        np.testing.assert_allclose(np.asarray(out_f[k]),
                                   np.asarray(out_p[k]), atol=3e-5,
                                   err_msg=k)

    def loss(p, fused):
        out = run(p, fused)
        return ((out["rgb"] ** 2).mean() + out["opacity"].mean()
                + (out["depth"] ** 2).mean())

    g_f = jax.grad(lambda p: loss(p, True))(params)
    g_p = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
