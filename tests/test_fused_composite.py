"""Fused composite kernel parity (interpreter mode): per-ray outputs and
gradients must match ops/render.composite_static_transient applied to the
activated field outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from texpose_tpu.kernels.fused_composite import (fused_composite_st,
                                                 fused_composite_available)
from texpose_tpu.ops.render import composite_static_transient

pytestmark = pytest.mark.skipif(not fused_composite_available(),
                                reason="no pallas")


def _inputs(key, B=2, R=8, N=16):
    ks = jax.random.split(key, 6)
    rgb_raw = jax.random.normal(ks[0], (B * R * N, 3))
    trans_raw = jax.random.normal(ks[1], (B * R * N, 5))
    dens_raw = jax.random.normal(ks[2], (B * R * N, 1)) * 2
    depth = jnp.sort(jax.random.uniform(ks[3], (B, R, N, 1),
                                        minval=2.0, maxval=6.0), axis=2)
    ray = jax.random.normal(ks[4], (B, R, 3))
    return rgb_raw, trans_raw, dens_raw, depth, ray


def _plain(rgb_raw, trans_raw, dens_raw, depth, ray, min_uncert=0.05):
    """The current XLA path: activations + stack + composite."""
    B, R, N, _ = depth.shape
    sh = (B, R, N)
    rgb = jax.nn.sigmoid(rgb_raw).reshape(*sh, 3)
    rgb_t = jax.nn.sigmoid(trans_raw[:, :3]).reshape(*sh, 3)
    dens = jax.nn.softplus(jax.lax.stop_gradient(dens_raw[:, 0])).reshape(sh)
    dens_t = jax.nn.softplus(trans_raw[:, 3]).reshape(sh)
    uncert = jax.nn.softplus(trans_raw[:, 4:5]).reshape(*sh, 1)
    rgb_pair = jnp.stack([rgb, rgb_t], axis=-1)
    dens_pair = jnp.stack([dens, dens_t], axis=-1)
    out = composite_static_transient(rgb_pair, dens_pair, depth, ray, uncert,
                                     min_uncert=min_uncert)
    out["trans_density_mean"] = dens_t.mean()
    return out


KEYS = ["rgb", "rgb_static", "rgb_transient", "depth", "opacity",
        "opacity_static", "opacity_transient", "uncert",
        "trans_density_mean"]


@pytest.mark.parametrize("flat", [False, True])
def test_fused_composite_forward(key, flat):
    args = _inputs(key)
    ref = _plain(*args)
    out = fused_composite_st(*args, interpret=True, tile_rays=8, flat=flat)
    for k in KEYS:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=2e-5, err_msg=k)


@pytest.mark.parametrize("flat", [False, True])
def test_fused_composite_gradients(key, flat):
    args = _inputs(key)

    def loss_of(fn):
        def loss(rgb_raw, trans_raw):
            out = fn(rgb_raw, trans_raw, *args[2:])
            # touch every differentiable output with distinct weights
            s = (out["rgb"].sum() + 2 * out["rgb_static"].sum()
                 + 3 * out["rgb_transient"].sum()
                 + 0.5 * out["opacity"].sum()
                 + 0.25 * out["opacity_transient"].sum()
                 + 4 * (out["uncert"] ** 2).mean()
                 + 1.5 * out["trans_density_mean"])
            return s
        return loss

    g_ref = jax.grad(loss_of(_plain), argnums=(0, 1))(args[0], args[1])
    g_out = jax.grad(
        loss_of(lambda *a: fused_composite_st(*a, interpret=True,
                                              tile_rays=8, flat=flat)),
        argnums=(0, 1))(args[0], args[1])
    np.testing.assert_allclose(np.asarray(g_out[0]), np.asarray(g_ref[0]),
                               atol=3e-5, err_msg="d rgb_raw")
    np.testing.assert_allclose(np.asarray(g_out[1]), np.asarray(g_ref[1]),
                               atol=3e-5, err_msg="d trans_raw")


def test_render_st_core_fused_matches_plain(key, monkeypatch):
    """End-to-end: render_st_core routes through field+composite kernels
    (interpret mode) and must match the plain XLA path, values AND
    generator-side gradients."""
    from texpose_tpu.models.render import render_st_core
    from texpose_tpu.nn.fields import init_nerf_st, use_fused_render
    from texpose_tpu.utils.config import Config, process_options

    cfg = process_options(Config({
        "arch": {
            "layers_feat": [None, 32, 32, 32],
            "layers_rgb": [None, 32, 3],
            "layers_trans": [None, 32, 5],
            "skip": [1],
            "posenc": {"L_3D": 4, "L_view": 2},
            "density_activ": "softplus", "tf_init": True,
        },
        "nerf": {"view_dep": True, "density_noise_reg": None,
                 "N_latent_trans": 8, "N_latent_light": 12,
                 "min_uncert": 0.05, "sample_intvs": 16,
                 "sample_stratified": False,
                 "depth": {"param": "metric", "scale": 10, "range": [0, 3]}},
        "c2f": {"range": [0.1, 0.6], "start": 1},
        "data": {"image_size": [8, 8]},
        "kernels": {"fused_trunk": False},
    }))
    B, R, N = 2, 64, 16
    ks = jax.random.split(key, 6)
    params = init_nerf_st(ks[0], cfg)
    center = jax.random.normal(ks[1], (B, R, 3))
    ray = jax.random.normal(ks[2], (B, R, 3))
    near = jnp.full((B, R), 2.0)
    far = jnp.full((B, R), 6.0)
    lt = jax.random.normal(ks[3], (B, 8)) * 0.2
    ll = jax.random.normal(ks[4], (B, 12)) * 0.2

    def run(params, lt, ll):
        return render_st_core(params, cfg, center, ray, near, far, lt, ll,
                              jax.random.PRNGKey(7), jnp.asarray(0.5),
                              "eval", compute_dtype=jnp.float32,
                              want_density=True)

    ref = run(params, lt, ll)
    monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
    assert use_fused_render(cfg, B, R, N)
    out = run(params, lt, ll)
    assert "trans_density_mean" in out and "density" not in out
    for k in ["rgb", "rgb_static", "rgb_transient", "depth", "opacity",
              "opacity_static", "opacity_transient", "uncert"]:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=3e-5, err_msg=k)
    np.testing.assert_allclose(float(out["trans_density_mean"]),
                               float(ref["density"][..., -1].mean()),
                               atol=3e-5)

    # generator-side gradients (heads + latents; trunk frozen in both)
    def loss(fn_params, lt, ll, fused):
        if fused:
            monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
        else:
            monkeypatch.delenv("TEXPOSE_FUSED_INTERPRET", raising=False)
        o = run(fn_params, lt, ll)
        treg = (o["trans_density_mean"] if "trans_density_mean" in o
                else o["density"][..., -1].mean())
        return (o["rgb"] ** 2).mean() + (o["uncert"] ** 2).mean() + treg

    heads = {k: v for k, v in params.items() if k != "mlp_feat"}

    def wrap(h, lt, ll, fused):
        return loss(dict(h, mlp_feat=params["mlp_feat"]), lt, ll, fused)

    g_ref = jax.grad(wrap, argnums=(0, 1, 2))(heads, lt, ll, False)
    g_out = jax.grad(wrap, argnums=(0, 1, 2))(heads, lt, ll, True)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_o, _ = jax.tree_util.tree_flatten(g_out)
    for a, b in zip(flat_o, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fused_composite_rejects_nondividing_rays(key):
    """BR with no power-of-two factor >= 8 must raise (a silently skipped
    tail would leave uninitialized output rows)."""
    import pytest
    from texpose_tpu.kernels.fused_composite import fused_composite_st
    B, R, N = 65, 4, 8          # BR = 260 > tile; no pow-2 factor >= 8
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rgb_raw = jax.random.normal(k1, (B * R * N, 3))
    trans_raw = jax.random.normal(k2, (B * R * N, 5))
    dens_raw = jax.random.normal(k3, (B * R * N, 1))
    depth = jnp.linspace(1.0, 2.0, N)[None, None, :, None].repeat(
        R, 1).repeat(B, 0)
    ray = jax.random.normal(k4, (B, R, 3))
    with pytest.raises(ValueError, match="divisible"):
        fused_composite_st(rgb_raw, trans_raw, dens_raw, depth, ray,
                           interpret=True)
