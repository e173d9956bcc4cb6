"""Fused ST-field kernel parity (interpreter mode): outputs and gradients
must match the plain apply_nerf_st path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from texpose_tpu.kernels.fused_st_field import fused_st_available
from texpose_tpu.nn.fields import (init_nerf_st, apply_nerf_st,
                                   apply_nerf_st_fused)
from texpose_tpu.utils.config import Config, process_options


def st_cfg():
    return process_options(Config({
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
                 "min_uncert": 0.05,
                 "depth": {"scale": 10, "range": [0, 3]}},
        "c2f": {"range": [0.1, 0.6], "start": 1},
        "data": {"image_size": [8, 8]},
        "kernels": {"fused_trunk": False},
    }))


@pytest.mark.skipif(not fused_st_available(), reason="no pallas")
def test_fused_st_matches_plain(key):
    cfg = st_cfg()
    params = init_nerf_st(key, cfg)
    B, R, N = 2, 4, 16          # rows/img = 64, tile 32 → 2 tiles/img
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.normal(k1, (B, R, N, 3))
    ray = jax.random.normal(k2, (B, R, N, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    lt = jax.random.normal(k3, (B, 8))
    ll = jax.random.normal(k4, (B, 12))
    progress = jnp.asarray(0.4)

    rgb_p, dens_p, unc_p = apply_nerf_st(params, cfg, pts, ray, lt, ll,
                                         progress=progress)
    rgb_f, dens_f, unc_f = apply_nerf_st_fused(
        params, cfg, pts, ray, lt, ll, progress=progress,
        compute_dtype=jnp.float32, tile_fwd=32, tile_bwd=32, interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(unc_f), np.asarray(unc_p),
                               atol=2e-5)

    # gradients: heads + latents must match; trunk grads must be zero
    heads_keys = ("mlp_rgb", "mlp_trans")

    def loss(fn, p, lt_, ll_, **kw):
        rgb, dens, unc = fn(p, cfg, pts, ray, lt_, ll_, progress=progress,
                            **kw)
        return ((rgb ** 2).mean() + unc.mean()
                + dens[..., 1].mean())

    g_p = jax.grad(lambda p, a, b: loss(apply_nerf_st, p, a, b),
                   argnums=(0, 1, 2))(params, lt, ll)
    g_f = jax.grad(lambda p, a, b: loss(
        apply_nerf_st_fused, p, a, b, compute_dtype=jnp.float32, tile_fwd=32, tile_bwd=32,
        interpret=True), argnums=(0, 1, 2))(params, lt, ll)

    for hk in heads_keys:
        for a, b in zip(jax.tree_util.tree_leaves(g_p[0][hk]),
                        jax.tree_util.tree_leaves(g_f[0][hk])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_p[1]),
                               atol=3e-5)   # d latent_trans
    np.testing.assert_allclose(np.asarray(g_f[2]), np.asarray(g_p[2]),
                               atol=3e-5)   # d latent_light
    for leaf in jax.tree_util.tree_leaves(g_f[0]["mlp_feat"]):
        assert float(jnp.abs(leaf).max()) == 0.0


@pytest.mark.skipif(not fused_st_available(), reason="no pallas")
def test_fused_st_subtiles_straddle_images(key, monkeypatch):
    """With subtiles=2 and an ODD number of compute tiles per image, one
    grid step's two sub-tiles belong to DIFFERENT images — the per-image
    latent indexing must still hold (values AND latent gradients)."""
    monkeypatch.setenv("TEXPOSE_ST_SUBTILES_FWD", "2")
    monkeypatch.setenv("TEXPOSE_ST_SUBTILES_BWD", "2")
    cfg = st_cfg()
    params = init_nerf_st(key, cfg)
    B, R, N = 4, 4, 24          # rows/img = 96 = 3 tiles of 32 (odd)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.normal(k1, (B, R, N, 3))
    ray = jax.random.normal(k2, (B, R, N, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    lt = jax.random.normal(k3, (B, 8))
    ll = jax.random.normal(k4, (B, 12))
    progress = jnp.asarray(0.4)

    rgb_p, dens_p, unc_p = apply_nerf_st(params, cfg, pts, ray, lt, ll,
                                         progress=progress)
    rgb_f, dens_f, unc_f = apply_nerf_st_fused(
        params, cfg, pts, ray, lt, ll, progress=progress,
        compute_dtype=jnp.float32, tile_fwd=32, tile_bwd=32, interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(unc_f), np.asarray(unc_p),
                               atol=2e-5)

    def loss(fn, lt_, ll_, **kw):
        rgb, dens, unc = fn(params, cfg, pts, ray, lt_, ll_,
                            progress=progress, **kw)
        return (rgb ** 2).mean() + unc.mean()

    g_p = jax.grad(lambda a, b: loss(apply_nerf_st, a, b),
                   argnums=(0, 1))(lt, ll)
    g_f = jax.grad(lambda a, b: loss(
        apply_nerf_st_fused, a, b, compute_dtype=jnp.float32,
        tile_fwd=32, tile_bwd=32, interpret=True), argnums=(0, 1))(lt, ll)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_p[0]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_p[1]),
                               atol=3e-5)


@pytest.mark.skipif(not fused_st_available(), reason="no pallas")
@pytest.mark.parametrize("N", [24, 32])
def test_fused_st_bwd_fullblock_matches_plain(key, monkeypatch, N):
    """TEXPOSE_ST_BWD_FULLBLOCK=1: the backward head recompute + dW/dX
    chain runs on the FULL streamed tile (latents are additive rows in
    split mode) with only the per-image latent row-sums subtile-resolved.
    Grads must match the plain path both when a grid step's subtiles
    straddle an image boundary (N=24: rows/img=96, 3 subtiles/img, odd)
    and on the same-image fast path (N=32: rows/img=128 divides by the
    64-row streamed tile — single latent row per grid step)."""
    monkeypatch.setenv("TEXPOSE_ST_SUBTILES_BWD", "2")
    monkeypatch.setenv("TEXPOSE_ST_BWD_FULLBLOCK", "1")
    cfg = st_cfg()
    params = init_nerf_st(key, cfg)
    B, R = 4, 4
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.normal(k1, (B, R, N, 3))
    ray = jax.random.normal(k2, (B, R, N, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    lt = jax.random.normal(k3, (B, 8))
    ll = jax.random.normal(k4, (B, 12))
    progress = jnp.asarray(0.4)

    def loss(fn, p, lt_, ll_, **kw):
        rgb, dens, unc = fn(p, cfg, pts, ray, lt_, ll_,
                            progress=progress, **kw)
        return (rgb ** 2).mean() + unc.mean()

    g_p = jax.grad(lambda p, a, b: loss(apply_nerf_st, p, a, b),
                   argnums=(0, 1, 2))(params, lt, ll)
    g_f = jax.grad(lambda p, a, b: loss(
        apply_nerf_st_fused, p, a, b, compute_dtype=jnp.float32,
        tile_fwd=32, tile_bwd=32, interpret=True),
        argnums=(0, 1, 2))(params, lt, ll)
    for hk in ("mlp_rgb", "mlp_trans"):
        for a, b in zip(jax.tree_util.tree_leaves(g_p[0][hk]),
                        jax.tree_util.tree_leaves(g_f[0][hk])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_p[1]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[2]), np.asarray(g_p[2]),
                               atol=3e-5)


@pytest.mark.skipif(not fused_st_available(), reason="no pallas")
@pytest.mark.parametrize("N", [24, 32])
def test_fused_st_heads_fullblock_matches_plain(key, monkeypatch, N):
    """TEXPOSE_ST_HEADS_FULLBLOCK=1: forward heads run once on the full
    streamed tile (per-subtile trunk unchanged).  Values and grads must
    match the plain path both across an image-straddling grid step
    (N=24) and on the same-image fast path (N=32: one latent row per
    grid step, feat read back from the output ref)."""
    monkeypatch.setenv("TEXPOSE_ST_SUBTILES_FWD", "2")
    monkeypatch.setenv("TEXPOSE_ST_HEADS_FULLBLOCK", "1")
    cfg = st_cfg()
    params = init_nerf_st(key, cfg)
    B, R = 4, 4
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.normal(k1, (B, R, N, 3))
    ray = jax.random.normal(k2, (B, R, N, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    lt = jax.random.normal(k3, (B, 8))
    ll = jax.random.normal(k4, (B, 12))
    progress = jnp.asarray(0.4)

    rgb_p, dens_p, unc_p = apply_nerf_st(params, cfg, pts, ray, lt, ll,
                                         progress=progress)
    rgb_f, dens_f, unc_f = apply_nerf_st_fused(
        params, cfg, pts, ray, lt, ll, progress=progress,
        compute_dtype=jnp.float32, tile_fwd=32, tile_bwd=32, interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(unc_f), np.asarray(unc_p),
                               atol=2e-5)

    def loss(fn, lt_, ll_, **kw):
        rgb, dens, unc = fn(params, cfg, pts, ray, lt_, ll_,
                            progress=progress, **kw)
        return (rgb ** 2).mean() + unc.mean()

    g_p = jax.grad(lambda a, b: loss(apply_nerf_st, a, b),
                   argnums=(0, 1))(lt, ll)
    g_f = jax.grad(lambda a, b: loss(
        apply_nerf_st_fused, a, b, compute_dtype=jnp.float32,
        tile_fwd=32, tile_bwd=32, interpret=True), argnums=(0, 1))(lt, ll)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_p[0]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_p[1]),
                               atol=3e-5)


@pytest.mark.skipif(not fused_st_available(), reason="no pallas")
def test_fused_st_trunk_ilp_matches_plain(key, monkeypatch):
    """TEXPOSE_ST_TRUNK_ILP=1 (layer-outer trunk emission over the fwd
    subtile chains — A/B wash on v5e but a live knob): outputs and
    head/latent grads must match the plain path exactly."""
    monkeypatch.setenv("TEXPOSE_ST_TRUNK_ILP", "1")
    monkeypatch.setenv("TEXPOSE_ST_SUBTILES_FWD", "2")
    cfg = st_cfg()
    params = init_nerf_st(key, cfg)
    B, R, N = 2, 4, 16
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.normal(k1, (B, R, N, 3))
    ray = jax.random.normal(k2, (B, R, N, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    lt = jax.random.normal(k3, (B, 8))
    ll = jax.random.normal(k4, (B, 12))
    progress = jnp.asarray(0.4)

    rgb_p, dens_p, unc_p = apply_nerf_st(params, cfg, pts, ray, lt, ll,
                                         progress=progress)
    rgb_f, dens_f, unc_f = apply_nerf_st_fused(
        params, cfg, pts, ray, lt, ll, progress=progress,
        compute_dtype=jnp.float32, tile_fwd=32, tile_bwd=32, interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(unc_f), np.asarray(unc_p),
                               atol=2e-5)

    def loss(fn, p, lt_, ll_, **kw):
        rgb, dens, unc = fn(p, cfg, pts, ray, lt_, ll_, progress=progress,
                            **kw)
        return (rgb ** 2).mean() + unc.mean() + dens[..., 1].mean()

    g_p = jax.grad(lambda p, a, b: loss(apply_nerf_st, p, a, b),
                   argnums=(0, 1, 2))(params, lt, ll)
    g_f = jax.grad(lambda p, a, b: loss(
        apply_nerf_st_fused, p, a, b, compute_dtype=jnp.float32,
        tile_fwd=32, tile_bwd=32, interpret=True),
        argnums=(0, 1, 2))(params, lt, ll)
    for hk in ("mlp_rgb", "mlp_trans"):
        for a, b in zip(jax.tree_util.tree_leaves(g_p[0][hk]),
                        jax.tree_util.tree_leaves(g_f[0][hk])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_p[1]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[2]), np.asarray(g_p[2]),
                               atol=3e-5)


@pytest.mark.skipif(not fused_st_available(), reason="no pallas")
def test_fused_st_sinext_matches_plain(key, monkeypatch):
    """"sinext" enc mode (streamed XLA sin bands, no in-kernel angle
    matmul): outputs + head/latent grads match; trunk grads stay zero."""
    monkeypatch.setenv("TEXPOSE_ST_POSENC", "sinext")
    cfg = st_cfg()
    params = init_nerf_st(key, cfg)
    B, R, N = 2, 4, 16
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.normal(k1, (B, R, N, 3))
    ray = jax.random.normal(k2, (B, R, N, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    lt = jax.random.normal(k3, (B, 8))
    ll = jax.random.normal(k4, (B, 12))
    progress = jnp.asarray(0.4)

    rgb_p, dens_p, unc_p = apply_nerf_st(params, cfg, pts, ray, lt, ll,
                                         progress=progress)
    rgb_f, dens_f, unc_f = apply_nerf_st_fused(
        params, cfg, pts, ray, lt, ll, progress=progress,
        compute_dtype=jnp.float32, tile_fwd=32, tile_bwd=32, interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(unc_f), np.asarray(unc_p),
                               atol=2e-5)

    def loss(fn, p, lt_, ll_, **kw):
        rgb, dens, unc = fn(p, cfg, pts, ray, lt_, ll_, progress=progress,
                            **kw)
        return (rgb ** 2).mean() + unc.mean() + dens[..., 1].mean()

    g_p = jax.grad(lambda p, a, b: loss(apply_nerf_st, p, a, b),
                   argnums=(0, 1, 2))(params, lt, ll)
    g_f = jax.grad(lambda p, a, b: loss(
        apply_nerf_st_fused, p, a, b, compute_dtype=jnp.float32,
        tile_fwd=32, tile_bwd=32, interpret=True),
        argnums=(0, 1, 2))(params, lt, ll)
    for hk in ("mlp_rgb", "mlp_trans"):
        for a, b in zip(jax.tree_util.tree_leaves(g_p[0][hk]),
                        jax.tree_util.tree_leaves(g_f[0][hk])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_p[1]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[2]), np.asarray(g_p[2]),
                               atol=3e-5)
    for leaf in jax.tree_util.tree_leaves(g_f[0]["mlp_feat"]):
        assert float(jnp.abs(leaf).max()) == 0.0


@pytest.mark.skipif(not fused_st_available(), reason="no pallas")
def test_fused_st_xext_matches_plain(key, monkeypatch):
    """"xext" enc mode (pts folded into the streamed sin-band block):
    outputs + head/latent grads match; trunk grads stay zero."""
    monkeypatch.setenv("TEXPOSE_ST_POSENC", "xext")
    cfg = st_cfg()
    params = init_nerf_st(key, cfg)
    B, R, N = 2, 4, 16
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.normal(k1, (B, R, N, 3))
    ray = jax.random.normal(k2, (B, R, N, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    lt = jax.random.normal(k3, (B, 8))
    ll = jax.random.normal(k4, (B, 12))
    progress = jnp.asarray(0.4)

    rgb_p, dens_p, unc_p = apply_nerf_st(params, cfg, pts, ray, lt, ll,
                                         progress=progress)
    rgb_f, dens_f, unc_f = apply_nerf_st_fused(
        params, cfg, pts, ray, lt, ll, progress=progress,
        compute_dtype=jnp.float32, tile_fwd=32, tile_bwd=32, interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(unc_f), np.asarray(unc_p),
                               atol=2e-5)

    def loss(fn, p, lt_, ll_, **kw):
        rgb, dens, unc = fn(p, cfg, pts, ray, lt_, ll_, progress=progress,
                            **kw)
        return (rgb ** 2).mean() + unc.mean() + dens[..., 1].mean()

    g_p = jax.grad(lambda p, a, b: loss(apply_nerf_st, p, a, b),
                   argnums=(0, 1, 2))(params, lt, ll)
    g_f = jax.grad(lambda p, a, b: loss(
        apply_nerf_st_fused, p, a, b, compute_dtype=jnp.float32,
        tile_fwd=32, tile_bwd=32, interpret=True),
        argnums=(0, 1, 2))(params, lt, ll)
    for hk in ("mlp_rgb", "mlp_trans"):
        for a, b in zip(jax.tree_util.tree_leaves(g_p[0][hk]),
                        jax.tree_util.tree_leaves(g_f[0][hk])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_p[1]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[2]), np.asarray(g_p[2]),
                               atol=3e-5)
    for leaf in jax.tree_util.tree_leaves(g_f[0]["mlp_feat"]):
        assert float(jnp.abs(leaf).max()) == 0.0


@pytest.mark.skipif(not fused_st_available(), reason="no pallas")
def test_fused_st_split_heads_off_matches_plain(key, monkeypatch):
    """Legacy concat-form heads (TEXPOSE_ST_SPLIT_HEADS=0): the default
    flipped to the split layer-0 form, so pin the old path's value AND
    head/latent gradient parity against the plain implementation."""
    monkeypatch.setenv("TEXPOSE_ST_SPLIT_HEADS", "0")
    cfg = st_cfg()
    params = init_nerf_st(key, cfg)
    B, R, N = 2, 4, 16
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.normal(k1, (B, R, N, 3))
    ray = jax.random.normal(k2, (B, R, N, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    lt = jax.random.normal(k3, (B, 8))
    ll = jax.random.normal(k4, (B, 12))
    progress = jnp.asarray(0.4)

    def loss(fn, p, lt_, ll_, **kw):
        rgb, dens, unc = fn(p, cfg, pts, ray, lt_, ll_, progress=progress,
                            **kw)
        return (rgb ** 2).mean() + unc.mean() + dens[..., 1].mean()

    g_p = jax.grad(lambda p, a, b: loss(apply_nerf_st, p, a, b),
                   argnums=(0, 1, 2))(params, lt, ll)
    g_f = jax.grad(lambda p, a, b: loss(
        apply_nerf_st_fused, p, a, b, compute_dtype=jnp.float32,
        tile_fwd=32, tile_bwd=32, interpret=True),
        argnums=(0, 1, 2))(params, lt, ll)
    for hk in ("mlp_rgb", "mlp_trans"):
        for a, b in zip(jax.tree_util.tree_leaves(g_p[0][hk]),
                        jax.tree_util.tree_leaves(g_f[0][hk])):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_p[1]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_f[2]), np.asarray(g_p[2]),
                               atol=3e-5)
