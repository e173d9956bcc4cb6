"""Fused coarse-field train kernels (interpreter mode): forward and FULL
gradients (trunk included) must match the plain apply_nerf path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from texpose_tpu.kernels.fused_coarse_field import fused_coarse_available
from texpose_tpu.nn.fields import (init_nerf, apply_nerf, apply_nerf_fused)
from texpose_tpu.utils.config import Config, process_options


def coarse_cfg(view_dep=False):
    return process_options(Config({
        "arch": {
            "layers_feat": [None, 32, 32, 32, 32],
            "layers_rgb": [None, 32, 3],
            "skip": [2],
            "posenc": {"L_3D": 4, "L_view": 2 if view_dep else None},
            "density_activ": "softplus", "tf_init": True,
        },
        "nerf": {"view_dep": view_dep, "density_noise_reg": None,
                 "setbg_opaque": None,
                 "depth": {"scale": 10, "range": [0, 3]}},
        "c2f": [0.1, 0.6],
        "data": {"image_size": [8, 8]},
        "kernels": {"fused_trunk": False, "fused_coarse": False},
    }))


@pytest.mark.skipif(not fused_coarse_available(), reason="no pallas")
@pytest.mark.parametrize("view_dep", [False, True])
def test_fused_coarse_matches_plain(view_dep, key):
    cfg = coarse_cfg(view_dep)
    params = init_nerf(key, cfg)
    M = 96
    pts = jax.random.normal(jax.random.PRNGKey(1), (M, 3))
    ray = jax.random.normal(jax.random.PRNGKey(2), (M, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    progress = jnp.asarray(0.5)

    rgb_p, dens_p = apply_nerf(params, cfg, pts, ray, progress=progress)
    rgb_f, dens_f = apply_nerf_fused(params, cfg, pts, ray,
                                     progress=progress,
                                     compute_dtype=jnp.float32, tile=32,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_p),
                               atol=2e-5)

    def loss(fn, p, **kw):
        rgb, dens = fn(p, cfg, pts, ray, progress=progress, **kw)
        return (rgb ** 2).mean() + (jnp.tanh(dens) ** 2).mean()

    g_p = jax.grad(lambda p: loss(apply_nerf, p))(params)
    g_f = jax.grad(lambda p: loss(apply_nerf_fused, p,
                                  compute_dtype=jnp.float32, tile=32,
                                  interpret=True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


@pytest.mark.skipif(not fused_coarse_available(), reason="no pallas")
def test_fused_coarse_sinext_matches_plain(key, monkeypatch):
    """"sinext" enc mode: XLA-built weighted sin bands streamed into the
    kernel (no in-kernel angle matmul) — values and FULL trunk gradients
    must still match the plain path."""
    monkeypatch.setenv("TEXPOSE_COARSE_POSENC", "sinext")
    cfg = coarse_cfg(view_dep=True)
    params = init_nerf(key, cfg)
    M = 96
    pts = jax.random.normal(jax.random.PRNGKey(1), (M, 3))
    ray = jax.random.normal(jax.random.PRNGKey(2), (M, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    progress = jnp.asarray(0.5)

    rgb_p, dens_p = apply_nerf(params, cfg, pts, ray, progress=progress)
    rgb_f, dens_f = apply_nerf_fused(params, cfg, pts, ray,
                                     progress=progress,
                                     compute_dtype=jnp.float32, tile=32,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_p),
                               atol=2e-5)

    def loss(fn, p, **kw):
        rgb, dens = fn(p, cfg, pts, ray, progress=progress, **kw)
        return (rgb ** 2).mean() + (jnp.tanh(dens) ** 2).mean()

    g_p = jax.grad(lambda p: loss(apply_nerf, p))(params)
    g_f = jax.grad(lambda p: loss(apply_nerf_fused, p,
                                  compute_dtype=jnp.float32, tile=32,
                                  interpret=True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


@pytest.mark.skipif(not fused_coarse_available(), reason="no pallas")
def test_fused_coarse_xext_matches_plain(key, monkeypatch):
    """"xext" enc mode (pts folded into the streamed sin-band block): XLA-built weighted sin bands streamed into the
    kernel (no in-kernel angle matmul) — values and FULL trunk gradients
    must still match the plain path."""
    monkeypatch.setenv("TEXPOSE_COARSE_POSENC", "xext")
    cfg = coarse_cfg(view_dep=True)
    params = init_nerf(key, cfg)
    M = 96
    pts = jax.random.normal(jax.random.PRNGKey(1), (M, 3))
    ray = jax.random.normal(jax.random.PRNGKey(2), (M, 3))
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    progress = jnp.asarray(0.5)

    rgb_p, dens_p = apply_nerf(params, cfg, pts, ray, progress=progress)
    rgb_f, dens_f = apply_nerf_fused(params, cfg, pts, ray,
                                     progress=progress,
                                     compute_dtype=jnp.float32, tile=32,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_p),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_p),
                               atol=2e-5)

    def loss(fn, p, **kw):
        rgb, dens = fn(p, cfg, pts, ray, progress=progress, **kw)
        return (rgb ** 2).mean() + (jnp.tanh(dens) ** 2).mean()

    g_p = jax.grad(lambda p: loss(apply_nerf, p))(params)
    g_f = jax.grad(lambda p: loss(apply_nerf_fused, p,
                                  compute_dtype=jnp.float32, tile=32,
                                  interpret=True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)
