"""Pallas fused-trunk kernel tests (interpreter mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from texpose_tpu.kernels.fused_trunk import (fused_trunk_forward,
                                             plain_trunk_forward,
                                             fused_trunk_available)
from texpose_tpu.nn.init import dense_init
from texpose_tpu.nn.fields import init_trunk, apply_trunk, _encode_points
from texpose_tpu.utils.config import Config, process_options


def _params(key, dims):
    ws, bs = [], []
    for i, (a, b) in enumerate(dims):
        p = dense_init(jax.random.fold_in(key, i), a, b)
        ws.append(p["w"])
        bs.append(p["b"])
    return ws, bs


@pytest.mark.skipif(not fused_trunk_available(), reason="no pallas")
def test_fused_matches_plain_and_grads(key):
    L, skip = 6, (2,)
    enc = 3 + 6 * L
    dims = [(enc, 64), (64, 64), (64 + enc, 64), (64, 65)]
    ws, bs = _params(key, dims)
    pts = jax.random.normal(jax.random.PRNGKey(1), (777, 3))
    c2f = jnp.array([1.0, 1.0, 0.8, 0.3, 0.0, 0.0])

    f1, d1 = plain_trunk_forward(pts, c2f, ws, bs, skip, L)
    f2, d2 = fused_trunk_forward(pts, c2f, ws, bs, skip, L, tile=256,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)

    def loss(fn):
        def inner(ws_, pts_):
            f, d = fn(pts_, c2f, ws_, bs, skip, L)
            return (f ** 2).mean() + (jnp.tanh(d) ** 2).mean()
        return inner

    g1 = jax.grad(loss(lambda *a: plain_trunk_forward(*a)),
                  argnums=(0, 1))(tuple(ws), pts)
    g2 = jax.grad(loss(lambda *a: fused_trunk_forward(*a, tile=256,
                                                      interpret=True)),
                  argnums=(0, 1))(tuple(ws), pts)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.skipif(not fused_trunk_available(), reason="no pallas")
def test_fused_matches_field_apply_trunk(key):
    """The kernel's math must equal nn.fields.apply_trunk (posenc included,
    c2f window, density split)."""
    cfg = process_options(Config({
        "arch": {"layers_feat": [None, 32, 32, 32], "skip": [1],
                 "posenc": {"L_3D": 4}, "density_activ": "softplus",
                 "tf_init": True},
        "nerf": {"view_dep": False, "density_noise_reg": None,
                 "depth": {"scale": 10, "range": [0, 3]}},
        "c2f": [0.1, 0.5],
        "data": {"image_size": [8, 8]},
    }))
    layers = init_trunk(key, cfg)
    pts = jax.random.normal(jax.random.PRNGKey(2), (50, 3))
    progress = jnp.asarray(0.3)

    enc = _encode_points(cfg, pts, progress)
    feat_ref, dens_ref = apply_trunk(layers, cfg, enc)

    from texpose_tpu.nn.fields import _c2f_band_weights
    c2f_w = _c2f_band_weights(cfg, 4, progress)
    ws = [lp["w"] for lp in layers]
    bs = [lp["b"] for lp in layers]
    feat, dens_raw = fused_trunk_forward(pts, c2f_w, ws, bs,
                                         tuple(cfg.arch.skip), 4,
                                         tile=64, interpret=True)
    dens = jax.nn.softplus(dens_raw)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dens), np.asarray(dens_ref),
                               atol=1e-5)


def test_posenc_recursion_accuracy_f64():
    """The double-angle recursion in _posenc_rows must stay close to exact
    f64 sin/cos at the production envelope (L=10, |x| up to ~45 scaled
    units) — error comparable to direct f32 evaluation's argument-reduction
    error."""
    import numpy as np
    import jax.numpy as jnp
    from texpose_tpu.kernels.fused_trunk import _posenc_rows, _freq

    rng = np.random.default_rng(3)
    L = 10
    pts = rng.uniform(-45, 45, (4096, 3)).astype(np.float32)
    ours = np.asarray(_posenc_rows(jnp.asarray(pts), L, _freq(L),
                                   jnp.ones((L,))))[:, 3:]

    freq = (2.0 ** np.arange(L)) * np.pi
    spec = pts.astype(np.float64)[:, :, None] * freq                 # [T,3,L]
    exact = np.concatenate(
        [np.concatenate([np.sin(spec[:, d]), np.cos(spec[:, d])], axis=1)
         for d in range(3)], axis=1)
    err = np.abs(ours - exact)
    # worst band: 2^9·π·45 ≈ 6.4e4 rad of phase; f32 phase noise ≈ 6e4·ε
    # ≈ 7e-3 — the recursion must stay in that same class
    assert err.max() < 2e-2, err.max()
    assert np.median(err) < 1e-4


@pytest.mark.skipif(not fused_trunk_available(), reason="no pallas")
def test_fused_trunk_sinext_matches_plain(key, monkeypatch):
    """"sinext" enc mode on the fwd-only trunk kernel (streamed XLA sin
    bands), including the row-padding path (M not a tile multiple)."""
    monkeypatch.setenv("TEXPOSE_TRUNK_POSENC", "sinext")
    L, skip = 6, (2,)
    enc = 3 + 6 * L
    dims = [(enc, 64), (64, 64), (64 + enc, 64), (64, 65)]
    ws, bs = _params(key, dims)
    pts = jax.random.normal(jax.random.PRNGKey(1), (777, 3))
    c2f = jnp.array([1.0, 1.0, 0.8, 0.3, 0.0, 0.0])

    f1, d1 = plain_trunk_forward(pts, c2f, ws, bs, skip, L)
    f2, d2 = fused_trunk_forward(pts, c2f, ws, bs, skip, L, tile=256,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


@pytest.mark.skipif(not fused_trunk_available(), reason="no pallas")
def test_fused_trunk_xext_matches_plain(key, monkeypatch):
    """"xext" enc mode (pts folded into the streamed sin-band block) on the fwd-only trunk kernel (streamed XLA sin
    bands), including the row-padding path (M not a tile multiple)."""
    monkeypatch.setenv("TEXPOSE_TRUNK_POSENC", "xext")
    L, skip = 6, (2,)
    enc = 3 + 6 * L
    dims = [(enc, 64), (64, 64), (64 + enc, 64), (64, 65)]
    ws, bs = _params(key, dims)
    pts = jax.random.normal(jax.random.PRNGKey(1), (777, 3))
    c2f = jnp.array([1.0, 1.0, 0.8, 0.3, 0.0, 0.0])

    f1, d1 = plain_trunk_forward(pts, c2f, ws, bs, skip, L)
    f2, d2 = fused_trunk_forward(pts, c2f, ws, bs, skip, L, tile=256,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
