"""Field+composite mega-kernel parity (interpreter mode): the single
fwd/bwd pallas_call pair (kernels/fused_st_render.py) must match the plain
XLA path AND the two-kernel fused pipeline, values and gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from texpose_tpu.kernels.fused_st_render import fused_st_render_available
from texpose_tpu.nn.fields import init_nerf_st, use_fused_st_render
from texpose_tpu.utils.config import Config, process_options

pytestmark = pytest.mark.skipif(not fused_st_render_available(),
                                reason="no pallas")


def _cfg(**kernels):
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
                 "min_uncert": 0.05, "sample_intvs": 16,
                 "sample_stratified": False,
                 "depth": {"param": "metric", "scale": 10, "range": [0, 3]}},
        "c2f": {"range": [0.1, 0.6], "start": 1},
        "data": {"image_size": [8, 8]},
        # st_mega ships default-OFF (lost the production A/B); the tests
        # here exist to keep the kernel parity-covered, so force it on.
        "kernels": dict({"fused_trunk": False, "st_mega": True}, **kernels),
    }))


def _scene(key, B=2, R=64):
    ks = jax.random.split(key, 6)
    center = jax.random.normal(ks[1], (B, R, 3))
    ray = jax.random.normal(ks[2], (B, R, 3))
    near = jnp.full((B, R), 2.0)
    far = jnp.full((B, R), 6.0)
    lt = jax.random.normal(ks[3], (B, 8)) * 0.2
    ll = jax.random.normal(ks[4], (B, 12)) * 0.2
    return center, ray, near, far, lt, ll


KEYS = ["rgb", "rgb_static", "rgb_transient", "depth", "opacity",
        "opacity_static", "opacity_transient", "uncert"]


def _run(params, cfg, scene, lt, ll):
    from texpose_tpu.models.render import render_st_core
    center, ray, near, far = scene
    return render_st_core(params, cfg, center, ray, near, far, lt, ll,
                          jax.random.PRNGKey(7), jnp.asarray(0.5),
                          "eval", compute_dtype=jnp.float32)


def test_mega_matches_plain_and_two_kernel(key, monkeypatch):
    cfg = _cfg()
    B, R, N = 2, 64, 16
    params = init_nerf_st(key, cfg)
    center, ray, near, far, lt, ll = _scene(key, B, R)
    scene = (center, ray, near, far)

    # plain XLA reference (kernels disabled on CPU without interpret)
    monkeypatch.delenv("TEXPOSE_FUSED_INTERPRET", raising=False)
    ref = _run(params, cfg, scene, lt, ll)

    monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
    assert use_fused_st_render(cfg, B, R, N, params)
    mega = _run(params, cfg, scene, lt, ll)
    for k in KEYS:
        np.testing.assert_allclose(np.asarray(mega[k]), np.asarray(ref[k]),
                                   atol=3e-5, err_msg=k)

    # two-kernel fused path (mega off) — near-bitwise agreement expected:
    # identical kernel math, only the HBM round-trip differs
    cfg2 = _cfg(st_mega=False)
    assert not use_fused_st_render(cfg2, B, R, N, params)
    two = _run(params, cfg2, scene, lt, ll)
    for k in KEYS:
        np.testing.assert_allclose(np.asarray(mega[k]), np.asarray(two[k]),
                                   atol=1e-6, err_msg=k)
    np.testing.assert_allclose(float(mega["trans_density_mean"]),
                               float(two["trans_density_mean"]), atol=1e-6)


def test_mega_gradients_match_plain(key, monkeypatch):
    cfg = _cfg()
    B, R, N = 2, 64, 16
    params = init_nerf_st(key, cfg)
    center, ray, near, far, lt, ll = _scene(key, B, R)
    scene = (center, ray, near, far)
    heads = {k: v for k, v in params.items() if k != "mlp_feat"}

    def loss(h, lt_, ll_, fused):
        if fused:
            monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
        else:
            monkeypatch.delenv("TEXPOSE_FUSED_INTERPRET", raising=False)
        o = _run(dict(h, mlp_feat=params["mlp_feat"]), cfg, scene, lt_, ll_)
        return ((o["rgb"] ** 2).mean() + 2 * (o["rgb_static"] ** 2).mean()
                + 3 * o["rgb_transient"].sum()
                + 0.5 * o["opacity"].sum()
                + 0.25 * o["opacity_transient"].sum()
                + 4 * (o["uncert"] ** 2).mean()
                + 1.5 * o["trans_density_mean"])

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(heads, lt, ll, False)
    monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
    assert use_fused_st_render(cfg, B, R, N, params)
    g_out = jax.grad(loss, argnums=(0, 1, 2))(heads, lt, ll, True)
    flat_r, tdef = jax.tree_util.tree_flatten(g_ref)
    flat_o, _ = jax.tree_util.tree_flatten(g_out)
    for a, b, p in zip(flat_o, flat_r, range(len(flat_r))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=f"grad leaf {p}")


def test_mega_subtiles_straddle_images(key, monkeypatch):
    """One streamed fwd grid step (512×4 = 2048 rows) spans TWO images
    (rows/img = 1024): per-image latent rows and latent grads must stay
    image-resolved across the subtile loop."""
    cfg = _cfg(st_subtiles_fwd=4, st_subtiles_bwd=2)
    B, R, N = 4, 64, 16                       # rows/img = 1024 = 2 subtiles
    params = init_nerf_st(key, cfg)
    center, ray, near, far, _, _ = _scene(key, B, R)
    scene = (center, ray, near, far)
    ks = jax.random.split(key, 2)
    lt = jax.random.normal(ks[0], (B, 8)) * 0.3
    ll = jax.random.normal(ks[1], (B, 12)) * 0.3

    def loss(lt_, ll_, fused):
        if fused:
            monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
        else:
            monkeypatch.delenv("TEXPOSE_FUSED_INTERPRET", raising=False)
        o = _run(params, cfg, scene, lt_, ll_)
        return (o["rgb"] ** 2).mean() + (o["uncert"] ** 2).mean()

    v_ref = loss(lt, ll, False)
    g_ref = jax.grad(loss, argnums=(0, 1))(lt, ll, False)
    monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
    assert use_fused_st_render(cfg, B, R, N, params)
    v_out = loss(lt, ll, True)
    g_out = jax.grad(loss, argnums=(0, 1))(lt, ll, True)
    np.testing.assert_allclose(float(v_out), float(v_ref), atol=3e-5)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_mega_gate_fallbacks(key, monkeypatch):
    """Configs outside the mega contract must fall back (gate False)."""
    monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
    cfg = _cfg()
    params = init_nerf_st(key, cfg)
    B, R, N = 2, 64, 16
    assert use_fused_st_render(cfg, B, R, N, params)
    # N that does not divide the (fitted) tile
    assert not use_fused_st_render(cfg, 2, 16, 48, params)
    # non-xext posenc
    assert not use_fused_st_render(_cfg(st_posenc="sinext"), B, R, N,
                                   params)
    # split heads off
    assert not use_fused_st_render(_cfg(st_split_heads=False), B, R, N,
                                   params)
    # trunk experiments
    assert not use_fused_st_render(_cfg(st_trunk_ilp=True), B, R, N,
                                   params)
    # explicit off-switch
    assert not use_fused_st_render(_cfg(st_mega=False), B, R, N, params)


def test_mega_packed_off_matches(key, monkeypatch):
    cfg = _cfg(st_pack_heads=False)
    B, R, N = 2, 64, 16
    params = init_nerf_st(key, cfg)
    center, ray, near, far, lt, ll = _scene(key, B, R)
    scene = (center, ray, near, far)
    monkeypatch.delenv("TEXPOSE_FUSED_INTERPRET", raising=False)
    ref = _run(params, cfg, scene, lt, ll)
    monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
    assert use_fused_st_render(cfg, B, R, N, params)
    out = _run(params, cfg, scene, lt, ll)
    for k in KEYS:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=3e-5, err_msg=k)


def test_mega_full_bwd_matches_hybrid(key, monkeypatch):
    """TEXPOSE_MEGA_FULLBWD=1 (the fully-fused bwd kept for A/B) must
    produce the same gradients as the default hybrid backward."""
    cfg = _cfg()
    B, R, N = 2, 64, 16
    params = init_nerf_st(key, cfg)
    center, ray, near, far, lt, ll = _scene(key, B, R)
    scene = (center, ray, near, far)
    heads = {k: v for k, v in params.items() if k != "mlp_feat"}
    monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
    assert use_fused_st_render(cfg, B, R, N, params)

    def loss(h, lt_, ll_):
        o = _run(dict(h, mlp_feat=params["mlp_feat"]), cfg, scene, lt_, ll_)
        return ((o["rgb"] ** 2).mean() + (o["rgb_static"] ** 2).mean()
                + (o["uncert"] ** 2).mean() + o["trans_density_mean"])

    monkeypatch.delenv("TEXPOSE_MEGA_FULLBWD", raising=False)
    g_hyb = jax.grad(loss, argnums=(0, 1, 2))(heads, lt, ll)
    monkeypatch.setenv("TEXPOSE_MEGA_FULLBWD", "1")
    from texpose_tpu.kernels.fused_st_render import _make_op
    _make_op.cache_clear()          # same static config, new bwd mode
    g_full = jax.grad(loss, argnums=(0, 1, 2))(heads, lt, ll)
    _make_op.cache_clear()
    flat_h = jax.tree_util.tree_leaves(g_hyb)
    flat_f = jax.tree_util.tree_leaves(g_full)
    for i, (a, b) in enumerate(zip(flat_f, flat_h)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=f"grad leaf {i}")
