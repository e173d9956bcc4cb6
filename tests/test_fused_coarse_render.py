"""Coarse field+composite mega-kernel parity (interpreter mode): the fused
forward pallas_call + hybrid backward (kernels/fused_coarse_render.py) must
match the two-kernel fused path AND the plain XLA path, values and
gradients — INCLUDING trunk gradients (pretrain trains the trunk)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from texpose_tpu.kernels.fused_coarse_render import (
    fused_coarse_render_available, coarse_mega_layout_ok)
from texpose_tpu.utils.config import Config, process_options

pytestmark = pytest.mark.skipif(not fused_coarse_render_available(),
                                reason="no pallas")


def _cfg(view_dep=False, **kernels):
    return process_options(Config({
        "arch": {
            "layers_feat": [None] + [32] * 4,
            "layers_rgb": [None, 32, 3],
            "skip": [2],
            "posenc": {"L_3D": 4, "L_view": 2 if view_dep else None},
            "density_activ": "softplus", "tf_init": True,
        },
        "nerf": {"view_dep": view_dep, "density_noise_reg": None,
                 "sample_intvs": 8, "sample_stratified": False,
                 "setbg_opaque": False,
                 "depth": {"param": "metric", "scale": 1,
                           "range": [0, 3]}},
        "c2f": None, "camera": {"ndc": False},
        "data": {"image_size": [16, 16]},
        "kernels": dict({"fused_trunk": False}, **kernels),
    }))


def _scene(key, cfg, B=2, R=32):
    ks = jax.random.split(key, 2)
    cfg.H = cfg.W = 16
    pose = jnp.tile(jnp.eye(3, 4)[None], (B, 1, 1))
    pose = pose.at[:, 2, 3].set(2.0)
    intr = jnp.tile(jnp.asarray([[20.0, 0, 8], [0, 20.0, 8],
                                 [0, 0, 1]])[None], (B, 1, 1))
    ray_idx = jax.random.randint(ks[0], (B, R), 0, 256)
    z_near = jnp.full((B, 256), 0.5)
    z_far = jnp.full((B, 256), 3.0)
    return pose, intr, ray_idx, z_near, z_far, ks[1]


def _run(params, cfg, scene):
    from texpose_tpu.models.render import render_rays_nerf
    pose, intr, ray_idx, z_near, z_far, k = scene
    return render_rays_nerf(params, cfg, pose, intr, ray_idx, z_near,
                            z_far, k, progress=jnp.asarray(0.5),
                            mode="train", compute_dtype=jnp.float32)


@pytest.mark.parametrize("view_dep", [False, True])
def test_mega_matches_two_kernel_and_plain(key, view_dep, monkeypatch):
    monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
    from texpose_tpu.nn.fields import init_nerf, use_fused_coarse_mega

    cfg_mega = _cfg(view_dep)
    cfg_two = _cfg(view_dep, coarse_mega=False)
    cfg_plain = _cfg(view_dep, fused_coarse=False, fused_composite=False)
    params = init_nerf(key, cfg_mega)
    scene = _scene(key, cfg_mega, B=2, R=32)
    for c in (cfg_two, cfg_plain):
        c.H = c.W = 16
    assert use_fused_coarse_mega(cfg_mega, 2, 32, 8, "train")
    assert not use_fused_coarse_mega(cfg_two, 2, 32, 8, "train")

    out_m = _run(params, cfg_mega, scene)
    out_2 = _run(params, cfg_two, scene)
    out_p = _run(params, cfg_plain, scene)
    for k in ("rgb", "depth", "opacity"):
        np.testing.assert_allclose(np.asarray(out_m[k]),
                                   np.asarray(out_2[k]), atol=3e-5,
                                   err_msg=f"mega-vs-two {k}")
        np.testing.assert_allclose(np.asarray(out_m[k]),
                                   np.asarray(out_p[k]), atol=3e-5,
                                   err_msg=f"mega-vs-plain {k}")

    def loss(p, cfg):
        out = _run(p, cfg, scene)
        return ((out["rgb"] ** 2).mean() + out["opacity"].mean()
                + (out["depth"] ** 2).mean())

    g_m = jax.grad(lambda p: loss(p, cfg_mega))(params)
    g_2 = jax.grad(lambda p: loss(p, cfg_two))(params)
    g_p = jax.grad(lambda p: loss(p, cfg_plain))(params)
    for a, b, c in zip(jax.tree_util.tree_leaves(g_m),
                       jax.tree_util.tree_leaves(g_2),
                       jax.tree_util.tree_leaves(g_p)):
        # the hybrid backward chains the SAME two kernels → tight match
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-5)


def test_mega_enc_mode_xext(key, monkeypatch):
    """Non-default posenc mode through the mega kernel (the coarse default
    is sinext; xext folds pts into the streamed block)."""
    monkeypatch.setenv("TEXPOSE_FUSED_INTERPRET", "1")
    from texpose_tpu.nn.fields import init_nerf

    cfg_x = _cfg(False, coarse_posenc="xext")
    cfg_p = _cfg(False, fused_coarse=False, fused_composite=False)
    params = init_nerf(key, cfg_x)
    scene = _scene(key, cfg_x, B=2, R=32)
    cfg_p.H = cfg_p.W = 16
    out_x = _run(params, cfg_x, scene)
    out_p = _run(params, cfg_p, scene)
    for k in ("rgb", "depth", "opacity"):
        np.testing.assert_allclose(np.asarray(out_x[k]),
                                   np.asarray(out_p[k]), atol=3e-5,
                                   err_msg=k)


def test_layout_gate():
    # compute subtile must hold complete rays
    assert coarse_mega_layout_ok(512, 2, 1, 4096, 8)
    assert not coarse_mega_layout_ok(512, 2, 1, 4096, 48)   # 512 % 48 != 0
    # M-divisibility fallback: sub drops to 1, still OK
    assert coarse_mega_layout_ok(512, 2, 1, 512, 8)
    assert not coarse_mega_layout_ok(512, 1, 1, 768, 8)     # M % tile != 0
