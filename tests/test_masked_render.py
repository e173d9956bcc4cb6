"""Masked (bucketed object-ray) rendering must equal the full-frame render
on object pixels and produce the documented defaults elsewhere."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from texpose_tpu.data.fixture import generate_fixture
from test_texture_gan_e2e import tiny_gan_cfg


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from texpose_tpu.models.texture_gan import TextureGANEngine
    root = generate_fixture(str(tmp_path_factory.mktemp("bop")),
                            n_train=3, n_test=1, scene="scene_all",
                            image_scale=0.25, crop_res=32)
    cfg = tiny_gan_cfg(root, tmp_path_factory.mktemp("out"))
    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    return eng


def test_masked_equals_full_on_object(engine):
    eng = engine
    cfg = eng.cfg
    frame = eng.eval_frame(0)
    lt = jnp.zeros((1, cfg.nerf.N_latent_trans))
    ll = eng.state["latents"]["light"][0:1]
    full = eng._render_frame_st(frame, lt, ll, masked=False)
    # force the masked path regardless of coverage
    obj = np.asarray(frame["obj_mask"]).reshape(-1)
    assert 0 < (obj > 0).mean() < 0.9
    from texpose_tpu.models.render import (masked_ray_indices,
                                           render_rays_masked_st,
                                           scatter_masked_st)
    idx_p, n = masked_ray_indices(obj, chunk=cfg.nerf.rand_rays)
    out = render_rays_masked_st(
        eng.state["params"]["nerf"], cfg, frame["pose"], frame["intr"],
        jnp.asarray(idx_p), frame["z_near"], frame["z_far"], lt, ll,
        jax.random.PRNGKey(0), progress=jnp.asarray(1.0),
        chunk=cfg.nerf.rand_rays)
    masked = scatter_masked_st(cfg, out, jnp.asarray(idx_p), n,
                               (frame["obj_mask"] > 0).astype(jnp.float32))

    m = obj > 0
    for k in ("rgb_static", "rgb", "uncert", "opacity_static", "depth"):
        a = np.asarray(full[k])[0][m]
        b = np.asarray(masked[k])[0][m]
        np.testing.assert_allclose(b, a, atol=1e-5, err_msg=k)
    # defaults off-object (reference: rgb ← 0, uncert ← min_uncert)
    bg = ~m
    assert np.allclose(np.asarray(masked["rgb_static"])[0][bg], 0.0)
    assert np.allclose(np.asarray(masked["uncert"])[0][bg],
                       cfg.nerf.min_uncert)
    assert np.allclose(np.asarray(masked["opacity_static"])[0][bg], 0.0)
