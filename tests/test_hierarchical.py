"""Hierarchical (importance) sampling: inverse-CDF behavior + fine-field
training path."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from texpose_tpu.ops.render import (sample_depth_from_pdf,
                                    union_sorted_depths)


def test_pdf_sampling_concentrates(key):
    B, R, N = 2, 8, 32
    d = jnp.broadcast_to(jnp.linspace(1.0, 5.0, N)[None, None, :, None],
                         (B, R, N, 1))
    # weights peaked around depth 3.0 (index 16)
    w = jnp.exp(-0.5 * ((jnp.arange(N) - 16) / 2.0) ** 2)
    w = jnp.broadcast_to(w[None, None, :], (B, R, N))
    fine = sample_depth_from_pdf(key, d, w, 64)
    assert fine.shape == (B, R, 64, 1)
    f = np.asarray(fine).reshape(-1)
    assert 2.4 < np.median(f) < 3.6, np.median(f)
    assert (f >= 1.0).all() and (f <= 5.0).all()

    # uniform weights → roughly uniform coverage
    fine_u = sample_depth_from_pdf(key, d, jnp.ones((B, R, N)), 64)
    fu = np.asarray(fine_u).reshape(-1)
    assert abs(np.median(fu) - 3.0) < 0.4

    both = union_sorted_depths(d, fine)
    assert both.shape == (B, R, N + 64, 1)
    assert (np.diff(np.asarray(both)[..., 0], axis=-1) >= 0).all()


def test_fine_sampling_pretrain_e2e(tmp_path, tmp_path_factory):
    from texpose_tpu.data.fixture import generate_fixture
    from test_pretrain_e2e import tiny_pretrain_cfg
    from texpose_tpu.models.pretrain import PretrainEngine

    root = generate_fixture(str(tmp_path_factory.mktemp("bop")),
                            n_train=4, n_test=1, scene="scene_naive",
                            fixed_light=True, image_scale=0.25, crop_res=32)
    cfg = tiny_pretrain_cfg(root, tmp_path)
    cfg.nerf.fine_sampling = True
    cfg.nerf.sample_intvs_fine = 16
    cfg.loss_weight.render_fine = 0
    cfg.max_iter = 60

    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    assert "nerf_fine" in eng.state["params"]
    eng.setup_optimizer()
    first = None
    for it in range(cfg.max_iter):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        if it == 0:
            first = float(np.asarray(loss["render_fine"]))
    last = float(np.asarray(loss["render_fine"]))
    assert np.isfinite(last) and last < first, (first, last)
