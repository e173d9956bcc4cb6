"""Scan-fused training (K steps per dispatch) must be bit-identical to K
single steps, and the gcd clamp must keep hooks reachable."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from texpose_tpu.data.fixture import generate_fixture
from test_pretrain_e2e import tiny_pretrain_cfg


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return generate_fixture(str(tmp_path_factory.mktemp("bop")),
                            n_train=4, n_test=1, scene="scene_naive",
                            fixed_light=True, image_scale=0.25, crop_res=32)


def test_scan_equivalence(root, tmp_path):
    from texpose_tpu.models.pretrain import PretrainEngine
    res = {}
    for K in (1, 10):
        cfg = tiny_pretrain_cfg(root, tmp_path / f"k{K}")
        cfg.scan_steps = K
        cfg.max_iter = 20
        eng = PretrainEngine(cfg)
        eng.load_dataset()
        eng.build_networks()
        eng.setup_optimizer()
        assert eng.scan_k() == K
        for _ in range(20 // K):
            eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        res[K] = (float(np.asarray(loss["all"])),
                  int(np.asarray(eng.state["it"])),
                  np.asarray(eng.state["params"]["nerf"]["mlp_feat"][0]["w"]))
    assert res[1][1] == res[10][1] == 20
    assert abs(res[1][0] - res[10][0]) < 1e-6, (res[1][0], res[10][0])
    np.testing.assert_allclose(res[10][2], res[1][2], atol=1e-6)


def test_scan_gcd_clamp(root, tmp_path):
    from texpose_tpu.models.pretrain import PretrainEngine
    cfg = tiny_pretrain_cfg(root, tmp_path)
    cfg.scan_steps = 20
    cfg.freq.scalar = 5          # forces gcd clamp to 5
    cfg.max_iter = 30
    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    assert eng.scan_k() == 5
