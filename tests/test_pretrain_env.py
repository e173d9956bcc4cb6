"""Env-lighting pretrain variant: view-dependent field, poses forced to GT
(reference model/nerf_pretrain_env.py:483-485)."""

import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from texpose_tpu.data.fixture import generate_fixture
from test_pretrain_e2e import tiny_pretrain_cfg


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return generate_fixture(str(tmp_path_factory.mktemp("bop")),
                            n_train=4, n_test=1, scene="scene_all",
                            image_scale=0.25, crop_res=32)


def test_env_engine_runs_viewdep(root, tmp_path):
    from texpose_tpu.models.pretrain import PretrainEnvEngine

    cfg = tiny_pretrain_cfg(root, tmp_path)
    cfg.model = "nerf_pretrain_env"
    cfg.data.scene = "scene_all"
    # env variant: view-dependent field, no depth supervision, box-less range
    cfg.arch.posenc.L_view = 2
    cfg.nerf.view_dep = True
    cfg.nerf.depth.range_source = None
    cfg.loss_weight = {"render": 0, "mask": -1, "depth": None}
    cfg.max_iter = 30
    # poses must resolve to GT even with pose_source=predicted
    cfg.data.pose_source = "predicted"
    cfg.data.pose_loop = "init_calib"

    eng = PretrainEnvEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    assert eng.pose_source_fixed == "gt"
    b = eng.train_batch
    pose_used = eng.get_pose(b, "train")
    np.testing.assert_array_equal(np.asarray(pose_used),
                                  np.asarray(b["pose"]))

    for it in range(cfg.max_iter):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    host = {k: float(np.asarray(v)) for k, v in loss.items()}
    assert all(np.isfinite(v) for v in host.values()), host
    # view-dep rgb head has the larger input (feat + view enc + pts)
    w0 = eng.state["params"]["nerf"]["mlp_rgb"][0]["w"]
    assert w0.shape[0] == 64 + (3 + 6 * 2) + 3
