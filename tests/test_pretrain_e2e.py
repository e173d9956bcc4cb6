"""End-to-end geometry pretrain on the procedural sphere fixture
(SURVEY.md §4d: fit a synthetic scene, assert loss decreases + PSNR)."""

import os

import numpy as np
import pytest

from texpose_tpu.data.fixture import generate_fixture
from texpose_tpu.utils.config import Config, process_options


def tiny_pretrain_cfg(root, tmp_path, crop=32):
    cfg = Config({
        "model": "nerf_pretrain", "seed": 0,
        "group": "test", "name": "e2e", "output_root": str(tmp_path / "out"),
        "max_iter": 300, "tb": False, "resume": False,
        "compute_dtype": "float32",
        "c2f": None,
        "arch": {
            "layers_feat": [None, 64, 64, 64, 64, 64],
            "layers_rgb": [None, 64, 3],
            "skip": [2],
            "posenc": {"L_3D": 6, "L_view": None},
            "density_activ": "softplus", "tf_init": True,
        },
        "nerf": {
            "view_dep": False,
            "depth": {"param": "metric", "range": [0, 3], "scale": 10,
                      "range_source": "box", "box_mask": None,
                      "box_source": "gt_box"},
            "sample_intvs": 32, "sample_stratified": True,
            "rand_rays": 1024, "density_noise_reg": None,
            "setbg_opaque": None, "mask_obj": True,
        },
        "data": {
            "root": os.path.join(root), "dataset": "lm", "object": "ball",
            "scene": "scene_naive", "image_size": [crop, crop],
            "pose_source": "gt", "pose_loop": None, "erode_mask": None,
            "erode_mask_loss": None, "multi_obj": None,
            "scene_info_source": None, "box_format": "wh",
            "mask_visib_source": "mask_visib", "bgcolor": None,
            "splits_root": os.path.join(root, "splits"),
            "train_sub": None, "val_sub": None,
        },
        "camera": {"model": "perspective", "ndc": False},
        "loss_weight": {"render": 0, "depth": -1, "mask": -1},
        "optim": {"lr": 5.e-3, "lr_end": 1.e-3, "algo": "Adam"},
        "freq": {"scalar": 100, "vis": 10000, "val": 10000, "ckpt": 10000},
        "gan": None,
    })
    return process_options(cfg)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop")
    return generate_fixture(str(root), n_train=10, n_test=1,
                            scene="scene_naive", fixed_light=True,
                            image_scale=0.25, crop_res=32)


def test_pretrain_e2e(fixture_root, tmp_path):
    from texpose_tpu.models.pretrain import PretrainEngine

    cfg = tiny_pretrain_cfg(fixture_root, tmp_path)
    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()

    # capture first/last train losses
    import jax
    import jax.numpy as jnp
    first = None
    for it in range(cfg.max_iter):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        if it == 0:
            first = float(np.asarray(loss["all"]))
    last = float(np.asarray(loss["all"]))
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.5, (first, last)

    # validation: full-frame render; PSNR here is from the OBJECT-masked
    # render MSE (mask_obj=True) — background rays with the open [0,30]
    # default depth range are unconstrained by design (reference renders
    # only object rays at eval, model/nerf_adapt_st_gan.py:652-679)
    mean = eng.validate(cfg.max_iter)
    assert mean["PSNR"] > 16.0, mean

    # visualization hook writes panel PNGs
    eng.visualize(cfg.max_iter)
    for panel in ("rgb", "image", "image_masked", "depth_gt",
                  "depth_error", "z_near"):
        assert os.path.exists(os.path.join(
            cfg.output_path, "vis",
            f"{cfg.max_iter:06d}_{panel}.png")), panel

    # eval export path: pngs + quant.txt
    res = eng.evaluate_full()
    assert os.path.exists(os.path.join(cfg.output_path, "quant.txt"))
    assert np.isfinite(res["psnr"]) and np.isfinite(res["ssim"])

    # checkpoint round-trip incl. partial trunk restore
    eng.save_checkpoint(cfg.max_iter)
    from texpose_tpu.utils import checkpoint as ckpt
    fname = os.path.join(cfg.output_path, "model.ckpt")
    state2 = ckpt.restore_checkpoint(
        fname, dict(eng.state, step=np.int32(0)))
    assert int(state2["step"]) == cfg.max_iter
    chex_like = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: np.allclose(a, b),
                               eng.state["params"], state2["params"]))
    assert chex_like

    # trunk-only restore into freshly-initialized params
    import jax.random as jr
    fresh = {"nerf": PretrainEngine.field_init(jr.PRNGKey(7), cfg)}
    merged, n = ckpt.restore_subtree(fname, fresh, "mlp_feat")
    assert n > 0
    same_trunk = np.allclose(merged["nerf"]["mlp_feat"][0]["w"],
                             np.asarray(eng.state["params"]["nerf"]["mlp_feat"][0]["w"]))
    diff_rgb = not np.allclose(merged["nerf"]["mlp_rgb"][0]["w"],
                               np.asarray(eng.state["params"]["nerf"]["mlp_rgb"][0]["w"]))
    assert same_trunk and diff_rgb


def test_pretrain_resume(fixture_root, tmp_path):
    from texpose_tpu.models.pretrain import PretrainEngine

    cfg = tiny_pretrain_cfg(fixture_root, tmp_path)
    cfg.max_iter = 4
    cfg.freq.val = 1000
    cfg.freq.ckpt = 1000
    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    eng.train()

    cfg2 = tiny_pretrain_cfg(fixture_root, tmp_path)
    cfg2.max_iter = 4
    cfg2.resume = True
    eng2 = PretrainEngine(cfg2)
    eng2.load_dataset()
    eng2.build_networks()
    eng2.setup_optimizer()
    assert eng2.restore_checkpoint()
    assert eng2.start_step == 4


def test_resume_real_field_restore(fixture_root, tmp_path):
    """train.py --resume_real path: restore_field_checkpoint loads the FULL
    nerf field (trunk + rgb head, unlike --resume_pretrain's trunk-only)
    from the group-level pretrain checkpoint into a fresh engine, leaving
    the optimizer state fresh (reference util.py:225-242)."""
    import shutil

    import jax
    from texpose_tpu.models.pretrain import PretrainEngine

    cfg = tiny_pretrain_cfg(fixture_root, tmp_path)
    cfg.max_iter = 4
    cfg.freq.val = 1000
    cfg.freq.ckpt = 1000
    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    for _ in range(cfg.max_iter):
        eng.state, _ = eng.step_fn(eng.state, eng.train_batch)
    eng.save_checkpoint(cfg.max_iter)
    group_ckpt = os.path.join(str(cfg.output_root), str(cfg.group),
                              "pretrain_model.ckpt")
    shutil.copyfile(os.path.join(cfg.output_path, "model.ckpt"), group_ckpt)

    cfg2 = tiny_pretrain_cfg(fixture_root, tmp_path)
    cfg2.seed = 7  # fresh init differs from eng's trained params
    cfg2.name = "resume_real"
    from texpose_tpu.utils.config import process_options
    cfg2 = process_options(cfg2)
    eng2 = PretrainEngine(cfg2)
    eng2.load_dataset()
    eng2.build_networks()
    eng2.setup_optimizer()
    trained = jax.tree_util.tree_map(np.asarray, eng.state["params"]["nerf"])
    fresh = jax.tree_util.tree_map(np.asarray, eng2.state["params"]["nerf"])
    assert not np.allclose(fresh["mlp_rgb"][0]["w"], trained["mlp_rgb"][0]["w"])

    eng2.restore_field_checkpoint()
    restored = jax.tree_util.tree_map(np.asarray,
                                      eng2.state["params"]["nerf"])
    jax.tree_util.tree_map(np.testing.assert_array_equal, restored, trained)
    # optimizer slots stay fresh (reference resets optim on --resume_real)
    mu = jax.tree_util.tree_leaves(eng2.state["opt_state"])
    assert all(np.allclose(m, 0) for m in mu if hasattr(m, "shape"))


def test_generate_videos_synthesis(fixture_root, tmp_path):
    """Novel-view orbit export: rgb_%d/depth_%d frames + novel_pose.npy
    (reference model/nerf_pretrain.py:242-305,283)."""
    from texpose_tpu.models.pretrain import PretrainEngine

    cfg = tiny_pretrain_cfg(fixture_root, tmp_path)
    cfg.max_iter = 1
    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    eng.state, _ = eng.step_fn(eng.state, eng.train_batch)

    path = eng.generate_videos_synthesis(N=2)
    for f in ("rgb_0.png", "rgb_1.png", "depth_0.png", "depth_1.png"):
        assert os.path.exists(os.path.join(path, f)), f
    poses = np.load(os.path.join(path, "novel_pose.npy"))
    assert poses.shape == (2, 3, 4) and np.isfinite(poses).all()

    # the GAN model does not implement video synthesis (reference
    # nerf_adapt_st_gan.py:406-407) — the base hook must say so loudly
    from texpose_tpu.models.texture_gan import TextureGANEngine
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        TextureGANEngine.generate_videos_synthesis(object())
