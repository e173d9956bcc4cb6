"""syn2real full-frame dataset + texture-GAN eval/export path."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from texpose_tpu.data.fixture import generate_fixture
from texpose_tpu.data.lmsyn2real import LineMODSyn2RealDataset
from test_texture_gan_e2e import tiny_gan_cfg


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return generate_fixture(str(tmp_path_factory.mktemp("bop")),
                            n_train=4, n_test=2, scene="scene_all",
                            image_scale=0.25, crop_res=32)


def test_syn2real_dataset(root, tmp_path):
    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.data.image_size = [60, 80]
    cfg.data.raw_size = [120, 160]
    cfg.H, cfg.W = 60, 80
    ds = LineMODSyn2RealDataset(cfg, split="test",
                                splits_root=cfg.data.splits_root)
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (3, 60, 80)
    assert s["z_near"].shape == (60 * 80,)
    assert s["obj_mask"].shape == (60, 80)
    # intrinsics rescaled by H ratio with the +0.5 convention
    K, _, _ = ds.get_camera(0)
    assert abs(K[0, 0] / (572.4114 * 0.25) - 0.5) < 0.01
    # bounds bracket the object depth where the mask hits
    m = s["obj_mask"].reshape(-1) > 0
    assert (s["z_near"][m] < 4.5).all() and (s["z_far"][m] > 3.5).all()


def test_syn2real_frame0_gt_pose_anchor(root, tmp_path):
    """Predicted-pose syn2real training pins image 0 to its GT pose — the
    reference's gauge anchor (data/lmsyn2real.py:322
    `... if idx != 0 else pose_gt`); other frames ride the noisy
    predictions."""
    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.data.image_size = [60, 80]
    cfg.data.raw_size = [120, 160]
    cfg.H, cfg.W = 60, 80
    assert cfg.data.pose_source == "predicted"
    ds = LineMODSyn2RealDataset(cfg, split="train",
                                splits_root=cfg.data.splits_root)
    _, gt0, init0 = ds.get_camera(0)
    np.testing.assert_array_equal(init0, gt0)
    _, gt1, init1 = ds.get_camera(1)
    assert np.abs(init1 - gt1).max() > 0      # fixture preds carry noise


def test_val_on_test_and_val_sub(root, tmp_path):
    """data.val_on_test routes the eval split to "test" (reference
    model/base.py:36-37) and data.val_sub truncates the eval split even
    when it is "test" (reference passes subset=opt.data.val_sub
    unconditionally, :38); validate() loops the whole subset."""
    from texpose_tpu.models.texture_gan import TextureGANEngine

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.data.val_on_test = True
    cfg.data.val_sub = 2
    eng = TextureGANEngine(cfg)
    eng.load_dataset()                     # eval_split="val" → overridden
    assert eng.eval_data.split == "test" and len(eng.eval_data) == 2
    eng.build_networks()
    eng.setup_optimizer()
    calls = []
    orig = eng.eval_frame
    eng.eval_frame = lambda i: calls.append(i) or orig(i)
    cfg.render.drift_monitor = False
    mean = eng.validate(0)
    assert calls == [0, 1] and np.isfinite(mean["PSNR"])
    # val_sub truncates the test split too
    cfg2 = tiny_gan_cfg(root, tmp_path / "b")
    cfg2.data.val_on_test = True
    cfg2.data.val_sub = 1
    eng2 = TextureGANEngine(cfg2)
    eng2.load_dataset()
    assert len(eng2.eval_data) == 1


def test_syn2real_eval_export(root, tmp_path):
    """Train briefly at crop size, then evaluate syn2real full-frame with a
    fresh engine sharing the checkpoint-free state (reference runs this as
    evaluate.py --syn2real with image_size=[480,640])."""
    import jax
    import jax.numpy as jnp
    from texpose_tpu.models.texture_gan import TextureGANEngine

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.max_iter = 3
    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    for it in range(3):
        eng.state, _ = eng.step_fn(eng.state, eng.train_batch)
    eng.save_checkpoint(3)

    cfg2 = tiny_gan_cfg(root, tmp_path)
    cfg2.syn2real = True
    cfg2.resume = True
    cfg2.data.image_size = [60, 80]
    cfg2.data.raw_size = [120, 160]
    cfg2.H, cfg2.W = 60, 80
    eng2 = TextureGANEngine(cfg2)
    eng2.load_dataset(eval_split="test")
    eng2.build_networks()
    eng2.setup_optimizer()
    assert eng2.restore_checkpoint()
    res = eng2.evaluate_full()
    assert np.isfinite(res["psnr"])
    out_dir = os.path.join(cfg2.output_path, "test_view_last")
    files = sorted(os.listdir(out_dir))
    assert len(files) == 2
    import cv2
    img = cv2.imread(os.path.join(out_dir, files[0]))
    # export upsampled to the raw full-frame size (reference :341-349)
    assert img.shape == (120, 160, 3)


def test_scene_vis_eval_export(root, tmp_path):
    """scene_vis eval export (reference nerf_adapt_st_gan.py:349-371):
    256-px center crop, render composited on white inside the depth-derived
    mask, plus unmasked-GT (syn_*) and plasma-depth (depth_vis_*) dumps."""
    import shutil

    import cv2
    from texpose_tpu.models.texture_gan import TextureGANEngine

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.max_iter = 2
    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    for it in range(2):
        eng.state, _ = eng.step_fn(eng.state, eng.train_batch)
    eng.save_checkpoint(2)

    # scene_vis shares the data tree; only the split files differ
    src = os.path.join(root, "splits", "lm", "ball", "scene_all")
    dst = os.path.join(root, "splits", "lm", "ball", "scene_vis")
    if not os.path.exists(dst):
        shutil.copytree(src, dst)

    cfg2 = tiny_gan_cfg(root, tmp_path)
    cfg2.syn2real = True
    cfg2.resume = True
    cfg2.data.scene = "scene_vis"
    cfg2.data.image_size = [60, 80]
    cfg2.data.raw_size = [120, 160]
    cfg2.H, cfg2.W = 60, 80
    eng2 = TextureGANEngine(cfg2)
    eng2.load_dataset(eval_split="test", prefetch_train=False)
    eng2.build_networks()
    eng2.setup_optimizer()
    assert eng2.restore_checkpoint()
    res = eng2.evaluate_full()
    assert np.isfinite(res["psnr"])

    out_dir = os.path.join(cfg2.output_path, "test_view_last")
    files = sorted(os.listdir(out_dir))
    renders = [f for f in files if f[0].isdigit()]
    syn = [f for f in files if f.startswith("syn_")]
    dvis = [f for f in files if f.startswith("depth_vis_")]
    assert len(renders) == 2 and len(syn) == 2 and len(dvis) == 2
    for f in renders + syn + dvis:
        img = cv2.imread(os.path.join(out_dir, f))
        assert img.shape == (256, 256, 3), f
    # the raw frame is 120x160 < 256: the padded border is outside the
    # mask, so the white composite must show there
    img = cv2.imread(os.path.join(out_dir, renders[0]))
    assert (img[0, 0] == 255).all() and (img[-1, -1] == 255).all()
    # the GT dump is NOT composited -- its padded border stays black
    gt = cv2.imread(os.path.join(out_dir, syn[0]))
    assert (gt[0, 0] == 0).all()


def test_eval_metrics_device_matches_host_reference_path(root, tmp_path):
    """The r5 on-device metrics jit (mask → resize_bilinear upscale →
    PSNR/SSIM/LPIPS) must reproduce the r4 host path (cv2 resize +
    per-metric device round trips) — i.e. the reference's own eval math
    (model/nerf_adapt_st_gan.py:341-364) — per frame."""
    import cv2
    import jax.numpy as jnp
    from texpose_tpu.models.texture_gan import TextureGANEngine
    from texpose_tpu.ops.ssim import ssim
    from texpose_tpu.utils.metrics import mse_to_psnr

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.name = "metric_parity"
    cfg.syn2real = True
    cfg.data.image_size = [60, 80]
    cfg.data.raw_size = [120, 160]
    cfg.H, cfg.W = 60, 80
    cfg.render.light = "mean"            # deterministic latent protocol
    cfg.render.transient = "zero"
    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test", prefetch_train=False)
    eng.build_networks()
    eng.setup_optimizer()
    eng.evaluate_full()

    rows = []
    with open(os.path.join(cfg.output_path, "quant.txt")) as f:
        header = f.readline().split()[2:]
        for line in f:
            vals = line.split()[1:]
            rows.append(dict(zip(header, (float(v) for v in vals))))

    tab = eng._host_latents_table()
    ll = tab["light"].mean(axis=0, keepdims=True)
    lt = np.zeros((1, cfg.nerf.N_latent_trans), np.float32)
    for i in range(len(eng.eval_data)):
        frame = eng.eval_frame(i)
        out = eng._render_frame_st(frame, lt, ll)
        rgb = np.asarray(out["rgb_static"]).reshape(cfg.H, cfg.W, 3)
        mask = np.asarray(frame["obj_mask"]).reshape(cfg.H, cfg.W, 1)
        image = np.asarray(frame["image"])[0].transpose(1, 2, 0) * mask
        rgb = cv2.resize(rgb, (160, 120), interpolation=cv2.INTER_LINEAR)
        image = cv2.resize(image, (160, 120), interpolation=cv2.INTER_LINEAR)
        p = float(mse_to_psnr(jnp.mean((jnp.asarray(rgb) -
                                        jnp.asarray(image)) ** 2)))
        rgb_t = jnp.asarray(rgb.transpose(2, 0, 1))[None]
        img_t = jnp.asarray(image.transpose(2, 0, 1))[None]
        s = float(ssim(rgb_t, img_t))
        lp = eng.lpips(rgb_t, img_t)
        assert abs(rows[i]["psnr"] - p) < 2e-3, (i, rows[i]["psnr"], p)
        assert abs(rows[i]["ssim"] - s) < 2e-4, (i, rows[i]["ssim"], s)
        assert abs(rows[i][eng.lpips_key] - lp) < 2e-4
