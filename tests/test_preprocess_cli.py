"""Preprocessing CLI tests on the fixture BOP tree: compute_box and
compute_surfelinfo produce valid, loadable outputs."""

import os

import numpy as np
import pytest

from texpose_tpu.data.fixture import generate_fixture


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return generate_fixture(str(tmp_path_factory.mktemp("bop")),
                            n_train=3, n_test=1, scene="scene_all",
                            image_scale=0.25, crop_res=32)


def test_compute_box_cli(root, tmp_path):
    import compute_box
    H, W = 120, 160
    out = str(tmp_path / "target")
    compute_box.main([
        "--data_root", os.path.join(root, "lm"),
        "--folder", "000001",
        "--split_file", os.path.join(root, "splits", "lm", "ball",
                                     "scene_all", "train.txt"),
        "--cad_path", os.path.join(root, "lm", "models", "obj_000001.ply"),
        "--pred_loop", "init_calib",
        "--height", str(H), "--width", str(W),
        "--target_folder", out,
    ])
    files = sorted(os.listdir(os.path.join(out, "pred_box_init_calib")))
    assert len(files) == 3
    box = np.load(os.path.join(out, "pred_box_init_calib", files[0]))["data"]
    assert box.shape == (2, H, W)
    hit = box[1] > 0
    assert hit.any()
    # bounds bracket the sphere surface distance (~400mm center, 60mm radius,
    # box enlarged) and near < far on hits
    assert (box[0][hit] < box[1][hit]).all()
    assert 200 < np.median(box[1][hit]) < 700
    # compare against the fixture's analytic gt_box on overlapping pixels:
    # both are ray/AABB intersections, ccompute_box's box is larger (+scale/6
    # +25% diagonal), so its t_near must be <= the analytic cube's t_near
    gt = np.load(os.path.join(root, "lm", "000001", "gt_box",
                              files[0].replace("_000000", "")))["data"]
    both = hit & (gt[1] > 0)
    assert (box[0][both] <= gt[0][both] + 1.0).all()


def test_compute_box_vis(root, tmp_path):
    """--vis dumps a QA overlay PNG and the CAD depth must fall inside the
    computed box bounds (headless reference compute_box.py:287-337)."""
    import compute_box
    H, W = 120, 160
    out = str(tmp_path / "target")
    compute_box.main([
        "--data_root", os.path.join(root, "lm"),
        "--folder", "000001",
        "--split_file", os.path.join(root, "splits", "lm", "ball",
                                     "scene_all", "train.txt"),
        "--cad_path", os.path.join(root, "lm", "models", "obj_000001.ply"),
        "--pred_loop", "init_calib",
        "--height", str(H), "--width", str(W),
        "--target_folder", out, "--vis",
    ])
    png = os.path.join(out, "pred_box_init_calib", "box_vis.png")
    assert os.path.exists(png)
    # the violation fraction is also directly checkable here: the box is a
    # strict superset of the mesh AABB, so depth must sit inside the bounds
    from texpose_tpu.data.cad import CADModel
    from texpose_tpu.data import bop
    import json
    model = CADModel(os.path.join(root, "lm", "models", "obj_000001.ply"))
    lines = bop.readlines(os.path.join(root, "splits", "lm", "ball",
                                       "scene_all", "train.txt"))
    frame = int(bop.split_line(lines[-1])[2])
    scene_dir = os.path.join(root, "lm", "000001")
    with open(os.path.join(scene_dir, "scene_pred_init_calib.json")) as f:
        rec = json.load(f)[str(frame)][0]
    with open(os.path.join(scene_dir, "scene_camera.json")) as f:
        K = np.array(json.load(f)[str(frame)]["cam_K"],
                     np.float32).reshape(3, 3)[None]
    pose = np.concatenate(
        [np.array(rec["cam_R_m2c"], np.float32).reshape(3, 3),
         np.array(rec["cam_t_m2c"], np.float32)[:, None]], axis=1)[None]
    box = np.load(os.path.join(out, "pred_box_init_calib",
                               f"{frame:06d}.npz"))["data"]
    frac = compute_box.dump_box_vis(str(tmp_path / "qa.png"), model, pose, K,
                                    box, H, W)
    assert frac < 0.05, f"box bounds miss {frac:.1%} of CAD depth pixels"


def test_compute_surfelinfo_cli(root, tmp_path):
    import compute_surfelinfo
    from texpose_tpu.utils.config import Config, process_options
    geo_dir = str(tmp_path / "geo")
    cfg = process_options(Config({
        "data": {
            "root": root, "dataset": "lm", "object": "ball",
            "scene": "scene_all", "image_size": [32, 32],
            "pose_source": "predicted", "pose_loop": "init_calib",
            "erode_mask": None, "mask_visib_source": "mask_visib",
            "scene_info_source": None, "box_format": "wh",
            "multi_obj": None, "train_sub": None,
            "splits_root": os.path.join(root, "splits"),
        },
        "nerf": {"depth": {"scale": 10, "range": [0, 3]}},
        "render": {"geo_save_dir": geo_dir},
        "cad_path": os.path.join(root, "lm", "models", "obj_000001.ply"),
        "model": "nerf_pretrain",
    }))
    compute_surfelinfo.compute_surfelinfo(cfg)
    for sub, n in [("rgbsyn_init_calib", 3), ("nocs_init_calib", 3),
                   ("normal_init_calib", 3)]:
        assert len(os.listdir(os.path.join(geo_dir, sub))) == n
    import cv2
    rgba = cv2.imread(os.path.join(geo_dir, "rgbsyn_init_calib",
                                   "000000.png"), -1)
    assert rgba.shape == (32, 32, 4)
    assert (rgba[..., 3] > 0).any(), "alpha channel empty"
    # object roughly centered in the crop
    ys, xs = np.nonzero(rgba[..., 3])
    assert 8 < ys.mean() < 24 and 8 < xs.mean() < 24
    nocs = cv2.imread(os.path.join(geo_dir, "nocs_init_calib",
                                   "000000.png"), -1)
    assert nocs[rgba[..., 3] > 0].std() > 10, "nocs should vary over surface"
    normal = np.load(os.path.join(geo_dir, "normal_init_calib",
                                  "000000.npz"))["data"]
    assert normal.shape == (32, 32, 3)
    lens = np.linalg.norm(normal, axis=-1)
    assert (np.abs(lens[lens > 0.5] - 1) < 1e-3).all()


def test_compute_box_vis_empty_split(root, tmp_path):
    """--vis with an empty split file must not crash (loop-leak guard)."""
    import compute_box
    empty = str(tmp_path / "empty.txt")
    open(empty, "w").write("\n")
    out = str(tmp_path / "target")
    compute_box.main([
        "--data_root", os.path.join(root, "lm"),
        "--folder", "000001",
        "--split_file", empty,
        "--cad_path", os.path.join(root, "lm", "models", "obj_000001.ply"),
        "--pred_loop", "init_calib",
        "--height", "120", "--width", "160",
        "--target_folder", out, "--vis",
    ])
    assert not os.path.exists(
        os.path.join(out, "pred_box_init_calib", "box_vis.png"))
