"""Visualization utilities tests."""

import os

import numpy as np

from texpose_tpu.utils.vis import (make_grid, preprocess_vis_image,
                                   dump_image_grid, plot_cameras,
                                   plot_pose_trajectory)


def test_make_grid_shapes():
    imgs = np.random.default_rng(0).random((5, 3, 8, 10)).astype(np.float32)
    grid = make_grid(imgs, pad=2)
    # 5 images → 3 rows x 2 cols
    assert grid.shape == (3, 3 * 10 + 2, 2 * 12 + 2)
    # first tile matches first image
    np.testing.assert_array_equal(grid[:, 2:10, 2:12], imgs[0])


def test_preprocess_range_and_cmap():
    depth = np.linspace(2, 6, 16, dtype=np.float32).reshape(1, 1, 4, 4)
    out = preprocess_vis_image(depth, from_range=(2, 6), cmap="plasma")
    assert out.shape == (1, 3, 4, 4)
    assert out.min() >= 0 and out.max() <= 1


def test_dump_and_plots(tmp_path):
    imgs = np.random.default_rng(0).random((2, 3, 8, 8)).astype(np.float32)
    p = dump_image_grid(str(tmp_path / "grid.png"), imgs)
    assert os.path.exists(p)

    rng = np.random.default_rng(1)
    poses = []
    for i in range(4):
        theta = i * np.pi / 2
        R = np.array([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
        t = rng.normal(size=3)
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    poses = np.stack(poses).astype(np.float32)
    p1 = plot_cameras(poses, str(tmp_path / "cams.png"), poses_ref=poses)
    p2 = plot_pose_trajectory([poses, poses], str(tmp_path / "traj.png"))
    assert os.path.exists(p1) and os.path.exists(p2)
