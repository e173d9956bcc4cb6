"""Visualization: image grids, heatmaps, camera-pose plots.

Capability parity with /root/reference/util_vis.py:
  * tb_image: batched [B,C,H,W] → tiled grid into TensorBoard, with
    optional value-range normalization + matplotlib colormap heatmaps
    (util_vis.py:37-72)
  * camera/pose visualization: 3D camera-frustum plots and pose-trajectory
    figures (util_vis.py:76-157, 202-275) — rendered headless with
    matplotlib to PNG (the reference's visdom server dependency is
    deliberately dropped: TPU jobs are non-interactive; PNGs + TB are the
    observable artifacts)
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def make_grid(images, num_rows=None, pad=2, pad_value=0.0):
    """[B,C,H,W] in [0,1] → [C, gh, gw] tiled grid (torchvision-style)."""
    images = np.asarray(images)
    B, C, H, W = images.shape
    num_rows = num_rows or int(np.ceil(np.sqrt(B)))
    num_cols = int(np.ceil(B / num_rows))
    grid = np.full((C, num_rows * (H + pad) + pad,
                    num_cols * (W + pad) + pad), pad_value, images.dtype)
    for i in range(B):
        r, c = divmod(i, num_cols)
        y = r * (H + pad) + pad
        x = c * (W + pad) + pad
        grid[:, y:y + H, x:x + W] = images[i]
    return grid


def center_crop(image, size):
    """Center-crop an [H,W,C] array to size x size with torchvision
    semantics: images smaller than the crop are zero-padded symmetrically
    first (torchvision.transforms.functional.center_crop; the reference's
    scene_vis eval export uses it, model/nerf_adapt_st_gan.py:350-355)."""
    h, w = image.shape[:2]
    if h < size or w < size:
        pl = max((size - w) // 2, 0)
        pr = max((size - w + 1) // 2, 0)
        pt = max((size - h) // 2, 0)
        pb = max((size - h + 1) // 2, 0)
        image = np.pad(image, ((pt, pb), (pl, pr)) +
                       ((0, 0),) * (image.ndim - 2))
        h, w = image.shape[:2]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return image[top:top + size, left:left + size]


def preprocess_vis_image(images, from_range=(0.0, 1.0), cmap=None):
    """Normalize by from_range, clip to [0,1], optionally colormap single-
    channel images (util_vis.py:23-35 + get_heatmap)."""
    images = np.asarray(images, np.float32)
    lo, hi = float(from_range[0]), float(from_range[1])
    images = (images - lo) / max(hi - lo, 1e-12)
    images = np.clip(images, 0.0, 1.0)
    if cmap is not None and images.shape[1] == 1:
        mapped = plt.get_cmap(cmap)(images[:, 0])[..., :3]       # [B,H,W,3]
        images = mapped.transpose(0, 3, 1, 2).astype(np.float32)
    return images


def tb_image(writer, step, split, name, images, from_range=(0.0, 1.0),
             cmap=None, num_rows=None):
    """Write a tiled image grid to the MetricsWriter's TB stream (no-op when
    TB is disabled)."""
    images = preprocess_vis_image(images, from_range, cmap)
    grid = make_grid(images, num_rows=num_rows)
    writer.image(step, f"{name}", grid, split=split)


def dump_image_grid(path, images, from_range=(0.0, 1.0), cmap=None):
    """Same grid, written as a PNG (headless artifact)."""
    import cv2
    images = preprocess_vis_image(images, from_range, cmap)
    grid = make_grid(images).transpose(1, 2, 0)
    if grid.shape[-1] == 1:
        grid = np.repeat(grid, 3, axis=-1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, (grid[..., ::-1] * 255).astype(np.uint8))
    return path


def _camera_wireframe(pose, scale=1.0):
    """[3,4] world→cam pose → list of 3D segments forming a frustum
    (reference util_vis.get_camera_mesh semantics: canonical pyramid pushed
    through the inverse pose)."""
    verts = np.array([[-0.5, -0.5, 1], [0.5, -0.5, 1], [0.5, 0.5, 1],
                      [-0.5, 0.5, 1], [0, 0, 0]]) * scale
    R, t = pose[:, :3], pose[:, 3]
    cam_pts = (verts - t) @ R          # world coords of frustum verts
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (1, 4), (2, 4), (3, 4)]
    return cam_pts, edges


def plot_cameras(poses, path, poses_ref=None, scale=None):
    """3D camera-frustum plot of [N,3,4] poses (blue) vs optional reference
    poses (red), saved to PNG (replaces visdom vis_cameras,
    util_vis.py:76-157)."""
    poses = np.asarray(poses)
    if scale is None:
        centers = np.stack([-p[:, :3].T @ p[:, 3] for p in poses])
        scale = 0.1 * float(np.linalg.norm(
            centers - centers.mean(0), axis=1).mean() + 1e-6)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    for group, color in [(poses, "tab:blue"),
                         (poses_ref, "tab:red")]:
        if group is None:
            continue
        for p in np.asarray(group):
            pts, edges = _camera_wireframe(p, scale)
            for a, b in edges:
                ax.plot(*zip(pts[a], pts[b]), color=color, linewidth=0.8)
    ax.set_box_aspect((1, 1, 1))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_pose_trajectory(poses_history, path):
    """Camera-center trajectories over training (reference pose PNG dumps,
    util_vis.py:202-275): poses_history is a list of [N,3,4] arrays."""
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    n = len(poses_history)
    for i, poses in enumerate(poses_history):
        centers = np.stack([-p[:, :3].T @ p[:, 3] for p in np.asarray(poses)])
        ax.scatter(*centers.T, s=3, color=plt.cm.viridis(i / max(n - 1, 1)))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
