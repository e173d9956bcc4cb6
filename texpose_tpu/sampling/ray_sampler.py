"""Continuous-coordinate ray sampling for patch-based training.

Capability parity with /root/reference/tools/ray_sampler.py: given normalized
patch coords [-1,1], produce world-space ray centers/directions and
grid-sampled per-ray depth bounds / image values.

TPU-first delta: the reference grid-samples X/Y coordinate ramps
(ray_sampler.py:49-57).  Bilinear interpolation of a linear ramp with
align_corners=True is exactly the affine map u = (x+1)/2·(W−1), so we compute
pixel coords closed-form — no gathers on the hot path, bit-identical for
in-bounds coords (patch coords are in-bounds by construction:
patch_sampler shift bound 1−scale).  Bounds/images still use real
grid_sample since they interpolate data.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.rays import img2cam, cam2world, to_hom
from ..ops.grid_sample import grid_sample


def coords_to_pixels(coords, H, W):
    """[-1,1] coords [B,h,w,2] → pixel (u,v) via the align_corners=True map."""
    u = (coords[..., 0] + 1) / 2 * (W - 1)
    v = (coords[..., 1] + 1) / 2 * (H - 1)
    return u, v


def get_rays(intr, coords, pose, H, W):
    """coords [B,h,w,2] → (center [B,h,w,3], ray [B,h,w,3]) in world frame.

    NOTE (parity): the reference samples an arange grid WITHOUT the +0.5
    pixel-center offset here (unlike camera.get_center_and_ray) — replicated.
    """
    B, h, w, _ = coords.shape
    u, v = coords_to_pixels(coords, H, W)
    xy = jnp.stack([u, v], axis=-1).reshape(B, h * w, 2)
    grid_3D = img2cam(to_hom(xy), intr)
    center_3D = jnp.zeros_like(grid_3D)
    grid_3D = cam2world(grid_3D, pose)
    center_3D = cam2world(center_3D, pose)
    ray = grid_3D - center_3D
    return center_3D.reshape(B, h, w, 3), ray.reshape(B, h, w, 3)


def get_bounds(coords, z_near, z_far, H, W):
    """Grid-sample per-pixel depth bounds at patch coords.

    z_near/z_far [B,HW] → ([B,h,w], [B,h,w]); bilinear, align_corners=True
    (reference ray_sampler.py:24-37).
    """
    B = z_near.shape[0]
    zn = z_near.reshape(B, 1, H, W).astype(jnp.float32)
    zf = z_far.reshape(B, 1, H, W).astype(jnp.float32)
    zn_s = grid_sample(zn, coords, mode="bilinear", align_corners=True)[:, 0]
    zf_s = grid_sample(zf, coords, mode="bilinear", align_corners=True)[:, 0]
    return zn_s, zf_s


def get_image(coords, image):
    """Bilinear patch extraction from [B,C,H,W] (reference :12-21)."""
    return grid_sample(image, coords, mode="bilinear", align_corners=True)
