"""Camera/ray geometry, pure JAX.

Capability parity with the reference's coordinate transforms + ray generation
(/root/reference/camera.py:250-458): world↔camera↔image transforms, per-pixel
ray generation with +0.5 pixel centers, NDC reparameterization, AABB slab
intersection, back-projection.

TPU notes: ray generation is pure gather-free arithmetic that XLA fuses into
one kernel; the pixel grid is built with broadcasted_iota (static shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pose import pose_invert


def to_hom(X):
    """Append a homogeneous 1 to the last axis."""
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X, pose):
    """[...,N,3] world points → camera frame via [...,3,4] pose."""
    return to_hom(X) @ jnp.swapaxes(pose, -1, -2)


def cam2img(X, intr):
    return X @ jnp.swapaxes(intr, -1, -2)


def img2cam(X, intr):
    return X @ jnp.swapaxes(jnp.linalg.inv(intr), -1, -2)


def cam2world(X, pose):
    """Camera-frame points → world (pose is world→cam, so invert first)."""
    return to_hom(X) @ jnp.swapaxes(pose_invert(pose), -1, -2)


def pixel_grid(H, W, dtype=jnp.float32, center_offset=0.5):
    """[(H*W), 2] grid of (x, y) pixel centers (x fastest, matching a
    row-major H×W flatten in the reference)."""
    ys = jax.lax.broadcasted_iota(dtype, (H, W), 0) + center_offset
    xs = jax.lax.broadcasted_iota(dtype, (H, W), 1) + center_offset
    return jnp.stack([xs, ys], axis=-1).reshape(H * W, 2)


def get_center_and_ray(pose, intr, H, W, center_offset=0.5):
    """Per-pixel camera centers and (unnormalized) ray directions in world.

    pose [B,3,4], intr [B,3,3] → (center [B,HW,3], ray [B,HW,3]).
    Matches reference camera.get_center_and_ray (camera.py:292-314): pixel
    centers at +0.5, ray = unproject(pixel, depth=1) - center.
    """
    B = pose.shape[0]
    xy = pixel_grid(H, W, pose.dtype, center_offset)           # [HW,2]
    xy = jnp.broadcast_to(xy[None], (B, H * W, 2))
    grid_3D = img2cam(to_hom(xy), intr)                        # [B,HW,3]
    center_3D = jnp.zeros_like(grid_3D)
    grid_3D = cam2world(grid_3D, pose)
    center_3D = cam2world(center_3D, pose)
    return center_3D, grid_3D - center_3D


def get_3D_points_from_depth(center, ray, depth, multi_samples=False):
    """x = c + d*v. With multi_samples, center/ray [B,HW,3] broadcast against
    depth [B,HW,N,1] → [B,HW,N,3]."""
    if multi_samples:
        center, ray = center[..., None, :], ray[..., None, :]
    return center + ray * depth


def convert_NDC(center, ray, intr, near=1.0):
    """Shift ray origins to the near plane and project to NDC
    (+z-facing convention, reference camera.py:325-342)."""
    center = center + (near - center[..., 2:]) / ray[..., 2:] * ray
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    rx, ry, rz = ray[..., 0], ray[..., 1], ray[..., 2]
    scale_x = (intr[:, 0, 0] / intr[:, 0, 2])[:, None]
    scale_y = (intr[:, 1, 1] / intr[:, 1, 2])[:, None]
    cnx = scale_x * (cx / cz)
    cny = scale_y * (cy / cz)
    cnz = 1 - 2 * near / cz
    rnx = scale_x * (rx / rz - cx / cz)
    rny = scale_y * (ry / rz - cy / cz)
    rnz = 2 * near / cz
    return (jnp.stack([cnx, cny, cnz], axis=-1),
            jnp.stack([rnx, rny, rnz], axis=-1))


def aabb_ray_intersection(aabb_min, aabb_max, ray_o, ray_d):
    """Slab-method ray/AABB intersection.

    aabb_min/max broadcastable to [B,HW,3]; returns (t_near, t_far, valid)
    each [B,HW].  Matches reference camera.py:415-433 exactly (including the
    validity rule t_far > 0 AND t_far > t_near).
    """
    inv_d = 1.0 / ray_d
    t_min = (aabb_min - ray_o) * inv_d
    t_max = (aabb_max - ray_o) * inv_d
    t0 = jnp.minimum(t_min, t_max)
    t1 = jnp.maximum(t_min, t_max)
    t_near = jnp.max(t0, axis=-1)
    t_far = jnp.min(t1, axis=-1)
    valid = (t_far > 0) & (t_far > t_near)
    return t_near, t_far, valid


def enlarge_diagonal(aabb_min, aabb_max, alpha=0.25):
    """Symmetric AABB inflation by a fraction of its extent
    (camera.py:436-440)."""
    direction = aabb_max - aabb_min
    return aabb_min - direction * alpha / 2, aabb_max + direction * alpha / 2


def back_project(pix_coord, depth, intr):
    """Lift homogeneous pixel coords [B,HW,3] at depth [B,HW,1] to camera
    frame (camera.py:443-447)."""
    return (pix_coord * depth) @ jnp.swapaxes(jnp.linalg.inv(intr), -1, -2)
