"""2D grid sampling with torch ``F.grid_sample`` semantics (NCHW).

The reference leans on grid_sample for its continuous ray/patch sampling
(/root/reference/tools/ray_sampler.py:20-56, model/nerf_adapt_st_gan.py:
444-461,726-731).  This is the exact-semantics JAX equivalent:

  * grid [B,h,w,2], last dim = (x, y) in [-1, 1]; x indexes W, y indexes H
  * align_corners=True:  pix = (g+1)/2 · (size−1)
  * align_corners=False: pix = ((g+1)·size − 1)/2
  * padding_mode='zeros': out-of-bounds taps contribute 0
  * modes: 'bilinear', 'nearest'

TPU notes: implemented as four flat gathers + lerp — XLA lowers gathers to
dynamic-slice batches; for the small patches used here this is memory-bound
and fuses with the surrounding ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(g, size, align_corners):
    if align_corners:
        return (g + 1) / 2 * (size - 1)
    return ((g + 1) * size - 1) / 2


def grid_sample(image, grid, mode="bilinear", align_corners=False):
    """image [B,C,H,W], grid [B,h,w,2] → [B,C,h,w]."""
    B, C, H, W = image.shape
    gx = _unnormalize(grid[..., 0], W, align_corners)       # [B,h,w]
    gy = _unnormalize(grid[..., 1], H, align_corners)

    img_flat = image.reshape(B, C, H * W)

    def gather(iy, ix, valid):
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)  # [B,h,w]
        out = jnp.take_along_axis(
            img_flat, idx.reshape(B, 1, -1).astype(jnp.int32), axis=2)
        out = out.reshape(B, C, *idx.shape[1:])
        return out * valid[:, None].astype(image.dtype)

    if mode == "nearest":
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        return gather(iy, ix, valid)

    if mode != "bilinear":
        raise NotImplementedError(mode)

    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = gx - x0.astype(gx.dtype)
    wy = gy - y0.astype(gy.dtype)

    def ok(iy, ix):
        return (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)

    v00 = gather(y0, x0, ok(y0, x0))
    v01 = gather(y0, x1, ok(y0, x1))
    v10 = gather(y1, x0, ok(y1, x0))
    v11 = gather(y1, x1, ok(y1, x1))

    wx = wx[:, None]
    wy = wy[:, None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def grid_sample_table(images, frame_idx, grid, mode="bilinear",
                      align_corners=False):
    """grid_sample straight out of a whole-split frame table.

    images [N,C,H,W], frame_idx [B] int, grid [B,h,w,2] → [B,C,h,w];
    exactly ``grid_sample(images[frame_idx], grid, ...)`` but the frame
    index is composed into the pixel gather, so the B full frames are
    never materialized (the reference's DataLoader batches frames on the
    host so it never sees this cost; with the split prefetched on-device,
    gathering [B,C,H,W] to read h·w px/frame showed up as a per-step
    HLO hotspot — full-frame gather + layout transposes)."""
    N, C, H, W = images.shape
    B = grid.shape[0]
    gx = _unnormalize(grid[..., 0], W, align_corners)       # [B,h,w]
    gy = _unnormalize(grid[..., 1], H, align_corners)

    flat = images.reshape(N * C * H * W)
    c_off = jnp.arange(C, dtype=jnp.int32).reshape(1, C, 1, 1)
    f_off = frame_idx.astype(jnp.int32).reshape(B, 1, 1, 1)

    def gather(iy, ix, valid):
        pix = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)  # [B,h,w]
        idx = (f_off * C + c_off) * (H * W) + pix[:, None]         # [B,C,h,w]
        out = jnp.take(flat, idx)
        return out * valid[:, None].astype(images.dtype)

    if mode == "nearest":
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        return gather(iy, ix, valid)

    if mode != "bilinear":
        raise NotImplementedError(mode)

    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = gx - x0.astype(gx.dtype)
    wy = gy - y0.astype(gy.dtype)

    def ok(iy, ix):
        return (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)

    v00 = gather(y0, x0, ok(y0, x0))
    v01 = gather(y0, x1, ok(y0, x1))
    v10 = gather(y1, x0, ok(y1, x0))
    v11 = gather(y1, x1, ok(y1, x1))

    wx = wx[:, None]
    wy = wy[:, None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)
