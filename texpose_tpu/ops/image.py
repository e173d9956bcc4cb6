"""Device-side image resize matching cv2.resize(..., INTER_LINEAR) on
float input.

The reference's eval path resizes rendered frames up to the raw 480×640
resolution on the host with cv2 before computing PSNR/SSIM/LPIPS
(/root/reference/model/nerf_adapt_st_gan.py:341-349).  Doing that resize on
host forces a device→host→device round trip per frame through the TPU
tunnel; this module reproduces cv2's float-path semantics on device so the
whole metric computation can stay device-resident:

  * half-pixel sampling:  src = (dst + 0.5) · (S/D) − 0.5
  * bilinear between floor(src) and floor(src)+1, both clamped to the
    valid range (edge replicate)
  * separable (rows then columns) — identical math, and XLA lowers the
    static gathers + weighted adds to cheap fused ops

Parity with cv2.resize on float32 inputs is pinned to ≤1e-5 in
tests/test_ops.py (cv2 evaluates the same formula in float arithmetic for
float inputs; the only divergence is accumulated rounding).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _axis_weights(src_size, dst_size):
    """Host-side static gather indices + lerp weights for one axis."""
    d = np.arange(dst_size, dtype=np.float64)
    src = (d + 0.5) * (src_size / dst_size) - 0.5
    i0 = np.floor(src).astype(np.int64)
    w1 = (src - i0).astype(np.float32)
    i1 = np.clip(i0 + 1, 0, src_size - 1)
    i0 = np.clip(i0, 0, src_size - 1)
    return i0, i1, w1


def resize_bilinear(img, out_hw):
    """img [H,W,C] (or [H,W]) float → [out_H,out_W,(C)], cv2.INTER_LINEAR
    float semantics.  out_hw is a static (H,W) tuple."""
    H, W = img.shape[0], img.shape[1]
    oH, oW = int(out_hw[0]), int(out_hw[1])
    if (oH, oW) == (H, W):
        return img
    r0, r1, rw = _axis_weights(H, oH)
    c0, c1, cw = _axis_weights(W, oW)
    rw = jnp.asarray(rw).reshape(oH, *([1] * (img.ndim - 1)))
    cw = jnp.asarray(cw).reshape(1, oW, *([1] * (img.ndim - 2)))
    rows = img[jnp.asarray(r0)] * (1 - rw) + img[jnp.asarray(r1)] * rw
    return rows[:, jnp.asarray(c0)] * (1 - cw) + rows[:, jnp.asarray(c1)] * cw
