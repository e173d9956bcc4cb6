"""Color space conversions: closed-form sRGB ↔ CIE Lab in JAX.

Replaces the reference's kornia.color.rgb_to_lab dependency
(/root/reference/layers/lab_loss.py:5,14-16) with the same D65/2° standard:
sRGB inverse gamma → linear RGB → XYZ (sRGB primaries) → Lab.
"""

from __future__ import annotations

import jax.numpy as jnp

# sRGB → XYZ (D65), rows are X,Y,Z
_RGB2XYZ = jnp.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], jnp.float32)

# D65 reference white
_WHITE = jnp.array([0.950456, 1.0, 1.088754], jnp.float32)


def srgb_to_linear(rgb):
    """Inverse sRGB gamma, input in [0,1]."""
    return jnp.where(rgb > 0.04045,
                     ((rgb + 0.055) / 1.055) ** 2.4,
                     rgb / 12.92)


def linear_to_srgb(lin):
    lin = jnp.clip(lin, 0.0, 1.0)
    return jnp.where(lin > 0.0031308,
                     1.055 * lin ** (1 / 2.4) - 0.055,
                     12.92 * lin)


def rgb_to_lab(rgb):
    """rgb [B,3,H,W] in [0,1] → Lab [B,3,H,W], L∈[0,100], ab∈[−127,127]."""
    lin = srgb_to_linear(rgb)
    xyz = jnp.einsum("ij,bjhw->bihw", _RGB2XYZ, lin)
    xyz = xyz / _WHITE[None, :, None, None]
    eps = 0.008856   # (6/29)^3
    kappa = 7.787    # 1/(3 δ^2) with δ=6/29 (kornia/OpenCV convention)
    f = jnp.where(xyz > eps, jnp.cbrt(xyz), kappa * xyz + 4.0 / 29.0)
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=1)


def normalize_lab(lab):
    """L [0,100] → [0,1]; ab [−127,127] → [0,1]
    (reference layers/lab_loss.py:36-48)."""
    lo = jnp.array([0.0, -127.0, -127.0], lab.dtype)[None, :, None, None]
    hi = jnp.array([100.0, 127.0, 127.0], lab.dtype)[None, :, None, None]
    return (lab - lo) / (hi - lo)
