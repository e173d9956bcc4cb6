"""Patch coordinate samplers (GRAF-style), functional with explicit PRNG.

Capability parity with /root/reference/tools/patch_sampler.py:
  * FlexPatchSampler: random scale in [min,max] with exponential anneal of
    the min scale (floor at 0.8 cap), random in-bounds shift; returns
    normalized [-1,1] coords [B,p,p,2] (x,y) + scales [B,1,1,1]
  * FullImageSampler / RescalePatchSampler equivalents

TPU notes: `iteration` is a traced scalar so the anneal doesn't recompile;
coords layout matches grid_sample semantics (coords[...,0]=x indexes W).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _base_grid(patch_size, dtype=jnp.float32):
    """[p,p,2] grid, coords[i,j] = (lin[j], lin[i]) — x varies along columns,
    matching the reference's cat([h,w]) of an ij meshgrid."""
    lin = jnp.linspace(-1.0, 1.0, patch_size, dtype=dtype)
    x = jnp.broadcast_to(lin[None, :], (patch_size, patch_size))
    y = jnp.broadcast_to(lin[:, None], (patch_size, patch_size))
    return jnp.stack([x, y], axis=-1)


def flex_patch_coords(key, nbatch, patch_size, iteration=0,
                      min_scale=0.25, max_scale=1.0, scale_anneal=0.0002,
                      random_shift=True, random_scale=True):
    """Annealed random-scale random-shift patch coords.

    Returns (coords [B,p,p,2] in [-1,1], scales [B,1,1,1]).
    """
    grid = _base_grid(patch_size)[None]                      # [1,p,p,2]
    it = jnp.asarray(iteration, jnp.float32)
    if scale_anneal > 0:
        lo = jnp.maximum(min_scale, max_scale * jnp.exp(-it * scale_anneal))
        lo = jnp.minimum(0.8, lo)
    else:
        lo = jnp.asarray(min_scale, jnp.float32)
    hi = jnp.asarray(max_scale, jnp.float32)

    k_scale, k_h, k_w = jax.random.split(key, 3)
    if random_scale:
        scales = jax.random.uniform(k_scale, (nbatch, 1, 1, 1)) * (hi - lo) + lo
    else:
        scales = jnp.ones((nbatch, 1, 1, 1)) * lo

    coords = grid * scales
    if random_shift:
        max_offset = 1 - scales
        h_off = (jax.random.uniform(k_h, (nbatch, 1, 1, 1)) * 2 - 1) * max_offset
        w_off = (jax.random.uniform(k_w, (nbatch, 1, 1, 1)) * 2 - 1) * max_offset
        # reference shifts h (x) with h_offset and w (y) with w_offset
        coords = coords + jnp.concatenate([h_off, w_off], axis=-1)
    return coords, scales


def current_scale_bounds(iteration, min_scale=0.25, max_scale=1.0,
                         scale_anneal=0.0002):
    """Host-side mirror of the annealed (min,max) for logging
    (reference patch_sampler.py:86-93)."""
    import math
    if scale_anneal > 0:
        lo = max(min_scale, max_scale * math.exp(-iteration * scale_anneal))
        lo = min(0.8, lo)
    else:
        lo = min_scale
    return lo, max_scale


def full_image_coords(nbatch, H, W):
    """[B,H,W,2] identity sampling grid + unit scales."""
    ly = jnp.linspace(-1.0, 1.0, H)
    lx = jnp.linspace(-1.0, 1.0, W)
    x = jnp.broadcast_to(lx[None, :], (H, W))
    y = jnp.broadcast_to(ly[:, None], (H, W))
    coords = jnp.stack([x, y], axis=-1)[None].repeat(nbatch, 0)
    return coords, jnp.ones((nbatch, 1, 1, 1))


def rescale_patch_coords(nbatch, patch_size, scale=1.0):
    coords = _base_grid(patch_size)[None] * scale
    return jnp.repeat(coords, nbatch, 0), jnp.ones((nbatch, 1, 1, 1))
