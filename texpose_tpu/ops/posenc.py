"""Positional encoding with BARF coarse-to-fine frequency windowing.

Capability parity with the reference's NeRF.positional_encoding
(/root/reference/layers/nerf.py:138-154 and
layers/nerf_static_transient_light.py:217-234): freq_k = 2^k·π, per input
dimension the encoding is [sin(f_0 x)…sin(f_{L−1} x), cos(f_0 x)…cos(f_{L−1} x)],
and the c2f window w_k = (1 − cos(π·clamp(α−k, 0, 1)))/2 with
α = (progress − start)/(end − start)·L ramps frequencies in as training
progresses.

TPU-first notes: `progress` is a traced f32 scalar (NOT a Python float), so
annealing never retriggers compilation; the whole encoding is fused
elementwise work on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def positional_encoding(x, L, progress=None, c2f_range=None, c2f_start=0):
    """Encode x [..., D] → [..., D*2L].

    Args:
      x: input coordinates.
      L: number of frequency bands.
      progress: traced scalar in [0,1] (training progress); required when
        c2f_range is given.
      c2f_range: (start, end) progress window over which frequencies anneal
        in; None disables windowing (all frequencies active).
      c2f_start: frequency offset subtracted from k (the static/transient
        field starts its window above the lowest bands,
        reference layers/nerf_static_transient_light.py:226-229).
    """
    shape = x.shape
    freq = (2.0 ** jnp.arange(L, dtype=x.dtype)) * np.pi            # [L]
    spectrum = x[..., None] * freq                                  # [...,D,L]
    enc = jnp.stack([jnp.sin(spectrum), jnp.cos(spectrum)], axis=-2)  # [...,D,2,L]
    if c2f_range is not None:
        weight = c2f_band_weights(L, progress, c2f_range, c2f_start,
                                  dtype=x.dtype)
        enc = enc * weight                                          # bcast over [L]
    return enc.reshape(*shape[:-1], shape[-1] * 2 * L)


def c2f_band_weights(L, progress, c2f_range, c2f_start=0,
                     dtype=jnp.float32):
    """Per-frequency BARF coarse-to-fine window w_k as an [L] vector
    (reference layers/nerf.py:138-154): alpha ramps with progress over
    c2f_range, band k fades in as (1-cos(π·clip(alpha-k,0,1)))/2.  The
    ONE definition of the window — the fused-kernel path (nn/fields) and
    the plain XLA path both call this, so an anneal tweak cannot diverge
    them."""
    start, end = c2f_range
    alpha = (progress - start) / (end - start) * L
    k = jnp.arange(L, dtype=dtype) - c2f_start
    return (1 - jnp.cos(np.pi * jnp.clip(alpha - k, 0.0, 1.0))) / 2


def posenc_with_identity(x, L, progress=None, c2f_range=None, c2f_start=0):
    """[x, posenc(x)] → [..., D + D*2L], the network input layout used by all
    reference fields (layers/nerf.py:63-64)."""
    enc = positional_encoding(x, L, progress, c2f_range, c2f_start)
    return jnp.concatenate([x, enc], axis=-1)
