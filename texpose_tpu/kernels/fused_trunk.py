"""Pallas TPU kernel: fused positional-encoding + trunk MLP forward.

The hot loop of every stage is the 8x256 feature/density trunk evaluated on
B*R*N ray samples (SURVEY.md §3, hot loops #1).  The plain XLA path writes
each [M,256] activation to HBM between layers (~13 matmul round-trips);
this kernel keeps the whole pipeline in VMEM per row-tile:

    points [T,3] -> c2f-windowed posenc [T,63] -> L dense layers (+skip,
    ReLU) -> (feat [T,256], density_raw [T])

Weights stay resident in VMEM across the row grid (~2 MB for 8x256 f32).
Matmuls hit the MXU via jnp.dot with f32 accumulation (bf16 inputs).

Gradients: the op carries a custom_vjp whose backward is XLA autodiff of
the numerically-identical plain implementation (rematerialized) — the
texture stage never differentiates the trunk (frozen, stop_gradient), so
its step sees pure kernel speed; pretrain gets the fast forward plus the
standard XLA backward.
"""

from __future__ import annotations

import functools


import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ._params import compiler_params as _compiler_params
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def fused_trunk_available():
    return _PALLAS_OK


def _posenc_rows(pts, L, freq, c2f_w):
    """[T,3] → [T, 3+6L] identity+sin/cos encoding with per-band window
    c2f_w [L] (matches ops/posenc.py layout: per dim [sin_0..sin_{L-1},
    cos_0..cos_{L-1}], dims stacked then flattened dim-major).  freq [L] is
    passed in (π·2^k) — Pallas kernels can't capture array constants.

    Built as pure 2-D lane concats (no >2-D reshapes — Mosaic-friendly)."""
    parts = [pts]
    w = c2f_w[None, :]                                          # [1,L]
    for d in range(pts.shape[1]):
        spec = pts[:, d:d + 1] * freq[None, :]                  # [T,L]
        parts.append(jnp.sin(spec) * w)
        parts.append(jnp.cos(spec) * w)
    return jnp.concatenate(parts, axis=-1)                      # [T,3+6L]


def _posenc_rows_recursive(pts, L, freq, c2f_w):
    """_posenc_rows via the double-angle recursion: only the base band calls
    sin/cos; band k+1 = (2sc, 1−2s²) — 3 cheap VPU ops instead of 2
    transcendentals.  Error matches direct f32 evaluation (the recursion
    doubles the base error k times ≈ the argument-reduction noise of
    sin(2^k·πx)).

    VMEM caveat: the per-band [T,1] columns each pad to a full 128-lane
    tile, so this variant costs ~L× more VMEM for intermediates — only
    usable at small row tiles.  Kept switchable for A/B benchmarking
    (TEXPOSE_POSENC_RECURSION=1)."""
    parts = [pts]
    w = c2f_w[None, :]                                          # [1,L]
    # base band is always π·x (freq[k] = π·2^k by construction, see _freq);
    # the python constant avoids a 1-D ref gather Mosaic can't lower
    for d in range(pts.shape[1]):
        base = pts[:, d:d + 1] * np.pi                          # [T,1]
        s = jnp.sin(base)
        c = jnp.cos(base)
        sins, coss = [s], [c]
        for _ in range(1, L):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            sins.append(s)
            coss.append(c)
        parts.append(jnp.concatenate(sins, axis=-1) * w)        # [T,L]
        parts.append(jnp.concatenate(coss, axis=-1) * w)
    return jnp.concatenate(parts, axis=-1)                      # [T,3+6L]


import os as _os
if _os.environ.get("TEXPOSE_POSENC_RECURSION") == "1":  # pragma: no cover
    _posenc_rows_direct = _posenc_rows
    _posenc_rows = _posenc_rows_recursive


def _freq(L, dtype=jnp.float32):
    return jnp.asarray((2.0 ** np.arange(L)) * np.pi, dtype)


def _plain_forward(pts, c2f_w, weights, biases, skip, L, compute_dtype):
    """Reference implementation (same math as nn.fields.apply_trunk)."""
    x = _posenc_rows(pts, L, _freq(L, pts.dtype), c2f_w)
    h = x
    n = len(weights)
    density_raw = None
    for li in range(n):
        if li in skip:
            h = jnp.concatenate([h, x], axis=-1)
        hc = h.astype(compute_dtype) if compute_dtype else h
        wc = weights[li].astype(compute_dtype) if compute_dtype else weights[li]
        h = jax.lax.dot_general(hc, wc, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = h + biases[li]
        if li == n - 1:
            density_raw = h[:, 0]
            h = h[:, 1:]
        h = jnp.maximum(h, 0.0)
    return h, density_raw


def _kernel(L, skip, n_layers, compute_dtype, enc_mode,
            pts_ref, aux_ref, *refs):
    # enc_mode "matmul": refs lead with make_posenc_mm_aux constants + the
    # split_trunk_weights_mm pieces — the element-wise posenc build costs
    # ~60% of trunk time (mxu_probe r3); the matmul form has no narrow-lane
    # concats at all.  "sinext": refs lead with the streamed [tile, 6L]
    # weighted sin bands (make_sinw) instead of the aux constants — skips
    # the in-kernel HIGHEST angle matmul (~0.47 ms/131k-row pass).
    if enc_mode in ("matmul", "sinext", "xext"):
        from .fused_st_field import _trunk_feat_mm
        skip_t = tuple(sorted(skip))
        perm_last = (n_layers - 1) not in skip_t
        auxm_ref = refs[0] if enc_mode == "matmul" else None
        sinw_pre = refs[0][...] if enc_mode == "sinext" else None
        x_pre = refs[0][...] if enc_mode == "xext" else None
        base_mm = (1 + 2 * len(skip_t)) if enc_mode == "xext" \
            else (2 + 3 * len(skip_t))
        n_mm = base_mm + (2 if perm_last else 0)
        mm_refs = refs[1:1 + n_mm]
        refs = refs[1 + n_mm:]
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers:2 * n_layers]
        feat_ref, dens_ref = refs[2 * n_layers:]
        feat, dens = _trunk_feat_mm(pts_ref[...], auxm_ref, w_refs, b_refs,
                                    skip_t, compute_dtype, mm_refs=mm_refs,
                                    perm_last=perm_last, sinw_pre=sinw_pre,
                                    x_pre=x_pre)
        dens_ref[...] = dens
        feat_ref[...] = feat
        return
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers:2 * n_layers]
    feat_ref, dens_ref = refs[2 * n_layers:]
    pts = pts_ref[...]
    x = _posenc_rows(pts, L, aux_ref[0], aux_ref[1])
    x = x.astype(compute_dtype)
    h = x
    for li in range(n_layers):
        if li in skip:
            h = jnp.concatenate([h, x], axis=-1)
        hc = h.astype(compute_dtype)
        # weights arrive pre-cast to compute_dtype (done once outside the
        # grid — casting here would re-convert every tile)
        h = jax.lax.dot_general(hc, w_refs[li][...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = h + b_refs[li][...]
        if li == n_layers - 1:
            dens_ref[...] = h[:, 0:1]
            h = h[:, 1:]
        h = jnp.maximum(h, 0.0)
    feat_ref[...] = h


def _pallas_forward(pts, c2f_w, weights, biases, skip, L, compute_dtype,
                    tile=512, interpret=False):
    import os
    M = pts.shape[0]
    pad = (-M) % tile
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    n = len(weights)
    feat_dim = weights[-1].shape[1] - 1
    grid = ((M + pad) // tile,)

    # "sinext" default: measured trunk-only 1.65 vs 1.84 ms on v5e (the
    # in-kernel HIGHEST angle matmul leaves the serial compute pipeline)
    enc_mode = os.environ.get("TEXPOSE_TRUNK_POSENC", "sinext")
    kernel = functools.partial(_kernel, L, skip, n,
                               compute_dtype or jnp.float32, enc_mode)
    aux = jnp.stack([_freq(L, pts.dtype), c2f_w.astype(pts.dtype)])  # [2,L]
    in_specs = [pl.BlockSpec((tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]       # aux [2,L]
    enc_args = []
    cdtype = compute_dtype or jnp.float32
    if enc_mode in ("matmul", "sinext", "xext"):
        from .fused_st_field import (make_posenc_mm_aux, make_sinw,
                                     make_xext, split_trunk_weights_mm,
                                     split_trunk_weights_x)
        wc = [w.astype(cdtype) for w in weights]
        perm_last = (len(weights) - 1) not in skip
        if enc_mode == "matmul":
            enc0 = make_posenc_mm_aux(L, c2f_w.astype(jnp.float32))
            enc0_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        elif enc_mode == "sinext":
            enc0 = make_sinw(pts_p, L, c2f_w.astype(jnp.float32), cdtype)
            enc0_spec = pl.BlockSpec((tile, 6 * L), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        else:
            enc0 = make_xext(pts_p, L, c2f_w.astype(jnp.float32), cdtype)
            enc0_spec = pl.BlockSpec((tile, 3 + 6 * L), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
        split_fn = split_trunk_weights_x if enc_mode == "xext" \
            else split_trunk_weights_mm
        enc_args = ([enc0]
                    + split_fn(
                        wc, tuple(sorted(skip)), 6 * L,
                        trunk_b=list(biases) if perm_last else None))
        in_specs += [enc0_spec] \
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(enc_args) - 1)
    for w in weights:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    for b in biases:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out_specs = (pl.BlockSpec((tile, feat_dim), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((tile, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM))
    cdtype = compute_dtype or jnp.float32
    weights_c = [w.astype(cdtype) for w in weights]
    feat, dens = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(jax.ShapeDtypeStruct((M + pad, feat_dim), jnp.float32),
                   jax.ShapeDtypeStruct((M + pad, 1), jnp.float32)),
        interpret=interpret,
        # row tiles are independent → let Mosaic pipeline/overlap grid steps
        compiler_params=_compiler_params(interpret, parallel=True),
    )(pts_p, aux, *enc_args, *weights_c, *biases)
    return feat[:M], dens[:M, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_trunk(pts, c2f_w, weights, biases, skip, L, compute_dtype,
                 tile, interpret):
    return _pallas_forward(pts, c2f_w, list(weights), list(biases), skip, L,
                           compute_dtype, tile, interpret)


def _fwd(pts, c2f_w, weights, biases, skip, L, compute_dtype, tile,
         interpret):
    out = _pallas_forward(pts, c2f_w, list(weights), list(biases), skip, L,
                          compute_dtype, tile, interpret)
    return out, (pts, c2f_w, weights, biases)


def _bwd(skip, L, compute_dtype, tile, interpret, res, g):
    pts, c2f_w, weights, biases = res
    _, vjp = jax.vjp(
        lambda p, c, w, b: _plain_forward(p, c, list(w), list(b), skip, L,
                                          compute_dtype), pts, c2f_w,
        weights, biases)
    return vjp(g)


_fused_trunk.defvjp(_fwd, _bwd)


def fused_trunk_forward(pts, c2f_w, weights, biases, skip, L,
                        compute_dtype=None, tile=1024, interpret=False):
    """Fused trunk: pts [M,3], c2f_w [L] band window (ones = no anneal),
    weights/biases tuples per layer → (feat [M,F], density_raw [M]).

    Differentiable (backward = XLA autodiff of the identical plain path).
    """
    return _fused_trunk(pts, c2f_w, tuple(weights), tuple(biases),
                        tuple(sorted(skip)), int(L), compute_dtype, int(tile),
                        bool(interpret))


def plain_trunk_forward(pts, c2f_w, weights, biases, skip, L,
                        compute_dtype=None):
    """Reference path (used for parity tests and as the CPU fallback)."""
    return _plain_forward(pts, c2f_w, list(weights), list(biases),
                          tuple(sorted(skip)), int(L), compute_dtype)
