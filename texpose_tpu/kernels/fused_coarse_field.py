"""Pallas TPU kernels: fused coarse-field (trunk + RGB head) forward AND
backward for the geometry-pretrain stages.

Unlike the texture stage, pretrain TRAINS the trunk, so the backward here
backpropagates through all trunk layers (incl. the skip connection and the
density/feature split).  Strategy: NO residuals at all — the backward
recomputes the whole field per row-tile inside VMEM and accumulates every
dW/db in VMEM scratch across the sequential grid.  Poses are fixed in both
pretrain variants (reference model/nerf_pretrain.py:503-509 reads
gt/predicted poses, never optimizes them), so no d(points) is produced.

Supports view-dependent RGB heads (env variant): the encoded view direction
is an optional extra head input.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .fused_trunk import _posenc_rows, _freq
from .fused_st_field import _dot, _dot_t1, _dot_t2


def fused_coarse_available():
    return _PALLAS_OK


def _field_forward(pts, enc_view, aux3, wf, bf, wr, br, skip, L3, cdtype,
                   want_acts=False):
    """Full coarse field on a row tile.  Returns (rgb_raw [T,3],
    dens_raw [T,1]) and optionally every pre-ReLU activation."""
    x = _posenc_rows(pts, L3, aux3[0], aux3[1])
    acts = {"x": x}
    h = x
    nf = len(wf)
    for li in range(nf):
        if li in skip:
            h = jnp.concatenate([h, x], axis=-1)
        acts[f"fa{li}"] = h                      # input to layer li
        z = _dot(h.astype(cdtype), wf[li][...]) + bf[li][...]
        if li == nf - 1:
            dens_raw = z[:, 0:1]
            acts["fz_last"] = z
            h = jnp.maximum(z[:, 1:], 0.0)
        else:
            acts[f"fz{li}"] = z
            h = jnp.maximum(z, 0.0)
    feat = h
    parts = [feat]
    if enc_view is not None:
        parts.append(enc_view)
    parts.append(pts)
    a0 = jnp.concatenate(parts, axis=-1)
    acts["r_a0"] = a0
    h = a0
    nr = len(wr)
    for li in range(nr):
        acts[f"ra{li}"] = h
        z = _dot(h.astype(cdtype), wr[li][...]) + br[li][...]
        if li != nr - 1:
            acts[f"rz{li}"] = z
            h = jnp.maximum(z, 0.0)
        else:
            rgb_raw = z
    if want_acts:
        return rgb_raw, dens_raw, acts
    return rgb_raw, dens_raw


def _fwd_kernel(L3, skip, nf, nr, has_view, cdtype, subtiles,
                pts_ref, enc_ref, aux3_ref, *refs):
    wf = refs[:nf]
    bf = refs[nf:2 * nf]
    wr = refs[2 * nf:2 * nf + nr]
    br = refs[2 * nf + nr:2 * nf + 2 * nr]
    rgb_ref, dens_ref = refs[-2:]
    S = pts_ref.shape[0] // subtiles
    for k in range(subtiles):
        sl = slice(k * S, (k + 1) * S)
        pts = pts_ref[sl, :]
        enc_view = enc_ref[sl, :] if has_view else None
        rgb_raw, dens_raw = _field_forward(pts, enc_view, aux3_ref, wf, bf,
                                           wr, br, skip, L3, cdtype)
        rgb_ref[sl, :] = rgb_raw
        dens_ref[sl, :] = dens_raw


def _bwd_kernel(L3, skip, nf, nr, has_view, cdtype, subtiles,
                pts_ref, enc_ref, aux3_ref, g_rgb_ref, g_dens_ref, *refs):
    wf = refs[:nf]
    bf = refs[nf:2 * nf]
    wr = refs[2 * nf:2 * nf + nr]
    br = refs[2 * nf + nr:2 * nf + 2 * nr]
    n_out = 2 * (nf + nr)
    outs = refs[2 * (nf + nr):2 * (nf + nr) + n_out]
    scratch = refs[2 * (nf + nr) + n_out:]
    # scratch order: dwf*nf, dbf*nf, dwr*nr, dbr*nr (f32)

    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        for s in scratch:
            s[...] = jnp.zeros_like(s)

    S = pts_ref.shape[0] // subtiles
    for k in range(subtiles):
        sl = slice(k * S, (k + 1) * S)
        pts = pts_ref[sl, :]
        enc_view = enc_ref[sl, :] if has_view else None
        _, _, acts = _field_forward(pts, enc_view, aux3_ref, wf, bf, wr, br,
                                    skip, L3, cdtype, want_acts=True)

        # ---- rgb head backward ----
        g = g_rgb_ref[sl, :].astype(jnp.float32)
        for li in range(nr - 1, -1, -1):
            scratch[2 * nf + li][...] += _dot_t1(
                acts[f"ra{li}"].astype(cdtype), g.astype(cdtype))
            scratch[2 * nf + nr + li][...] += jnp.sum(g, axis=0,
                                                      keepdims=True)
            g = _dot_t2(g.astype(cdtype), wr[li][...])
            if li > 0:
                g = g * (acts[f"rz{li-1}"] > 0)
        F = acts["fz_last"].shape[1] - 1
        g_feat = g[:, :F]                        # d a0 → d feat slice

        # ---- trunk backward (density col + relu'd feature cols) ----
        g_dens = g_dens_ref[sl, :].astype(jnp.float32)
        g_last = jnp.concatenate(
            [g_dens, g_feat * (acts["fz_last"][:, 1:] > 0)], axis=-1)
        g = g_last
        for li in range(nf - 1, -1, -1):
            scratch[li][...] += _dot_t1(acts[f"fa{li}"].astype(cdtype),
                                        g.astype(cdtype))
            scratch[nf + li][...] += jnp.sum(g, axis=0, keepdims=True)
            if li > 0:
                g = _dot_t2(g.astype(cdtype), wf[li][...])
                if li in skip:
                    # layer li consumed concat([h_{li-1}, x]); keep only
                    # the activation block (posenc x not differentiated)
                    g = g[:, :acts[f"fz{li-1}"].shape[1]]
                g = g * (acts[f"fz{li-1}"] > 0)

    @pl.when(i == n_prog - 1)
    def _():
        for o, s in zip(outs, scratch):
            o[...] = s[...]


def _row_spec(tile, c):
    return pl.BlockSpec((tile, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _run_fwd(pts, enc_view, aux3, wf, bf, wr, br, skip, L3, tile, cdtype,
             interpret, subtiles=1):
    M = pts.shape[0]
    nf, nr = len(wf), len(wr)
    has_view = enc_view is not None
    kernel = functools.partial(_fwd_kernel, L3, skip, nf, nr, has_view,
                               cdtype, subtiles)
    enc_in = enc_view if has_view else jnp.zeros((M, 1), pts.dtype)
    in_specs = ([_row_spec(tile, 3),
                 _row_spec(tile, enc_in.shape[1]), _full()]
                + [_full()] * (2 * nf + 2 * nr))
    out_specs = (_row_spec(tile, 3), _row_spec(tile, 1))
    out_shape = (jax.ShapeDtypeStruct((M, 3), jnp.float32),
                 jax.ShapeDtypeStruct((M, 1), jnp.float32))
    wfc = [w.astype(cdtype) for w in wf]
    wrc = [w.astype(cdtype) for w in wr]
    return pl.pallas_call(
        kernel, grid=(M // tile,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        # forward row tiles are independent → parallel grid semantics
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(pts, enc_in, aux3, *wfc, *bf, *wrc, *br)


def _run_bwd(pts, enc_view, aux3, wf, bf, wr, br, g_rgb, g_dens, skip, L3,
             tile, cdtype, interpret, subtiles=1):
    M = pts.shape[0]
    nf, nr = len(wf), len(wr)
    has_view = enc_view is not None
    kernel = functools.partial(_bwd_kernel, L3, skip, nf, nr, has_view,
                               cdtype, subtiles)
    enc_in = enc_view if has_view else jnp.zeros((M, 1), pts.dtype)
    in_specs = ([_row_spec(tile, 3), _row_spec(tile, enc_in.shape[1]),
                 _full(), _row_spec(tile, 3), _row_spec(tile, 1)]
                + [_full()] * (2 * nf + 2 * nr))
    out_shape = ([jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wf]
                 + [jax.ShapeDtypeStruct((1,) + b.shape, jnp.float32)
                    for b in bf]
                 + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wr]
                 + [jax.ShapeDtypeStruct((1,) + b.shape, jnp.float32)
                    for b in br])
    out_specs = tuple(_full() for _ in out_shape)
    scratch = [pltpu.VMEM(s.shape, jnp.float32) for s in out_shape]
    wfc = [w.astype(cdtype) for w in wf]
    wrc = [w.astype(cdtype) for w in wr]
    return pl.pallas_call(
        kernel, grid=(M // tile,), in_specs=in_specs,
        out_specs=out_specs, out_shape=tuple(out_shape),
        scratch_shapes=scratch, interpret=interpret,
    )(pts, enc_in, aux3, g_rgb, g_dens, *wfc, *bf, *wrc, *br)


@functools.lru_cache(maxsize=None)
def _make_op(skip, L3, tile, cdtype, has_view, interpret, sub_fwd=1,
             sub_bwd=1):
    def op_impl(trunk, rgb, pts, ray_enc, aux3):
        return _run_fwd(pts, ray_enc if has_view else None, aux3,
                        trunk["w"], trunk["b"], rgb["w"], rgb["b"],
                        skip, L3, tile * sub_fwd, cdtype, interpret,
                        subtiles=sub_fwd)

    @jax.custom_vjp
    def op(trunk, rgb, pts, ray_enc, aux3):
        return op_impl(trunk, rgb, pts, ray_enc, aux3)

    def op_fwd(trunk, rgb, pts, ray_enc, aux3):
        out = op_impl(trunk, rgb, pts, ray_enc, aux3)
        return out, (trunk, rgb, pts, ray_enc, aux3)

    def op_bwd(res, g):
        trunk, rgb, pts, ray_enc, aux3 = res
        g_rgb, g_dens = g
        outs = _run_bwd(pts, ray_enc if has_view else None, aux3,
                        trunk["w"], trunk["b"], rgb["w"], rgb["b"],
                        g_rgb, g_dens, skip, L3, tile * sub_bwd, cdtype,
                        interpret, subtiles=sub_bwd)
        nf, nr = len(trunk["w"]), len(rgb["w"])
        d_trunk = {"w": tuple(outs[:nf]),
                   "b": tuple(o[0] for o in outs[nf:2 * nf])}
        d_rgb = {"w": tuple(outs[2 * nf:2 * nf + nr]),
                 "b": tuple(o[0] for o in outs[2 * nf + nr:])}
        return (d_trunk, d_rgb, jnp.zeros_like(pts),
                jnp.zeros_like(ray_enc), jnp.zeros_like(aux3))

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_coarse_field(pts, ray_enc, trunk_params, rgb_params, aux3, skip,
                       L3, tile=512, compute_dtype=jnp.bfloat16,
                       interpret=False, subtiles_fwd=None, subtiles_bwd=None):
    """Differentiable fused coarse field (trunk trains).

    pts [M,3]; ray_enc [M,E] or None (view-independent); returns
    (rgb_raw [M,3], density_raw [M,1]); M % tile == 0 required.
    """
    trunk = {"w": tuple(lp["w"] for lp in trunk_params),
             "b": tuple(lp["b"] for lp in trunk_params)}
    rgb = {"w": tuple(lp["w"] for lp in rgb_params),
           "b": tuple(lp["b"] for lp in rgb_params)}
    has_view = ray_enc is not None
    enc = ray_enc if has_view else jnp.zeros((pts.shape[0], 1), pts.dtype)
    # subtile streaming (see fused_st_field): K compute tiles per grid
    # step.  fwd default 2: measured 9.00→8.89 ms/step on v5e and the
    # fwd kernel compiles fine.  bwd default 1: the trunk-training bwd
    # kernel is large and the K=2 unroll blew the remote Mosaic compile
    # past 25 min.  Callers surface these as cfg.kernels.coarse_subtiles_*;
    # when None the env knobs apply (hardware A/Bs).
    import os
    if subtiles_fwd is None:
        subtiles_fwd = os.environ.get("TEXPOSE_COARSE_SUBTILES_FWD", "2")
    if subtiles_bwd is None:
        subtiles_bwd = os.environ.get("TEXPOSE_COARSE_SUBTILES_BWD", "1")
    sub_fwd = int(subtiles_fwd)
    sub_bwd = int(subtiles_bwd)
    M = pts.shape[0]
    if M % (int(tile) * sub_fwd):
        sub_fwd = 1
    if M % (int(tile) * sub_bwd):
        sub_bwd = 1
    op = _make_op(tuple(sorted(skip)), int(L3), int(tile), compute_dtype,
                  bool(has_view), bool(interpret), sub_fwd, sub_bwd)
    return op(trunk, rgb, pts, enc, aux3)
