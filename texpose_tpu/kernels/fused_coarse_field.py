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
    from ._params import compiler_params as _compiler_params
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .fused_trunk import _posenc_rows, _freq
from .fused_st_field import (_dot, _dot_t1, _dot_t2, make_posenc_mm_aux,
                             make_sinw, make_xext, split_trunk_weights_mm,
                             split_trunk_weights_x)


def fused_coarse_available():
    return _PALLAS_OK


def _field_forward(pts, enc_view, aux3, wf, bf, wr, br, skip, L3, cdtype,
                   want_acts=False, x_pre=None):
    """Full coarse field on a row tile.  Returns (rgb_raw [T,3],
    dens_raw [T,1]) and optionally every pre-ReLU activation.
    x_pre: posenc streamed from outside the kernel (the in-kernel
    narrow-lane build is ~60% of trunk time; mxu_probe r3) — the coarse
    BWD recomputes the field, so it saves the build twice per step."""
    x = _posenc_rows(pts, L3, aux3[0], aux3[1]) if x_pre is None else x_pre
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


def _field_forward_mm(pts, enc_view, auxm_ref, wf, bf, wr, br, skip,
                      cdtype, want_acts=False, mm_refs=None,
                      sinw_pre=None, x_pre=None):
    """Matmul-form posenc coarse field (see fused_st_field.
    make_posenc_mm_aux): the [T,3+6L] encoding never materializes — the
    first/skip trunk layers consume (pts, sin-bands) via row-split weights,
    eliminating every narrow-lane concat of the element-wise build.

    sinw_pre ("sinext"): sin bands built outside in XLA and streamed —
    skips the in-kernel HIGHEST angle matmul (fwd AND the bwd recompute,
    so the coarse kernel saves it twice per step).

    x_pre ("xext"): combined (pts, sin-bands) stream + split_trunk_
    weights_x pieces — layer 0/skip run ONE K=3+6L matmul, and the bwd
    dW for those layers accumulates as one issue off acts["x63"]."""
    if x_pre is not None:
        xc = x_pre.astype(cdtype)
        acts = {"x63": xc}
        skip_sorted = sorted(skip)
        h = None
        nf = len(wf)
        dens_raw = None
        for li in range(nf):
            if li == 0:
                z = _dot(xc, mm_refs[0][...]) + bf[li][...]
            elif li in skip:
                k = 1 + 2 * skip_sorted.index(li)
                acts[f"fa{li}"] = h
                z = (_dot(h.astype(cdtype), mm_refs[k][...])
                     + _dot(xc, mm_refs[k + 1][...]) + bf[li][...])
            else:
                acts[f"fa{li}"] = h
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
    if sinw_pre is not None:
        sinw = sinw_pre.astype(cdtype)
    else:
        D = auxm_ref[0:3, :]
        phase = auxm_ref[3:4, :]
        wb = auxm_ref[4:5, :]
        # HIGHEST is load-bearing: see fused_st_field._trunk_feat_mm —
        # DEFAULT computes this f32 matmul at bf16 and wrecks the
        # high-band angles.
        spec = jax.lax.dot_general(
            pts, D, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) + phase
        sinw = (jnp.sin(spec) * wb).astype(cdtype)
    ptsc = pts.astype(cdtype)
    E = sinw.shape[1]
    acts = {"sinw": sinw, "ptsc": ptsc}
    skip_sorted = sorted(skip)

    def pieces(li):
        if mm_refs is None:
            w = wf[li]
            if li == 0:
                return w[0:3, :], w[3:3 + E, :], None
            F = w.shape[0] - 3 - E
            return w[F:F + 3, :], w[F + 3:, :], w[0:F, :]
        if li == 0:
            return mm_refs[0][...], mm_refs[1][...], None
        k = 2 + 3 * skip_sorted.index(li)
        return mm_refs[k + 1][...], mm_refs[k + 2][...], mm_refs[k][...]

    h = None
    nf = len(wf)
    dens_raw = None
    for li in range(nf):
        if li == 0:
            w_pts, w_sin, _ = pieces(li)
            z = _dot(ptsc, w_pts) + _dot(sinw, w_sin) + bf[li][...]
        elif li in skip:
            w_pts, w_sin, w_h = pieces(li)
            acts[f"fa{li}"] = h
            z = (_dot(h.astype(cdtype), w_h) + _dot(ptsc, w_pts)
                 + _dot(sinw, w_sin) + bf[li][...])
        else:
            acts[f"fa{li}"] = h
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


def _fwd_kernel(L3, skip, nf, nr, has_view, cdtype, subtiles, enc_mode,
                pts_ref, enc_ref, aux3_ref, *refs):
    enc_extra = refs[0] if enc_mode != "kernel" else None
    refs = refs[1:] if enc_mode != "kernel" else refs
    mm_refs = None
    mm_form = enc_mode in ("matmul", "sinext", "xext")
    if mm_form:
        n_mm = (1 + 2 * len(skip)) if enc_mode == "xext" \
            else (2 + 3 * len(skip))
        mm_refs = refs[:n_mm]
        refs = refs[n_mm:]
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
        if mm_form:
            rgb_raw, dens_raw = _field_forward_mm(
                pts, enc_view,
                enc_extra if enc_mode == "matmul" else None,
                wf, bf, wr, br, skip, cdtype, mm_refs=mm_refs,
                sinw_pre=enc_extra[sl, :] if enc_mode == "sinext"
                else None,
                x_pre=enc_extra[sl, :] if enc_mode == "xext" else None)
        else:
            rgb_raw, dens_raw = _field_forward(
                pts, enc_view, aux3_ref, wf, bf, wr, br, skip, L3, cdtype,
                x_pre=enc_extra[sl, :] if enc_mode == "outside" else None)
        rgb_ref[sl, :] = rgb_raw
        dens_ref[sl, :] = dens_raw


def _bwd_kernel(L3, skip, nf, nr, has_view, cdtype, subtiles, enc_mode,
                pts_ref, enc_ref, aux3_ref, g_rgb_ref, g_dens_ref, *refs):
    enc_extra = refs[0] if enc_mode != "kernel" else None
    refs = refs[1:] if enc_mode != "kernel" else refs
    mm_refs = None
    mm_form = enc_mode in ("matmul", "sinext", "xext")
    if mm_form:
        n_mm = (1 + 2 * len(skip)) if enc_mode == "xext" \
            else (2 + 3 * len(skip))
        mm_refs = refs[:n_mm]
        refs = refs[n_mm:]
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
        if mm_form:
            _, _, acts = _field_forward_mm(
                pts, enc_view,
                enc_extra if enc_mode == "matmul" else None,
                wf, bf, wr, br, skip, cdtype,
                want_acts=True, mm_refs=mm_refs,
                sinw_pre=enc_extra[sl, :] if enc_mode == "sinext"
                else None,
                x_pre=enc_extra[sl, :] if enc_mode == "xext" else None)
        else:
            _, _, acts = _field_forward(pts, enc_view, aux3_ref, wf, bf,
                                        wr, br, skip, L3, cdtype,
                                        want_acts=True,
                                        x_pre=enc_extra[sl, :]
                                        if enc_mode == "outside" else None)

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
            gc = g.astype(cdtype)
            if enc_mode == "xext" and li == 0:
                # xext: (pts, sin-bands) live as ONE streamed block — the
                # full layer-0 dW is a single issue
                scratch[li][...] += _dot_t1(acts["x63"], gc)
            elif enc_mode == "xext" and li in skip:
                scratch[li][...] += jnp.concatenate(
                    [_dot_t1(acts[f"fa{li}"].astype(cdtype), gc),
                     _dot_t1(acts["x63"], gc)], axis=0)
            elif mm_form and li == 0:
                # layer 0 consumed (pts, sin-bands) via split rows; its dW
                # splits the same way and pts/posenc get no dX at all.
                # (concat the blocks as VALUES — sub-slice scratch writes
                # at rows 0:3 would be sublane-misaligned)
                scratch[li][...] += jnp.concatenate(
                    [_dot_t1(acts["ptsc"], gc),
                     _dot_t1(acts["sinw"], gc)], axis=0)
            elif mm_form and li in skip:
                scratch[li][...] += jnp.concatenate(
                    [_dot_t1(acts[f"fa{li}"].astype(cdtype), gc),
                     _dot_t1(acts["ptsc"], gc),
                     _dot_t1(acts["sinw"], gc)], axis=0)
            else:
                scratch[li][...] += _dot_t1(acts[f"fa{li}"].astype(cdtype),
                                            gc)
            scratch[nf + li][...] += jnp.sum(g, axis=0, keepdims=True)
            if li > 0:
                if mm_form and li in skip:
                    # dX only through the activation rows (posenc rows get
                    # no gradient) — fewer flops than slicing afterwards
                    Fh = acts[f"fa{li}"].shape[1]
                    g = _dot_t2(gc, wf[li][0:Fh, :])
                else:
                    g = _dot_t2(gc, wf[li][...])
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


def _enc_specs(enc_mode, enc_extra, tile, skip=()):
    if enc_mode == "outside":
        return [_row_spec(tile, enc_extra.shape[1])]
    if enc_mode == "matmul":
        return [_full()] * (1 + 2 + 3 * len(skip))
    if enc_mode == "sinext":
        return [_row_spec(tile, enc_extra.shape[1])] \
            + [_full()] * (2 + 3 * len(skip))
    if enc_mode == "xext":
        return [_row_spec(tile, enc_extra.shape[1])] \
            + [_full()] * (1 + 2 * len(skip))
    return []


def _run_fwd(pts, enc_view, aux3, wf, bf, wr, br, skip, L3, tile, cdtype,
             interpret, subtiles=1, enc_mode="kernel", enc_extra=None):
    M = pts.shape[0]
    nf, nr = len(wf), len(wr)
    has_view = enc_view is not None
    kernel = functools.partial(_fwd_kernel, L3, skip, nf, nr, has_view,
                               cdtype, subtiles, enc_mode)
    enc_in = enc_view if has_view else jnp.zeros((M, 1), pts.dtype)
    in_specs = ([_row_spec(tile, 3),
                 _row_spec(tile, enc_in.shape[1]), _full()]
                + _enc_specs(enc_mode, enc_extra, tile, skip=skip)
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
        compiler_params=_compiler_params(interpret, parallel=True),
    )(pts, enc_in, aux3, *([enc_extra] if enc_mode != "kernel" else []),
      *(split_trunk_weights_x(wfc, skip, 6 * L3)
        if enc_mode == "xext" else
        split_trunk_weights_mm(wfc, skip, 6 * L3)
        if enc_mode in ("matmul", "sinext") else []),
      *wfc, *bf, *wrc, *br)


def _run_bwd(pts, enc_view, aux3, wf, bf, wr, br, g_rgb, g_dens, skip, L3,
             tile, cdtype, interpret, subtiles=1, enc_mode="kernel",
             enc_extra=None):
    M = pts.shape[0]
    nf, nr = len(wf), len(wr)
    has_view = enc_view is not None
    kernel = functools.partial(_bwd_kernel, L3, skip, nf, nr, has_view,
                               cdtype, subtiles, enc_mode)
    enc_in = enc_view if has_view else jnp.zeros((M, 1), pts.dtype)
    in_specs = ([_row_spec(tile, 3), _row_spec(tile, enc_in.shape[1]),
                 _full(), _row_spec(tile, 3), _row_spec(tile, 1)]
                + _enc_specs(enc_mode, enc_extra, tile, skip=skip)
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
        compiler_params=_compiler_params(interpret),
    )(pts, enc_in, aux3, g_rgb, g_dens,
      *([enc_extra] if enc_mode != "kernel" else []),
      *(split_trunk_weights_x(wfc, skip, 6 * L3)
        if enc_mode == "xext" else
        split_trunk_weights_mm(wfc, skip, 6 * L3)
        if enc_mode in ("matmul", "sinext") else []),
      *wfc, *bf, *wrc, *br)


@functools.lru_cache(maxsize=None)
def _make_op(skip, L3, tile, cdtype, has_view, interpret, sub_fwd=1,
             sub_bwd=1, enc_mode="matmul"):
    def _enc(pts, aux3):
        # posenc constants/rows consumed by fwd AND bwd (see
        # _field_forward_mm / _field_forward)
        if enc_mode == "matmul":
            return make_posenc_mm_aux(L3, aux3[1])
        if enc_mode == "sinext":
            return make_sinw(pts, L3, aux3[1], cdtype)
        if enc_mode == "xext":
            return make_xext(pts, L3, aux3[1], cdtype)
        if enc_mode == "outside":
            return _posenc_rows(pts, L3, aux3[0], aux3[1])
        return None

    def op_impl(trunk, rgb, pts, ray_enc, aux3):
        return _run_fwd(pts, ray_enc if has_view else None, aux3,
                        trunk["w"], trunk["b"], rgb["w"], rgb["b"],
                        skip, L3, tile * sub_fwd, cdtype, interpret,
                        subtiles=sub_fwd, enc_mode=enc_mode,
                        enc_extra=_enc(pts, aux3))

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
                        interpret, subtiles=sub_bwd, enc_mode=enc_mode,
                        enc_extra=_enc(pts, aux3))
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
                       interpret=False, subtiles_fwd=None, subtiles_bwd=None,
                       enc_mode=None):
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
    # "sinext" default: the coarse bwd RECOMPUTES the field, so the saved
    # in-kernel HIGHEST angle matmul pays off twice per step (see
    # fused_st_field.make_sinw; ST A/B on v5e: fwd −11%, fwd+bwd −6%)
    if enc_mode is None:
        enc_mode = os.environ.get("TEXPOSE_COARSE_POSENC", "sinext")
    assert enc_mode in ("kernel", "outside", "matmul", "sinext",
                        "xext"), enc_mode
    M = pts.shape[0]
    if M % (int(tile) * sub_fwd):
        sub_fwd = 1
    if M % (int(tile) * sub_bwd):
        sub_bwd = 1
    op = _make_op(tuple(sorted(skip)), int(L3), int(tile), compute_dtype,
                  bool(has_view), bool(interpret), sub_fwd, sub_bwd,
                  str(enc_mode))
    return op(trunk, rgb, pts, enc, aux3)
