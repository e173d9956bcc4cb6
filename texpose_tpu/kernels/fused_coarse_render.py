"""Pallas TPU mega-kernel: coarse field + single-density composite in ONE
forward pallas_call (the pretrain twin of kernels/fused_st_render.py —
VERDICT r3 item 3's "if it wins, do the coarse twin").

The separated pretrain pipeline (kernels/fused_coarse_field.py →
kernels/fused_composite_coarse.py) round-trips rgb_raw [M,3] /
dens_raw [M,1] through HBM and crosses the XLA↔Mosaic boundary twice on
the forward.  Here each compute subtile (complete rays: tile % N == 0)
runs posenc-stream → trunk → RGB head → per-column (S,1)→(S/N,N) plane
reshape → softplus/sigmoid composite without leaving VMEM, writing one
packed [BR,8] buffer (cols 0-2 rgb | 3 depth | 4 opacity | 5-7 pad).

Backward is the HYBRID proven on the ST mega (tools/probe_mega_time.py on
v5e: fused fwd −0.26 ms, fully-fused bwd +2.2 ms — the per-ray composite
recompute serializes on tiny tiles): the mega fwd additionally writes the
rgb channel PLANES (3×[BR,N]) plus dens [M,1] as residuals — the plane
form feeds the composite-bwd kernel with zero XLA-side extraction glue —
and the backward chains the existing
composite-bwd (closed-form VJP incl. density, fused_composite_coarse) and
trunk-training field-bwd (zero-residual recompute, fused_coarse_field)
kernels — identical math to the two-kernel path.

Hot loop match: reference layers/nerf.py:72-134 (forward_samples +
composite) driven by model/nerf_pretrain.py:503-529; poses/bounds are
fixed in both pretrain variants, so dist/depth take no gradient.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ._params import compiler_params as _compiler_params
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .fused_coarse_field import (_field_forward, _field_forward_mm,
                                 _enc_specs, _row_spec, _full)
from .fused_coarse_field import _run_bwd as _field_bwd
from .fused_composite_coarse import _forward_core, N_OUT
from .fused_composite_coarse import _run_bwd as _comp_bwd
from .fused_composite import _tri_excl, _tri_suffix
from .fused_st_field import (make_posenc_mm_aux, make_sinw, make_xext,
                             split_trunk_weights_mm, split_trunk_weights_x)
from .fused_st_render import _planes_v
from .fused_trunk import _posenc_rows


def fused_coarse_render_available():
    return _PALLAS_OK


# ------------------------------------------------------------------ forward

def _mega_fwd_kernel(L3, skip, nf, nr, has_view, cdtype, subtiles, enc_mode,
                     N, raw_out,
                     pts_ref, enc_ref, aux3_ref, dist_ref, depth_ref,
                     tri_e, tri_s, *refs):
    # weight/stream unpacking mirrors fused_coarse_field._fwd_kernel
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
    if raw_out:
        packed_ref = refs[-5]
        plane_refs = refs[-4:-1]
        dens_out_ref = refs[-1]
    else:
        packed_ref = refs[-1]
        plane_refs = dens_out_ref = None

    S = pts_ref.shape[0] // subtiles
    RS = S // N
    tri_e_v, tri_s_v = tri_e[...], tri_s[...]
    for k in range(subtiles):
        sl = slice(k * S, (k + 1) * S)
        rsl = slice(k * RS, (k + 1) * RS)
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
        # ---- composite: complete rays per subtile, all in VMEM ----
        planes = (_planes_v(rgb_raw, 3, N)
                  + [dens_raw.reshape(RS, N), dist_ref[rsl, :],
                     depth_ref[rsl, :], tri_e_v, tri_s_v])
        if raw_out:
            # hybrid-bwd residuals: rgb in PLANE form ([BR,N] per channel
            # — fused_composite_coarse._run_bwd consumes channel planes,
            # so emitting the planes the kernel already holds removes the
            # XLA-side strided extraction; see fused_st_render), density
            # as [M,1] (its [M,1]→[BR,N] reshape is layout-trivial and
            # the field-bwd kernel wants the row form anyway).
            for c in range(3):
                plane_refs[c][rsl, :] = planes[c].astype(jnp.float32)
            dens_out_ref[sl, :] = dens_raw.astype(jnp.float32)
        f = _forward_core(planes)

        def rsum(x):
            return jnp.sum(x, axis=1, keepdims=True)

        cols = [rsum(f["w"] * f["cs"][c]) for c in range(3)]
        cols.append(rsum(f["w"] * f["depth"]))
        cols.append(rsum(f["w"]))
        z = jnp.zeros_like(cols[0])
        packed_ref[rsl, :] = jnp.concatenate(cols + [z, z, z], axis=1)


def _run_fwd(pts, enc_in, aux3, dist, depth, enc_extra, mm_parts,
             wfc, bf, wrc, br, skip, L3, tile, N, cdtype, subtiles,
             enc_mode, has_view, interpret, raw_out=False):
    M = pts.shape[0]
    BR = M // N
    TRt = tile // N
    nf, nr = len(wfc), len(wrc)
    kernel = functools.partial(
        _mega_fwd_kernel, L3, skip, nf, nr, has_view, cdtype, subtiles,
        enc_mode, N, raw_out)
    ray_spec = pl.BlockSpec((TRt, N), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = ([_row_spec(tile, 3), _row_spec(tile, enc_in.shape[1]),
                 _full(), ray_spec, ray_spec, _full(), _full()]
                + _enc_specs(enc_mode, enc_extra, tile, skip=skip)
                + [_full()] * (2 * nf + 2 * nr))
    out_specs = (pl.BlockSpec((TRt, N_OUT), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),)
    out_shape = (jax.ShapeDtypeStruct((BR, N_OUT), jnp.float32),)
    if raw_out:
        out_specs = out_specs + tuple(
            pl.BlockSpec((TRt, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(3)
        ) + (_row_spec(tile, 1),)
        out_shape = out_shape + tuple(
            jax.ShapeDtypeStruct((BR, N), jnp.float32) for _ in range(3)
        ) + (jax.ShapeDtypeStruct((M, 1), jnp.float32),)
    return pl.pallas_call(
        kernel, grid=(M // tile,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        # forward row tiles are independent → parallel grid semantics
        compiler_params=_compiler_params(interpret, parallel=True),
    )(pts, enc_in, aux3, dist, depth, _tri_excl(N), _tri_suffix(N),
      *([enc_extra] if enc_mode != "kernel" else []),
      *mm_parts, *wfc, *bf, *wrc, *br)


# -------------------------------------------------------------- custom vjp

@functools.lru_cache(maxsize=None)
def _make_op(skip, L3, tile, N, cdtype, has_view, interpret, sub_fwd,
             sub_bwd, enc_mode):
    """Differentiable fused coarse render for a static config.

    f(trunk, rgb, pts, ray_enc, aux3, dist, depth) → packed [BR,8].
    Gradients flow to trunk AND rgb head (pretrain trains the trunk);
    dist/depth enter stop-gradient like the two-kernel composite."""

    def _enc(pts, aux3):
        if enc_mode == "matmul":
            return make_posenc_mm_aux(L3, aux3[1])
        if enc_mode == "sinext":
            return make_sinw(pts, L3, aux3[1], cdtype)
        if enc_mode == "xext":
            return make_xext(pts, L3, aux3[1], cdtype)
        if enc_mode == "outside":
            return _posenc_rows(pts, L3, aux3[0], aux3[1])
        return None

    def _mm(wfc):
        if enc_mode == "xext":
            return split_trunk_weights_x(wfc, skip, 6 * L3)
        if enc_mode in ("matmul", "sinext"):
            return split_trunk_weights_mm(wfc, skip, 6 * L3)
        return []

    def fwd_only(trunk, rgb, pts, ray_enc, aux3, dist, depth,
                 raw_out=False):
        wfc = [w.astype(cdtype) for w in trunk["w"]]
        wrc = [w.astype(cdtype) for w in rgb["w"]]
        enc_in = ray_enc if has_view \
            else jnp.zeros((pts.shape[0], 1), pts.dtype)
        return _run_fwd(pts, enc_in, aux3, dist, depth, _enc(pts, aux3),
                        _mm(wfc), wfc, trunk["b"], wrc, rgb["b"],
                        skip, L3, tile * sub_fwd, N, cdtype, sub_fwd,
                        enc_mode, has_view, interpret, raw_out=raw_out)

    @jax.custom_vjp
    def op(trunk, rgb, pts, ray_enc, aux3, dist, depth):
        return fwd_only(trunk, rgb, pts, ray_enc, aux3, dist, depth)[0]

    def op_fwd(trunk, rgb, pts, ray_enc, aux3, dist, depth):
        outs = fwd_only(
            trunk, rgb, pts, ray_enc, aux3, dist, depth, raw_out=True)
        packed_out = outs[0]
        raw_planes = tuple(outs[1:4])
        raw_dens = outs[4]
        res = (trunk, rgb, pts, ray_enc, aux3, raw_planes, raw_dens, dist,
               depth)
        return packed_out, res

    def op_bwd(res, g):
        (trunk, rgb, pts, ray_enc, aux3, raw_planes, raw_dens, dist,
         depth) = res
        # HYBRID: composite-bwd kernel → field-bwd kernel (identical math
        # to the two-kernel path; see module docstring).  rgb residuals
        # arrive already in plane form from the fwd kernel — no XLA
        # extraction here.
        M = raw_dens.shape[0]
        BR = M // N
        planes = raw_planes + (raw_dens.reshape(BR, N), dist, depth)
        grads4 = _comp_bwd(planes, g, N, 256, interpret)
        d_rgb = jnp.stack(grads4[0:3], axis=-1).reshape(M, 3)
        d_dens = grads4[3].reshape(M, 1)
        outs = _field_bwd(pts, ray_enc if has_view else None, aux3,
                          trunk["w"], trunk["b"], rgb["w"], rgb["b"],
                          d_rgb, d_dens, skip, L3, tile * sub_bwd, cdtype,
                          interpret, subtiles=sub_bwd, enc_mode=enc_mode,
                          enc_extra=_enc(pts, aux3))
        nf, nr = len(trunk["w"]), len(rgb["w"])
        d_trunk = {"w": tuple(outs[:nf]),
                   "b": tuple(o[0] for o in outs[nf:2 * nf])}
        d_rgb_p = {"w": tuple(outs[2 * nf:2 * nf + nr]),
                   "b": tuple(o[0] for o in outs[2 * nf + nr:])}
        return (d_trunk, d_rgb_p, jnp.zeros_like(pts),
                jnp.zeros_like(ray_enc), jnp.zeros_like(aux3),
                jnp.zeros_like(dist), jnp.zeros_like(depth))

    op.defvjp(op_fwd, op_bwd)
    return op


def coarse_mega_layout_ok(tile, sub_fwd, sub_bwd, M, N):
    """Layout contract: each compute subtile (= `tile` rows) must hold
    complete rays, after the same M-divisibility fallbacks the entry
    applies."""
    t = int(tile)
    sf = int(sub_fwd) if M % (t * int(sub_fwd)) == 0 else 1
    sb = int(sub_bwd) if M % (t * int(sub_bwd)) == 0 else 1
    if t % N:
        return False
    return M % (t * sf) == 0 and M % (t * sb) == 0


def fused_coarse_render(pts, ray_enc, trunk_params, rgb_params, aux3, skip,
                        L3, depth_samples, ray, tile=512,
                        compute_dtype=jnp.bfloat16, interpret=False,
                        subtiles_fwd=None, subtiles_bwd=None,
                        enc_mode=None):
    """Fully-fused differentiable coarse render: field + composite in one
    forward kernel.  Same argument contract as fused_coarse_field plus the
    composite inputs (depth_samples [B,R,N,1], ray [B,R,3]); returns
    dict(rgb [B,R,3], depth [B,R,1], opacity [B,R,1]).  Callers must
    pre-check coarse_mega_layout_ok (complete rays per compute subtile).
    """
    if subtiles_fwd is None:
        subtiles_fwd = os.environ.get("TEXPOSE_COARSE_SUBTILES_FWD", "2")
    if subtiles_bwd is None:
        subtiles_bwd = os.environ.get("TEXPOSE_COARSE_SUBTILES_BWD", "1")
    sub_fwd = int(subtiles_fwd)
    sub_bwd = int(subtiles_bwd)
    if enc_mode is None:
        enc_mode = os.environ.get("TEXPOSE_COARSE_POSENC", "sinext")
    assert enc_mode in ("kernel", "outside", "matmul", "sinext",
                        "xext"), enc_mode
    M = pts.shape[0]
    if M % (int(tile) * sub_fwd):
        sub_fwd = 1
    if M % (int(tile) * sub_bwd):
        sub_bwd = 1

    B, R, N, _ = depth_samples.shape
    BR = B * R
    d = depth_samples.reshape(BR, N)
    ray_len = jnp.linalg.norm(ray, axis=-1).reshape(BR, 1)
    intv = jnp.concatenate([d[:, 1:] - d[:, :-1],
                            jnp.full_like(d[:, :1], 1e10)], axis=1)
    dist = jax.lax.stop_gradient(intv * ray_len)
    d = jax.lax.stop_gradient(d)

    trunk = {"w": tuple(lp["w"] for lp in trunk_params),
             "b": tuple(lp["b"] for lp in trunk_params)}
    rgb = {"w": tuple(lp["w"] for lp in rgb_params),
           "b": tuple(lp["b"] for lp in rgb_params)}
    has_view = ray_enc is not None
    enc = ray_enc if has_view else jnp.zeros((M, 1), pts.dtype)
    op = _make_op(tuple(sorted(skip)), int(L3), int(tile), int(N),
                  compute_dtype, bool(has_view), bool(interpret),
                  sub_fwd, sub_bwd, str(enc_mode))
    packed = op(trunk, rgb, pts, enc, aux3, dist, d)

    def out(lo, hi):
        return packed[:, lo:hi].reshape(B, R, hi - lo)

    return dict(rgb=out(0, 3), depth=out(3, 4), opacity=out(4, 5))
