"""Pallas TPU mega-kernel: ST field + dual-density composite in ONE
fwd/bwd pallas_call pair (the r3 "0.86 ms pallas-boundary interaction"
fix — VERDICT r3 item 3).

The separated pipeline (kernels/fused_st_field.py → kernels/
fused_composite.py) round-trips rgb_raw [M,3] / trans_raw [M,5] /
dens_raw [M,1] through HBM and crosses the XLA↔Mosaic boundary four
times per step (field fwd, composite fwd, composite bwd, field bwd);
section timing showed render-fwd minus kernel-fwd = ~0.86 ms that no
XLA glue op accounts for.  Here each compute subtile (512 rows = 8
complete rays at N=64 samples) runs trunk → heads → composite without
leaving VMEM:

  forward:  xext posenc stream → frozen trunk → split heads →
            per-column (S,1)→(S/N,N) plane reshape (the direct
            (S,C)→(S/N,N·C) cast is unsupported by Mosaic; see
            tools/probe_reshape.py) → dual-density composite →
            packed [BR,16].
            Residuals written: feat [M,256] (cdtype) + dens [M,1] (f32)
            + head-output channel PLANES 8×[BR,N] (f32, hybrid-bwd
            residuals — plane form feeds fused_composite._run_bwd with
            zero XLA extraction glue).
  backward (default, HYBRID): the existing composite-bwd and field-bwd
            kernels chained, identical math to the two-kernel path.
            Measured on v5e (tools/probe_mega_time.py, scan-chained
            marginals): mega fwd beats two-kernel fwd by 0.26 ms, but
            the fully-fused mega bwd (TEXPOSE_MEGA_FULLBWD=1, kept for
            A/B) loses +2.2 ms — the per-ray composite recompute and
            one-hot re-interleave serialize on tiny [8,64] tiles inside
            the row-streamed kernel, so the bwd stays two-kernel.

Hot loop match: reference layers/nerf_static_transient_light.py:76-212
(field) + :168-212 (composite); the trunk stays frozen (:87-100,236-239)
so the static density gets no gradient.

Supported configuration (production defaults): enc_mode "xext",
split heads, ≥2-layer heads, softplus density, N | subtile.  Everything
else falls back to the two-kernel path (models/render.py routes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ._params import compiler_params as _compiler_params
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

from .fused_st_field import (
    make_xext, split_trunk_weights_x, _trunk_feat_mm, _heads_forward,
    _heads_bwd_subtile, _finish_split, _split_head_l0, _latent_rows,
    _build_w_pack, _row_spec, _full_spec)
from .fused_composite import (
    _forward_core, _fwd_cols, _bwd_cols, _tri_excl, _tri_suffix,
    N_OUT, packed_to_dict)


def fused_st_render_available():
    return _PALLAS_OK


def _planes_v(y, C, N):
    """Per-ray channel planes from the [S,C] head-output VALUE: per column,
    lane-slice + (S,1)→(S/N,N) reshape.  The direct (S,C)→(S/N,N·C) shape
    cast is REJECTED by Mosaic's infer-vector-layout; the per-column route
    lowers cleanly (tools/probe_reshape.py cases A/C, measured on v5e)."""
    RS = y.shape[0] // N
    return [y[:, c:c + 1].reshape(RS, N) for c in range(C)]


def _store_v(planes, e_ref, m_ref):
    """Inverse of _planes_v: C [RS,N] planes → [S,C] flat rows.

    The direct (RS,N)→(S,1) shape cast FAILS Mosaic's infer-vector-layout
    when the plane comes from real compute (probe_reshape case E — the
    A/C round-trip only folded away).  Exact one-hot interleave instead:
    g_c[s] = rowsum((E @ P_c) * M)[s] = P_c[s//N, s%N], with E [S,RS]
    ray-one-hot and M [S,N] sample-one-hot passed as kernel inputs.
    Precision.HIGHEST keeps the K=8 matmul f32-exact (default precision
    bf16-rounds the grads; probe_reshape2 cases 2/4)."""
    e, m = e_ref[...], m_ref[...]
    cols = [jnp.sum(jnp.dot(e, p, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST) * m,
                    axis=1, keepdims=True) for p in planes]
    return jnp.concatenate(cols, axis=1)


def _interleave_consts(S, N):
    """numpy one-hot E [S,S//N] / M [S,N] for _store_v (Mosaic: no
    captured array constants — passed as pallas_call inputs)."""
    import numpy as np
    s = np.arange(S)
    e = (s[:, None] // N == np.arange(S // N)[None, :]).astype(np.float32)
    m = (s[:, None] % N == np.arange(N)[None, :]).astype(np.float32)
    return jnp.asarray(e), jnp.asarray(m)


# ------------------------------------------------------------------ forward

def _mega_fwd_kernel(skip, nr, nt, n_trunk, tiles_per_img, cdtype, subtiles,
                     packed, N, min_uncert, raw_out,
                     enc_ref, light_ref, trans_ref, xext_ref, dist_ref,
                     depth_ref, tri_e, tri_s, *refs):
    # weight unpacking mirrors fused_st_field._fwd_kernel (xext + split)
    perm_last = (n_trunk - 1) not in skip
    n_mm = 1 + 2 * len(skip) + (2 if perm_last else 0)
    mm_refs = refs[:n_mm]
    refs = refs[n_mm:]
    wf = refs[:n_trunk]
    bf = refs[n_trunk:2 * n_trunk]
    o = 2 * n_trunk
    wr = ((refs[o], refs[o + 1]),) + tuple(refs[o + 2:o + nr + 1])
    o += nr + 1
    br = refs[o:o + nr]
    wt = refs[o + nr:o + nr + nt]
    bt = refs[o + nr + nt:o + nr + 2 * nt]
    w_pack = refs[o + nr + 2 * nt] if packed else None
    if raw_out:
        packed_ref, dens_ref, feat_ref = refs[-11:-8]
        plane_refs = refs[-8:]
    else:
        packed_ref, dens_ref, feat_ref = refs[-3:]
        plane_refs = None

    S = enc_ref.shape[0] // subtiles
    RS = S // N
    tri_e_v, tri_s_v = tri_e[...], tri_s[...]
    for k in range(subtiles):
        sl = slice(k * S, (k + 1) * S)
        rsl = slice(k * RS, (k + 1) * RS)
        img = (pl.program_id(0) * subtiles + k) // tiles_per_img
        light = light_ref[pl.ds(img, 1), :]
        trans = trans_ref[pl.ds(img, 1), :]
        feat, dens = _trunk_feat_mm(
            None, None, wf, bf, skip, cdtype, mm_refs=mm_refs,
            perm_last=perm_last, x_pre=xext_ref[sl, :])
        dens_ref[sl, :] = dens
        feat_ref[sl, :] = feat.astype(feat_ref.dtype)
        rgb_raw, trans_raw = _heads_forward(
            feat, enc_ref[sl, :], None, light, trans, wr, br, wt, bt,
            cdtype, w_pack=w_pack, split=True)
        # ---- composite: 8 complete rays per subtile, all in VMEM ----
        planes = (_planes_v(rgb_raw, 3, N) + _planes_v(trans_raw, 5, N)
                  + [dens.reshape(RS, N), dist_ref[rsl, :],
                     depth_ref[rsl, :], tri_e_v, tri_s_v])
        if raw_out:
            # hybrid-bwd residuals in PLANE form ([BR,N] per channel):
            # fused_composite._run_bwd consumes channel planes, and the
            # XLA-side [M,C]→planes extraction (strided narrow-lane
            # slices) measured ~0.5 ms/step — emitting the planes the
            # kernel already holds makes the hybrid bwd glue-free.
            for c in range(8):
                plane_refs[c][rsl, :] = planes[c].astype(jnp.float32)
        f = _forward_core(planes, min_uncert)
        packed_ref[rsl, :] = _fwd_cols(f, min_uncert)


def _run_fwd(enc_in, light_in, trans_in, xext, dist, depth, mm_parts,
             trunk_wc, trunk_b, rgb_wc, rgb_b, tr_wc, tr_b, pack,
             skip, tile, rows_per_img, N, F, min_uncert, cdtype, subtiles,
             packed, interpret, raw_out=False):
    M = xext.shape[0]
    BR = M // N
    TRt = tile // N
    sub = tile // subtiles
    tiles_per_img = rows_per_img // sub
    n_trunk, nr, nt = len(trunk_wc), len(rgb_wc) - 1, len(tr_wc)
    kernel = functools.partial(
        _mega_fwd_kernel, skip, nr, nt, n_trunk, tiles_per_img, cdtype,
        subtiles, packed, N, float(min_uncert), raw_out)
    ray_spec = pl.BlockSpec((TRt, N), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = ([_row_spec(tile, enc_in.shape[1]), _full_spec(),
                 _full_spec(), _row_spec(tile, xext.shape[1]),
                 ray_spec, ray_spec]
                + [_full_spec()] * (2 + len(mm_parts) + 2 * n_trunk
                                    + (nr + 1) + nr + 2 * nt
                                    + (1 if packed else 0)))
    out_specs = (pl.BlockSpec((TRt, N_OUT), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 _row_spec(tile, 1), _row_spec(tile, F))
    out_shape = (jax.ShapeDtypeStruct((BR, N_OUT), jnp.float32),
                 jax.ShapeDtypeStruct((M, 1), jnp.float32),
                 jax.ShapeDtypeStruct((M, F), cdtype))
    if raw_out:
        out_specs = out_specs + tuple(
            pl.BlockSpec((TRt, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(8))
        out_shape = out_shape + tuple(
            jax.ShapeDtypeStruct((BR, N), jnp.float32) for _ in range(8))
    return pl.pallas_call(
        kernel, grid=(M // tile,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(enc_in, light_in, trans_in, xext, dist, depth,
      _tri_excl(N), _tri_suffix(N),
      *mm_parts, *trunk_wc, *trunk_b, *rgb_wc, *rgb_b, *tr_wc, *tr_b, *pack)


# ----------------------------------------------------------------- backward

def _mega_bwd_kernel(nr, nt, B, tiles_per_img, cdtype, subtiles, packed,
                     N, min_uncert,
                     feat_ref, enc_ref, light_ref, trans_ref, dens_ref,
                     dist_ref, depth_ref, g_ref, tri_e, tri_s, il_e, il_m,
                     *refs):
    nR = nr + 1
    wr = ((refs[0], refs[1]),) + tuple(refs[2:nR])
    br = refs[nR:nR + nr]
    wt = refs[nR + nr:nR + nr + nt]
    bt = refs[nR + nr + nt:nR + nr + 2 * nt]
    n_w = nR + nr + 2 * nt
    extra = 1 if packed else 0
    w_pack = refs[n_w] if packed else None
    n_out = nR + nr + 2 * nt + 2
    outs = refs[n_w + extra:n_w + extra + n_out]
    scratch = refs[n_w + extra + n_out:]

    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        for s in scratch:
            s[...] = jnp.zeros_like(s)

    row = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    S = feat_ref.shape[0] // subtiles
    RS = S // N
    tri_e_v, tri_s_v = tri_e[...], tri_s[...]
    for k in range(subtiles):
        sl = slice(k * S, (k + 1) * S)
        rsl = slice(k * RS, (k + 1) * RS)
        img = (i * subtiles + k) // tiles_per_img
        light = light_ref[pl.ds(img, 1), :]
        trans = trans_ref[pl.ds(img, 1), :]
        feat = feat_ref[sl, :].astype(jnp.float32)
        rayenc = enc_ref[sl, :]
        rgb_raw, trans_raw, acts = _heads_forward(
            feat, rayenc, None, light, trans, wr, br, wt, bt, cdtype,
            want_acts=True, w_pack=w_pack, split=True)
        # ---- composite recompute + closed-form VJP, all in VMEM ----
        planes = (_planes_v(rgb_raw, 3, N) + _planes_v(trans_raw, 5, N)
                  + [dens_ref[sl, :].reshape(RS, N), dist_ref[rsl, :],
                     depth_ref[rsl, :], tri_e_v, tri_s_v])
        f = _forward_core(planes, min_uncert)
        d_rgb_cols, d_tr_cols = _bwd_cols(f, g_ref[rsl, :], planes[6],
                                          planes[7])
        g_rgb = _store_v(d_rgb_cols, il_e, il_m)
        g_tr = _store_v(d_tr_cols, il_e, il_m)
        _, _, dlight, dtrans = _heads_bwd_subtile(
            acts, feat, rayenc, None, g_rgb, g_tr, wr, br, wt, bt, w_pack,
            scratch, nr, nt, cdtype, True, packed)
        scratch[-2][...] += jnp.where(row == img, dlight, 0.0)
        scratch[-1][...] += jnp.where(row == img, dtrans, 0.0)

    @pl.when(i == n_prog - 1)
    def _():
        for o, s in zip(outs, scratch):
            o[...] = s[...]


def _run_bwd(feat, enc_in, light_rows, trans_rows, light_in, trans_in,
             dens, dist, depth, g, rgb_w, rgb_b, tr_w, tr_b, rgb_wc, tr_wc,
             w_l, w_t, pack, tile, rows_per_img, N, min_uncert, cdtype,
             subtiles, packed, interpret):
    M = feat.shape[0]
    TRt = tile // N
    sub = tile // subtiles
    tiles_per_img = rows_per_img // sub
    B = light_rows.shape[0]
    nr, nt = len(rgb_w), len(tr_w)
    F = feat.shape[1]
    E = enc_in.shape[1] - 3
    kernel = functools.partial(
        _mega_bwd_kernel, nr, nt, B, tiles_per_img, cdtype, subtiles,
        packed, N, float(min_uncert))
    ray_spec = pl.BlockSpec((TRt, N), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = ([_row_spec(tile, F), _row_spec(tile, enc_in.shape[1]),
                 _full_spec(), _full_spec(), _row_spec(tile, 1),
                 ray_spec, ray_spec,
                 pl.BlockSpec((TRt, N_OUT), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
                + [_full_spec()] * (4 + len(rgb_wc) + nr + 2 * nt
                                    + (1 if packed else 0)))
    O = rgb_w[0].shape[1]
    w_shapes = ([(F, O), (E + 3, O)] + [w.shape for w in rgb_w[1:]],
                [(F, tr_w[0].shape[1])] + [w.shape for w in tr_w[1:]])
    lat_shapes = ((B, O), (B, tr_w[0].shape[1]))
    out_shape = ([jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes[0]]
                 + [jax.ShapeDtypeStruct((1,) + b.shape, jnp.float32)
                    for b in rgb_b]
                 + [jax.ShapeDtypeStruct(s, jnp.float32)
                    for s in w_shapes[1]]
                 + [jax.ShapeDtypeStruct((1,) + b.shape, jnp.float32)
                    for b in tr_b]
                 + [jax.ShapeDtypeStruct(lat_shapes[0], jnp.float32),
                    jax.ShapeDtypeStruct(lat_shapes[1], jnp.float32)])
    out_specs = tuple(_full_spec() for _ in out_shape)
    scratch = [pltpu.VMEM(s.shape, jnp.float32) for s in out_shape]
    # the bwd's weight-grad scratch + streams + interleave constants need
    # 17.7M scoped VMEM — just over Mosaic's 16M default (measured OOM on
    # v5e); raise the budget for THIS call only (v5e has 128M physical)
    import os as _os
    bwd_mb = float(_os.environ.get("TEXPOSE_MEGA_BWD_VMEM_MB", "24"))
    outs = pl.pallas_call(
        kernel, grid=(M // tile,), in_specs=in_specs, out_specs=out_specs,
        out_shape=tuple(out_shape), scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_compiler_params(interpret, vmem_limit_mb=bwd_mb),
    )(feat, enc_in, light_in, trans_in, dens, dist, depth, g,
      _tri_excl(N), _tri_suffix(N), *_interleave_consts(sub, N),
      *rgb_wc, *rgb_b, *tr_wc, *tr_b, *pack)
    return _finish_split(outs, light_rows, trans_rows, w_l, w_t, nr, nt)


# -------------------------------------------------------------- custom vjp

@functools.lru_cache(maxsize=None)
def _make_op(skip, L3, tile_fwd, tile_bwd, rows_per_img, N, min_uncert,
             cdtype, interpret, sub_fwd, sub_bwd, packed, full_bwd=False):
    """Differentiable fused ST render for a static config.

    f(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3, dist,
      depth) → packed [BR,16].  Gradients flow to heads and the latent
    rows only (frozen trunk; dist/depth enter stop-gradient like the
    two-kernel composite).

    Backward modes (scan-chained marginals, tools/probe_mega_time.py on
    v5e): the fully-fused mega bwd (full_bwd=True) loses +2.2 ms to the
    two-kernel bwd — the per-ray composite recompute + one-hot
    re-interleave serialize on tiny [8,64] tiles inside the row-streamed
    kernel.  Default is the HYBRID: mega fwd (one XLA↔Mosaic boundary,
    −0.26 ms vs two-kernel fwd) + the existing composite-bwd and
    field-bwd kernels chained (head-output channel planes saved as
    residuals so the composite bwd needs no XLA-side extraction)."""

    def prep(heads, light_rows, trans_rows, pts, ray_enc):
        F = heads["rgb_w"][0].shape[0] - ray_enc.shape[1] - 3 \
            - light_rows.shape[1]
        E = ray_enc.shape[1]
        wr_f, wr_ep, w_l, w_t = _split_head_l0(
            heads["rgb_w"][0], heads["tr_w"][0], F, E, cdtype)
        enc_in = jnp.concatenate([ray_enc.astype(cdtype),
                                  pts.astype(cdtype)], axis=1)
        light_in, trans_in = _latent_rows(light_rows, trans_rows, w_l, w_t,
                                          cdtype)
        rgb_wc = [wr_f, wr_ep] + [w.astype(cdtype)
                                  for w in heads["rgb_w"][1:]]
        tr_wc = [heads["tr_w"][0][:F].astype(cdtype)] \
            + [w.astype(cdtype) for w in heads["tr_w"][1:]]
        pack = [_build_w_pack(heads["rgb_w"], heads["tr_w"], cdtype)] \
            if packed else []
        return enc_in, light_in, trans_in, rgb_wc, tr_wc, w_l, w_t, pack

    def fwd_only(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3,
                 dist, depth, raw_out=False):
        xext = make_xext(pts, L3, aux3[1], cdtype)
        enc_in, light_in, trans_in, rgb_wc, tr_wc, _, _, pack = prep(
            heads, light_rows, trans_rows, pts, ray_enc)
        trunk_wc = [w.astype(cdtype) for w in trunk["w"]]
        perm_last = (len(trunk["w"]) - 1) not in skip
        mm_parts = split_trunk_weights_x(
            trunk_wc, skip, 6 * L3,
            trunk_b=trunk["b"] if perm_last else None)
        F = trunk["w"][-1].shape[1] - 1
        return _run_fwd(enc_in, light_in, trans_in, xext, dist, depth,
                        mm_parts, trunk_wc, trunk["b"], rgb_wc,
                        heads["rgb_b"], tr_wc, heads["tr_b"], pack,
                        skip, tile_fwd, rows_per_img, N, F, min_uncert,
                        cdtype, sub_fwd, packed, interpret,
                        raw_out=raw_out)

    @jax.custom_vjp
    def op(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3, dist,
           depth):
        packed_out = fwd_only(heads, light_rows, trans_rows, pts,
                              ray_enc, trunk, aux3, dist, depth)[0]
        return packed_out

    def op_fwd(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3,
               dist, depth):
        outs = fwd_only(heads, light_rows, trans_rows, pts, ray_enc,
                        trunk, aux3, dist, depth, raw_out=not full_bwd)
        if full_bwd:
            packed_out, dens, feat = outs
            raw_planes = None
        else:
            packed_out, dens, feat = outs[:3]
            raw_planes = tuple(outs[3:])
        res = (heads, light_rows, trans_rows, pts, ray_enc, feat, dens,
               raw_planes, dist, depth, trunk, aux3)
        return packed_out, res

    def op_bwd(res, g):
        (heads, light_rows, trans_rows, pts, ray_enc, feat, dens,
         raw_planes, dist, depth, trunk, aux3) = res
        if full_bwd:
            enc_in, light_in, trans_in, rgb_wc, tr_wc, w_l, w_t, pack = \
                prep(heads, light_rows, trans_rows, pts, ray_enc)
            outs = _run_bwd(feat, enc_in, light_rows, trans_rows, light_in,
                            trans_in, dens, dist, depth, g,
                            heads["rgb_w"], heads["rgb_b"],
                            heads["tr_w"], heads["tr_b"], rgb_wc, tr_wc,
                            w_l, w_t, pack, tile_bwd, rows_per_img, N,
                            min_uncert, cdtype, sub_bwd, packed, interpret)
        else:
            # HYBRID: composite-bwd kernel → re-interleave in XLA →
            # field-bwd kernel (identical math to the two-kernel path).
            # Residuals arrive already in plane form from the fwd kernel
            # — no XLA extraction here (only dens, a 1-column array whose
            # [M,1]→[BR,N] reshape is layout-trivial).
            from .fused_composite import _run_bwd as _comp_bwd
            from .fused_st_field import _run_bwd as _field_bwd
            M = feat.shape[0]
            BR = M // N
            pl_list = list(raw_planes) + [dens.reshape(BR, N), dist, depth]
            grads8 = _comp_bwd(tuple(pl_list), g, N, min_uncert, 256,
                               interpret)
            d_rgb = jnp.stack(grads8[0:3], axis=-1).reshape(M, 3)
            d_tr = jnp.stack(grads8[3:8], axis=-1).reshape(M, 5)
            outs = _field_bwd(feat, ray_enc, pts, light_rows, trans_rows,
                              heads["rgb_w"], heads["rgb_b"],
                              heads["tr_w"], heads["tr_b"], d_rgb, d_tr,
                              tile_bwd, rows_per_img, cdtype, interpret,
                              subtiles=sub_bwd, packed=packed, split=True)
        nr, nt = len(heads["rgb_w"]), len(heads["tr_w"])
        d_heads = {
            "rgb_w": tuple(outs[:nr]),
            "rgb_b": tuple(o[0] for o in outs[nr:2 * nr]),
            "tr_w": tuple(outs[2 * nr:2 * nr + nt]),
            "tr_b": tuple(o[0] for o in outs[2 * nr + nt:2 * nr + 2 * nt]),
        }
        d_light, d_trans = outs[-2], outs[-1]
        zeros = jax.tree_util.tree_map(
            jnp.zeros_like, (pts, ray_enc, trunk, aux3, dist, depth))
        return (d_heads, d_light, d_trans) + zeros

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_st_render(pts, ray_enc, light_rows, trans_rows, trunk_params,
                    head_params, aux3, skip, L3, rows_per_img,
                    depth_samples, ray, min_uncert=0.05,
                    tile_fwd=512, tile_bwd=512,
                    compute_dtype=jnp.bfloat16, interpret=False,
                    subtiles_fwd=None, subtiles_bwd=None, packed=None):
    """Fully-fused differentiable ST render: field + composite in one
    kernel pair.  Same argument contract as fused_st_field plus the
    composite inputs (depth_samples [B,R,N,1], ray [B,R,3]); returns the
    composite dict of fused_composite_st (rgb/rgb_static/rgb_transient/
    depth/opacity*/uncert [B,R,C] + trans_density_mean scalar).

    Only the production configuration is supported here (xext posenc,
    split heads, packed final layers optional); callers must pre-check
    fused_st_render_supported().
    """
    import os
    if subtiles_fwd is None:
        subtiles_fwd = os.environ.get("TEXPOSE_ST_SUBTILES_FWD", "4")
    if subtiles_bwd is None:
        subtiles_bwd = os.environ.get("TEXPOSE_ST_SUBTILES_BWD", "2")
    sub_fwd = int(subtiles_fwd)
    sub_bwd = int(subtiles_bwd)
    if packed is None:
        packed = os.environ.get("TEXPOSE_ST_PACK_HEADS", "1") == "1"
    packed = bool(packed) and len(head_params["mlp_rgb"]) >= 2 \
        and len(head_params["mlp_trans"]) >= 2
    M = pts.shape[0]
    if M % (int(tile_fwd) * sub_fwd):
        sub_fwd = 1
    if M % (int(tile_bwd) * sub_bwd):
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
    heads = {"rgb_w": tuple(lp["w"] for lp in head_params["mlp_rgb"]),
             "rgb_b": tuple(lp["b"] for lp in head_params["mlp_rgb"]),
             "tr_w": tuple(lp["w"] for lp in head_params["mlp_trans"]),
             "tr_b": tuple(lp["b"] for lp in head_params["mlp_trans"])}
    full_bwd = os.environ.get("TEXPOSE_MEGA_FULLBWD", "0") == "1"
    op = _make_op(tuple(sorted(skip)), int(L3), int(tile_fwd) * sub_fwd,
                  int(tile_bwd) * sub_bwd, int(rows_per_img), int(N),
                  float(min_uncert), compute_dtype, bool(interpret),
                  sub_fwd, sub_bwd, packed, full_bwd)
    packed_out = op(heads, light_rows, trans_rows, pts, ray_enc, trunk,
                    aux3, dist, d)
    return packed_to_dict(packed_out, B, R, N)


def mega_layout_ok(tile_fwd, tile_bwd, sub_fwd, sub_bwd, M, N,
                   rows_per_img):
    """The mega-kernel's layout contract: every compute subtile must hold
    complete rays (subtile % N == 0) in BOTH directions, after the same
    M-divisibility fallbacks fused_st_render applies."""
    tf, tb = int(tile_fwd), int(tile_bwd)
    sf = int(sub_fwd) if M % (tf * int(sub_fwd)) == 0 else 1
    sb = int(sub_bwd) if M % (tb * int(sub_bwd)) == 0 else 1
    for tile, sub in ((tf, sf), (tb, sb)):
        # compute subtile = `tile` rows; streamed tile = tile*sub rows
        if tile % N or M % (tile * sub) or rows_per_img % tile:
            return False
    return True
