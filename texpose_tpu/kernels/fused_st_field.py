"""Pallas TPU kernels: fully-fused static/transient/light field forward AND
backward for the texture stage.

Texture-stage profile (tools/bench_decompose.py on v5e): render forward
4.4 ms but forward+backward 11.7 ms — the XLA backward is memory-bound on
[M,256] head-activation residuals spilled to HBM.  These kernels eliminate
that traffic:

  forward:  row tiles → posenc(3D, c2f) → frozen trunk (8×256+skip) →
            rgb head (+light latent) → transient head (+transient latent),
            all in VMEM; the ONLY residual written is the [M,256] trunk
            feature map (bf16).
  backward: re-runs just the two heads from the saved features inside VMEM,
            backpropagates them, and accumulates dW/db and per-image latent
            grads in VMEM scratch across the sequential row-tile grid.
            The trunk is frozen (reference
            layers/nerf_static_transient_light.py:87-100,236-239), so no
            trunk backward exists at all.

Layout contract: rows are [B, R, N] flattened; rows_per_image = R·N must be
divisible by the tile so every tile maps to exactly one image's latent row.

View-direction encoding and all nonlinearities (sigmoid/softplus) stay
outside in XLA — their cotangents flow into the kernels' raw outputs.
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


def fused_st_available():
    return _PALLAS_OK


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t1(a, b):
    """a^T @ b ([T,I],[T,O] → [I,O]) with f32 accumulation."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t2(a, b):
    """a @ b^T ([T,O],[I,O] → [T,I]) with f32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def make_posenc_mm_aux(L, c2f_w, dtype=jnp.float32):
    """[5, 6L] packed constants for the matmul-form posenc:
    rows 0-2 = D (pts @ D gives each band's angle), row 3 = phase
    (+π/2 turns sin into cos), row 4 = per-band c2f window.

    Why: the element-wise posenc builds [T,63] out of [T,10] pieces — dozens
    of narrow-lane concats that cost ~2 ms per 131k rows in-kernel AND in
    XLA (mxu_probe r3: the matmul chain itself runs at ~180 TFLOPs).  As a
    [T,3]x[3,6L] matmul + one aligned sin over [T,6L], the encoding has no
    lane surgery at all; the identity columns never materialize — the
    trunk's first/skip layers consume (pts, sin-bands) through row-split
    weights instead.
    """
    L = int(L)
    freqs = (2.0 ** np.arange(L)) * np.pi
    D = np.zeros((3, 6 * L), np.float32)
    phase = np.zeros((1, 6 * L), np.float32)
    for d in range(3):
        o = d * 2 * L
        D[d, o:o + L] = freqs           # sin bands
        D[d, o + L:o + 2 * L] = freqs   # cos bands (phase-shifted sin)
        phase[0, o + L:o + 2 * L] = np.pi / 2
    wb = jnp.tile(jnp.concatenate([c2f_w, c2f_w]), 3)[None, :]
    return jnp.concatenate([jnp.asarray(D), jnp.asarray(phase),
                            wb.astype(jnp.float32)], axis=0).astype(dtype)


def make_sinw(pts, L, c2f_w, dtype=jnp.bfloat16):
    """[M, 6L] weighted sin bands built OUTSIDE the kernel ("sinext" mode),
    column-ordered to match make_posenc_mm_aux (per dim d: L sin bands then
    L cos bands at offset d·2L).

    Why: the in-kernel matmul-form angle computation needs
    Precision.HIGHEST (a bf16-rounded angle at band 2^9·π is noise), and
    the multi-pass HIGHEST matmul costs ~0.47 ms per 131k-row trunk pass
    on v5e (tools/mxu_probe.py trunk stages, r3) — serial time inside the
    compute pipeline.  Built element-wise in XLA it is EXACT f32 (no
    matmul rounding at all) and the [M,6L] result streams into the kernel
    as a pipelined HBM load (~16 MB bf16 ≈ 0.02 ms).

    BUILD-FORM NOTE (r3, all measured in-situ via bench_scan_sections
    Sh/Si): this [M,3,L] build compiles to {0,2,1}-layout 3-D
    intermediates + a transpose copy (~0.3-0.5 ms of layout surgery at
    the production envelope, optimized-HLO dump) — but BOTH attempted
    fixes were worse: per-dim 2-D [M,L] lane concats +1.3 ms (narrow-lane
    concat fusions), and a [M,3]x[3,6L] HIGHEST angle matmul +0.2 ms (the
    multi-pass dot costs more than the layout copies it removes).  Keep
    this form."""
    L = int(L)
    freqs = jnp.asarray((2.0 ** np.arange(L)) * np.pi, jnp.float32)
    ang = pts.astype(jnp.float32)[:, :, None] * freqs          # [M,3,L]
    blk = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    w = jnp.concatenate([c2f_w, c2f_w]).astype(jnp.float32)[None, None, :]
    return (blk * w).reshape(pts.shape[0], 6 * L).astype(dtype)


def make_xext(pts, L, c2f_w, dtype=jnp.bfloat16):
    """[M, 3+6L] streamed trunk input for "xext" mode: pts columns folded
    into the sin-band block so layer 0 / skip layers consume ONE K=3+6L
    matmul instead of a pathological K=3 issue plus a K=6L issue (the
    trunk stage probe prices a K=3 [2048,3]x[3,256] issue at ~3x a full
    K=256 issue — the MXU pass is latency-, not FLOP-, bound)."""
    return jnp.concatenate(
        [pts.astype(dtype), make_sinw(pts, L, c2f_w, dtype)], axis=1)


def split_trunk_weights_x(trunk_wc, skip, E, trunk_b=None):
    """Trace-time split for "xext": [w0_x] + per-skip [w_h, w_x], where
    w_x covers the (pts, sin-bands) rows as ONE [3+E, O] block (the
    streamed make_xext columns).  With trunk_b, appends the density-
    rotated last layer exactly like split_trunk_weights_mm."""
    parts = [trunk_wc[0][:3 + E]]
    for li in sorted(skip):
        w = trunk_wc[li]
        F = w.shape[0] - 3 - E
        parts += [w[:F], w[F:F + 3 + E]]
    if trunk_b is not None:
        wn, bn = trunk_wc[-1], trunk_b[-1]
        parts += [jnp.concatenate([wn[:, 1:], wn[:, 0:1]], axis=1),
                  jnp.concatenate([bn[..., 1:], bn[..., 0:1]], axis=-1)]
    return parts


def split_trunk_weights_mm(trunk_wc, skip, E, trunk_b=None):
    """Trace-time row-split of the first/skip trunk weights for the
    matmul-form posenc: [w0_pts, w0_sin] + per-skip [w_h, w_pts, w_sin].
    Passing the pieces as separate kernel inputs avoids in-kernel ref
    slicing at sublane-misaligned rows (3:3+E), which forces a weight
    relayout every tile.

    With trunk_b, also appends the LAST layer's weight/bias with the
    density column rotated to the END: the reference convention puts
    density at column 0, so feat = z[:, 1:] — a LANE-misaligned slice of
    a [T,257] block that relayouts the whole feature map every tile.
    Permuted, both slices land on 128-lane boundaries.  Only valid when
    the last layer is not a skip layer."""
    parts = [trunk_wc[0][:3], trunk_wc[0][3:3 + E]]
    for li in sorted(skip):
        w = trunk_wc[li]
        F = w.shape[0] - 3 - E
        parts += [w[:F], w[F:F + 3], w[F + 3:F + 3 + E]]
    if trunk_b is not None:
        wn, bn = trunk_wc[-1], trunk_b[-1]
        parts += [jnp.concatenate([wn[:, 1:], wn[:, 0:1]], axis=1),
                  jnp.concatenate([bn[..., 1:], bn[..., 0:1]], axis=-1)]
    return parts


def _trunk_feat_mm(pts, auxm_ref, w_refs, b_refs, skip, cdtype,
                   mm_refs=None, perm_last=False,
                   sinw_pre=None, x_pre=None):
    """Matmul-form posenc trunk: see make_posenc_mm_aux.  mm_refs: the
    split_trunk_weights_mm pieces (falls back to ref slicing if absent);
    perm_last: mm_refs carries the density-col-rotated last layer — both
    output slices become lane-aligned.

    sinw_pre ("sinext" mode): the weighted sin bands computed OUTSIDE the
    kernel (make_sinw) and streamed in — skips the in-kernel HIGHEST
    angle matmul (~0.47 ms per 131k-row pass on v5e).

    x_pre ("xext" mode): the combined (pts, sin-bands) [T, 3+6L] stream
    (make_xext) with mm_refs from split_trunk_weights_x — layer 0 / skip
    become ONE K=3+6L matmul (no pathological K=3 issue at all)."""
    if x_pre is not None:
        xc = x_pre.astype(cdtype)
        n = len(w_refs)
        skip_sorted = sorted(skip)
        h = None
        dens = None
        for li in range(n):
            last = li == n - 1
            if li == 0:
                z = _dot(xc, mm_refs[0][...]) + b_refs[li][...]
            elif li in skip:
                k = 1 + 2 * skip_sorted.index(li)
                z = (_dot(h.astype(cdtype), mm_refs[k][...])
                     + _dot(xc, mm_refs[k + 1][...]) + b_refs[li][...])
            elif last and perm_last:
                z = _dot(h.astype(cdtype), mm_refs[-2][...]) \
                    + mm_refs[-1][...]
                F = z.shape[1] - 1
                return jnp.maximum(z[:, :F], 0.0), z[:, F:F + 1]
            else:
                z = _dot(h.astype(cdtype), w_refs[li][...]) + b_refs[li][...]
            if last:
                dens = z[:, 0:1]
                z = z[:, 1:]
            h = jnp.maximum(z, 0.0)
        return h, dens
    if sinw_pre is not None:
        sinw = sinw_pre.astype(cdtype)
    else:
        D = auxm_ref[0:3, :]
        phase = auxm_ref[3:4, :]
        wb = auxm_ref[4:5, :]
        # Precision.HIGHEST is load-bearing: DEFAULT runs the f32 matmul
        # as a single bf16 MXU pass, and a bf16-rounded angle at band
        # 2^9·π is off by O(radians) — sin() output becomes noise (on-TPU
        # parity failed at grad rel ~0.5 before this).  K=3, so the
        # multi-pass cost is nil.
        spec = jax.lax.dot_general(
            pts, D, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST) + phase
        sinw = (jnp.sin(spec) * wb).astype(cdtype)
    ptsc = pts.astype(cdtype)
    E = sinw.shape[1]
    n = len(w_refs)
    skip_sorted = sorted(skip)

    def pieces(li):
        if mm_refs is None:
            w = w_refs[li]
            if li == 0:
                return w[0:3, :], w[3:3 + E, :], None
            F = w.shape[0] - 3 - E
            return w[F:F + 3, :], w[F + 3:F + 3 + E, :], w[0:F, :]
        if li == 0:
            return mm_refs[0][...], mm_refs[1][...], None
        k = 2 + 3 * skip_sorted.index(li)
        return mm_refs[k + 1][...], mm_refs[k + 2][...], mm_refs[k][...]

    h = None
    dens = None
    for li in range(n):
        last = li == n - 1
        if li == 0:
            w_pts, w_sin, _ = pieces(li)
            z = _dot(ptsc, w_pts) + _dot(sinw, w_sin) + b_refs[li][...]
        elif li in skip:
            w_pts, w_sin, w_h = pieces(li)
            z = (_dot(h.astype(cdtype), w_h) + _dot(ptsc, w_pts)
                 + _dot(sinw, w_sin) + b_refs[li][...])
        elif last and perm_last:
            # density column rotated to the end → both slices lane-aligned
            z = _dot(h.astype(cdtype), mm_refs[-2][...]) \
                + mm_refs[-1][...]
            F = z.shape[1] - 1
            return jnp.maximum(z[:, :F], 0.0), z[:, F:F + 1]
        else:
            z = _dot(h.astype(cdtype), w_refs[li][...]) + b_refs[li][...]
        if last:
            dens = z[:, 0:1]
            z = z[:, 1:]
        h = jnp.maximum(z, 0.0)
    return h, dens


def _trunk_feat_mm_multi(blks, w_refs, b_refs, skip, cdtype, mm_refs,
                         perm_last, xext):
    """Layer-OUTER trunk over K independent subtile chains (ILP form).

    blks: per-subtile (pts, stream) pairs — stream is the make_xext block
    (xext=True) or the make_sinw bands (sinext).  The subtile-outer loop in
    _fwd_kernel emits each chain's 8 matmuls back-to-back, every issue
    depending on the previous one — the MXU drains between issues and the
    trunk runs at a 1-of-4-MXU rate (CLAUDE.md r3 probe).  Emitting
    layer-outer gives Mosaic K independent issues per layer to overlap,
    while intermediates stay subtile-narrow (the failed fullblock A/B
    widened them instead)."""
    K = len(blks)
    n = len(w_refs)
    skip_sorted = sorted(skip)
    if xext:
        xcs = [s.astype(cdtype) for _, s in blks]
    else:
        ptss = [p.astype(cdtype) for p, _ in blks]
        sins = [s.astype(cdtype) for _, s in blks]
    hs = [None] * K
    for li in range(n):
        last = li == n - 1
        if li == 0:
            b = b_refs[li][...]
            if xext:
                w0 = mm_refs[0][...]
                zs = [_dot(xcs[j], w0) + b for j in range(K)]
            else:
                w_pts, w_sin = mm_refs[0][...], mm_refs[1][...]
                zs = [_dot(ptss[j], w_pts) + _dot(sins[j], w_sin) + b
                      for j in range(K)]
        elif li in skip:
            b = b_refs[li][...]
            if xext:
                k = 1 + 2 * skip_sorted.index(li)
                w_h, w_x = mm_refs[k][...], mm_refs[k + 1][...]
                zs = [_dot(hs[j].astype(cdtype), w_h) + _dot(xcs[j], w_x)
                      + b for j in range(K)]
            else:
                k = 2 + 3 * skip_sorted.index(li)
                w_h = mm_refs[k][...]
                w_pts, w_sin = mm_refs[k + 1][...], mm_refs[k + 2][...]
                zs = [_dot(hs[j].astype(cdtype), w_h)
                      + _dot(ptss[j], w_pts) + _dot(sins[j], w_sin) + b
                      for j in range(K)]
        elif last and perm_last:
            wn, bn = mm_refs[-2][...], mm_refs[-1][...]
            zs = [_dot(hs[j].astype(cdtype), wn) + bn for j in range(K)]
            F = zs[0].shape[1] - 1
            return ([jnp.maximum(z[:, :F], 0.0) for z in zs],
                    [z[:, F:F + 1] for z in zs])
        else:
            w = w_refs[li][...]
            b = b_refs[li][...]
            zs = [_dot(hs[j].astype(cdtype), w) + b for j in range(K)]
        if last:
            return ([jnp.maximum(z[:, 1:], 0.0) for z in zs],
                    [z[:, 0:1] for z in zs])
        hs = [jnp.maximum(z, 0.0) for z in zs]


def _trunk_feat(pts, aux3, w_refs, b_refs, skip, L3, cdtype, x_pre=None):
    """In-VMEM trunk forward → (feat [T,F] f32, density_raw [T,1]).
    x_pre: posenc computed OUTSIDE the kernel (streamed [T,3+6L]) — the
    in-kernel narrow-lane posenc build costs ~2 ms per 131k rows (60% of
    the old forward; mxu_probe r3), while the matmul chain itself runs at
    ~180 TFLOPs."""
    x = _posenc_rows(pts, L3, aux3[0], aux3[1]) if x_pre is None else x_pre
    x = x.astype(cdtype)
    h = x
    n = len(w_refs)
    dens = None
    for li in range(n):
        if li in skip:
            h = jnp.concatenate([h, x], axis=-1)
        h = _dot(h.astype(cdtype), w_refs[li][...]) + b_refs[li][...]
        if li == n - 1:
            dens = h[:, 0:1]
            h = h[:, 1:]
        h = jnp.maximum(h, 0.0)
    return h, dens


def _heads_forward(feat, ray_enc, pts, light, trans, wr, br, wt, bt, cdtype,
                   want_acts=False, w_pack=None, split=False):
    """Both heads on a row slice.  w_pack (optional, [Fr+Ft, 3+5]) is the
    block-diagonal packing of the two tiny-N final layers — ONE MXU issue
    instead of two, with the same padded cost (both N=3 and N=5 pad to a
    128-lane tile anyway).

    split=True: the concat-free layer-0 form (mirrors the trunk's
    matmul-form posenc fix).  wr[0] is the (w_feat, w_encpts) ref pair,
    ray_enc is the streamed [T, E+3] (enc ⊕ pts) block, and light/trans
    are the PRE-MATMULED per-image rows light@W_l / trans@W_t ([1, O],
    computed once per step in XLA) — layer 0 becomes two MXU issues plus
    a broadcast row add: no [T,334]/[T,272] concat builds, no [T,48]
    latent broadcasts, and backward skips both heads' layer-0 dX issues
    entirely (d_latent falls out of the row-sum of dz0)."""
    T = feat.shape[0]
    acts = {}
    nr = len(wr)
    nt = len(wt)
    if split:
        z = (_dot(feat.astype(cdtype), wr[0][0][...])
             + _dot(ray_enc.astype(cdtype), wr[0][1][...])
             + light + br[0][...])
        acts["rz0"] = z
        h = jnp.maximum(z, 0.0)
        r_lo = 1
    else:
        a0 = jnp.concatenate(
            [feat, ray_enc, pts,
             jnp.broadcast_to(light, (T, light.shape[-1]))], axis=-1)
        acts["a0"] = a0
        h = a0
        r_lo = 0
    n_hidden_r = nr - 1 if w_pack is not None else nr
    for li in range(r_lo, n_hidden_r):
        z = _dot(h.astype(cdtype), wr[li][...]) + br[li][...]
        if li != nr - 1:
            acts[f"rz{li}"] = z
            h = jnp.maximum(z, 0.0)
        else:
            rgb_raw = z
    h_rgb_last = h
    if split:
        z = (_dot(feat.astype(cdtype), wt[0][...])
             + trans + bt[0][...])
        acts["tz0"] = z
        h = jnp.maximum(z, 0.0)
        t_lo = 1
    else:
        t0 = jnp.concatenate(
            [feat, jnp.broadcast_to(trans, (T, trans.shape[-1]))], axis=-1)
        acts["t0"] = t0
        h = t0
        t_lo = 0
    n_hidden_t = nt - 1 if w_pack is not None else nt
    for li in range(t_lo, n_hidden_t):
        z = _dot(h.astype(cdtype), wt[li][...]) + bt[li][...]
        if li != nt - 1:
            acts[f"tz{li}"] = z
            h = jnp.maximum(z, 0.0)
        else:
            trans_raw = z
    if w_pack is not None:
        x_pack = jnp.concatenate([h_rgb_last, h], axis=-1)
        acts["x_pack"] = x_pack
        z = _dot(x_pack.astype(cdtype), w_pack[...])
        Cr = br[nr - 1].shape[-1]
        rgb_raw = z[:, :Cr] + br[nr - 1][...]
        trans_raw = z[:, Cr:] + bt[nt - 1][...]
    if want_acts:
        return rgb_raw, trans_raw, acts
    return rgb_raw, trans_raw


# ------------------------------------------------------------------ forward

def _fwd_kernel(L3, skip, nr, nt, n_trunk, tiles_per_img, cdtype, subtiles,
                fullblock, packed, enc_mode, split, ilp,
                heads_fullblock, pts_ref,
                enc_ref, aux3_ref, light_ref, trans_ref, *refs):
    # split: enc_ref streams [tile, E+3] (enc ⊕ pts); light_ref/trans_ref
    # carry the pre-matmuled [B, O] latent rows (see _heads_forward)
    # enc_mode: "kernel" (legacy in-kernel elementwise posenc), "outside"
    # (posenc streamed from XLA; refs[0] = [tile, 3+6L] rows), "matmul"
    # (refs[0] = make_posenc_mm_aux constants + split weight pieces;
    # see _trunk_feat_mm), "sinext" (refs[0] = streamed [tile, 6L] weighted
    # sin bands from make_sinw + the same split weight pieces)
    enc_extra = refs[0] if enc_mode != "kernel" else None
    refs = refs[1:] if enc_mode != "kernel" else refs
    mm_refs = None
    mm_form = enc_mode in ("matmul", "sinext", "xext")
    perm_last = mm_form and (n_trunk - 1) not in skip
    if mm_form:
        base_mm = (1 + 2 * len(skip)) if enc_mode == "xext" \
            else (2 + 3 * len(skip))
        n_mm = base_mm + (2 if perm_last else 0)
        mm_refs = refs[:n_mm]
        refs = refs[n_mm:]
    wf = refs[:n_trunk]
    bf = refs[n_trunk:2 * n_trunk]
    o = 2 * n_trunk
    if split:
        # rgb layer 0 arrives as the (w_feat, w_encpts) pair
        wr = ((refs[o], refs[o + 1]),) + tuple(refs[o + 2:o + nr + 1])
        o += nr + 1
    else:
        wr = refs[o:o + nr]
        o += nr
    br = refs[o:o + nr]
    wt = refs[o + nr:o + nr + nt]
    bt = refs[o + nr + nt:o + nr + 2 * nt]
    w_pack = refs[o + nr + 2 * nt] if packed else None
    rgb_ref, dens_ref, transr_ref, feat_ref = refs[-4:]

    # split+xext: the trunk consumes the xext stream and the heads the
    # enc⊕pts stream — pts_ref is a [1,1] placeholder (dead stream removed)
    drop_pts = split and enc_mode == "xext"
    S = enc_ref.shape[0] // subtiles
    def trunk(pts_blk, sl=None):
        if mm_form:
            sinw_pre = x_pre = None
            if enc_mode in ("sinext", "xext"):
                blk = (enc_extra[...] if sl is None
                       else enc_extra[sl, :])
                if enc_mode == "sinext":
                    sinw_pre = blk
                else:
                    x_pre = blk
            return _trunk_feat_mm(
                pts_blk, enc_extra if enc_mode == "matmul" else None,
                wf, bf, skip, cdtype,
                mm_refs=mm_refs, perm_last=perm_last,
                sinw_pre=sinw_pre, x_pre=x_pre)
        x_pre = None
        if enc_mode == "outside":
            x_pre = (enc_extra[...] if sl is None
                     else enc_extra[sl, :]).astype(cdtype)
        return _trunk_feat(pts_blk, aux3_ref, wf, bf, skip, L3, cdtype,
                           x_pre=x_pre)

    if fullblock:
        # the trunk has no per-image dependence: run its 9 matmuls ONCE on
        # the whole streamed block (fewer, larger MXU issues); only the
        # latent-conditioned heads need the per-image subtile loop
        feat_all, dens_all = trunk(None if drop_pts else pts_ref[...])
        dens_ref[...] = dens_all
        feat_ref[...] = feat_all.astype(feat_ref.dtype)
    elif ilp:
        # layer-outer emission over the independent subtile chains (see
        # _trunk_feat_mm_multi); only valid for the streamed enc modes
        blks = [(None if drop_pts else pts_ref[slice(k * S, (k + 1) * S),
                                              :],
                 enc_extra[slice(k * S, (k + 1) * S), :])
                for k in range(subtiles)]
        feats, denss = _trunk_feat_mm_multi(blks, wf, bf, skip, cdtype,
                                            mm_refs, perm_last,
                                            enc_mode == "xext")
    blk_feats = []
    for k in range(subtiles):
        sl = slice(k * S, (k + 1) * S)
        # latent tables live whole in VMEM (tiny); slice this tile's row
        img = (pl.program_id(0) * subtiles + k) // tiles_per_img
        light = light_ref[pl.ds(img, 1), :]
        trans = trans_ref[pl.ds(img, 1), :]
        pts = None if drop_pts else pts_ref[sl, :]
        if fullblock:
            feat = feat_all[sl, :].astype(jnp.float32)
        elif ilp:
            feat = feats[k]
            dens_ref[sl, :] = denss[k]
            feat_ref[sl, :] = feat.astype(feat_ref.dtype)
        else:
            feat, dens = trunk(pts, sl)
            dens_ref[sl, :] = dens
            feat_ref[sl, :] = feat.astype(feat_ref.dtype)
        if heads_fullblock:
            # defer the heads: the trunk keeps its (measured-best)
            # per-subtile chains, the heads run ONCE on the full tile
            blk_feats.append(feat)
            continue
        rgb_raw, trans_raw = _heads_forward(
            feat, enc_ref[sl, :], pts, light, trans, wr, br, wt, bt, cdtype,
            w_pack=w_pack, split=split)
        rgb_ref[sl, :] = rgb_raw
        transr_ref[sl, :] = trans_raw
    if heads_fullblock:
        # split mode only: latents are additive per-image rows → issue each
        # head matmul once per grid step instead of once per subtile
        i0 = pl.program_id(0) * subtiles
        if tiles_per_img % subtiles == 0:
            # every subtile of this grid step lies in ONE image
            # (rows_per_img % streamed-tile == 0, the production case):
            # one latent row + feat read back from the just-written output
            # ref — no [tile,O] broadcast/concat builds at all
            img = i0 // tiles_per_img
            light = light_ref[pl.ds(img, 1), :]
            trans = trans_ref[pl.ds(img, 1), :]
            feat = feat_ref[...]
        else:
            def _lat_blk(ref):
                if subtiles == 1:
                    return jnp.broadcast_to(
                        ref[pl.ds(i0 // tiles_per_img, 1), :],
                        (S, ref.shape[1]))
                return jnp.concatenate(
                    [jnp.broadcast_to(
                        ref[pl.ds((i0 + j) // tiles_per_img, 1), :],
                        (S, ref.shape[1])) for j in range(subtiles)],
                    axis=0)

            light = _lat_blk(light_ref)
            trans = _lat_blk(trans_ref)
            feat = blk_feats[0] if subtiles == 1 \
                else jnp.concatenate(blk_feats, axis=0)
        rgb_raw, trans_raw = _heads_forward(
            feat, enc_ref[...], None if drop_pts else pts_ref[...],
            light, trans, wr, br, wt, bt, cdtype, w_pack=w_pack,
            split=split)
        rgb_ref[...] = rgb_raw
        transr_ref[...] = trans_raw


# ----------------------------------------------------------------- backward

def _bwd_kernel(nr, nt, B, tiles_per_img, cdtype, subtiles, packed, split,
                fullblock, feat_ref, enc_ref, pts_ref, light_ref, trans_ref,
                g_rgb_ref, g_trans_ref, *refs):
    # split mode (see _heads_forward): enc_ref streams [tile, E+3]
    # (enc ⊕ pts), light_ref/trans_ref carry the [B,O] latent rows, the
    # rgb layer-0 weight arrives as a (w_feat, w_encpts) pair, BOTH heads'
    # layer-0 dX issues are skipped (no consumer: the trunk is frozen and
    # d_latent is the per-image row-sum of dz0), and the d_light/d_trans
    # slots accumulate [B,O] dz0 row-sums finished off in XLA
    nR = nr + 1 if split else nr
    if split:
        wr = ((refs[0], refs[1]),) + tuple(refs[2:nR])
    else:
        wr = refs[:nR]
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
    # fullblock (split mode only): the latents enter layer 0 as ADDITIVE
    # per-image rows, so the head recompute + dW/dX chain runs ONCE on the
    # full streamed tile — half the matmul issues of the per-subtile loop —
    # while the per-image latent row-sums stay subtile-resolved below.
    n_blk = 1 if fullblock else subtiles
    Sb = feat_ref.shape[0] // n_blk
    for k in range(n_blk):
        sl = slice(k * Sb, (k + 1) * Sb)
        if fullblock and tiles_per_img % subtiles == 0:
            # every subtile of this grid step lies in ONE image
            # (rows_per_img % streamed-tile == 0, the production case):
            # single latent row, single-image latent-grad row-sum below
            img = (i * subtiles) // tiles_per_img
            light = light_ref[pl.ds(img, 1), :]
            trans = trans_ref[pl.ds(img, 1), :]
        elif fullblock:
            def _lat_blk(ref):
                return jnp.concatenate(
                    [jnp.broadcast_to(
                        ref[pl.ds((i * subtiles + j) // tiles_per_img, 1),
                            :], (S, ref.shape[1]))
                     for j in range(subtiles)], axis=0) \
                    if subtiles > 1 else jnp.broadcast_to(
                        ref[pl.ds(i // tiles_per_img, 1), :],
                        (S, ref.shape[1]))
            light = _lat_blk(light_ref)
            trans = _lat_blk(trans_ref)
            img = None
        else:
            img = (i * subtiles + k) // tiles_per_img
            light = light_ref[pl.ds(img, 1), :]
            trans = trans_ref[pl.ds(img, 1), :]
        feat = feat_ref[sl, :].astype(jnp.float32)
        # split mode: pts rides the enc⊕pts stream (pts_ref is a [1,1]
        # placeholder, see _run_bwd)
        pts = None if split else pts_ref[sl, :]
        rayenc = enc_ref[sl, :]

        _, _, acts = _heads_forward(feat, rayenc, pts, light, trans,
                                    wr, br, wt, bt, cdtype, want_acts=True,
                                    w_pack=w_pack, split=split)
        g_rgb = g_rgb_ref[sl, :].astype(jnp.float32)
        g_tr = g_trans_ref[sl, :].astype(jnp.float32)
        dz0_rgb, dz0_tr, dlight, dtrans = _heads_bwd_subtile(
            acts, feat, rayenc, pts, g_rgb, g_tr, wr, br, wt, bt, w_pack,
            scratch, nr, nt, cdtype, split, packed)

        if fullblock and img is None:
            # per-image latent grads: subtile-resolved row sums of dz0
            for j in range(subtiles):
                ssl = slice(j * S, (j + 1) * S)
                img_j = (i * subtiles + j) // tiles_per_img
                scratch[-2][...] += jnp.where(
                    row == img_j,
                    jnp.sum(dz0_rgb[ssl], axis=0, keepdims=True), 0.0)
                scratch[-1][...] += jnp.where(
                    row == img_j,
                    jnp.sum(dz0_tr[ssl], axis=0, keepdims=True), 0.0)
        else:
            scratch[-2][...] += jnp.where(row == img, dlight, 0.0)
            scratch[-1][...] += jnp.where(row == img, dtrans, 0.0)

    @pl.when(i == n_prog - 1)
    def _():
        for o, s in zip(outs, scratch):
            o[...] = s[...]


def _heads_bwd_subtile(acts, feat, rayenc, pts, g_rgb, g_tr, wr, br, wt, bt,
                       w_pack, scratch, nr, nt, cdtype, split, packed):
    """Backward of both heads for ONE compute subtile: accumulates dW/db
    into the VMEM scratch slots (the _run_bwd output layout) and returns
    (dz0_rgb, dz0_tr, dlight, dtrans) — the layer-0 cotangents (split mode;
    None otherwise) and this subtile's latent-grad row-sums.  Shared by
    the ST-field bwd kernel and the field+composite mega-kernel
    (fused_st_render.py)."""
    nR = nr + 1 if split else nr

    def r_slot(li):
        return li + 1 if (split and li >= 1) else li

    t_base = nR + nr
    dz0_rgb = dz0_tr = None
    if packed:
        # both tiny-N final layers in ONE dW issue + ONE dX issue on the
        # block-diagonal packing (off-diagonal dW blocks are grads of
        # structural zeros — discarded)
        Fr = wr[nr - 1].shape[0]
        Cr = wr[nr - 1].shape[1]
        g_pack = jnp.concatenate([g_rgb, g_tr], axis=-1)
        dwp = _dot_t1(acts["x_pack"].astype(cdtype),
                      g_pack.astype(cdtype))
        scratch[r_slot(nr - 1)][...] += dwp[:Fr, :Cr]
        scratch[nR + nr - 1][...] += jnp.sum(g_rgb, axis=0,
                                             keepdims=True)
        scratch[t_base + nt - 1][...] += dwp[Fr:, Cr:]
        scratch[t_base + nt + nt - 1][...] += jnp.sum(g_tr, axis=0,
                                                      keepdims=True)
        dx = _dot_t2(g_pack.astype(cdtype), w_pack[...])
        g_rgb = dx[:, :Fr] * (acts[f"rz{nr-2}"] > 0)
        g_tr = dx[:, Fr:] * (acts[f"tz{nt-2}"] > 0)
        start_r, start_t = nr - 2, nt - 2
    else:
        start_r, start_t = nr - 1, nt - 1

    # ---- rgb head backward ----
    g = g_rgb
    hs = [acts.get("a0")] + [jnp.maximum(acts[f"rz{k}"], 0.0)
                             for k in range(nr - 1)]
    for li in range(start_r, 0, -1):
        scratch[r_slot(li)][...] += _dot_t1(hs[li].astype(cdtype),
                                            g.astype(cdtype))
        scratch[nR + li][...] += jnp.sum(g, axis=0, keepdims=True)
        g = _dot_t2(g.astype(cdtype), wr[li][...])
        g = g * (acts[f"rz{li-1}"] > 0)
    # layer 0: g is dz0
    scratch[nR][...] += jnp.sum(g, axis=0, keepdims=True)      # bias
    if split:
        scratch[0][...] += _dot_t1(feat.astype(cdtype),
                                   g.astype(cdtype))
        scratch[1][...] += _dot_t1(rayenc.astype(cdtype),
                                   g.astype(cdtype))
        # d_latent = per-image row-sum of dz0, finished in XLA
        dz0_rgb = g
        dlight = jnp.sum(g, axis=0, keepdims=True)             # [1,O]
    else:
        scratch[0][...] += _dot_t1(hs[0].astype(cdtype),
                                   g.astype(cdtype))
        g = _dot_t2(g.astype(cdtype), wr[0][...])
        off = feat.shape[1] + rayenc.shape[1] + pts.shape[1]
        dlight = jnp.sum(g[:, off:], axis=0, keepdims=True)   # [1,48]

    # ---- transient head backward ----
    g = g_tr
    hs = [acts.get("t0")] + [jnp.maximum(acts[f"tz{k}"], 0.0)
                             for k in range(nt - 1)]
    for li in range(start_t, 0, -1):
        scratch[t_base + li][...] += _dot_t1(hs[li].astype(cdtype),
                                             g.astype(cdtype))
        scratch[t_base + nt + li][...] += jnp.sum(g, axis=0,
                                                  keepdims=True)
        g = _dot_t2(g.astype(cdtype), wt[li][...])
        g = g * (acts[f"tz{li-1}"] > 0)
    scratch[t_base + nt][...] += jnp.sum(g, axis=0, keepdims=True)
    if split:
        scratch[t_base][...] += _dot_t1(feat.astype(cdtype),
                                        g.astype(cdtype))
        dz0_tr = g
        dtrans = jnp.sum(g, axis=0, keepdims=True)             # [1,O]
    else:
        scratch[t_base][...] += _dot_t1(hs[0].astype(cdtype),
                                        g.astype(cdtype))
        g = _dot_t2(g.astype(cdtype), wt[0][...])
        dtrans = jnp.sum(g[:, feat.shape[1]:], axis=0, keepdims=True)
    return dz0_rgb, dz0_tr, dlight, dtrans


# --------------------------------------------------------------- pallas_call

def _row_spec(tile, c):
    return pl.BlockSpec((tile, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)





def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _build_w_pack(rgb_w, tr_w, cdtype):
    """Block-diagonal [Fr+Ft, Cr+Ct] packing of both heads' final layers."""
    wr_last, wt_last = rgb_w[-1], tr_w[-1]
    Fr, Cr = wr_last.shape
    Ft, Ct = wt_last.shape
    top = jnp.concatenate([wr_last, jnp.zeros((Fr, Ct), wr_last.dtype)], 1)
    bot = jnp.concatenate([jnp.zeros((Ft, Cr), wt_last.dtype), wt_last], 1)
    return jnp.concatenate([top, bot], 0).astype(cdtype)


def _split_head_l0(rgb_w0, tr_w0, F, E, cdtype):
    """Trace-time row-split of both heads' layer-0 weights (split mode).

    rgb_w0 rows are [feat(F) | enc(E) | pts(3) | light(Dl)] (the a0 concat
    order of _heads_forward); tr_w0 rows are [feat(F) | trans(Dt)].
    Returns (w_f [F,O], w_ep [E+3,O]) in cdtype for the kernel plus the
    latent blocks (w_l [Dl,O], w_t [Dt,O]) consumed in XLA."""
    assert rgb_w0.shape[0] > F + E + 3 and tr_w0.shape[0] > F, \
        (rgb_w0.shape, tr_w0.shape, F, E)
    return (rgb_w0[:F].astype(cdtype), rgb_w0[F:F + E + 3].astype(cdtype),
            rgb_w0[F + E + 3:], tr_w0[F:])


def _latent_rows(light_rows, trans_rows, w_l, w_t, cdtype):
    """Pre-matmuled per-image latent rows ([B,O] f32): exactly the latent
    columns' contribution to each head's layer-0 matmul, computed ONCE per
    step in XLA instead of per-row in-kernel."""
    lrow = jax.lax.dot_general(
        light_rows.astype(cdtype), w_l.astype(cdtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    trow = jax.lax.dot_general(
        trans_rows.astype(cdtype), w_t.astype(cdtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return lrow, trow


def _run_fwd(pts, ray_enc, light_rows, trans_rows, trunk_w, trunk_b,
             rgb_w, rgb_b, tr_w, tr_b, aux3, skip, L3, tile, rows_per_img,
             cdtype, interpret, subtiles=1, fullblock=False, packed=False,
             enc_mode="kernel", enc_extra=None,
             split=False, ilp=False, heads_fullblock=False):
    # `tile` rows stream per grid step; compute runs on tile/subtiles-row
    # slices (narrow VMEM intermediates, fewer grid steps → less per-step
    # pipeline overhead)
    sub = tile // subtiles
    tiles_per_img = rows_per_img // sub
    if rows_per_img % sub or tiles_per_img <= 0:
        raise ValueError(
            f"fused_st fwd: rows_per_img={rows_per_img} must be a positive "
            f"multiple of the compute subtile {sub} (tile={tile}, "
            f"subtiles={subtiles}) — per-image latent indexing would be "
            f"silently wrong otherwise")
    M = pts.shape[0]
    n_trunk, nr, nt = len(trunk_w), len(rgb_w), len(tr_w)
    F = trunk_w[-1].shape[1] - 1
    E = ray_enc.shape[1]
    ilp = (bool(ilp) and enc_mode in ("sinext", "xext") and not fullblock
           and subtiles > 1)
    # heads_fullblock needs the additive-latent (split) layer-0 form
    heads_fullblock = bool(heads_fullblock) and split and subtiles > 1
    kernel = functools.partial(_fwd_kernel, L3, skip, nr, nt, n_trunk,
                               tiles_per_img, cdtype, subtiles, fullblock,
                               packed, enc_mode, split, ilp,
                               heads_fullblock)
    if split:
        # concat-free heads: stream enc ⊕ pts as one block IN THE COMPUTE
        # DTYPE (the kernel casts to cdtype before the matmul anyway —
        # identical math, half the stream bytes and materialization for
        # bf16 compute); hoist the latent contributions to per-image
        # [B,O] rows (XLA, once)
        wr_f, wr_ep, w_l, w_t = _split_head_l0(rgb_w[0], tr_w[0], F, E,
                                               cdtype)
        ray_enc = jnp.concatenate([ray_enc.astype(cdtype),
                                   pts.astype(cdtype)], axis=1)
        E = E + 3
        light_rows, trans_rows = _latent_rows(light_rows, trans_rows,
                                              w_l, w_t, cdtype)
    perm_last = (n_trunk - 1) not in skip
    mm_form = enc_mode in ("matmul", "sinext", "xext")
    base_mm = (1 + 2 * len(skip)) if enc_mode == "xext" \
        else (2 + 3 * len(skip))
    n_mm = (base_mm + (2 if perm_last else 0)) if mm_form else 0
    if enc_mode == "outside":
        enc_spec = [_row_spec(tile, enc_extra.shape[1])]
    elif enc_mode == "matmul":
        # tiny whole-VMEM constant table (+ the split weight pieces)
        enc_spec = [_full_spec()] * (1 + n_mm)
    elif enc_mode in ("sinext", "xext"):
        # streamed rows tile first, then the full-VMEM weight pieces
        enc_spec = [_row_spec(tile, enc_extra.shape[1])] \
            + [_full_spec()] * n_mm
    else:
        enc_spec = []
    # split+xext consumes pts only via the xext / enc⊕pts streams — the
    # raw pts stream would be dead weight; pass a [1,1] placeholder
    drop_pts = split and enc_mode == "xext"
    pts_arg = pts[:1, :1] if drop_pts else pts
    in_specs = ([_full_spec() if drop_pts else _row_spec(tile, 3),
                 _row_spec(tile, E), _full_spec(),
                 _full_spec(), _full_spec()]
                + enc_spec
                + [_full_spec()] * (2 * n_trunk + 2 * nr + 2 * nt
                                    + (1 if split else 0)
                                    + (1 if packed else 0)))
    out_specs = (_row_spec(tile, 3), _row_spec(tile, 1), _row_spec(tile, 5),
                 _row_spec(tile, F))
    # feat residual in the compute dtype: for bf16 compute this is EXACT
    # (head inputs are cast to bf16 anyway); for f32 compute keep f32
    out_shape = (jax.ShapeDtypeStruct((M, 3), jnp.float32),
                 jax.ShapeDtypeStruct((M, 1), jnp.float32),
                 jax.ShapeDtypeStruct((M, 5), jnp.float32),
                 jax.ShapeDtypeStruct((M, F), cdtype))
    trunk_wc = [w.astype(cdtype) for w in trunk_w]
    if split:
        rgb_wc = [wr_f, wr_ep] + [w.astype(cdtype) for w in rgb_w[1:]]
        tr_wc = [tr_w[0][:F].astype(cdtype)] \
            + [w.astype(cdtype) for w in tr_w[1:]]
    else:
        rgb_wc = [w.astype(cdtype) for w in rgb_w]
        tr_wc = [w.astype(cdtype) for w in tr_w]
    pack = [_build_w_pack(rgb_w, tr_w, cdtype)] if packed else []
    # measured on v5e (tools/bench_kernels.py): parallel fwd semantics force
    # tile ≤512 (extra in-flight VMEM) and net-lose vs sequential tile 1024
    # (3.98 vs 3.33 ms) — default OFF, switchable for future A/Bs
    import os
    par = os.environ.get("TEXPOSE_ST_FWD_PARALLEL", "0") != "0"
    if mm_form:
        split_fn = split_trunk_weights_x if enc_mode == "xext" \
            else split_trunk_weights_mm
        mm_parts = split_fn(
            trunk_wc, skip, 6 * L3,
            trunk_b=trunk_b if perm_last else None)
    else:
        mm_parts = []
    return pl.pallas_call(
        kernel, grid=(M // tile,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        # forward row tiles are independent → parallel grid semantics
        # (needs tile ≤512 to fit the extra in-flight buffering in VMEM)
        compiler_params=_compiler_params(interpret, parallel=par),
    )(pts_arg, ray_enc, aux3, light_rows, trans_rows,
      *([enc_extra] if enc_mode != "kernel" else []), *mm_parts,
      *trunk_wc, *trunk_b, *rgb_wc, *rgb_b, *tr_wc, *tr_b, *pack)


def _run_bwd(feat, ray_enc, pts, light_rows, trans_rows, rgb_w, rgb_b,
             tr_w, tr_b, g_rgb, g_trans, tile, rows_per_img, cdtype,
             interpret, subtiles=1, packed=False, split=False,
             fullblock=False):
    sub = tile // subtiles
    tiles_per_img = rows_per_img // sub
    if rows_per_img % sub or tiles_per_img <= 0:
        raise ValueError(
            f"fused_st bwd: rows_per_img={rows_per_img} must be a positive "
            f"multiple of the compute subtile {sub} (tile={tile}, "
            f"subtiles={subtiles}) — per-image latent grads would be "
            f"silently wrong otherwise")
    M = pts.shape[0]
    B = light_rows.shape[0]
    nr, nt = len(rgb_w), len(tr_w)
    F = feat.shape[1]
    E = ray_enc.shape[1]
    # fullblock needs the additive-latent (split) layer-0 form and only
    # changes anything when there is more than one subtile to merge
    fullblock = bool(fullblock) and split and subtiles > 1
    kernel = functools.partial(_bwd_kernel, nr, nt, B, tiles_per_img, cdtype,
                               subtiles, packed, split, fullblock)
    if split:
        wr_f, wr_ep, w_l, w_t = _split_head_l0(rgb_w[0], tr_w[0], F, E,
                                               cdtype)
        # compute-dtype stream (identical math — the kernel casts before
        # every matmul; half the bytes for bf16 compute)
        enc_in = jnp.concatenate([ray_enc.astype(cdtype),
                                  pts.astype(cdtype)], axis=1)
        E_in = E + 3
        light_in, trans_in = _latent_rows(light_rows, trans_rows, w_l, w_t,
                                          cdtype)
        rgb_wc = [wr_f, wr_ep] + [w.astype(cdtype) for w in rgb_w[1:]]
        tr_wc = [tr_w[0][:F].astype(cdtype)] \
            + [w.astype(cdtype) for w in tr_w[1:]]
        O = rgb_w[0].shape[1]
        w_shapes = ([(F, O), (E + 3, O)] + [w.shape for w in rgb_w[1:]],
                    [(F, tr_w[0].shape[1])] + [w.shape for w in tr_w[1:]])
        lat_shapes = ((B, O), (B, tr_w[0].shape[1]))
    else:
        enc_in, E_in = ray_enc, E
        light_in, trans_in = light_rows, trans_rows
        rgb_wc = [w.astype(cdtype) for w in rgb_w]
        tr_wc = [w.astype(cdtype) for w in tr_w]
        w_shapes = ([w.shape for w in rgb_w], [w.shape for w in tr_w])
        lat_shapes = ((B, light_rows.shape[1]), (B, trans_rows.shape[1]))
    # split mode: pts rides the enc⊕pts stream — the raw pts stream would
    # be dead weight; pass a [1,1] placeholder
    pts_arg = pts[:1, :1] if split else pts
    in_specs = ([_row_spec(tile, F), _row_spec(tile, E_in),
                 _full_spec() if split else _row_spec(tile, 3),
                 _full_spec(), _full_spec(),
                 _row_spec(tile, 3), _row_spec(tile, 5)]
                + [_full_spec()] * (len(rgb_wc) + nr + 2 * nt
                                    + (1 if packed else 0)))
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
    pack = [_build_w_pack(rgb_w, tr_w, cdtype)] if packed else []
    outs = pl.pallas_call(
        kernel, grid=(M // tile,), in_specs=in_specs, out_specs=out_specs,
        out_shape=tuple(out_shape), scratch_shapes=scratch,
        interpret=interpret,
        # fullblock's full-tile f32 activation chain overruns the 16M
        # default scoped budget by ~0.4M at the stock 512x2 tiling
        compiler_params=_compiler_params(
            interpret, vmem_limit_mb=20 if fullblock else None),
    )(feat, enc_in, pts_arg, light_in, trans_in, g_rgb, g_trans,
      *rgb_wc, *rgb_b, *tr_wc, *tr_b, *pack)
    if not split:
        return outs
    return _finish_split(outs, light_rows, trans_rows, w_l, w_t, nr, nt)


def _finish_split(outs, light_rows, trans_rows, w_l, w_t, nr, nt):
    """XLA assembly back to the original parameter layout (split mode):
    the latent blocks' dW rows and the [B,Dl]/[B,Dt] latent grads both
    fall out of the per-image dz0 row-sums (d_lrow/d_trow, the last two
    outputs).  Shared by _run_bwd and the mega-kernel's bwd."""
    outs = list(outs)
    nR = nr + 1
    d_lrow, d_trow = outs[-2], outs[-1]
    # tiny [B,O] finishes: full-f32 HIGHEST (a bf16 cast of the already
    # row-summed dz0 costs ~3x grad parity for zero measurable time)
    hi = jax.lax.Precision.HIGHEST
    dw_l = jax.lax.dot_general(
        light_rows.astype(jnp.float32), d_lrow,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=hi)
    dw_t = jax.lax.dot_general(
        trans_rows.astype(jnp.float32), d_trow,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=hi)
    d_light = jax.lax.dot_general(
        d_lrow, w_l.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=hi)
    d_trans = jax.lax.dot_general(
        d_trow, w_t.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=hi)
    dw_r0 = jnp.concatenate([outs[0], outs[1], dw_l], axis=0)
    dw_t0 = jnp.concatenate([outs[nR + nr], dw_t], axis=0)
    return tuple([dw_r0] + outs[2:nR]            # rgb weight grads
                 + outs[nR:nR + nr]              # rgb bias grads
                 + [dw_t0] + outs[nR + nr + 1:nR + nr + nt]
                 + outs[nR + nr + nt:nR + nr + 2 * nt]
                 + [d_light, d_trans])


# -------------------------------------------------------------- custom vjp

@functools.lru_cache(maxsize=None)
def _make_op(skip, L3, tile_fwd, tile_bwd, rows_per_img, cdtype, interpret,
             sub_fwd=1, sub_bwd=1, fullblock=False, packed=False,
             enc_mode="matmul", split=False, ilp=False,
             bwd_fullblock=False, heads_fullblock=False):
    """Build the differentiable fused op for a static config.

    Signature: f(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3)
      heads = {"rgb_w": tuple, "rgb_b": tuple, "tr_w": tuple, "tr_b": tuple}
      → (rgb_raw [M,3], density_raw [M,1], trans_raw [M,5])
    Gradients flow to heads and the latent rows only (trunk frozen,
    geometry not optimized in the texture stage).
    """

    def fwd_only(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3):
        if enc_mode == "matmul":
            # concat-free posenc (see make_posenc_mm_aux): the element-wise
            # build costs ~2 ms / 131k rows wherever it runs IN-KERNEL
            enc_extra = make_posenc_mm_aux(L3, aux3[1])
        elif enc_mode == "sinext":
            # f32-exact weighted sin bands built in XLA, streamed in (the
            # kernel keeps the split-weight matmul-form trunk)
            enc_extra = make_sinw(pts, L3, aux3[1], cdtype)
        elif enc_mode == "xext":
            # (pts, sin bands) folded into ONE streamed block — layer 0 /
            # skip run a single K=3+6L matmul (no K=3 issue)
            enc_extra = make_xext(pts, L3, aux3[1], cdtype)
        elif enc_mode == "outside":
            enc_extra = _posenc_rows(pts, L3, aux3[0], aux3[1])
        else:
            enc_extra = None
        out = _run_fwd(pts, ray_enc, light_rows, trans_rows,
                       trunk["w"], trunk["b"],
                       heads["rgb_w"], heads["rgb_b"],
                       heads["tr_w"], heads["tr_b"],
                       aux3, skip, L3, tile_fwd, rows_per_img, cdtype,
                       interpret, subtiles=sub_fwd, fullblock=fullblock,
                       packed=packed,
                       enc_mode=enc_mode, enc_extra=enc_extra, split=split,
                       ilp=ilp, heads_fullblock=heads_fullblock)
        return out

    @jax.custom_vjp
    def op(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3):
        rgb, dens, trans_raw, _ = fwd_only(heads, light_rows, trans_rows,
                                           pts, ray_enc, trunk, aux3)
        return rgb, dens, trans_raw

    def op_fwd(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3):
        rgb, dens, trans_raw, feat = fwd_only(heads, light_rows, trans_rows,
                                              pts, ray_enc, trunk, aux3)
        res = (heads, light_rows, trans_rows, pts, ray_enc, feat, trunk,
               aux3)
        return (rgb, dens, trans_raw), res

    def op_bwd(res, g):
        heads, light_rows, trans_rows, pts, ray_enc, feat, trunk, aux3 = res
        g_rgb, _, g_trans = g          # density_raw is frozen-trunk output
        outs = _run_bwd(feat, ray_enc, pts, light_rows, trans_rows,
                        heads["rgb_w"], heads["rgb_b"],
                        heads["tr_w"], heads["tr_b"],
                        g_rgb, g_trans, tile_bwd, rows_per_img, cdtype,
                        interpret, subtiles=sub_bwd, packed=packed,
                        split=split, fullblock=bwd_fullblock)
        nr, nt = len(heads["rgb_w"]), len(heads["tr_w"])
        d_heads = {
            "rgb_w": tuple(outs[:nr]),
            "rgb_b": tuple(o[0] for o in outs[nr:2 * nr]),
            "tr_w": tuple(outs[2 * nr:2 * nr + nt]),
            "tr_b": tuple(o[0] for o in outs[2 * nr + nt:2 * nr + 2 * nt]),
        }
        d_light, d_trans = outs[-2], outs[-1]
        zeros = jax.tree_util.tree_map(jnp.zeros_like, (pts, ray_enc, trunk,
                                                        aux3))
        return (d_heads, d_light, d_trans) + zeros

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_st_field(pts, ray_enc, light_rows, trans_rows, trunk_params,
                   head_params, aux3, skip, L3, rows_per_img,
                   tile_fwd=512, tile_bwd=512,
                   compute_dtype=jnp.bfloat16, interpret=False,
                   subtiles_fwd=None, subtiles_bwd=None, fullblock=None,
                   packed=None, enc_mode=None,
                   split_heads=None, trunk_ilp=None, bwd_fullblock=None,
                   heads_fullblock=None):
    """Differentiable fused ST-field.

    pts [M,3], ray_enc [M,E] (pre-encoded, c2f applied), light_rows [B,Dl],
    trans_rows [B,Dt]; rows_per_img = R·N (must divide by both tiles).
    Returns (rgb_raw [M,3], density_raw [M,1], trans_raw [M,5]).

    subtiles_{fwd,bwd}: stream tile*sub rows per grid step while computing
    on tile-row slices (fewer grid steps, same VMEM-width intermediates).
    Callers surface these as cfg.kernels.st_subtiles_{fwd,bwd}; when None
    the env knobs TEXPOSE_ST_SUBTILES_{FWD,BWD} apply (perf A/Bs).
    """
    # defaults measured on v5e (tools/perf_sweep.sh + bench_kernels):
    # fwd tile 512 x 4 subtiles (2048-row stream, narrow compute slices)
    # beat 1024x2 by ~3% isolated (3.28 vs 3.38 ms); bwd 512x2.  Streaming
    # more than 2048 rows exceeds the 16M scoped-VMEM limit.
    import os
    if subtiles_fwd is None:
        subtiles_fwd = os.environ.get("TEXPOSE_ST_SUBTILES_FWD", "4")
    if subtiles_bwd is None:
        subtiles_bwd = os.environ.get("TEXPOSE_ST_SUBTILES_BWD", "2")
    sub_fwd = int(subtiles_fwd)
    sub_bwd = int(subtiles_bwd)
    # A/B negative on v5e: whole-block trunk (one 2048-row matmul chain)
    # measured 3.40 vs 3.32 ms for the per-subtile trunk — wider live
    # intermediates cost more than the saved matmul issues.  Knob kept.
    if fullblock is None:
        fullblock = os.environ.get("TEXPOSE_ST_TRUNK_FULLBLOCK", "0") == "1"
    fullblock = bool(fullblock)
    # pack the two tiny-N final head layers (out 3 / out 5, each padding to
    # a 128-lane MXU tile) into ONE block-diagonal issue in fwd, bwd dW and
    # bwd dX — same padded cost, fewer matmul issues (the kernel is
    # compute-pipeline bound, CLAUDE.md r2 analysis)
    if packed is None:
        packed = os.environ.get("TEXPOSE_ST_PACK_HEADS", "1") == "1"
    packed = bool(packed) and len(head_params["mlp_rgb"]) >= 2 \
        and len(head_params["mlp_trans"]) >= 2
    # posenc mode: "xext" (pts folded into the streamed sin-band block —
    # layer 0/skip run one K=3+6L matmul; default, measured trunk-only
    # 1.53 vs 1.60 ms and fwd+bwd 4.31 vs 4.34 on v5e), "sinext"
    # (matmul-form trunk + XLA-built sin bands streamed in — no in-kernel
    # HIGHEST angle matmul), "matmul" (concat-free, fully in-kernel),
    # "outside" (full XLA posenc streamed in), "kernel" (legacy in-kernel
    # elementwise build).  Measured-dead modes were REMOVED in r4: int8
    # trunk (issue-latency-bound passes — dequant only adds ops; fwd 2.44
    # vs 2.25 ms) and "xin" (in-kernel VPU rebuild, +0.047 ms/step).
    if enc_mode is None:
        enc_mode = os.environ.get("TEXPOSE_ST_POSENC", "xext")
    assert enc_mode in ("kernel", "outside", "matmul", "sinext",
                        "xext"), enc_mode
    # concat-free layer-0 heads (see _heads_forward split): the latent
    # contributions hoist to per-image XLA rows and backward skips both
    # heads' layer-0 dX issues.  Requires ≥2 layers per head (layer 0
    # must not be the output layer).
    if split_heads is None:
        split_heads = os.environ.get("TEXPOSE_ST_SPLIT_HEADS", "1") == "1"
    split_heads = (bool(split_heads)
                   and len(head_params["mlp_rgb"]) >= 2
                   and len(head_params["mlp_trans"]) >= 2)
    # layer-outer trunk over the independent fwd subtile chains (MXU ILP
    # across chains instead of one latency-bound dependent chain); only
    # meaningful for the streamed enc modes with subtiles > 1
    if trunk_ilp is None:
        trunk_ilp = os.environ.get("TEXPOSE_ST_TRUNK_ILP", "0") == "1"
    trunk_ilp = bool(trunk_ilp)
    # bwd fullblock: run the head recompute + dW/dX chain on the FULL
    # streamed bwd tile (split mode makes the latents additive rows, so
    # only the per-image latent row-sums need subtile resolution) — half
    # the bwd matmul issues per grid step.  Default off pending A/B.
    if bwd_fullblock is None:
        bwd_fullblock = os.environ.get("TEXPOSE_ST_BWD_FULLBLOCK",
                                       "0") == "1"
    bwd_fullblock = bool(bwd_fullblock)
    # fwd heads fullblock: trunk keeps per-subtile chains (measured best)
    # but the heads run once per grid step on the full streamed tile.
    # Default off pending A/B.
    if heads_fullblock is None:
        heads_fullblock = os.environ.get("TEXPOSE_ST_HEADS_FULLBLOCK",
                                         "0") == "1"
    heads_fullblock = bool(heads_fullblock)
    M = pts.shape[0]
    if M % (int(tile_fwd) * sub_fwd):
        sub_fwd = 1
    if M % (int(tile_bwd) * sub_bwd):
        sub_bwd = 1
    trunk = {"w": tuple(lp["w"] for lp in trunk_params),
             "b": tuple(lp["b"] for lp in trunk_params)}
    heads = {"rgb_w": tuple(lp["w"] for lp in head_params["mlp_rgb"]),
             "rgb_b": tuple(lp["b"] for lp in head_params["mlp_rgb"]),
             "tr_w": tuple(lp["w"] for lp in head_params["mlp_trans"]),
             "tr_b": tuple(lp["b"] for lp in head_params["mlp_trans"])}
    op = _make_op(tuple(sorted(skip)), int(L3), int(tile_fwd) * sub_fwd,
                  int(tile_bwd) * sub_bwd, int(rows_per_img), compute_dtype,
                  bool(interpret), sub_fwd, sub_bwd, fullblock, packed,
                  enc_mode, split_heads, trunk_ilp,
                  bwd_fullblock, heads_fullblock)
    return op(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3)
