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


def _trunk_feat(pts, aux3, w_refs, b_refs, skip, L3, cdtype):
    """In-VMEM trunk forward → (feat [T,F] f32, density_raw [T,1])."""
    x = _posenc_rows(pts, L3, aux3[0], aux3[1]).astype(cdtype)
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
                   want_acts=False):
    T = feat.shape[0]
    a0 = jnp.concatenate(
        [feat, ray_enc, pts,
         jnp.broadcast_to(light, (T, light.shape[-1]))], axis=-1)
    acts = {"a0": a0}
    h = a0
    nr = len(wr)
    for li in range(nr):
        z = _dot(h.astype(cdtype), wr[li][...]) + br[li][...]
        if li != nr - 1:
            acts[f"rz{li}"] = z
            h = jnp.maximum(z, 0.0)
        else:
            rgb_raw = z
    t0 = jnp.concatenate(
        [feat, jnp.broadcast_to(trans, (T, trans.shape[-1]))], axis=-1)
    acts["t0"] = t0
    h = t0
    nt = len(wt)
    for li in range(nt):
        z = _dot(h.astype(cdtype), wt[li][...]) + bt[li][...]
        if li != nt - 1:
            acts[f"tz{li}"] = z
            h = jnp.maximum(z, 0.0)
        else:
            trans_raw = z
    if want_acts:
        return rgb_raw, trans_raw, acts
    return rgb_raw, trans_raw


# ------------------------------------------------------------------ forward

def _fwd_kernel(L3, skip, nr, nt, n_trunk, tiles_per_img, cdtype, subtiles,
                fullblock, pts_ref, enc_ref, aux3_ref, light_ref, trans_ref,
                *refs):
    wf = refs[:n_trunk]
    bf = refs[n_trunk:2 * n_trunk]
    wr = refs[2 * n_trunk:2 * n_trunk + nr]
    br = refs[2 * n_trunk + nr:2 * n_trunk + 2 * nr]
    wt = refs[2 * n_trunk + 2 * nr:2 * n_trunk + 2 * nr + nt]
    bt = refs[2 * n_trunk + 2 * nr + nt:2 * n_trunk + 2 * nr + 2 * nt]
    rgb_ref, dens_ref, transr_ref, feat_ref = refs[-4:]

    S = pts_ref.shape[0] // subtiles
    if fullblock:
        # the trunk has no per-image dependence: run its 9 matmuls ONCE on
        # the whole streamed block (fewer, larger MXU issues); only the
        # latent-conditioned heads need the per-image subtile loop
        feat_all, dens_all = _trunk_feat(pts_ref[...], aux3_ref, wf, bf,
                                         skip, L3, cdtype)
        dens_ref[...] = dens_all
        feat_ref[...] = feat_all.astype(feat_ref.dtype)
    for k in range(subtiles):
        sl = slice(k * S, (k + 1) * S)
        # latent tables live whole in VMEM (tiny); slice this tile's row
        img = (pl.program_id(0) * subtiles + k) // tiles_per_img
        light = light_ref[pl.ds(img, 1), :]
        trans = trans_ref[pl.ds(img, 1), :]
        pts = pts_ref[sl, :]
        if fullblock:
            feat = feat_all[sl, :].astype(jnp.float32)
        else:
            feat, dens = _trunk_feat(pts, aux3_ref, wf, bf, skip, L3,
                                     cdtype)
            dens_ref[sl, :] = dens
            feat_ref[sl, :] = feat.astype(feat_ref.dtype)
        rgb_raw, trans_raw = _heads_forward(
            feat, enc_ref[sl, :], pts, light, trans, wr, br, wt, bt, cdtype)
        rgb_ref[sl, :] = rgb_raw
        transr_ref[sl, :] = trans_raw


# ----------------------------------------------------------------- backward

def _bwd_kernel(nr, nt, B, tiles_per_img, cdtype, subtiles,
                feat_ref, enc_ref, pts_ref, light_ref, trans_ref,
                g_rgb_ref, g_trans_ref, *refs):
    wr = refs[:nr]
    br = refs[nr:2 * nr]
    wt = refs[2 * nr:2 * nr + nt]
    bt = refs[2 * nr + nt:2 * nr + 2 * nt]
    n_out = 2 * (nr + nt) + 2
    outs = refs[2 * (nr + nt):2 * (nr + nt) + n_out]
    scratch = refs[2 * (nr + nt) + n_out:]

    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        for s in scratch:
            s[...] = jnp.zeros_like(s)

    row = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    S = feat_ref.shape[0] // subtiles
    for k in range(subtiles):
        sl = slice(k * S, (k + 1) * S)
        img = (i * subtiles + k) // tiles_per_img
        feat = feat_ref[sl, :].astype(jnp.float32)
        pts = pts_ref[sl, :]
        rayenc = enc_ref[sl, :]
        light = light_ref[pl.ds(img, 1), :]
        trans = trans_ref[pl.ds(img, 1), :]

        _, _, acts = _heads_forward(feat, rayenc, pts, light, trans,
                                    wr, br, wt, bt, cdtype, want_acts=True)

        # ---- rgb head backward ----
        g = g_rgb_ref[sl, :].astype(jnp.float32)
        hs = [acts["a0"]] + [jnp.maximum(acts[f"rz{k}"], 0.0)
                             for k in range(nr - 1)]
        for li in range(nr - 1, -1, -1):
            scratch[li][...] += _dot_t1(hs[li].astype(cdtype),
                                        g.astype(cdtype))
            scratch[nr + li][...] += jnp.sum(g, axis=0, keepdims=True)
            g = _dot_t2(g.astype(cdtype), wr[li][...])
            if li > 0:
                g = g * (acts[f"rz{li-1}"] > 0)
        off = feat.shape[1] + rayenc.shape[1] + pts.shape[1]
        dlight = jnp.sum(g[:, off:], axis=0, keepdims=True)      # [1,48]

        # ---- transient head backward ----
        g = g_trans_ref[sl, :].astype(jnp.float32)
        hs = [acts["t0"]] + [jnp.maximum(acts[f"tz{k}"], 0.0)
                             for k in range(nt - 1)]
        base = 2 * nr
        for li in range(nt - 1, -1, -1):
            scratch[base + li][...] += _dot_t1(hs[li].astype(cdtype),
                                               g.astype(cdtype))
            scratch[base + nt + li][...] += jnp.sum(g, axis=0,
                                                    keepdims=True)
            g = _dot_t2(g.astype(cdtype), wt[li][...])
            if li > 0:
                g = g * (acts[f"tz{li-1}"] > 0)
        dtrans = jnp.sum(g[:, feat.shape[1]:], axis=0, keepdims=True)

        scratch[-2][...] += jnp.where(row == img, dlight, 0.0)
        scratch[-1][...] += jnp.where(row == img, dtrans, 0.0)

    @pl.when(i == n_prog - 1)
    def _():
        for o, s in zip(outs, scratch):
            o[...] = s[...]


# --------------------------------------------------------------- pallas_call

def _row_spec(tile, c):
    return pl.BlockSpec((tile, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)





def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _run_fwd(pts, ray_enc, light_rows, trans_rows, trunk_w, trunk_b,
             rgb_w, rgb_b, tr_w, tr_b, aux3, skip, L3, tile, rows_per_img,
             cdtype, interpret, subtiles=1, fullblock=False):
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
    kernel = functools.partial(_fwd_kernel, L3, skip, nr, nt, n_trunk,
                               tiles_per_img, cdtype, subtiles, fullblock)
    in_specs = ([_row_spec(tile, 3), _row_spec(tile, E), _full_spec(),
                 _full_spec(), _full_spec()]
                + [_full_spec()] * (2 * n_trunk + 2 * nr + 2 * nt))
    out_specs = (_row_spec(tile, 3), _row_spec(tile, 1), _row_spec(tile, 5),
                 _row_spec(tile, F))
    # feat residual in the compute dtype: for bf16 compute this is EXACT
    # (head inputs are cast to bf16 anyway); for f32 compute keep f32
    out_shape = (jax.ShapeDtypeStruct((M, 3), jnp.float32),
                 jax.ShapeDtypeStruct((M, 1), jnp.float32),
                 jax.ShapeDtypeStruct((M, 5), jnp.float32),
                 jax.ShapeDtypeStruct((M, F), cdtype))
    trunk_wc = [w.astype(cdtype) for w in trunk_w]
    rgb_wc = [w.astype(cdtype) for w in rgb_w]
    tr_wc = [w.astype(cdtype) for w in tr_w]
    # measured on v5e (tools/bench_kernels.py): parallel fwd semantics force
    # tile ≤512 (extra in-flight VMEM) and net-lose vs sequential tile 1024
    # (3.98 vs 3.33 ms) — default OFF, switchable for future A/Bs
    import os
    par = os.environ.get("TEXPOSE_ST_FWD_PARALLEL", "0") != "0"
    return pl.pallas_call(
        kernel, grid=(M // tile,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        # forward row tiles are independent → parallel grid semantics
        # (needs tile ≤512 to fit the extra in-flight buffering in VMEM)
        compiler_params=None if (interpret or not par)
        else pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(pts, ray_enc, aux3, light_rows, trans_rows,
      *trunk_wc, *trunk_b, *rgb_wc, *rgb_b, *tr_wc, *tr_b)


def _run_bwd(feat, ray_enc, pts, light_rows, trans_rows, rgb_w, rgb_b,
             tr_w, tr_b, g_rgb, g_trans, tile, rows_per_img, cdtype,
             interpret, subtiles=1):
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
    kernel = functools.partial(_bwd_kernel, nr, nt, B, tiles_per_img, cdtype,
                               subtiles)
    in_specs = ([_row_spec(tile, F), _row_spec(tile, E), _row_spec(tile, 3),
                 _full_spec(), _full_spec(),
                 _row_spec(tile, 3), _row_spec(tile, 5)]
                + [_full_spec()] * (2 * nr + 2 * nt))
    out_shape = ([jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in rgb_w]
                 + [jax.ShapeDtypeStruct((1,) + b.shape, jnp.float32)
                    for b in rgb_b]
                 + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in tr_w]
                 + [jax.ShapeDtypeStruct((1,) + b.shape, jnp.float32)
                    for b in tr_b]
                 + [jax.ShapeDtypeStruct((B, light_rows.shape[1]),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((B, trans_rows.shape[1]),
                                         jnp.float32)])
    out_specs = tuple(_full_spec() for _ in out_shape)
    scratch = [pltpu.VMEM(s.shape, jnp.float32) for s in out_shape]
    rgb_wc = [w.astype(cdtype) for w in rgb_w]
    tr_wc = [w.astype(cdtype) for w in tr_w]
    return pl.pallas_call(
        kernel, grid=(M // tile,), in_specs=in_specs, out_specs=out_specs,
        out_shape=tuple(out_shape), scratch_shapes=scratch,
        interpret=interpret,
    )(feat, ray_enc, pts, light_rows, trans_rows, g_rgb, g_trans,
      *rgb_wc, *rgb_b, *tr_wc, *tr_b)


# -------------------------------------------------------------- custom vjp

@functools.lru_cache(maxsize=None)
def _make_op(skip, L3, tile_fwd, tile_bwd, rows_per_img, cdtype, interpret,
             sub_fwd=1, sub_bwd=1, fullblock=False):
    """Build the differentiable fused op for a static config.

    Signature: f(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3)
      heads = {"rgb_w": tuple, "rgb_b": tuple, "tr_w": tuple, "tr_b": tuple}
      → (rgb_raw [M,3], density_raw [M,1], trans_raw [M,5])
    Gradients flow to heads and the latent rows only (trunk frozen,
    geometry not optimized in the texture stage).
    """

    def fwd_only(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3):
        out = _run_fwd(pts, ray_enc, light_rows, trans_rows,
                       trunk["w"], trunk["b"],
                       heads["rgb_w"], heads["rgb_b"],
                       heads["tr_w"], heads["tr_b"],
                       aux3, skip, L3, tile_fwd, rows_per_img, cdtype,
                       interpret, subtiles=sub_fwd, fullblock=fullblock)
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
                        interpret, subtiles=sub_bwd)
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
                   subtiles_fwd=None, subtiles_bwd=None, fullblock=None):
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
                  bool(interpret), sub_fwd, sub_bwd, fullblock)
    return op(heads, light_rows, trans_rows, pts, ray_enc, trunk, aux3)
