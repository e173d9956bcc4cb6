"""Pallas TPU kernel: fused static/transient composite (fwd AND bwd).

After the fused ST-field kernel produces raw per-sample outputs, the plain
XLA path still materializes [B,R,N,3,2] stacks, sigmoid/softplus tensors and
cumsum transmittance chains — plus all of their backward — in HBM
(~3 ms of "glue" around a 5.5 ms kernel at the production envelope,
tools/bench_decompose.py).  This kernel runs the whole dual-density
composite (reference layers/nerf_static_transient_light.py:168-212 —
activations, quadrature, transmittances, weighted sums) per ray-tile in
VMEM:

  inputs   raw field outputs as [BR, N] channel planes
  cumsums  exclusive-prefix/strict-suffix sums as triangular matmuls (MXU)
  outputs  one packed [BR, 16] per-ray buffer
  backward closed-form vjp (no residuals — everything recomputes from the
           same inputs), emitting d(rgb_raw) / d(trans_raw) planes for the
           field kernel's backward; the static density is frozen-trunk
           output and gets no gradient (reference :87-100,236-239).

Activation convention matches nn/fields.apply_nerf_st_fused: rgb = sigmoid,
density_trans / uncert = softplus, static density = softplus (the kernel is
only routed when cfg.arch.density_activ == "softplus").

Packed output columns:
  0-2 rgb | 3-5 rgb_static | 6-8 rgb_transient | 9 depth | 10 opacity
  11 opacity_static | 12 opacity_transient | 13 uncert
  14 sum_n softplus(trans_density_raw)  (transient-reg numerator) | 15 pad
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


def fused_composite_available():
    return _PALLAS_OK


N_OUT = 16


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _softplus(x):
    return jax.nn.softplus(x)


def _tri_excl(N, dtype=jnp.float32):
    """U[n,m] = 1 if n < m: x @ U = exclusive prefix sum along samples."""
    return jnp.asarray(np.triu(np.ones((N, N)), k=1), dtype)


def _tri_suffix(N, dtype=jnp.float32):
    """S[n,m] = 1 if n > m: (x @ S)[m] = Σ_{n>m} x_n (strict suffix sum)."""
    return jnp.asarray(np.tril(np.ones((N, N)), k=-1), dtype)


def _mm(x, t):
    return jax.lax.dot_general(x, t, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _forward_core(refs, min_uncert):
    """Shared forward recompute.  refs: (rgb0..2, t0..4, dens, dist, depth,
    tri_excl, tri_suf).  Returns every intermediate the fwd/bwd needs."""
    (r0, r1, r2, t0, t1, t2, t3, t4, dens, dist, depth,
     tri_e, tri_s) = refs
    cs = [_sigmoid(r0), _sigmoid(r1), _sigmoid(r2)]
    ct = [_sigmoid(t0), _sigmoid(t1), _sigmoid(t2)]
    dens_t = _softplus(t3)
    u = _softplus(t4)
    dens_s = _softplus(dens)

    sds = dens_s * dist
    sdt = dens_t * dist
    sd = sds + sdt

    T = jnp.exp(-_mm(sd, tri_e))
    T_s = jnp.exp(-_mm(sds, tri_e))
    T_t = jnp.exp(-_mm(sdt, tri_e))

    e_s = jnp.exp(-sds)
    e_t = jnp.exp(-sdt)
    e = jnp.exp(-sd)
    a_s = 1.0 - e_s
    a_t = 1.0 - e_t
    a = 1.0 - e

    ps = T * a_s
    pt = T * a_t
    p = T * a
    ws = T_s * a_s
    wt = T_t * a_t
    return dict(cs=cs, ct=ct, dens_t=dens_t, u=u, dist=dist, depth=depth,
                T=T, T_s=T_s, T_t=T_t, e_s=e_s, e_t=e_t, e=e,
                a_s=a_s, a_t=a_t, a=a, ps=ps, pt=pt, p=p, ws=ws, wt=wt,
                tri_s=tri_s)


def _fwd_cols(f, min_uncert):
    """Packed [TR, 16] forward columns from _forward_core intermediates —
    shared by the plane/flat pallas kernels here and the fused
    field+composite mega-kernel (fused_st_render.py)."""

    def rsum(x):
        return jnp.sum(x, axis=1, keepdims=True)

    cols = []
    for c in range(3):                                   # rgb (joint T)
        cols.append(rsum(f["ps"] * f["cs"][c] + f["pt"] * f["ct"][c]))
    for c in range(3):                                   # rgb_static (own T)
        cols.append(rsum(f["ws"] * f["cs"][c]))
    for c in range(3):                                   # rgb_transient
        cols.append(rsum(f["wt"] * f["ct"][c]))
    cols.append(rsum(f["ws"] * f["depth"]))              # depth
    cols.append(rsum(f["p"]))                            # opacity
    cols.append(rsum(f["ws"]))                           # opacity_static
    cols.append(rsum(f["wt"]))                           # opacity_transient
    cols.append(rsum(f["u"] * f["pt"]) + min_uncert)     # uncert
    cols.append(rsum(f["dens_t"]))                       # trans-reg numerator
    cols.append(jnp.zeros_like(cols[0]))                 # pad
    return jnp.concatenate(cols, axis=1)


def _bwd_cols(f, g, t3_plane, t4_plane):
    """Closed-form composite VJP from _forward_core intermediates and the
    packed [TR,16] cotangent: returns (d_rgb_cols [3×(TR,N)],
    d_tr_cols [5×(TR,N)]) — the raw-output gradients.  Shared by the
    plane/flat kernels and the mega-kernel."""

    def col(i):
        return g[:, i:i + 1]                             # [TR,1] broadcast

    g_rgb = [col(0), col(1), col(2)]
    g_rgbs = [col(3), col(4), col(5)]
    g_rgbt = [col(6), col(7), col(8)]
    g_op = col(10)
    g_opt = col(12)
    g_unc = col(13)
    g_treg = col(14)

    cs, ct = f["cs"], f["ct"]
    ps, pt, p, ws, wt = f["ps"], f["pt"], f["p"], f["ws"], f["wt"]
    T, T_t = f["T"], f["T_t"]
    dist, u = f["dist"], f["u"]
    tri_s = f["tri_s"]

    d_rgb_cols = []
    d_tr_cols = []
    # --- color grads (through sigmoid) ---
    for c in range(3):
        dcs = ps * g_rgb[c] + ws * g_rgbs[c]
        d_rgb_cols.append(dcs * cs[c] * (1.0 - cs[c]))   # d rgb_raw_c
        dct = pt * g_rgb[c] + wt * g_rgbt[c]
        d_tr_cols.append(dct * ct[c] * (1.0 - ct[c]))    # d trans_raw_c

    # --- transient density grad (traw3) ---
    # per-sample coefficients multiplying ps / pt / wt / p in the scalar loss
    F_ps = sum(cs[c] * g_rgb[c] for c in range(3))
    F_pt = sum(ct[c] * g_rgb[c] for c in range(3)) + u * g_unc
    F_wt = sum(ct[c] * g_rgbt[c] for c in range(3)) + g_opt
    F_p = g_op
    # local terms: d a_t = e_t, d a = e (per-sample); ps = T·a_s has no
    # local sdt term (a_s is frozen-static)
    d_sdt = F_pt * T * f["e_t"] + F_wt * T_t * f["e_t"] + F_p * T * f["e"]
    # transmittance terms: T_n (n>m) carries -1 per upstream sdt_m
    d_sdt = d_sdt - _mm(F_ps * ps + F_pt * pt + F_p * p, tri_s)  # through T
    d_sdt = d_sdt - _mm(F_wt * wt, tri_s)                        # through T_t
    # d sdt/d traw3 = dist * softplus'(traw3) = dist * sigmoid(traw3)
    d_tr_cols.append((d_sdt * dist + g_treg) * _sigmoid(t3_plane))

    # --- uncertainty grad (traw4) ---
    d_tr_cols.append(pt * g_unc * _sigmoid(t4_plane))
    return d_rgb_cols, d_tr_cols


def _fwd_kernel(min_uncert, *refs):
    ins, out_ref = refs[:-1], refs[-1]
    f = _forward_core([r[...] for r in ins], min_uncert)
    out_ref[...] = _fwd_cols(f, min_uncert)


def _bwd_kernel(min_uncert, *refs):
    ins = refs[:12]                                      # 11 planes + g
    tri_refs = refs[12:14]
    outs = refs[14:]                                     # 8 grad planes
    g = ins[11][...]                                     # [TR, 16]
    f = _forward_core([r[...] for r in ins[:11]] + [t[...] for t in tri_refs],
                      min_uncert)
    d_rgb_cols, d_tr_cols = _bwd_cols(f, g, ins[6][...], ins[7][...])
    for c in range(3):
        outs[c][...] = d_rgb_cols[c]
        outs[3 + c][...] = d_tr_cols[c]
    outs[6][...] = d_tr_cols[3]
    outs[7][...] = d_tr_cols[4]


def _row_spec(tile, c):
    return pl.BlockSpec((tile, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _fit_rays(tile, rays):
    """Largest power-of-two ≤ tile that divides rays.  Raises when no
    divisor ≥ 8 exists — a non-dividing tile would make the grid silently
    skip the tail rows (uninitialized output)."""
    t = min(tile, rays)
    while t >= 8 and rays % t:
        t //= 2
    if t < 8 or rays % t:
        raise ValueError(
            f"fused composite needs B*R divisible by a power of two >= 8; "
            f"got {rays}")
    return t


def _run_fwd(planes, N, min_uncert, tile_rays, interpret):
    BR = planes[0].shape[0]
    tr = _fit_rays(tile_rays, BR)
    kernel = functools.partial(_fwd_kernel, float(min_uncert))
    in_specs = [_row_spec(tr, N)] * 11 + [_full(), _full()]
    return pl.pallas_call(
        kernel, grid=(BR // tr,), in_specs=in_specs,
        out_specs=_row_spec(tr, N_OUT),
        out_shape=jax.ShapeDtypeStruct((BR, N_OUT), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*planes, _tri_excl(N), _tri_suffix(N))


def _run_bwd(planes, g, N, min_uncert, tile_rays, interpret):
    BR = planes[0].shape[0]
    tr = _fit_rays(tile_rays, BR)
    kernel = functools.partial(_bwd_kernel, float(min_uncert))
    in_specs = [_row_spec(tr, N)] * 11 + [_row_spec(tr, N_OUT),
                                          _full(), _full()]
    out_shape = tuple(jax.ShapeDtypeStruct((BR, N), jnp.float32)
                      for _ in range(8))
    out_specs = tuple(_row_spec(tr, N) for _ in range(8))
    return pl.pallas_call(
        kernel, grid=(BR // tr,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*planes, g, _tri_excl(N), _tri_suffix(N))


@functools.lru_cache(maxsize=None)
def _make_op(N, min_uncert, tile_rays, interpret):
    """Differentiable fused composite over channel planes.

    f(rgb3 [BR,N]x3, traw5 [BR,N]x5, dens [BR,N], dist [BR,N], depth [BR,N])
      -> packed [BR, 16]
    Gradients flow to the rgb/trans planes only.
    """

    @jax.custom_vjp
    def op(r0, r1, r2, t0, t1, t2, t3, t4, dens, dist, depth):
        return _run_fwd((r0, r1, r2, t0, t1, t2, t3, t4, dens, dist, depth),
                        N, min_uncert, tile_rays, interpret)

    def op_fwd(*planes):
        return op(*planes), planes

    def op_bwd(planes, g):
        grads = _run_bwd(planes, g, N, min_uncert, tile_rays, interpret)
        zeros = tuple(jnp.zeros_like(p) for p in planes[8:])
        return grads + zeros

    op.defvjp(op_fwd, op_bwd)
    return op


# ------------------------------------------------- flat-input variant

def _hi_dot(a, b, dims=(((1,), (0,)), ((), ()))):
    """Exact permutation matmul: the matrices are 0/1 so every output is
    one input element + zeros; HIGHEST keeps the product f32-exact (the
    bf16-rounded DEFAULT f32 path would round the data)."""
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _perm_extract(N, C):
    """[N·C, C·N] permutation: row n·C+c → column c·N+n.  x[TR, N·C] @ P
    yields the C channel planes CONTIGUOUS on lanes ([:, c·N:(c+1)·N])."""
    P = np.zeros((N * C, C * N), np.float32)
    for n in range(N):
        for c in range(C):
            P[n * C + c, c * N + n] = 1.0
    return jnp.asarray(P)


def _flat_planes(ref, perm_ref, C, TR, N):
    """In-kernel plane extraction from a [TR, N·C] row block (the FREE
    XLA reshape of the flat [M,C] array — a [TR·N, C] block would pad its
    C lanes to 128 in VMEM and blow the scoped budget 43×).  Mosaic can't
    lower the (TR,N·C)→(TR·N,C) vector reshape, so the de-interleave runs
    as ONE exact permutation matmul on the MXU (see _perm_extract) and
    the planes fall out as 64-aligned lane slices."""
    if C == 1:
        return [ref[...]]
    y = _hi_dot(ref[...], perm_ref[...])                    # [TR, C·N]
    return [y[:, c * N:(c + 1) * N] for c in range(C)]


def _flat_store(planes, perm_ref, C, TR, N):
    """Inverse of _flat_planes: C [TR,N] planes → one [TR, N·C]
    interleaved block via z @ Pᵀ (contract on P's columns)."""
    z = jnp.concatenate(planes, axis=1)                     # [TR, C·N]
    if C == 1:
        return z
    return _hi_dot(z, perm_ref[...], (((1,), (1,)), ((), ())))


def _fwd_kernel_flat(min_uncert, N, rgb_ref, tr_ref, dens_ref, dist_ref,
                     depth_ref, tri_e, tri_s, p3_ref, p5_ref, out_ref):
    TR = dist_ref.shape[0]
    planes = (_flat_planes(rgb_ref, p3_ref, 3, TR, N)
              + _flat_planes(tr_ref, p5_ref, 5, TR, N)
              + _flat_planes(dens_ref, None, 1, TR, N)
              + [dist_ref[...], depth_ref[...], tri_e[...], tri_s[...]])
    f = _forward_core(planes, min_uncert)
    out_ref[...] = _fwd_cols(f, min_uncert)


def _bwd_kernel_flat(min_uncert, N, rgb_ref, tr_ref, dens_ref, dist_ref,
                     depth_ref, g_ref, tri_e, tri_s, p3_ref, p5_ref,
                     drgb_ref, dtr_ref):
    TR = dist_ref.shape[0]
    planes = (_flat_planes(rgb_ref, p3_ref, 3, TR, N)
              + _flat_planes(tr_ref, p5_ref, 5, TR, N)
              + _flat_planes(dens_ref, None, 1, TR, N)
              + [dist_ref[...], depth_ref[...], tri_e[...], tri_s[...]])
    f = _forward_core(planes, min_uncert)
    d_rgb_cols, d_tr_cols = _bwd_cols(f, g_ref[...], planes[6], planes[7])
    drgb_ref[...] = _flat_store(d_rgb_cols, p3_ref, 3, TR, N)
    dtr_ref[...] = _flat_store(d_tr_cols, p5_ref, 5, TR, N)


def _run_fwd_flat(args, N, min_uncert, tile_rays, interpret):
    rgb_raw, trans_raw, dens_raw, dist, depth = args
    BR = dist.shape[0]
    tr = _fit_rays(tile_rays, BR)
    kernel = functools.partial(_fwd_kernel_flat, float(min_uncert), int(N))
    in_specs = [_row_spec(tr, N * 3), _row_spec(tr, N * 5),
                _row_spec(tr, N * 1), _row_spec(tr, N), _row_spec(tr, N),
                _full(), _full(), _full(), _full()]
    return pl.pallas_call(
        kernel, grid=(BR // tr,), in_specs=in_specs,
        out_specs=_row_spec(tr, N_OUT),
        out_shape=jax.ShapeDtypeStruct((BR, N_OUT), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(rgb_raw.reshape(BR, N * 3), trans_raw.reshape(BR, N * 5),
      dens_raw.reshape(BR, N), dist, depth, _tri_excl(N), _tri_suffix(N),
      _perm_extract(N, 3), _perm_extract(N, 5))


def _run_bwd_flat(args, g, N, min_uncert, tile_rays, interpret):
    rgb_raw, trans_raw, dens_raw, dist, depth = args
    BR = dist.shape[0]
    M = rgb_raw.shape[0]
    tr = _fit_rays(tile_rays, BR)
    kernel = functools.partial(_bwd_kernel_flat, float(min_uncert), int(N))
    in_specs = [_row_spec(tr, N * 3), _row_spec(tr, N * 5),
                _row_spec(tr, N * 1), _row_spec(tr, N), _row_spec(tr, N),
                _row_spec(tr, N_OUT), _full(), _full(), _full(), _full()]
    out_specs = (_row_spec(tr, N * 3), _row_spec(tr, N * 5))
    out_shape = (jax.ShapeDtypeStruct((BR, N * 3), jnp.float32),
                 jax.ShapeDtypeStruct((BR, N * 5), jnp.float32))
    d_rgb, d_tr = pl.pallas_call(
        kernel, grid=(BR // tr,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(rgb_raw.reshape(BR, N * 3), trans_raw.reshape(BR, N * 5),
      dens_raw.reshape(BR, N), dist, depth, g,
      _tri_excl(N), _tri_suffix(N), _perm_extract(N, 3),
      _perm_extract(N, 5))
    return d_rgb.reshape(M, 3), d_tr.reshape(M, 5)


@functools.lru_cache(maxsize=None)
def _make_op_flat(N, min_uncert, tile_rays, interpret):
    """Differentiable fused composite over FLAT [M,C] field outputs: the
    plane extraction runs in-kernel, so neither direction materializes
    [BR,N]-plane relayouts in XLA.  Gradients flow to rgb_raw/trans_raw
    as flat [M,3]/[M,5] — exactly the ST-field bwd kernel's input layout.
    f(rgb_raw [M,3], trans_raw [M,5], dens_raw [M,1], dist [BR,N],
      depth [BR,N]) -> packed [BR, 16]."""

    @jax.custom_vjp
    def op(rgb_raw, trans_raw, dens_raw, dist, depth):
        return _run_fwd_flat((rgb_raw, trans_raw, dens_raw, dist, depth),
                             N, min_uncert, tile_rays, interpret)

    def op_fwd(*args):
        return op(*args), args

    def op_bwd(args, g):
        d_rgb, d_tr = _run_bwd_flat(args, g, N, min_uncert, tile_rays,
                                    interpret)
        return (d_rgb, d_tr) + tuple(jnp.zeros_like(a) for a in args[2:])

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_composite_st(rgb_raw, trans_raw, dens_raw, depth_samples, ray,
                       min_uncert=0.05, tile_rays=256, interpret=False,
                       flat=None):
    """Fused dual-density composite from RAW field outputs.

    rgb_raw [BR·N, 3], trans_raw [BR·N, 5], dens_raw [BR·N, 1] (frozen),
    depth_samples [B,R,N,1], ray [B,R,3] → dict of [B,R,C] leaves:
    rgb, rgb_static, rgb_transient (C=3); depth, opacity, opacity_static,
    opacity_transient, uncert (C=1); plus 'trans_density_mean' scalar
    (mean_n softplus(trans density raw) — the transient-reg term).

    flat (TEXPOSE_COMPOSITE_FLAT=1 to enable; default off pending the
    on-TPU A/B): consume the flat [M,C] arrays directly and extract
    channel planes IN-KERNEL — removes the XLA-side [M,C]→[BR,N,C]→slice
    layout copies on the forward inputs AND emits flat [M,3]/[M,5]
    gradients that feed the ST-field bwd kernel with no re-interleave.
    In-kernel (TR·N,)→(TR,N) reshapes measured ~4.5 µs each on v5e.
    """
    import os
    if flat is None:
        flat = os.environ.get("TEXPOSE_COMPOSITE_FLAT", "0") == "1"
    B, R, N, _ = depth_samples.shape
    BR = B * R
    d = depth_samples.reshape(BR, N)
    ray_len = jnp.linalg.norm(ray, axis=-1).reshape(BR, 1)
    intv = jnp.concatenate([d[:, 1:] - d[:, :-1],
                            jnp.full_like(d[:, :1], 1e10)], axis=1)
    dist = intv * ray_len

    if flat:
        op = _make_op_flat(int(N), float(min_uncert), int(tile_rays),
                           bool(interpret))
        packed = op(rgb_raw, trans_raw, jax.lax.stop_gradient(dens_raw),
                    jax.lax.stop_gradient(dist), jax.lax.stop_gradient(d))
    else:
        def planes(x, C):
            x = x.reshape(BR, N, C)
            return [x[:, :, c] for c in range(C)]

        r0, r1, r2 = planes(rgb_raw, 3)
        t0, t1, t2, t3, t4 = planes(trans_raw, 5)
        (dens,) = planes(dens_raw, 1)

        op = _make_op(int(N), float(min_uncert), int(tile_rays),
                      bool(interpret))
        packed = op(r0, r1, r2, t0, t1, t2, t3, t4,
                    jax.lax.stop_gradient(dens), dist, d)

    return packed_to_dict(packed, B, R, N)


def packed_to_dict(packed, B, R, N):
    """Unpack the [BR,16] composite buffer into the render dict (shared by
    fused_composite_st and the field+composite mega-kernel)."""
    BR = B * R

    def out(lo, hi):
        return packed[:, lo:hi].reshape(B, R, hi - lo)

    return dict(
        rgb=out(0, 3), rgb_static=out(3, 6), rgb_transient=out(6, 9),
        depth=out(9, 10), opacity=out(10, 11), opacity_static=out(11, 12),
        opacity_transient=out(12, 13), uncert=out(13, 14),
        trans_density_mean=packed[:, 14].sum() / (BR * N),
    )
