"""Pallas TPU kernel: fused coarse (single-density) composite, fwd AND bwd.

The pretrain stage's plain XLA composite (ops/render.py:composite, matching
reference layers/nerf.py:117-134) materializes sigmoid/softplus tensors and
a cumsum transmittance chain — plus their backward — in HBM around the
fused coarse-field kernel.  This kernel mirrors kernels/fused_composite.py
for the vanilla-NeRF composite: activations, quadrature, transmittance and
weighted sums run per ray-tile in VMEM, with a closed-form VJP to BOTH
rgb_raw and density_raw (the pretrain trunk is trained, so density carries
gradient — unlike the ST kernel's frozen static density).

  inputs   raw field outputs as [BR, N] channel planes
  cumsums  exclusive-prefix / strict-suffix sums as triangular matmuls
  outputs  one packed [BR, 8] per-ray buffer
  backward closed-form (no residuals): for w_n = T_n·(1−e^{−s_n}) with
           s = σ·δ and per-sample loss coefficient G_n = Σ_c g_rgb_c·c_nc
           + g_depth·d_n + g_opacity,
             dL/ds = G·T·e^{−s} − suffix_sum(G·w)
           then d(dens_raw) = dL/ds · δ · sigmoid(dens_raw)  (softplus').

Activation convention matches nn/fields.apply_nerf_fused: rgb = sigmoid,
density = softplus (routed only when cfg.arch.density_activ == "softplus").
setbg_opaque stays an XLA epilogue on the packed outputs (its gradient
flows through the opacity column automatically).

Packed output columns: 0-2 rgb | 3 depth | 4 opacity | 5-7 pad
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    from ._params import compiler_params as _compiler_params
    from .fused_composite import (_tri_excl, _tri_suffix, _mm, _row_spec,
                                  _full, _fit_rays, _sigmoid, _softplus,
                                  _flat_planes, _flat_store, _perm_extract)
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def fused_composite_coarse_available():
    return _PALLAS_OK


N_OUT = 8


def _forward_core(refs):
    """refs: (r0, r1, r2, dens, dist, depth, tri_e, tri_s)."""
    r0, r1, r2, dens, dist, depth, tri_e, tri_s = refs
    cs = [_sigmoid(r0), _sigmoid(r1), _sigmoid(r2)]
    sig = _softplus(dens)
    sd = sig * dist
    T = jnp.exp(-_mm(sd, tri_e))
    e = jnp.exp(-sd)
    w = T * (1.0 - e)
    return dict(cs=cs, sd=sd, T=T, e=e, w=w, dist=dist, depth=depth,
                tri_s=tri_s)


def _fwd_kernel(*refs):
    ins, out_ref = refs[:-1], refs[-1]
    f = _forward_core([r[...] for r in ins])

    def rsum(x):
        return jnp.sum(x, axis=1, keepdims=True)

    cols = [rsum(f["w"] * f["cs"][c]) for c in range(3)]     # rgb
    cols.append(rsum(f["w"] * f["depth"]))                   # depth
    cols.append(rsum(f["w"]))                                # opacity
    z = jnp.zeros_like(cols[0])
    out_ref[...] = jnp.concatenate(cols + [z, z, z], axis=1)


def _bwd_kernel(*refs):
    ins = refs[:7]                                           # 6 planes + g
    tri_refs = refs[7:9]
    outs = refs[9:]                                          # 4 grad planes
    g = ins[6][...]                                          # [TR, 8]
    f = _forward_core([r[...] for r in ins[:6]]
                      + [t[...] for t in tri_refs])

    def col(i):
        return g[:, i:i + 1]                                 # [TR,1] bcast

    g_rgb = [col(0), col(1), col(2)]
    g_depth = col(3)
    g_op = col(4)

    cs, w, T, e = f["cs"], f["w"], f["T"], f["e"]
    dist, depth, tri_s = f["dist"], f["depth"], f["tri_s"]

    # --- color grads (through sigmoid) ---
    for c in range(3):
        outs[c][...] = w * g_rgb[c] * cs[c] * (1.0 - cs[c])

    # --- density grad (through softplus) ---
    G = sum(cs[c] * g_rgb[c] for c in range(3)) + depth * g_depth + g_op
    d_sd = G * T * e - _mm(G * w, tri_s)
    outs[3][...] = d_sd * dist * _sigmoid(ins[3][...])


def _run_fwd(planes, N, tile_rays, interpret):
    BR = planes[0].shape[0]
    tr = _fit_rays(tile_rays, BR)
    in_specs = [_row_spec(tr, N)] * 6 + [_full(), _full()]
    return pl.pallas_call(
        _fwd_kernel, grid=(BR // tr,), in_specs=in_specs,
        out_specs=_row_spec(tr, N_OUT),
        out_shape=jax.ShapeDtypeStruct((BR, N_OUT), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*planes, _tri_excl(N), _tri_suffix(N))


def _run_bwd(planes, g, N, tile_rays, interpret):
    BR = planes[0].shape[0]
    tr = _fit_rays(tile_rays, BR)
    in_specs = [_row_spec(tr, N)] * 6 + [_row_spec(tr, N_OUT),
                                         _full(), _full()]
    out_shape = tuple(jax.ShapeDtypeStruct((BR, N), jnp.float32)
                      for _ in range(4))
    out_specs = tuple(_row_spec(tr, N) for _ in range(4))
    return pl.pallas_call(
        _bwd_kernel, grid=(BR // tr,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*planes, g, _tri_excl(N), _tri_suffix(N))


@functools.lru_cache(maxsize=None)
def _make_op(N, tile_rays, interpret):
    """Differentiable fused coarse composite over channel planes.

    f(rgb3 [BR,N]x3, dens [BR,N], dist [BR,N], depth [BR,N])
      -> packed [BR, 8].  Gradients flow to rgb AND density planes.
    """

    @jax.custom_vjp
    def op(r0, r1, r2, dens, dist, depth):
        return _run_fwd((r0, r1, r2, dens, dist, depth), N, tile_rays,
                        interpret)

    def op_fwd(*planes):
        return op(*planes), planes

    def op_bwd(planes, g):
        grads = _run_bwd(planes, g, N, tile_rays, interpret)
        zeros = tuple(jnp.zeros_like(p) for p in planes[4:])
        return grads + zeros

    op.defvjp(op_fwd, op_bwd)
    return op


# ------------------------------------------------- flat-input variant

def _fwd_kernel_flat(N, rgb_ref, dens_ref, dist_ref, depth_ref, tri_e,
                     tri_s, p3_ref, out_ref):
    TR = dist_ref.shape[0]
    planes = (_flat_planes(rgb_ref, p3_ref, 3, TR, N)
              + _flat_planes(dens_ref, None, 1, TR, N)
              + [dist_ref[...], depth_ref[...], tri_e[...], tri_s[...]])
    f = _forward_core(planes)

    def rsum(x):
        return jnp.sum(x, axis=1, keepdims=True)

    cols = [rsum(f["w"] * f["cs"][c]) for c in range(3)]
    cols.append(rsum(f["w"] * f["depth"]))
    cols.append(rsum(f["w"]))
    z = jnp.zeros_like(cols[0])
    out_ref[...] = jnp.concatenate(cols + [z, z, z], axis=1)


def _bwd_kernel_flat(N, rgb_ref, dens_ref, dist_ref, depth_ref, g_ref,
                     tri_e, tri_s, p3_ref, drgb_ref, ddens_ref):
    TR = dist_ref.shape[0]
    planes = (_flat_planes(rgb_ref, p3_ref, 3, TR, N)
              + _flat_planes(dens_ref, None, 1, TR, N)
              + [dist_ref[...], depth_ref[...], tri_e[...], tri_s[...]])
    f = _forward_core(planes)
    g = g_ref[...]

    def col(i):
        return g[:, i:i + 1]

    g_rgb = [col(0), col(1), col(2)]
    g_depth = col(3)
    g_op = col(4)
    cs, w, T, e = f["cs"], f["w"], f["T"], f["e"]
    dist, depth, tri_s_v = f["dist"], f["depth"], f["tri_s"]

    drgb_ref[...] = _flat_store(
        [w * g_rgb[c] * cs[c] * (1.0 - cs[c]) for c in range(3)],
        p3_ref, 3, TR, N)
    G = sum(cs[c] * g_rgb[c] for c in range(3)) + depth * g_depth + g_op
    d_sd = G * T * e - _mm(G * w, tri_s_v)
    ddens_ref[...] = d_sd * dist * _sigmoid(planes[3])


def _run_fwd_flat(args, N, tile_rays, interpret):
    rgb_raw, dens_raw, dist, depth = args
    BR = dist.shape[0]
    tr = _fit_rays(tile_rays, BR)
    kernel = functools.partial(_fwd_kernel_flat, int(N))
    # [BR, N·C]-shaped blocks: the free XLA reshape of the flat arrays —
    # [TR·N, C] blocks would pad C lanes to 128 in VMEM (scoped OOM)
    in_specs = [_row_spec(tr, N * 3), _row_spec(tr, N * 1),
                _row_spec(tr, N), _row_spec(tr, N), _full(), _full(),
                _full()]
    return pl.pallas_call(
        kernel, grid=(BR // tr,), in_specs=in_specs,
        out_specs=_row_spec(tr, N_OUT),
        out_shape=jax.ShapeDtypeStruct((BR, N_OUT), jnp.float32),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(rgb_raw.reshape(BR, N * 3), dens_raw.reshape(BR, N), dist, depth,
      _tri_excl(N), _tri_suffix(N), _perm_extract(N, 3))


def _run_bwd_flat(args, g, N, tile_rays, interpret):
    rgb_raw, dens_raw, dist, depth = args
    BR = dist.shape[0]
    M = rgb_raw.shape[0]
    tr = _fit_rays(tile_rays, BR)
    kernel = functools.partial(_bwd_kernel_flat, int(N))
    in_specs = [_row_spec(tr, N * 3), _row_spec(tr, N * 1),
                _row_spec(tr, N), _row_spec(tr, N), _row_spec(tr, N_OUT),
                _full(), _full(), _full()]
    out_specs = (_row_spec(tr, N * 3), _row_spec(tr, N * 1))
    out_shape = (jax.ShapeDtypeStruct((BR, N * 3), jnp.float32),
                 jax.ShapeDtypeStruct((BR, N), jnp.float32))
    d_rgb, d_dens = pl.pallas_call(
        kernel, grid=(BR // tr,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(rgb_raw.reshape(BR, N * 3), dens_raw.reshape(BR, N), dist, depth,
      g, _tri_excl(N), _tri_suffix(N), _perm_extract(N, 3))
    return d_rgb.reshape(M, 3), d_dens.reshape(M, 1)


@functools.lru_cache(maxsize=None)
def _make_op_flat(N, tile_rays, interpret):
    """Flat-input coarse composite (see fused_composite._make_op_flat):
    f(rgb_raw [M,3], dens_raw [M,1], dist [BR,N], depth [BR,N]) →
    packed [BR,8], with flat [M,3]/[M,1] gradients."""

    @jax.custom_vjp
    def op(rgb_raw, dens_raw, dist, depth):
        return _run_fwd_flat((rgb_raw, dens_raw, dist, depth), N,
                             tile_rays, interpret)

    def op_fwd(*args):
        return op(*args), args

    def op_bwd(args, g):
        d_rgb, d_dens = _run_bwd_flat(args, g, N, tile_rays, interpret)
        return (d_rgb, d_dens) + tuple(jnp.zeros_like(a) for a in args[2:])

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_composite_coarse(rgb_raw, dens_raw, depth_samples, ray,
                           tile_rays=256, interpret=False, flat=None):
    """Fused vanilla-NeRF composite from RAW field outputs.

    rgb_raw [BR·N, 3], dens_raw [BR·N, 1], depth_samples [B,R,N,1],
    ray [B,R,3] → dict(rgb [B,R,3], depth [B,R,1], opacity [B,R,1]).
    Gradients flow to rgb_raw and dens_raw (depth/ray are not trainable
    in the pretrain stage — reference trains with fixed poses/bounds).

    flat: see fused_composite.fused_composite_st — in-kernel plane
    extraction, flat gradients (TEXPOSE_COMPOSITE_FLAT; default off
    pending the on-TPU A/B).
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
        opf = _make_op_flat(int(N), int(tile_rays), bool(interpret))
        packed = opf(rgb_raw, dens_raw, jax.lax.stop_gradient(dist),
                     jax.lax.stop_gradient(d))

        def out(lo, hi):
            return packed[:, lo:hi].reshape(B, R, hi - lo)

        return dict(rgb=out(0, 3), depth=out(3, 4), opacity=out(4, 5))

    def planes(x, C):
        x = x.reshape(BR, N, C)
        return [x[:, :, c] for c in range(C)]

    r0, r1, r2 = planes(rgb_raw, 3)
    (dens,) = planes(dens_raw, 1)

    op = _make_op(int(N), int(tile_rays), bool(interpret))
    packed = op(r0, r1, r2, dens, jax.lax.stop_gradient(dist),
                jax.lax.stop_gradient(d))

    def out(lo, hi):
        return packed[:, lo:hi].reshape(B, R, hi - lo)

    return dict(rgb=out(0, 3), depth=out(3, 4), opacity=out(4, 5))
