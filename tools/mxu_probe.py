"""Dev utility: MXU micro-benchmarks that survive the TPU tunnel.

Measurement protocol (the only one that cannot be faked here):
  * every timing ends in float(np.asarray(...)) — a real host read;
  * each case is timed at TWO in-kernel chain depths (L_hi vs L_lo) and
    reported as the DIFFERENCE per extra matmul — the ~20 ms tunnel
    round-trip and dispatch overhead cancel exactly;
  * block_until_ready and bare dispatch loops are worthless: this tunnel
    has "measured" a [131072,256]x[256,256] chain at 3,648 TFLOPs.

Probes chained [tile,K]x[K,K] matmuls over a 131k-row grid (the trunk
envelope), varying width K and interleaved independent chains (ILP).
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 131072
L_LO, L_HI = 4, 68          # 64 extra matmuls between the two depths


def read_timed(f, *a, reps=5):
    """min wall time of dispatch + host read (compile on first call)."""
    r = f(*a)
    _ = float(np.asarray(r))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(f(*a)))
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def _kernel(n_layers, n_chains, in_dtype, acc, n_weights, x_ref, *refs):
    w_refs = refs[:n_weights]
    o_ref = refs[n_weights]
    S = x_ref.shape[0] // n_chains
    outs = []
    for c in range(n_chains):
        h = x_ref[pl.ds(c * S, S), :]
        for li in range(n_layers):
            # cycling distinct weights forces an MXU weight reload per
            # matmul — the realistic MLP pattern; n_weights=1 is the
            # weight-stationary best case
            w = w_refs[li % n_weights][...]
            h = jax.lax.dot_general(
                h.astype(in_dtype), w, (((1,), (0,)), ((), ())),
                preferred_element_type=acc)
            if acc == jnp.int32:
                h = jnp.maximum(h >> 7, -127)
            else:
                h = jnp.maximum(h, 0.0)
        outs.append(h)
    for c, h in enumerate(outs):
        o_ref[pl.ds(c * S, S), :] = h.astype(o_ref.dtype)


def _build(K, n_chains, n_layers, tile, int8, interpret, n_weights=1):
    if int8:
        in_dtype, acc, out_dtype = jnp.int8, jnp.int32, jnp.int8
    else:
        in_dtype, acc, out_dtype = jnp.bfloat16, jnp.float32, jnp.bfloat16
    kern = functools.partial(_kernel, n_layers, n_chains, in_dtype, acc,
                             n_weights)
    call = pl.pallas_call(
        kern,
        grid=(ROWS // tile,),
        in_specs=[pl.BlockSpec((tile, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_weights,
        out_specs=pl.BlockSpec((tile, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, K), out_dtype),
        interpret=interpret,
    )
    return jax.jit(
        lambda x, *ws: call(x, *ws).astype(jnp.float32)[0, 0])


def probe(K=256, n_chains=1, tile=2048, int8=False, interpret=None,
          l_lo=L_LO, l_hi=L_HI, n_weights=1):
    if interpret is None:
        interpret = os.environ.get("MXU_PROBE_INTERPRET") == "1"
    if int8:
        ws = [jnp.asarray(np.random.randint(-90, 90, (K, K)), jnp.int8)
              for _ in range(n_weights)]
        x = jnp.asarray(np.random.randint(-90, 90, (ROWS, K)), jnp.int8)
    else:
        ws = [jnp.asarray(np.random.randn(K, K) * 0.05, jnp.bfloat16)
              for _ in range(n_weights)]
        x = jnp.asarray(np.random.randn(ROWS, K), jnp.bfloat16)
    t_lo = read_timed(_build(K, n_chains, l_lo, tile, int8, interpret,
                             n_weights), x, *ws)
    t_hi = read_timed(_build(K, n_chains, l_hi, tile, int8, interpret,
                             n_weights), x, *ws)
    n_extra = l_hi - l_lo
    per = (t_hi - t_lo) / n_extra                      # ms per matmul layer
    flops = 2.0 * ROWS * K * K
    unit = "TOPs" if int8 else "TFLOPs"
    print(f"K={K:4d} chains={n_chains} tile={tile} nw={n_weights} "
          f"{'int8' if int8 else 'bf16'}: {per:7.4f} ms/layer "
          f"({t_lo:6.2f}->{t_hi:6.2f})  {flops/per/1e9:6.1f} {unit}",
          flush=True)


def _trunk_probe_kernel(reps, bias, posenc, highest, last257, K,
                        pts_ref, aux_ref, *refs):
    """One grid step = `reps` passes of an 8-layer trunk with features
    toggled cumulatively (see probe_trunk).  Data-dependent chaining (next
    pass's pts come from this pass's features) defeats DCE."""
    nW = 8
    ws = refs[:nW]
    bs = refs[nW:2 * nW]
    w_pts, w_sin = refs[2 * nW], refs[2 * nW + 1]
    i = 2 * nW + 2
    if last257:
        w_last, b_last = refs[i], refs[i + 1]
        i += 2
    o_ref = refs[-1]
    pts = pts_ref[...]
    acc = jnp.zeros((pts.shape[0], 1), jnp.float32)
    h = None
    for _ in range(reps):
        ptsc = pts.astype(jnp.bfloat16)
        if posenc:
            D = aux_ref[0:3, :]
            phase = aux_ref[3:4, :]
            wb = aux_ref[4:5, :]
            prec = jax.lax.Precision.HIGHEST if highest else None
            spec = jax.lax.dot_general(
                pts, D, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec) + phase
            sinw = (jnp.sin(spec) * wb).astype(jnp.bfloat16)
        for li in range(nW):
            last = li == nW - 1
            if li == 0:
                z = jax.lax.dot_general(
                    ptsc, w_pts[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if posenc:
                    z = z + jax.lax.dot_general(
                        sinw, w_sin[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            else:
                wref = w_last if (last and last257) else ws[li]
                z = jax.lax.dot_general(
                    h, wref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if posenc and li == 4:          # the skip layer's split
                    z = z + jax.lax.dot_general(
                        ptsc, w_pts[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    z = z + jax.lax.dot_general(
                        sinw, w_sin[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            if bias:
                z = z + (b_last[...] if (last and last257) else bs[li][...])
            if last and last257:
                acc = acc + z[:, K:K + 1]
                z = z[:, :K]
            h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        pts = (h[:, 0:3].astype(jnp.float32)
               * jnp.float32(0.25) + jnp.float32(0.1))
    o_ref[...] = (h + acc.astype(jnp.bfloat16)).astype(o_ref.dtype)


def _build_trunk(reps, bias, posenc, highest, last257, tile, K, L,
                 interpret):
    kern = functools.partial(_trunk_probe_kernel, reps, bias, posenc,
                             highest, last257, K)
    n_in = 2 * 8 + 2 + (2 if last257 else 0)
    call = pl.pallas_call(
        kern,
        grid=(ROWS // tile,),
        in_specs=[pl.BlockSpec((tile, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec((tile, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, K), jnp.bfloat16),
        interpret=interpret,
    )
    return jax.jit(lambda *a: call(*a).astype(jnp.float32)[0, 0])


def probe_trunk(tile=2048, K=256, L=18, r_lo=2, r_hi=10, interpret=None):
    """Locate the fused-trunk overhead: per-pass time of the REAL trunk
    structure with features added one at a time.  Stage deltas attribute
    the gap between the pure matmul chain (~185 TFLOPs, probe above) and
    the production trunk kernel.  6L = 108 → L=18 bands matches L_3D=10
    posenc width only loosely; the sin-path cost scales with 6L so this
    slightly over-states it (safe direction)."""
    if interpret is None:
        interpret = os.environ.get("MXU_PROBE_INTERPRET") == "1"
    E = 6 * L
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((ROWS, 3)), jnp.float32)
    aux = jnp.asarray(rng.standard_normal((5, E)), jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((K, K)) * 0.05, jnp.bfloat16)
          for _ in range(8)]
    bs = [jnp.asarray(rng.standard_normal((1, K)) * 0.05, jnp.float32)
          for _ in range(8)]
    w_pts = jnp.asarray(rng.standard_normal((3, K)) * 0.05, jnp.bfloat16)
    w_sin = jnp.asarray(rng.standard_normal((E, K)) * 0.05, jnp.bfloat16)
    w_last = jnp.asarray(rng.standard_normal((K, K + 1)) * 0.05,
                         jnp.bfloat16)
    b_last = jnp.asarray(rng.standard_normal((1, K + 1)) * 0.05,
                         jnp.float32)
    stages = [
        ("matmuls only        ", dict(bias=False, posenc=False,
                                      highest=False, last257=False)),
        ("+ bias adds         ", dict(bias=True, posenc=False,
                                      highest=False, last257=False)),
        ("+ posenc (bf16 sin) ", dict(bias=True, posenc=True,
                                      highest=False, last257=False)),
        ("+ HIGHEST angle mm  ", dict(bias=True, posenc=True,
                                      highest=True, last257=False)),
        ("+ 257-col last layer", dict(bias=True, posenc=True,
                                      highest=True, last257=True)),
    ]
    prev = None
    for name, fl in stages:
        args = [pts, aux] + ws + bs + [w_pts, w_sin]
        if fl["last257"]:
            args += [w_last, b_last]
        t_lo = read_timed(_build_trunk(r_lo, tile=tile, K=K, L=L,
                                       interpret=interpret, **fl), *args)
        t_hi = read_timed(_build_trunk(r_hi, tile=tile, K=K, L=L,
                                       interpret=interpret, **fl), *args)
        per = (t_hi - t_lo) / (r_hi - r_lo)        # ms per trunk pass
        d = "" if prev is None else f"  (+{per - prev:6.3f} ms)"
        print(f"{name}: {per:7.3f} ms/pass ({t_lo:6.2f}->{t_hi:6.2f}){d}",
              flush=True)
        prev = per


def probe_xla(K=256, l_lo=L_LO, l_hi=L_HI):
    w = jnp.asarray(np.random.randn(K, K) * 0.05, jnp.bfloat16)
    x = jnp.asarray(np.random.randn(ROWS, K), jnp.bfloat16)

    def chain(n):
        def f(x, w):
            h = x
            for _ in range(n):
                z = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
            return h.astype(jnp.float32)[0, 0]
        return jax.jit(f)
    t_lo = read_timed(chain(l_lo), x, w)
    t_hi = read_timed(chain(l_hi), x, w)
    per = (t_hi - t_lo) / (l_hi - l_lo)
    print(f"plain XLA K={K}: {per:7.4f} ms/layer ({t_lo:6.2f}->{t_hi:6.2f})"
          f"  {2.0*ROWS*K*K/per/1e9:6.1f} TFLOPs", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "shapes"
    if which == "shapes":
        # deep chains (Δ=256 layers ≈ 20+ ms of compute — far above the
        # ±2 ms tunnel jitter that corrupted the shallow version)
        probe(256, 1, l_lo=4, l_hi=260)
        probe(256, 2, l_lo=4, l_hi=260)
        probe(256, 1, l_lo=4, l_hi=260, n_weights=8)   # realistic reloads
        probe(256, 4, l_lo=4, l_hi=260, n_weights=8)
        probe(256, 1, l_lo=4, l_hi=260, n_weights=8, tile=8192)
    elif which == "xla":
        probe_xla()
    elif which == "trunk":
        probe_trunk(tile=int(os.environ.get("MXU_TRUNK_TILE", "2048")))
    elif which == "int8":
        probe(256, 1, int8=True, l_lo=4, l_hi=260)
        probe(256, 1, int8=True, l_lo=4, l_hi=260, n_weights=8)
    else:
        raise SystemExit(f"unknown probe {which}")
