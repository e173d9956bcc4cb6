"""Dev utility: trustworthy MXU micro-benchmarks through the TPU tunnel.

Every measurement is a lax.scan-CHAINED computation inside ONE jit whose
scalar result is read back to the host (np.asarray) — the only timing
pattern this tunnel does not fake (CLAUDE.md measurement warning; plain
block_until_ready timings have reported 40,000 "TFLOPs").

Probes (select with argv, default 'shapes'):
  shapes  — chained pallas matmuls at trunk-class shapes, varying N/K
            width and the number of interleaved independent chains (ILP):
            locates the per-shape MXU ceiling behind the 48-TFLOPs trunk.
  xla     — the same chained matmul in plain XLA (no pallas) for the
            compiler baseline.
  int8    — int8×int8→int32 chained pallas matmul vs bf16.

Keep each probe SMALL: remote compiles are minutes; a killed client can
wedge the tunnel for everyone.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, flops, reps=3):
    out = fn()
    _ = float(np.asarray(out))            # compile + blocking read
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(fn()))
        best = min(best, time.perf_counter() - t0)
    return best * 1000, flops / best / 1e12


def chain_kernel(n_layers, n_chains, dtype, acc_dtype, x_ref, w_ref, o_ref):
    """Per grid step: n_chains independent chains of n_layers dependent
    matmuls on [S, K]×[K, N] (same weight — dependency is what matters)."""
    w = w_ref[...]
    S = x_ref.shape[0] // n_chains
    for c in range(n_chains):
        h = x_ref[pl.ds(c * S, S), :]
        for _ in range(n_layers):
            h = jax.lax.dot_general(
                h.astype(dtype), w, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
            if acc_dtype == jnp.int32:
                h = jnp.maximum(h >> 7, -127)
            else:
                h = jnp.maximum(h, 0.0)
        o_ref[pl.ds(c * S, S), :] = h[:, :o_ref.shape[1]].astype(o_ref.dtype)


def probe_shapes(cases, dtype=jnp.bfloat16, acc=jnp.float32, scan_k=30,
                 n_layers=8, rows=2048):
    for (K, N, n_chains) in cases:
        if N < K:      # chain needs square-ish flow; keep N==K here
            continue
        w_np = (np.random.randn(K, N) * 0.05).astype(np.float32)
        x_np = np.random.randn(rows, K).astype(np.float32)
        if acc == jnp.int32:
            w_in = jnp.asarray(np.clip(np.round(w_np * 127), -127, 127),
                               jnp.int8)
            x_in = jnp.asarray(np.clip(np.round(x_np * 16), -127, 127),
                               jnp.int8)
            out_dtype = jnp.int8
        else:
            w_in = jnp.asarray(w_np, dtype)
            x_in = jnp.asarray(x_np, dtype)
            out_dtype = dtype

        import functools
        kern = functools.partial(chain_kernel, n_layers, n_chains, dtype
                                 if acc != jnp.int32 else jnp.int8, acc)
        import os
        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, K), out_dtype),
            interpret=os.environ.get("MXU_PROBE_INTERPRET") == "1",
        )

        def fn():
            def body(x, _):
                y = call(x, w_in)
                return y, ()
            y, _ = jax.lax.scan(body, x_in, None, length=scan_k)
            return y[0, 0].astype(jnp.float32)

        jfn = jax.jit(fn)
        flops = 2.0 * rows * K * N * n_layers * scan_k
        ms, tf = timed(jfn, flops)
        unit = "TOPs" if acc == jnp.int32 else "TFLOPs"
        print(f"K={K:4d} N={N:4d} chains={n_chains}  "
              f"{ms/scan_k/n_layers:7.4f} ms/matmul  {tf:6.1f} {unit}",
              flush=True)


def probe_xla(scan_k=50, rows=131072, K=256, N=256):
    w = jnp.asarray(np.random.randn(K, N).astype(np.float32) * 0.05,
                    jnp.bfloat16)
    x = jnp.asarray(np.random.randn(rows, K).astype(np.float32),
                    jnp.bfloat16)

    def fn():
        def body(h, _):
            z = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.maximum(z, 0.0).astype(jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, x, None, length=scan_k)
        return y[0, 0].astype(jnp.float32)

    ms, tf = timed(jax.jit(fn), 2.0 * rows * K * N * scan_k)
    print(f"plain XLA [{rows},{K}]x[{K},{N}] chain: "
          f"{ms/scan_k:7.4f} ms/matmul  {tf:6.1f} TFLOPs", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "shapes"
    if which == "shapes":
        probe_shapes([(256, 256, 1), (256, 256, 4),
                      (512, 512, 1), (128, 128, 1)])
    elif which == "xla":
        probe_xla()
    elif which == "int8":
        probe_shapes([(256, 256, 1), (256, 256, 4), (512, 512, 1)],
                     acc=jnp.int32)
    else:
        raise SystemExit(f"unknown probe {which}")
