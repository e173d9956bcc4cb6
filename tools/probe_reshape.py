"""Dev probe: which in-kernel value reshapes does Mosaic lower?

The mega-kernel (kernels/fused_st_render.py) needs [S,C] head outputs as
per-ray [S/N, N] channel planes inside the kernel.  The direct
(S,C)->(S/N, N*C) shape cast is REJECTED by infer-vector-layout
(measured: "%tpu.reshape (vector<512x3xf32>) -> vector<8x192xf32>
unsupported").  Candidate decompositions probed here, each as its own
tiny pallas_call so one failure doesn't mask the others:

  A. column plane:  x[:,c:c+1] (S,1) -> reshape (S/N, N)
  B. 1-D route:     x[:,c]     (S,)  -> reshape (S/N, N)
  C. inverse store: plane (S/N,N) -> reshape (S,1); concat C columns
  D. full direct:   (S,C) -> (S/N, N*C)   [expected FAIL]
"""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, N, C = 512, 64, 3
RS = S // N


def _run(kernel, out_shape):
    x = jnp.asarray(np.random.RandomState(0).rand(S, C), jnp.float32)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
    )(x), x


def kA(x_ref, o_ref):
    planes = [x_ref[...][:, c:c + 1].reshape(RS, N) for c in range(C)]
    o_ref[...] = jnp.concatenate([p.sum(axis=1, keepdims=True)
                                  for p in planes], axis=1)


def kB(x_ref, o_ref):
    planes = [x_ref[...][:, c].reshape(RS, N) for c in range(C)]
    o_ref[...] = jnp.concatenate([p.sum(axis=1, keepdims=True)
                                  for p in planes], axis=1)


def kC(x_ref, o_ref):
    planes = [x_ref[...][:, c:c + 1].reshape(RS, N) for c in range(C)]
    cols = [ (p * 2.0).reshape(S, 1) for p in planes ]
    o_ref[...] = jnp.concatenate(cols, axis=1)


def kD(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(RS, N * C)


# --- realistic-producer cases: the plane comes out of a MATMUL (as in
# _bwd_cols), not a reshape round-trip Mosaic can fold away -------------

def _run2(kernel, out_shape):
    x = jnp.asarray(np.random.RandomState(0).rand(S, C), jnp.float32)
    t = jnp.asarray(np.random.RandomState(1).rand(N, N), jnp.float32)
    e = jnp.asarray((np.arange(S)[:, None] // N
                     == np.arange(RS)[None, :]), jnp.float32)
    m = jnp.asarray((np.arange(S)[:, None] % N
                     == np.arange(N)[None, :]), jnp.float32)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
    )(x, t, e, m), (x, t, e, m)


def kE(x_ref, t_ref, e_ref, m_ref, o_ref):
    """matmul-produced plane -> direct (RS,N)->(S,1) reshape (the exact
    _store_v op that failed in the real bwd kernel)."""
    cols = []
    for c in range(C):
        p = x_ref[...][:, c:c + 1].reshape(RS, N)
        p = jnp.dot(p, t_ref[...], preferred_element_type=jnp.float32)
        cols.append(p.reshape(S, 1))
    o_ref[...] = jnp.concatenate(cols, axis=1)


def kF(x_ref, t_ref, e_ref, m_ref, o_ref):
    """matmul interleave: g_c[S,1] = rowsum((E @ P_c) * M)."""
    e, m = e_ref[...], m_ref[...]
    cols = []
    for c in range(C):
        p = x_ref[...][:, c:c + 1].reshape(RS, N)
        p = jnp.dot(p, t_ref[...], preferred_element_type=jnp.float32)
        x = jnp.dot(e, p, preferred_element_type=jnp.float32)
        cols.append(jnp.sum(x * m, axis=1, keepdims=True))
    o_ref[...] = jnp.concatenate(cols, axis=1)


def kG(x_ref, t_ref, e_ref, m_ref, o_ref):
    """matmul-produced [S,1] column -> (S,1)->(RS,N) reshape (the fwd
    _planes_v direction with a realistic producer)."""
    acc = jnp.zeros((RS, N), jnp.float32)
    for c in range(C):
        col = x_ref[...][:, c:c + 1]
        col = jnp.dot(col, t_ref[...][:1, :1],
                      preferred_element_type=jnp.float32)
        acc = acc + col.reshape(RS, N)
    o_ref[...] = acc


def kH(x_ref, t_ref, e_ref, m_ref, o_ref):
    """matmul spread: P_c[RS,N] = E^T @ (col * M) (fwd-direction
    fallback if kG fails)."""
    e, m = e_ref[...], m_ref[...]
    acc = jnp.zeros((RS, N), jnp.float32)
    for c in range(C):
        col = x_ref[...][:, c:c + 1]
        col = jnp.dot(col, t_ref[...][:1, :1],
                      preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            e, col * m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = acc


def main():
    x_np = None
    cases = [
        ("A col (S,1)->(RS,N)", kA, jax.ShapeDtypeStruct((RS, C),
                                                         jnp.float32)),
        ("B col (S,)->(RS,N)", kB, jax.ShapeDtypeStruct((RS, C),
                                                        jnp.float32)),
        ("C store (RS,N)->(S,1)", kC, jax.ShapeDtypeStruct((S, C),
                                                           jnp.float32)),
        ("D direct (S,C)->(RS,N*C)", kD,
         jax.ShapeDtypeStruct((RS, N * C), jnp.float32)),
    ]
    for name, k, osh in cases:
        try:
            out, x = _run(k, osh)
            out = np.asarray(jax.block_until_ready(out))
            xs = np.asarray(x)
            if name.startswith(("A", "B")):
                ref = xs.reshape(RS, N, C).sum(axis=1)
                ok = np.allclose(out, ref, atol=1e-5)
            elif name.startswith("C"):
                ok = np.allclose(out, xs * 2.0, atol=1e-5)
            else:
                ok = np.allclose(out, xs.reshape(RS, N * C), atol=1e-5)
            print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"{name}: FAIL — {msg}")

    cases2 = [
        ("E mm-plane (RS,N)->(S,1)", kE,
         jax.ShapeDtypeStruct((S, C), jnp.float32)),
        ("F mm interleave rowsum((E@P)*M)", kF,
         jax.ShapeDtypeStruct((S, C), jnp.float32)),
        ("G mm-col (S,1)->(RS,N)", kG,
         jax.ShapeDtypeStruct((RS, N), jnp.float32)),
        ("H mm spread E^T@(col*M)", kH,
         jax.ShapeDtypeStruct((RS, N), jnp.float32)),
    ]
    for name, k, osh in cases2:
        try:
            out, (x, t, e, m) = _run2(k, osh)
            out = np.asarray(jax.block_until_ready(out))
            xs, ts = np.asarray(x), np.asarray(t)
            if name.startswith(("E", "F")):
                ref = np.stack(
                    [(xs[:, c].reshape(RS, N) @ ts).reshape(S)
                     for c in range(C)], axis=1)
            else:
                t00 = ts[0, 0]
                ref = sum((xs[:, c] * t00).reshape(RS, N) for c in range(C))
            ok = np.allclose(out, ref, atol=1e-4)
            print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"{name}: FAIL — {msg}")


if __name__ == "__main__":
    main()
