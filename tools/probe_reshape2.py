"""Dev probe 2: diagnose the WRONG RESULT cases from probe_reshape.py.

probe_reshape cases F/G/H (matmul-produced operands feeding reshape /
one-hot-matmul interleave) compile but return wrong values on v5e.
Here each suspect op is isolated with printed diffs to find WHERE the
lowering goes wrong (slice? tiny-K matmul? reshape? rowsum?).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, N, C, F = 512, 64, 8, 128
RS = S // N

rng = np.random.RandomState(0)
A_np = rng.rand(S, F).astype(np.float32)
W_np = rng.rand(F, C).astype(np.float32)
E_np = (np.arange(S)[:, None] // N == np.arange(RS)[None, :]).astype(
    np.float32)
M_np = (np.arange(S)[:, None] % N == np.arange(N)[None, :]).astype(
    np.float32)


def run(kernel, out_shape, n_in=4):
    args = [jnp.asarray(a) for a in (A_np, W_np, E_np, M_np)[:n_in]]
    return np.asarray(jax.block_until_ready(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
    )(*args)))


def report(name, out, ref):
    d = np.abs(out - ref)
    rel = d.max() / (np.abs(ref).max() + 1e-9)
    print(f"{name}: max abs diff {d.max():.3e} rel {rel:.3e} "
          f"{'OK' if rel < 1e-4 else 'WRONG'}")
    if rel >= 1e-4:
        print("  out[0,:6] ", out.reshape(out.shape[0], -1)[0, :6])
        print("  ref[0,:6] ", ref.reshape(ref.shape[0], -1)[0, :6])
        print("  out[1,:6] ", out.reshape(out.shape[0], -1)[1, :6])
        print("  ref[1,:6] ", ref.reshape(ref.shape[0], -1)[1, :6])


def main():
    Y_np = A_np @ W_np                      # [S,C] the real head output

    # 1. real-producer fwd direction: y=A@W, slice col 0, (S,1)->(RS,N)
    def k1(a, w, e, m, o):
        y = jnp.dot(a[...], w[...], preferred_element_type=jnp.float32)
        o[...] = y[:, 0:1].reshape(RS, N)
    try:
        out = run(k1, jax.ShapeDtypeStruct((RS, N), jnp.float32))
        report("1 fwd col reshape (real producer)", out,
               Y_np[:, 0].reshape(RS, N))
    except Exception as ex:
        print("1 FAIL:", str(ex).split("\n")[0][:100])

    # 2. one-hot E matmul alone: X = E @ P  (P from input reshape)
    def k2(a, w, e, m, o):
        p = a[...][:, 0:1].reshape(RS, N)
        o[...] = jnp.dot(e[...], p, preferred_element_type=jnp.float32)
    try:
        out = run(k2, jax.ShapeDtypeStruct((S, N), jnp.float32))
        P = A_np[:, 0].reshape(RS, N)
        report("2 E@P (K=8 one-hot matmul)", out, E_np @ P)
    except Exception as ex:
        print("2 FAIL:", str(ex).split("\n")[0][:100])

    # 3. rowsum(X*M) alone (X an input-derived [S,N])
    def k3(a, w, e, m, o):
        x = a[...][:, :N] if F >= N else None
        o[...] = jnp.sum(x * m[...], axis=1, keepdims=True)
    try:
        out = run(k3, jax.ShapeDtypeStruct((S, 1), jnp.float32))
        report("3 rowsum(X*M)", out,
               (A_np[:, :N] * M_np).sum(axis=1, keepdims=True))
    except Exception as ex:
        print("3 FAIL:", str(ex).split("\n")[0][:100])

    # 4. full interleave chain with real producer:
    #    y=A@W, col->plane, X=E@plane, rowsum(X*M) == y[:,0]
    def k4(a, w, e, m, o):
        y = jnp.dot(a[...], w[...], preferred_element_type=jnp.float32)
        p = y[:, 0:1].reshape(RS, N)
        x = jnp.dot(e[...], p, preferred_element_type=jnp.float32)
        o[...] = jnp.sum(x * m[...], axis=1, keepdims=True)
    try:
        out = run(k4, jax.ShapeDtypeStruct((S, 1), jnp.float32))
        report("4 full interleave chain", out, Y_np[:, 0:1])
    except Exception as ex:
        print("4 FAIL:", str(ex).split("\n")[0][:100])

    # 5. fwd col reshape at C=3 exact mega shapes, compare ALL columns
    def k5(a, w, e, m, o):
        y = jnp.dot(a[...], w[...][:, :3],
                    preferred_element_type=jnp.float32)
        planes = [y[:, c:c + 1].reshape(RS, N) for c in range(3)]
        o[...] = jnp.concatenate(planes, axis=1)
    try:
        out = run(k5, jax.ShapeDtypeStruct((RS, 3 * N), jnp.float32))
        ref = np.concatenate([(A_np @ W_np[:, :3])[:, c].reshape(RS, N)
                              for c in range(3)], axis=1)
        report("5 fwd 3-col planes (real producer)", out, ref)
    except Exception as ex:
        print("5 FAIL:", str(ex).split("\n")[0][:100])


if __name__ == "__main__":
    main()
