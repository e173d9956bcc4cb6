"""Dev utility: bisect the fused-trunk fwd gap (measured ~1.53 ms vs the
0.73 ms pure-chain price of its matmuls, tools/mxu_probe.py).

mxu_probe times EXTRA in-VMEM passes per grid step, so per-grid-step costs
(HBM streaming pipeline, in/out copies) cancel out of its deltas by
construction.  This probe instead times whole STREAMED kernels — fresh
rows in, rows out, one pass per grid step, exactly like production — and
adds the production trunk's ingredients one at a time:

  A  sub=1: 8x[2048,256]x[256,256] + bias + relu, streamed
  B  sub=4: same matmul work as 4 independent [512,256] subtile chains
  C  B + layer 0 consumes x[:, :66]  (the xext K=66 posenc issue)
  D  C + 257-col last layer (density col, folded back for chaining)

Timing: the kernel output feeds the next iteration's input via lax.scan
(data dependence defeats overlap/caching); marginal cost per run from two
scan depths, blocking host read (the only trustworthy pattern here).
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
NL = 8


def read_timed(f, *a, reps=5):
    r = f(*a)
    _ = float(np.asarray(r))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(f(*a)))
        best = min(best, time.perf_counter() - t0)
    return best * 1000


def _kernel(sub, narrowk, last257, f32h, denso, x_ref, *refs):
    ws = refs[:NL]
    bs = refs[NL:2 * NL]
    i = 2 * NL
    if narrowk:
        w0 = refs[i]; i += 1
    if last257:
        wl, bl = refs[i], refs[i + 1]; i += 2
    if denso:
        o_ref, d_ref = refs[-2], refs[-1]
    else:
        o_ref = refs[-1]
    S = x_ref.shape[0] // sub
    for k in range(sub):
        sl = slice(k * S, (k + 1) * S)
        x = x_ref[sl, :]
        h = None
        for li in range(NL):
            last = li == NL - 1
            if li == 0:
                xin = x[:, :66] if narrowk else x
                w = w0 if narrowk else ws[0]
                z = jax.lax.dot_general(
                    xin, w[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                w = wl if (last and last257) else ws[li]
                z = jax.lax.dot_general(
                    h.astype(jnp.bfloat16) if f32h else h, w[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            z = z + (bl[...] if (last and last257) else bs[li][...])
            if last and last257:
                if denso:
                    # production style: density col written as its own
                    # narrow [S,1] f32 output ref
                    d_ref[sl, :] = z[:, 256:257]
                    z = z[:, :256]
                else:
                    # fold the 257th (density) column back in to keep the
                    # chained output shape stable
                    z = z[:, :256] + z[:, 256:257]
            h = jnp.maximum(z, 0.0)
            if not f32h:
                h = h.astype(jnp.bfloat16)
        o_ref[sl, :] = h.astype(jnp.bfloat16) if f32h else h


def build(sub, narrowk, last257, tile, interpret=False, f32h=False,
          denso=False):
    kern = functools.partial(_kernel, sub, narrowk, last257, f32h, denso)
    n_in = 2 * NL + (1 if narrowk else 0) + (2 if last257 else 0)
    out_specs = pl.BlockSpec((tile, 256), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((ROWS, 256), jnp.bfloat16)
    if denso:
        out_specs = (out_specs,
                     pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((ROWS, 1), jnp.float32))
    call = pl.pallas_call(
        kern,
        grid=(ROWS // tile,),
        in_specs=[pl.BlockSpec((tile, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    def run(depth):
        def step(x, _):
            out = call(x, *args_const)
            if denso:
                y, d = out
                # keep the dens output live via a cheap dependence
                y = y + d.astype(jnp.bfloat16)[0:1, :]
                return y, None
            return out, None

        def f(x):
            y, _ = jax.lax.scan(step, x, None, length=depth)
            return y.astype(jnp.float32)[0, 0]
        return jax.jit(f)

    rng = np.random.default_rng(0)
    args_const = (
        [jnp.asarray(rng.standard_normal((256, 256)) * 0.09, jnp.bfloat16)
         for _ in range(NL)]
        + [jnp.asarray(rng.standard_normal((1, 256)) * 0.05, jnp.float32)
           for _ in range(NL)])
    if narrowk:
        args_const += [jnp.asarray(rng.standard_normal((66, 256)) * 0.12,
                                   jnp.bfloat16)]
    if last257:
        args_const += [jnp.asarray(rng.standard_normal((256, 257)) * 0.09,
                                   jnp.bfloat16),
                       jnp.asarray(rng.standard_normal((1, 257)) * 0.05,
                                   jnp.float32)]
    return run


def main():
    interpret = os.environ.get("PROBE_STREAM_INTERPRET") == "1"
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((ROWS, 256)) * 0.1, jnp.bfloat16)
    d_lo, d_hi = 4, 20
    cases = [
        ("A sub=1 pure       ", dict(sub=1, narrowk=False, last257=False)),
        ("B sub=4            ", dict(sub=4, narrowk=False, last257=False)),
        ("C B + K=66 layer0  ", dict(sub=4, narrowk=True, last257=False)),
        ("D C + 257-col last ", dict(sub=4, narrowk=True, last257=True)),
        ("E D + f32 h chain  ", dict(sub=4, narrowk=True, last257=True,
                                     f32h=True)),
        ("F E + [.,1] dens out", dict(sub=4, narrowk=True, last257=True,
                                      f32h=True, denso=True)),
    ]
    tile = int(os.environ.get("PROBE_STREAM_TILE", "2048"))
    prev = None
    for name, kw in cases:
        run = build(tile=tile, interpret=interpret, **kw)
        t_lo = read_timed(run(d_lo), x)
        t_hi = read_timed(run(d_hi), x)
        per = (t_hi - t_lo) / (d_hi - d_lo)
        d = "" if prev is None else f"  (+{per - prev:6.3f} ms)"
        print(f"{name}: {per:7.3f} ms/run ({t_lo:6.2f}->{t_hi:6.2f}){d}",
              flush=True)
        prev = per


if __name__ == "__main__":
    main()
