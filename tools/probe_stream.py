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
  E  D + f32 h chain
  F  E + separate [.,1] f32 density output ref
  G  F + skip layer (layer 4 adds a K=66 xext piece)
  H  G + production split heads (rgb 2+2 issues, trans 1+2, packed final;
         const latent rows; separate streamed [.,33] enc input; narrow
         [.,3]/[.,5] f32 outputs + [.,256] bf16 feat output)
  I  H + per-image latent DYNAMIC slices (light/trans tables in VMEM,
         row picked by program_id-derived image index, per subtile)

Timing: the kernel output feeds the next iteration's input via lax.scan
(data dependence defeats overlap/caching); marginal cost per run from two
scan depths, blocking host read (the only trustworthy pattern here).

Run with PROBE_STREAM_TILE=512 to match the production tiling (sub=4 →
[128,256] subtile chains, 256 grid steps) vs the default 2048.
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
N_IMG = 16  # dynlat: images in the latent table


def read_timed(f, *a, reps=5):
    r = f(*a)
    _ = float(np.asarray(r))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(f(*a)))
        best = min(best, time.perf_counter() - t0)
    return best * 1000

def _kernel(sub, narrowk, last257, f32h, denso, heads, dynlat, skipl,
            headsfb, tiles_per_img, x_ref, *refs):
    i = 0
    enc_ref = None
    if heads:
        enc_ref = refs[i]; i += 1
    ws = refs[i:i + NL]; i += NL
    bs = refs[i:i + NL]; i += NL
    w0 = wl = bl = wsk = None
    if narrowk:
        w0 = refs[i]; i += 1
    if last257:
        wl, bl = refs[i], refs[i + 1]; i += 2
    if skipl:
        wsk = refs[i]; i += 1
    if heads:
        (wr0f, wr0e, wr1, wr2, wt0, wt1, wt2, wpack,
         br0, br1, br2, bt0, bt1, bt2, brf, btf) = refs[i:i + 16]
        i += 16
        if dynlat:
            ltab, ttab = refs[i], refs[i + 1]; i += 2
        else:
            lrow, trow = refs[i], refs[i + 1]; i += 2
    o_ref = refs[i]; i += 1
    d_ref = None
    if denso:
        d_ref = refs[i]; i += 1
    if heads:
        rgb_ref, tr_ref = refs[i], refs[i + 1]

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

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
                z = dot(xin, w[...])
            else:
                w = wl if (last and last257) else ws[li]
                z = dot(h.astype(jnp.bfloat16) if f32h else h, w[...])
                if skipl and li == 4:
                    z = z + dot(x[:, :66], wsk[...])
            z = z + (bl[...] if (last and last257) else bs[li][...])
            if last and last257:
                if denso:
                    d_ref[sl, :] = z[:, 256:257]
                    z = z[:, :256]
                else:
                    z = z[:, :256] + z[:, 256:257]
            h = jnp.maximum(z, 0.0)
            if not f32h:
                h = h.astype(jnp.bfloat16)
        feat = h
        o_ref[sl, :] = feat.astype(jnp.bfloat16) if f32h else feat
        if heads and not headsfb:
            featc = feat.astype(jnp.bfloat16) if f32h else feat
            enc = enc_ref[sl, :]
            if dynlat:
                img = (pl.program_id(0) * sub + k) // tiles_per_img
                lrow_ = ltab[pl.ds(img, 1), :]
                trow_ = ttab[pl.ds(img, 1), :]
            else:
                lrow_, trow_ = lrow[...], trow[...]
            z = dot(featc, wr0f[...]) + dot(enc, wr0e[...]) + lrow_ \
                + br0[...]
            hr = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
            z = dot(hr, wr1[...]) + br1[...]
            hr = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
            z = dot(hr, wr2[...]) + br2[...]
            hr = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
            z = dot(featc, wt0[...]) + trow_ + bt0[...]
            ht = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
            z = dot(ht, wt1[...]) + bt1[...]
            ht = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
            z = dot(ht, wt2[...]) + bt2[...]
            ht = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
            xp = jnp.concatenate([hr, ht], axis=-1)
            zp = dot(xp, wpack[...])
            rgb_ref[sl, :] = zp[:, :3] + brf[...]
            tr_ref[sl, :] = zp[:, 3:8] + btf[...]
    if heads and headsfb:
        # full-tile heads: all subtiles in a grid step share one image
        # (rows_per_img % tile == 0), so ONE latent row + S=tile issues;
        # feat read back from the just-written output ref (no concat)
        featc = o_ref[...]
        enc = enc_ref[...]
        if dynlat:
            img = (pl.program_id(0) * sub) // tiles_per_img
            lrow_ = ltab[pl.ds(img, 1), :]
            trow_ = ttab[pl.ds(img, 1), :]
        else:
            lrow_, trow_ = lrow[...], trow[...]
        z = dot(featc, wr0f[...]) + dot(enc, wr0e[...]) + lrow_ + br0[...]
        hr = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        z = dot(hr, wr1[...]) + br1[...]
        hr = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        z = dot(hr, wr2[...]) + br2[...]
        hr = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        z = dot(featc, wt0[...]) + trow_ + bt0[...]
        ht = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        z = dot(ht, wt1[...]) + bt1[...]
        ht = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        z = dot(ht, wt2[...]) + bt2[...]
        ht = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
        xp = jnp.concatenate([hr, ht], axis=-1)
        zp = dot(xp, wpack[...])
        rgb_ref[...] = zp[:, :3] + brf[...]
        tr_ref[...] = zp[:, 3:8] + btf[...]


def build(sub, narrowk, last257, tile, interpret=False, f32h=False,
          denso=False, heads=False, dynlat=False, skipl=False,
          headsfb=False):
    S = tile // sub
    tiles_per_img = (ROWS // N_IMG) // S
    kern = functools.partial(_kernel, sub, narrowk, last257, f32h, denso,
                             heads, dynlat, skipl, headsfb, tiles_per_img)
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    f32 = jnp.float32

    def w(shape, s=0.09, dt=bf):
        return jnp.asarray(rng.standard_normal(shape) * s, dt)

    args_const = ([w((256, 256)) for _ in range(NL)]
                  + [w((1, 256), 0.05, f32) for _ in range(NL)])
    if narrowk:
        args_const += [w((66, 256), 0.12)]
    if last257:
        args_const += [w((256, 257)), w((1, 257), 0.05, f32)]
    if skipl:
        args_const += [w((66, 256), 0.12)]
    if heads:
        args_const += [w((256, 256)), w((33, 256), 0.12), w((256, 256)),
                       w((256, 256)), w((256, 256)), w((256, 256)),
                       w((256, 256)), w((512, 8)),
                       w((1, 256), 0.05, f32), w((1, 256), 0.05, f32),
                       w((1, 256), 0.05, f32), w((1, 256), 0.05, f32),
                       w((1, 256), 0.05, f32), w((1, 256), 0.05, f32),
                       w((1, 3), 0.05, f32), w((1, 5), 0.05, f32)]
        if dynlat:
            args_const += [w((N_IMG, 256), 0.05, f32),
                           w((N_IMG, 256), 0.05, f32)]
        else:
            args_const += [w((1, 256), 0.05, f32), w((1, 256), 0.05, f32)]

    in_specs = [pl.BlockSpec((tile, 256), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if heads:
        in_specs += [pl.BlockSpec((tile, 33), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args_const)

    out_specs = [pl.BlockSpec((tile, 256), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((ROWS, 256), bf)]
    if denso:
        out_specs += [pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((ROWS, 1), f32)]
    if heads:
        out_specs += [pl.BlockSpec((tile, 3), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((tile, 5), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((ROWS, 3), f32),
                      jax.ShapeDtypeStruct((ROWS, 5), f32)]

    call = pl.pallas_call(
        kern,
        grid=(ROWS // tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        interpret=interpret,
    )

    def run(depth):
        # enc is threaded as a jit ARG (closed-over big arrays stage as
        # scoped-VMEM constants — the known trap)
        def g(x, e):
            def step2(xx, _):
                out = call(xx, e, *args_const) if heads \
                    else call(xx, *args_const)
                if not (denso or heads):
                    return out, None
                y = out[0]
                for extra in out[1:]:
                    y = y + extra.astype(bf)[0:1, 0:1]
                return y, None
            y, _ = jax.lax.scan(step2, x, None, length=depth)
            return y.astype(jnp.float32)[0, 0]
        fj = jax.jit(g)
        rng2 = np.random.default_rng(2)
        e0 = jnp.asarray(rng2.standard_normal((ROWS, 33)) * 0.1, bf)
        return lambda xx: fj(xx, e0)

    return run


def build_production(tile, sub):
    """Case K: the PRODUCTION _run_fwd (fused_st_field) chained on pts in
    THIS process — the only trustworthy comparison against case J."""
    from texpose_tpu.kernels.fused_st_field import (_run_fwd, make_xext)
    rng = np.random.default_rng(3)
    bf = jnp.bfloat16

    def w(shape, s=0.09, dt=bf):
        return jnp.asarray(rng.standard_normal(shape) * s, dt)

    # production trunk weights: layer 0 rows [pts(3)|sin(6L=60)]; skip
    # layer 4 rows [h(256)|pts|sin]; last layer 257 cols (density)
    trunk_w = tuple(
        w((3 + 60 if li == 0 else (256 + 3 + 60 if li == 4 else 256),
           257 if li == 7 else 256), dt=jnp.float32) for li in range(NL))
    trunk_b = tuple(w((1, 257 if li == 7 else 256), 0.05, jnp.float32)
                    for li in range(NL))
    rgb_w = (w((256 + 27 + 3 + 48, 256), dt=jnp.float32),
             w((256, 256), dt=jnp.float32), w((256, 256), dt=jnp.float32),
             w((256, 3), dt=jnp.float32))
    rgb_b = tuple(w((1, c), 0.05, jnp.float32) for c in (256, 256, 256, 3))
    tr_w = (w((256 + 16, 256), dt=jnp.float32),
            w((256, 256), dt=jnp.float32), w((256, 256), dt=jnp.float32),
            w((256, 5), dt=jnp.float32))
    tr_b = tuple(w((1, c), 0.05, jnp.float32) for c in (256, 256, 256, 5))
    ll = jnp.asarray(rng.standard_normal((N_IMG, 48)), jnp.float32)
    lt = jnp.asarray(rng.standard_normal((N_IMG, 16)), jnp.float32)
    aux3 = jnp.stack([jnp.asarray((2.0 ** np.arange(10)) * np.pi,
                                  jnp.float32), jnp.ones((10,))])
    pts0 = jnp.asarray(rng.standard_normal((ROWS, 3)), jnp.float32)
    enc0 = jnp.asarray(rng.standard_normal((ROWS, 27)), jnp.float32)
    xe0 = make_xext(pts0, 10, jnp.ones((10,)), bf)
    rows_per_img = ROWS // N_IMG

    def run(depth):
        def f(p, e, xe):
            def step(pp, _):
                rgb, dens, tr, feat = _run_fwd(
                    pp, e, ll, lt, trunk_w, trunk_b, rgb_w, rgb_b,
                    tr_w, tr_b, aux3, (4,), 10, tile, rows_per_img,
                    bf, False, subtiles=sub, packed=True,
                    enc_mode="xext", enc_extra=xe, split=True)
                return pp + 1e-6 * rgb, None
            return jax.lax.scan(step, p, None, length=depth)[0][0, 0]
        fj = jax.jit(f)
        return lambda xx: fj(pts0, enc0, xe0)

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
        ("G F + skip layer   ", dict(sub=4, narrowk=True, last257=True,
                                     f32h=True, denso=True, skipl=True)),
        ("H G + split heads  ", dict(sub=4, narrowk=True, last257=True,
                                     f32h=True, denso=True, skipl=True,
                                     heads=True)),
        ("I H + dyn latents  ", dict(sub=4, narrowk=True, last257=True,
                                     f32h=True, denso=True, skipl=True,
                                     heads=True, dynlat=True)),
        ("J I w/ fulltile heads", dict(sub=4, narrowk=True, last257=True,
                                       f32h=True, denso=True, skipl=True,
                                       heads=True, dynlat=True,
                                       headsfb=True)),
    ]
    only = os.environ.get("PROBE_STREAM_CASES")
    if only:
        cases = [c for c in cases if c[0].lstrip()[0] in only]
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
    if (not only or "K" in only) and not interpret:
        run = build_production(tile, int(os.environ.get(
            "PROBE_STREAM_SUB", "4")))
        t_lo = read_timed(run(d_lo), x)
        t_hi = read_timed(run(d_hi), x)
        per = (t_hi - t_lo) / (d_hi - d_lo)
        d = "" if prev is None else f"  (+{per - prev:6.3f} ms)"
        print(f"K production _run_fwd: {per:7.3f} ms/run "
              f"({t_lo:6.2f}->{t_hi:6.2f}){d}", flush=True)


if __name__ == "__main__":
    main()
