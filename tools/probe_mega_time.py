"""Dev probe: scan-chained timing of the ST render fwd/grad in mega vs
two-kernel mode, all four in ONE process (cross-process deltas at <0.3 ms
are meaningless; scan-chained marginal cost is the only trustworthy
single-kernel pattern on this tunnel — CLAUDE.md).

Each scan iteration perturbs the latents with the previous iteration's
scalar result, forcing true serialization; marginal cost between two
scan depths removes dispatch/tunnel overhead.

Usage: python tools/probe_mega_time.py   (TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

D1, D2 = 4, 12
REPS = 5


def _cfg(name):
    from texpose_tpu.utils.config import load_yaml
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_yaml(os.path.join(here, "configs", name))
    cfg.yaml = "x"
    return cfg


def main():
    from texpose_tpu.nn.fields import init_nerf_st, use_fused_st_render
    from texpose_tpu.models.render import render_st_core

    cfg = _cfg("nerf_lm_adapt_gan.yaml")
    key = jax.random.PRNGKey(0)
    params = init_nerf_st(key, cfg)
    B, R, N = 8, 256, int(cfg.nerf.sample_intvs)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    center = jax.random.normal(k1, (B, R, 3))
    ray = jax.random.normal(k2, (B, R, 3)) * 0.1 + jnp.asarray([0., 0., 1.])
    near = jnp.full((B, R), 34.0)
    far = jnp.full((B, R), 46.0)
    lt = jax.random.normal(k3, (B, cfg.nerf.N_latent_trans)) * 0.1
    ll = jax.random.normal(k3, (B, cfg.nerf.N_latent_light)) * 0.1
    heads = {k: v for k, v in params.items() if k != "mlp_feat"}

    def make(mega, grad):
        kcfg = {"fused_st": True, "fused_composite": True,
                "fused_trunk": True, "st_mega": mega}

        def loss(args):
            h, lt_, ll_ = args
            cfg.kernels = kcfg
            if mega:
                assert use_fused_st_render(cfg, B, R, N, params)
            p = dict(h, mlp_feat=params["mlp_feat"])
            out = render_st_core(p, cfg, center, ray, near, far, lt_, ll_,
                                 jax.random.PRNGKey(0), jnp.asarray(1.0),
                                 "train", jnp.bfloat16, want_density=True)
            return (out["rgb"] ** 2).mean() \
                + (out["rgb_static"] ** 2).mean() \
                + (out["uncert"] ** 2).mean() * 0.1 \
                + out["trans_density_mean"] * 1e-3

        def body(carry, _):
            args = (heads, lt + carry * 1e-9, ll)
            if grad:
                v, g = jax.value_and_grad(loss)(args)
                gl = g[1]  # d/d lt
                return v + gl.mean() * 1e-9, None
            return loss(args) * (1.0 + 0e0), None

        def make_run(depth):
            @jax.jit
            def run():
                c, _ = jax.lax.scan(body, jnp.asarray(0.0), None,
                                    length=depth)
                return c
            return run
        return make_run

    results = {}
    for mega in (True, False):
        for grad in (False, True):
            tag = f"{'mega' if mega else 'fused'}-{'grad' if grad else 'fwd'}"
            times = {}
            make_run = make(mega, grad)
            for depth in (D1, D2):
                run_d = make_run(depth)
                # warmup/compile
                v = float(np.asarray(run_d()))
                best = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    v = float(np.asarray(run_d()))
                    best.append(time.perf_counter() - t0)
                times[depth] = min(best)
                print(f"{tag} depth {depth}: {times[depth]*1e3:.3f} ms "
                      f"(val {v:.6f})", flush=True)
            marg = (times[D2] - times[D1]) / (D2 - D1) * 1e3
            results[tag] = marg
            print(f"{tag}: marginal {marg:.3f} ms/iter", flush=True)

    print("\n=== summary (scan-chained marginal ms) ===")
    for k, v in results.items():
        print(f"  {k:12s} {v:7.3f}")
    print(f"  mega fwd - fused fwd : "
          f"{results['mega-fwd'] - results['fused-fwd']:+.3f}")
    print(f"  mega grad - fused grad: "
          f"{results['mega-grad'] - results['fused-grad']:+.3f}")


if __name__ == "__main__":
    main()
