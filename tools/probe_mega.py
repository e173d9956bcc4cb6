"""Dev probe: bisect the mega-kernel (fused_st_render) TPU compile.

check_kernel_parity_tpu's st-mega value_and_grad dies with an opaque
"tpu_compile_helper subprocess exit code 1" (no Mosaic diagnostic).
Compile the pieces separately to find the culprit:

  STAGE=fwd    mega forward only (no grad)
  STAGE=grad   mega value_and_grad
  STAGE=fused  two-kernel value_and_grad (control)

Usage: STAGE=fwd python tools/probe_mega.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _cfg(name):
    from texpose_tpu.utils.config import load_yaml
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_yaml(os.path.join(here, "configs", name))
    cfg.yaml = "x"
    return cfg


def main():
    from texpose_tpu.nn.fields import init_nerf_st, use_fused_st_render
    from texpose_tpu.models.render import render_st_core

    stage = os.environ.get("STAGE", "fwd")
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

    mega = stage != "fused"
    cfg.kernels = {"fused_st": True, "fused_composite": True,
                   "fused_trunk": True, "st_mega": mega}
    assert (not mega) or use_fused_st_render(cfg, B, R, N, params)

    def loss(args):
        heads, lt, ll = args
        p = dict(heads, mlp_feat=params["mlp_feat"])
        out = render_st_core(p, cfg, center, ray, near, far, lt, ll,
                             jax.random.PRNGKey(0), jnp.asarray(1.0),
                             "train", jnp.bfloat16, want_density=True)
        return (out["rgb"] ** 2).mean() + (out["rgb_static"] ** 2).mean() \
            + (out["uncert"] ** 2).mean() * 0.1 \
            + out["trans_density_mean"] * 1e-3

    heads = {k: v for k, v in params.items() if k != "mlp_feat"}
    args = (heads, lt, ll)
    fn = loss if stage == "fwd" else jax.value_and_grad(loss)
    print(f"compiling stage={stage} ...", flush=True)
    v = jax.jit(fn)(args)
    jax.block_until_ready(v)
    flat = jax.tree_util.tree_leaves(v)
    print(f"stage={stage} OK; loss={float(flat[0]):.6f}", flush=True)


if __name__ == "__main__":
    main()
