"""Dev utility: scan-chained section decomposition of the texture step.

Every number is a MARGINAL per-step cost from two lax.scan depths with a
blocking host read — the only trustworthy single-section pattern through
the TPU tunnel (dispatch-loop timeit carries per-dispatch transport
overhead; see CLAUDE.md measurement warnings).  Sections are nested
subsets of the official bench workload (bench.py: 8 x 16x16 patches,
64 samples, 131072 field rows):

  S1 kernel fwd        fused ST-field forward only
  S2 kernel fwd+bwd    + the fused head backward (grad wrt heads)
  S3 render grad       + ray sampling, composite, uncert render loss
  S4 G-only step       full engine step with gan=None (+VGG, lab,
                       latent gather, optimizer) — engine scan, dispatch
                       timed (already scan-fused)
  S5 official step     G+D step (bench.py path) — engine scan

Deltas attribute: S3-S2 = composite+glue, S4-S3 ~= losses+optimizer,
S5-S4 = discriminator step (+gan_nerf fwd in G loss).
"""

import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def marginal(make_run, d_lo=4, d_hi=20, reps=5):
    """Marginal per-step ms from two scan depths (blocking read)."""
    ts = {}
    for d in (d_lo, d_hi):
        f = make_run(d)
        _ = float(np.asarray(f()))          # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(np.asarray(f()))
            best = min(best, time.perf_counter() - t0)
        ts[d] = best * 1000
    return (ts[d_hi] - ts[d_lo]) / (d_hi - d_lo), ts


def engine_step_ms(eng, n_disp=6):
    """Per-step ms of an engine's (already scan-fused) step_fn."""
    k = eng.scan_k()
    for _ in range(2):                       # compile + warm
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    _ = float(np.asarray(loss["all"]))
    best = float("inf")
    for _ in range(n_disp):
        t0 = time.perf_counter()
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        _ = float(np.asarray(loss["all"]))
        best = min(best, time.perf_counter() - t0)
    return best * 1000 / k


def main():
    from texpose_tpu.data.fixture import generate_fixture
    from texpose_tpu.utils.config import process_options
    from texpose_tpu.models.texture_gan import (TextureGANEngine,
                                                render_patch,
                                                sample_patch_images)
    from texpose_tpu.sampling.patch import flex_patch_coords
    from texpose_tpu.kernels.fused_st_field import fused_st_field
    from texpose_tpu.models.pretrain import _compute_dtype
    sys.path.insert(0, "/root/repo")
    from bench import _bench_cfg

    here = "/root/repo"
    cache = os.path.join(tempfile.gettempdir(), "texpose_bench_fixture_v1")
    marker = os.path.join(cache, ".done")
    if not os.path.exists(marker):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=16, n_test=1, scene="scene_all",
                         image_scale=1.0, crop_res=128)
        open(marker, "w").close()
    cfg = _bench_cfg(cache, here, "texpose_sections_out")
    cfg = process_options(cfg)
    cfg.max_iter = 100000

    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()

    B = int(cfg.batch_size)
    R = int(cfg.patch_size) ** 2
    Ns = int(cfg.nerf.sample_intvs)
    M = B * R * Ns
    dtype = _compute_dtype(cfg)
    params = eng.state["params"]["nerf"]
    trunk = params["mlp_feat"]
    heads = {k: v for k, v in params.items() if k != "mlp_feat"}
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    pts0 = jnp.asarray(rng.standard_normal((M, 3)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((M, 27)), jnp.float32)
    ll = jnp.asarray(rng.standard_normal((B, 48)), jnp.float32)
    lt = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
    aux3 = jnp.stack([jnp.asarray((2.0 ** np.arange(10)) * np.pi,
                                  jnp.float32), jnp.ones((10,))])
    sections = os.environ.get("SECTIONS", "12345")

    # NOTE: pts/enc/heads are threaded as jit ARGUMENTS everywhere —
    # closed-over arrays stage into the executable as constants (the
    # scoped-VMEM trap) and distort kernel timing
    def field(h, p, e):
        return fused_st_field(p, e, ll, lt, trunk, h, aux3, (4,), 10,
                              R * Ns, compute_dtype=dtype)

    # ---- S1: kernel fwd only, chained on pts
    if "1" in sections:
        def make_s1(depth):
            def f(p, e, h):
                def step(pp, _):
                    rgb, dens, tr = field(h, pp, e)
                    return pp + 1e-6 * rgb, None
                return jax.lax.scan(step, p, None, length=depth)[0][0, 0]
            fj = jax.jit(f)
            return lambda: fj(pts0, enc, heads)
        per, ts = marginal(make_s1)
        print(f"S1 kernel fwd      : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- S6: XLA prologue only — make_xext + enc⊕pts concat + latent
    # rows (everything fused_st_field stages OUTSIDE the pallas_call),
    # chained on pts
    if "6" in sections:
        from texpose_tpu.kernels.fused_st_field import (make_xext,
                                                        _split_head_l0,
                                                        _latent_rows)
        trunk_w = tuple(lp["w"] for lp in trunk)
        F = trunk_w[-1].shape[1] - 1
        rgb_w0 = heads["mlp_rgb"][0]["w"]
        tr_w0 = heads["mlp_trans"][0]["w"]
        c2f_w = jnp.ones((10,))

        def prologue(p, e):
            xext = make_xext(p, 10, c2f_w, dtype)
            wr_f, wr_ep, w_l, w_t = _split_head_l0(rgb_w0, tr_w0, F, 27,
                                                   dtype)
            rep = jnp.concatenate([e, p.astype(e.dtype)], axis=1)
            lrow, trow = _latent_rows(ll, lt, w_l, w_t, dtype)
            return (xext[0, 0].astype(jnp.float32) + rep[0, 0]
                    + lrow[0, 0] + trow[0, 0])

        def make_s6(depth):
            def f(p, e):
                def step(pp, _):
                    return pp + 1e-6 * prologue(pp, e), None
                return jax.lax.scan(step, p, None, length=depth)[0][0, 0]
            fj = jax.jit(f)
            return lambda: fj(pts0, enc)
        per, ts = marginal(make_s6)
        print(f"S6 XLA prologue    : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- S7: pallas fwd only — enc_extra prebuilt OUTSIDE the scan,
    # chained on pts (kernel cost is shape-dependent only)
    if "7" in sections:
        from texpose_tpu.kernels.fused_st_field import (_run_fwd, make_xext,
                                                        _latent_rows,
                                                        _split_head_l0)
        trunk_w = tuple(lp["w"] for lp in trunk)
        trunk_b = tuple(lp["b"] for lp in trunk)
        rgb_w = tuple(lp["w"] for lp in heads["mlp_rgb"])
        rgb_b = tuple(lp["b"] for lp in heads["mlp_rgb"])
        tr_w = tuple(lp["w"] for lp in heads["mlp_trans"])
        tr_b = tuple(lp["b"] for lp in heads["mlp_trans"])
        c2f_w = jnp.ones((10,))
        xext0 = make_xext(pts0, 10, c2f_w, dtype)

        def kern_only(p, e, xe):
            rgb, dens, tr, feat = _run_fwd(
                p, e, ll, lt, trunk_w, trunk_b, rgb_w, rgb_b, tr_w, tr_b,
                aux3, (4,), 10, 512, R * Ns, dtype, False, subtiles=4,
                packed=True, enc_mode="xext", enc_extra=xe, split=True)
            return rgb

        def make_s7(depth):
            def f(p, e, xe):
                def step(pp, _):
                    return pp + 1e-6 * kern_only(pp, e, xe), None
                return jax.lax.scan(step, p, None, length=depth)[0][0, 0]
            fj = jax.jit(f)
            return lambda: fj(pts0, enc, xext0)
        per, ts = marginal(make_s7)
        print(f"S7 pallas fwd only : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- S2: kernel fwd+bwd (grad wrt heads), chained on heads
    if "2" in sections:
        def loss2(h, p, e):
            rgb, dens, tr = field(h, p, e)
            return (rgb ** 2).mean() + (tr ** 2).mean()

        g2 = jax.grad(loss2)

        def make_s2(depth):
            def f(h, p, e):
                def step(hh, _):
                    g = g2(hh, p, e)
                    return jax.tree_util.tree_map(
                        lambda a, b: a - 1e-12 * b, hh, g), None
                return jax.lax.scan(
                    step, h, None, length=depth)[0]["mlp_rgb"][0]["w"][0, 0]
            fj = jax.jit(f)
            return lambda: fj(heads, pts0, enc)
        per, ts = marginal(make_s2)
        print(f"S2 kernel fwd+bwd  : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- S8: fused composite fwd only, chained on rgb_raw
    if "8" in sections:
        from texpose_tpu.kernels.fused_composite import fused_composite_st
        rgbr0 = jnp.asarray(rng.standard_normal((M, 3)), jnp.float32)
        trr0 = jnp.asarray(rng.standard_normal((M, 5)), jnp.float32)
        der0 = jnp.asarray(rng.standard_normal((M, 1)), jnp.float32)
        dep0 = jnp.asarray(
            np.sort(rng.uniform(0.5, 3.0, (B, R, Ns, 1)), axis=2),
            jnp.float32)
        ray0 = jnp.asarray(rng.standard_normal((B, R, 3)), jnp.float32)

        def make_s8(depth):
            def f(rr, tr, de, dp, ry):
                def step(x, _):
                    out = fused_composite_st(x, tr, de, dp, ry)
                    d = jnp.broadcast_to(out["rgb"][:, :, None, :],
                                         (B, R, Ns, 3)).reshape(M, 3)
                    return x + 1e-6 * d, None
                return jax.lax.scan(step, rr, None, length=depth)[0][0, 0]
            fj = jax.jit(f)
            return lambda: fj(rgbr0, trr0, der0, dep0, ray0)
        per, ts = marginal(make_s8)
        print(f"S8 composite fwd   : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- S9: fused composite fwd+bwd (grad wrt rgb_raw+trans_raw)
    if "9" in sections:
        from texpose_tpu.kernels.fused_composite import fused_composite_st
        rgbr0 = jnp.asarray(rng.standard_normal((M, 3)), jnp.float32)
        trr0 = jnp.asarray(rng.standard_normal((M, 5)), jnp.float32)
        der0 = jnp.asarray(rng.standard_normal((M, 1)), jnp.float32)
        dep0 = jnp.asarray(
            np.sort(rng.uniform(0.5, 3.0, (B, R, Ns, 1)), axis=2),
            jnp.float32)
        ray0 = jnp.asarray(rng.standard_normal((B, R, 3)), jnp.float32)

        def closs(rr, tr, de, dp, ry):
            out = fused_composite_st(rr, tr, de, dp, ry)
            return ((out["rgb"] ** 2).mean()
                    + (out["uncert"] ** 2).mean()
                    + out["trans_density_mean"])

        g9 = jax.grad(closs, argnums=(0, 1))

        def make_s9(depth):
            def f(rr, tr, de, dp, ry):
                def step(c, _):
                    x, t = c
                    gx, gt = g9(x, t, de, dp, ry)
                    return (x - 1e-9 * gx, t - 1e-9 * gt), None
                (x, t), _ = jax.lax.scan(step, (rr, tr), None, length=depth)
                return x[0, 0] + t[0, 0]
            fj = jax.jit(f)
            return lambda: fj(rgbr0, trr0, der0, dep0, ray0)
        per, ts = marginal(make_s9)
        print(f"S9 composite f+b   : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- S0: render_patch FWD only (rays+field+composite, no grad),
    # chained on the light latents (cheap dependence into the field)
    if "0" in sections:
        batch0 = jax.tree_util.tree_map(lambda x: x[:B], eng.train_batch)
        coords0, _ = flex_patch_coords(key, B, int(cfg.patch_size))
        p05 = jnp.asarray(0.5)

        def make_s0(depth):
            def f(h, ll_, po, it, zn, zf):
                def step(l, _):
                    out = render_patch(dict(h, mlp_feat=trunk), cfg,
                                       po, it, coords0, zn, zf, lt, l,
                                       key, p05, "train",
                                       compute_dtype=dtype)
                    return l + 1e-6 * out["rgb"].mean(), None
                return jax.lax.scan(step, ll_, None, length=depth)[0][0, 0]
            fj = jax.jit(f)
            return lambda: fj(heads, ll, batch0["pose_init"], batch0["intr"],
                              batch0["z_near"], batch0["z_far"])
        per, ts = marginal(make_s0)
        print(f"S0 render fwd      : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- S3: render_patch uncert loss grad (adds rays+composite+glue)
    if "3" in sections:
        batch = jax.tree_util.tree_map(lambda x: x[:B], eng.train_batch)
        coords, scales = flex_patch_coords(key, B, int(cfg.patch_size))
        sup = sample_patch_images(cfg, batch, coords)
        p05 = jnp.asarray(0.5)

        def rloss(h):
            out = render_patch(dict(h, mlp_feat=trunk), cfg,
                               batch["pose_init"], batch["intr"], coords,
                               batch["z_near"], batch["z_far"], lt, ll,
                               key, p05, "train", compute_dtype=dtype)
            hw = int(cfg.patch_size)
            rgb = out["rgb"].reshape(B, hw, hw, 3).transpose(0, 3, 1, 2)
            unc = out["uncert"].reshape(B, hw, hw, 1).transpose(0, 3, 1, 2)
            m = sup["mask"]
            return ((m * ((sup["image"] - rgb) ** 2 / unc ** 2)).sum()
                    / (m.sum() + 1e-5) + out["trans_density_mean"])

        g3 = jax.grad(rloss)

        def make_s3(depth):
            def step(h, _):
                g = g3(h)
                return jax.tree_util.tree_map(
                    lambda a, b: a - 1e-12 * b, h, g), None
            fj = jax.jit(lambda h: jax.lax.scan(
                step, h, None, length=depth)[0]["mlp_rgb"][0]["w"][0, 0])
            return lambda: fj(heads)
        per, ts = marginal(make_s3)
        print(f"S3 render grad     : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- S4: G-only engine step (gan=None)
    if "4" in sections:
        cfg4 = _bench_cfg(cache, here, "texpose_sections_out4")
        cfg4.gan = None
        for k in ("gan_nerf", "gan_disc_real", "gan_disc_fake",
                  "gan_reg_real", "gan_reg_fake"):
            cfg4.loss_weight[k] = None
        cfg4 = process_options(cfg4)
        cfg4.max_iter = 100000
        eng4 = TextureGANEngine(cfg4)
        eng4.load_dataset()
        eng4.build_networks()
        eng4.setup_optimizer()
        print(f"S4 G-only step     : {engine_step_ms(eng4):7.3f} ms/step",
              flush=True)
        del eng4

    # ---- S5: official G+D step
    if "5" in sections:
        print(f"S5 official step   : {engine_step_ms(eng):7.3f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
