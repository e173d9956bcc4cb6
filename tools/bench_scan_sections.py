"""Dev utility: scan-chained section decomposition of the texture step.

Every number is a MARGINAL per-step cost from two lax.scan depths with a
blocking host read — the only trustworthy single-section pattern through
the TPU tunnel (dispatch-loop timeit carries per-dispatch transport
overhead; see CLAUDE.md measurement warnings).  Sections are nested
subsets of the official bench workload (bench.py: 8 x 16x16 patches,
64 samples, 131072 field rows):

  S0 render fwd        render_patch forward (rays+field+composite)
  S1 kernel fwd        fused ST-field forward only
  S2 kernel fwd+bwd    + the fused head backward (grad wrt heads)
  S3 render grad       + ray sampling, composite, uncert render loss
  S4 G-only step       full engine step with gan=None (+VGG, lab,
                       latent gather, optimizer) — engine scan, dispatch
                       timed (already scan-fused)
  S5 official step     G+D step (bench.py path) — engine scan
  S6 XLA prologue      make_xext + enc⊕pts concat + latent rows only
  S7 pallas fwd only   _run_fwd with enc_extra prebuilt outside the scan
  S8/S9 composite      fused composite alone, fwd / fwd+bwd
  Sa/Sb/Sc             rays+bounds / sample_depth / full glue, field
                       stubbed to a linear map
  Sd/Sg                field+composite chained (slice-planes / transposed-
                       planes prep)
  Se/Sf                S0 with bounds / stratification ablated in-situ

Deltas attribute: S3-S2 = composite+glue, S4-S3 ~= losses+optimizer,
S5-S4 = discriminator step (+gan_nerf fwd in G loss).  IMPORTANT:
cross-PROCESS deltas at <0.3 ms are meaningless on this tunnel — compare
only sections run in the same process (e.g. SECTIONS=1dc0).

r3 findings (one process, v5e): S1 2.18 / Sd 2.42 / S0 3.08 / Sc 0.10 —
the fused composite (S8 0.005, S9 0.075) and every glue op are ~free in
isolation; the render step's extra ~0.9 ms over the bare kernel is an
interaction around the pallas boundary (transposed-plane prep measured
WORSE, 2.87).  Bounds gathers and stratified threefry are ~0.05-0.07 each
(Se/Sf)."""

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

    # ---- Sa: get_rays + get_bounds only, chained on coords
    if "a" in sections:
        from texpose_tpu.sampling.ray_sampler import get_rays, get_bounds
        batch_a = jax.tree_util.tree_map(lambda x: x[:B], eng.train_batch)
        coords_a, _ = flex_patch_coords(key, B, int(cfg.patch_size))

        def make_sa(depth):
            def f(c, po, it, zn, zf):
                def step(cc, _):
                    ctr, ray = get_rays(it, cc, po, cfg.H, cfg.W)
                    near, far = get_bounds(cc, zn, zf, cfg.H, cfg.W)
                    d = (ctr.mean() + ray.mean() + near.mean()
                         + far.mean())
                    return cc + 1e-9 * d, None
                return jax.lax.scan(step, c, None, length=depth)[0][0, 0, 0,
                                                                    0]
            fj = jax.jit(f)
            return lambda: fj(coords_a, batch_a["pose_init"],
                              batch_a["intr"], batch_a["z_near"],
                              batch_a["z_far"])
        per, ts = marginal(make_sa)
        print(f"Sa rays+bounds     : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- Sb: stratified sample_depth only, chained on near
    if "b" in sections:
        from texpose_tpu.ops.render import sample_depth
        near0 = jnp.full((B, R), 0.5, jnp.float32)
        far0 = jnp.full((B, R), 3.0, jnp.float32)

        def make_sb(depth):
            def f(nr, fr):
                def step(nn, _):
                    d = sample_depth(key, nn, fr, Ns, stratified=True,
                                     param=cfg.nerf.depth.param)
                    return nn + 1e-9 * d.mean(), None
                return jax.lax.scan(step, nr, None, length=depth)[0][0, 0]
            fj = jax.jit(f)
            return lambda: fj(near0, far0)
        per, ts = marginal(make_sb)
        print(f"Sb sample_depth    : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- Sc: the EXACT render_patch fwd glue with the FIELD stubbed to a
    # linear map (rays, bounds, stratified depth, pts build, per-ray enc +
    # broadcast, fused composite, output dict) — chained on ll like S0
    if "c" in sections:
        from texpose_tpu.sampling.ray_sampler import get_rays, get_bounds
        from texpose_tpu.ops.render import sample_depth
        from texpose_tpu.kernels.fused_composite import fused_composite_st
        from texpose_tpu.nn.fields import _encode_view
        batch_c = jax.tree_util.tree_map(lambda x: x[:B], eng.train_batch)
        coords_c, _ = flex_patch_coords(key, B, int(cfg.patch_size))
        w9 = jnp.asarray(rng.standard_normal((30, 9)) * 0.1, jnp.float32)
        hw = int(cfg.patch_size)

        def make_sc(depth):
            def f(l, po, it, zn, zf):
                def step(ll_, _):
                    ctr, ray = get_rays(it, coords_c, po, cfg.H, cfg.W)
                    ctr = ctr.reshape(B, hw * hw, 3)
                    ray = ray.reshape(B, hw * hw, 3)
                    near, far = get_bounds(coords_c, zn, zf, cfg.H, cfg.W)
                    near = near.reshape(B, hw * hw)
                    far = far.reshape(B, hw * hw)
                    dep = sample_depth(key, near, far, Ns, stratified=True,
                                       param=cfg.nerf.depth.param)
                    pts = ctr[..., None, :] + ray[..., None, :] * dep
                    ru = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
                    e = _encode_view(cfg, ru, jnp.asarray(0.5), c2f=True)
                    e = jnp.broadcast_to(e[..., None, :],
                                         (B, hw * hw, Ns, e.shape[-1]))
                    x = jnp.concatenate(
                        [pts.reshape(-1, 3),
                         e.reshape(-1, e.shape[-1])], axis=1)
                    raw = (x @ w9) + ll_[0, :9]
                    out = fused_composite_st(raw[:, :3], raw[:, 3:8],
                                             raw[:, 8:9], dep, ray)
                    return ll_ + 1e-6 * out["rgb"].mean(), None
                return jax.lax.scan(step, l, None, length=depth)[0][0, 0]
            fj = jax.jit(f)
            return lambda: fj(ll, batch_c["pose_init"], batch_c["intr"],
                              batch_c["z_near"], batch_c["z_far"])
        per, ts = marginal(make_sc)
        print(f"Sc glue (no field) : {per:7.3f} ms/step  {ts}", flush=True)

    # ---- Sd: field + composite with pts/enc GIVEN (chained on pts like
    # S1); Sd−S1 isolates the composite boundary, S0−Sd the ray/enc
    # producer chain feeding the kernel
    if "d" in sections:
        from texpose_tpu.kernels.fused_composite import fused_composite_st
        dep_d = jnp.asarray(
            np.sort(rng.uniform(0.5, 3.0, (B, R, Ns, 1)), axis=2),
            jnp.float32)
        ray_d = jnp.asarray(rng.standard_normal((B, R, 3)), jnp.float32)

        for flat in (False, True):
            def make_sd(depth, flat=flat):
                def f(p, e, h, dp, ry):
                    def step(pp, _):
                        rgb, dens, tr = field(h, pp, e)
                        out = fused_composite_st(rgb, tr, dens, dp, ry,
                                                 flat=flat)
                        return pp + 1e-6 * out["rgb"].mean(), None
                    return jax.lax.scan(step, p, None,
                                        length=depth)[0][0, 0]
                fj = jax.jit(f)
                return lambda: fj(pts0, enc, heads, dep_d, ray_d)
            per, ts = marginal(make_sd)
            print(f"Sd field+composite (flat={int(flat)}): {per:7.3f} "
                  f"ms/step  {ts}", flush=True)

    # ---- Sg: field + composite OP with channel planes prebuilt OUTSIDE
    # the scan (no per-step [M,C]→[BR,N] slicing); Sd−Sg isolates the
    # plane-slicing relayout cost at the composite boundary
    if "g" in sections:
        from texpose_tpu.kernels.fused_composite import _make_op
        dep_g = jnp.asarray(
            np.sort(rng.uniform(0.5, 3.0, (B, R, Ns, 1)), axis=2),
            jnp.float32).reshape(B * R, Ns)
        dist_g = jnp.concatenate(
            [dep_g[:, 1:] - dep_g[:, :-1],
             jnp.full_like(dep_g[:, :1], 1e10)], axis=1)
        comp_op = _make_op(Ns, 0.05, 256, False)
        BR = B * R

        def make_sg(depth):
            def f(p, e, h, dist, dep):
                def step(pp, _):
                    rgb, dens, tr = field(h, pp, e)
                    # transpose-based plane prep: one [M,C]→[C,M] relayout
                    # per tensor, then FREE [M]→[BR,N] reshapes
                    rT, tT, dT = rgb.T, tr.T, dens.T
                    planes = ([rT[c].reshape(BR, Ns) for c in range(3)]
                              + [tT[c].reshape(BR, Ns) for c in range(5)]
                              + [dT[0].reshape(BR, Ns)])
                    packed = comp_op(*planes, dist, dep)
                    return pp + 1e-6 * (rgb + packed[:1, :3].mean()), None
                return jax.lax.scan(step, p, None, length=depth)[0][0, 0]
            fj = jax.jit(f)
            return lambda: fj(pts0, enc, heads, dist_g, dep_g)
        per, ts = marginal(make_sg)
        print(f"Sg field+comp(transposed planes): {per:7.3f} ms/step  {ts}",
              flush=True)

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

    # ---- Se/Sf: S0 in-situ ablations — e: constant bounds (no
    # grid_sample gathers), f: stratified=False (no per-step threefry)
    for tag, patch in (("e", "bounds"), ("f", "strat")):
        if tag not in sections:
            continue
        batch_e = jax.tree_util.tree_map(lambda x: x[:B], eng.train_batch)
        coords_e, _ = flex_patch_coords(key, B, int(cfg.patch_size))
        p05 = jnp.asarray(0.5)
        import texpose_tpu.models.texture_gan as tg_mod
        import texpose_tpu.models.render as rd_mod
        orig_gb = tg_mod.get_bounds
        orig_sd = rd_mod.sample_depth
        if patch == "bounds":
            tg_mod.get_bounds = lambda c, zn, zf, H, W: (
                jnp.full(c.shape[:3], 0.5, jnp.float32),
                jnp.full(c.shape[:3], 3.0, jnp.float32))
        else:
            rd_mod.sample_depth = (
                lambda k, lo, hi, n, stratified=True, param=None:
                orig_sd(k, lo, hi, n, stratified=False, param=param))

        def make_se(depth):
            def f(h, ll_, po, it, zn, zf):
                def step(l, _):
                    out = render_patch(dict(h, mlp_feat=trunk), cfg,
                                       po, it, coords_e, zn, zf, lt, l,
                                       key, p05, "train",
                                       compute_dtype=dtype)
                    return l + 1e-6 * out["rgb"].mean(), None
                return jax.lax.scan(step, ll_, None, length=depth)[0][0, 0]
            fj = jax.jit(f)
            return lambda: fj(heads, ll, batch_e["pose_init"],
                              batch_e["intr"], batch_e["z_near"],
                              batch_e["z_far"])
        per, ts = marginal(make_se)
        print(f"S{tag} S0 w/o {patch:6s}: {per:7.3f} ms/step  {ts}",
              flush=True)
        tg_mod.get_bounds = orig_gb
        rd_mod.sample_depth = orig_sd

    # ---- Sh: S0 with the per-ray ENC precomputed outside the scan (pts
    # and everything else live); Si: pts ALSO precomputed (only depth/
    # composite/loss glue live).  One process with S0 pins the producer
    # chain in-situ.
    if "h" in sections or "i" in sections:
        from texpose_tpu.sampling.ray_sampler import get_rays, get_bounds
        from texpose_tpu.ops.render import sample_depth
        from texpose_tpu.kernels.fused_composite import fused_composite_st
        from texpose_tpu.nn.fields import apply_nerf_st_raw, _encode_view
        batch_h = jax.tree_util.tree_map(lambda x: x[:B], eng.train_batch)
        coords_h, _ = flex_patch_coords(key, B, int(cfg.patch_size))
        hw = int(cfg.patch_size)
        ctr0, ray0 = get_rays(batch_h["intr"], coords_h,
                              batch_h["pose_init"], cfg.H, cfg.W)
        ctr0 = ctr0.reshape(B, hw * hw, 3)
        ray0 = ray0.reshape(B, hw * hw, 3)
        near0, far0 = get_bounds(coords_h, batch_h["z_near"],
                                 batch_h["z_far"], cfg.H, cfg.W)
        near0 = near0.reshape(B, hw * hw)
        far0 = far0.reshape(B, hw * hw)
        dep0 = sample_depth(key, near0, far0, Ns, stratified=True,
                            param=cfg.nerf.depth.param)
        ru0 = ray0 / jnp.linalg.norm(ray0, axis=-1, keepdims=True)
        pts_pre = (ctr0[..., None, :] + ray0[..., None, :] * dep0)

        for tag in "hi":
            if tag not in sections:
                continue

            def make_sh(depth, tag=tag):
                def f(h, l, ctr, ray, dep, ppre):
                    def step(ll_, _):
                        if tag == "h":
                            pts = (ctr[..., None, :]
                                   + ray[..., None, :] * dep)
                        else:
                            pts = ppre
                        ru = ray / jnp.linalg.norm(ray, axis=-1,
                                                   keepdims=True)
                        rgb, dens, tr = apply_nerf_st_raw(
                            dict(h, mlp_feat=trunk), cfg, pts, ru,
                            lt, ll_, jnp.asarray(0.5), dtype)
                        out = fused_composite_st(rgb, tr, dens, dep, ray)
                        return ll_ + 1e-6 * out["rgb"].mean(), None
                    return jax.lax.scan(step, l, None,
                                        length=depth)[0][0, 0]
                fj = jax.jit(f)
                return lambda: fj(heads, ll, ctr0, ray0, dep0, pts_pre)
            per, ts = marginal(make_sh)
            nm = ("Sh rays/dep given  " if tag == "h"
                  else "Si pts also given  ")
            print(f"{nm}: {per:7.3f} ms/step  {ts}", flush=True)

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
