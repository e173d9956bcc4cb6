"""Dev utility: controlled ablations of the texture-GAN long-horizon
quality drift (VERDICT r1 item 3) on the sphere fixture.

Round-1 measured "PSNR 20.8 @ 2k steps -> 14.2 @ 10k steps", but the qual
harness looped DISPATCHES while max_iter counts REAL steps (scan_k=20), so
those were really 40k vs 200k real steps with the lr schedule decayed 20x
early.  This tool uses the corrected accounting (range(0, max_iter, K))
and evaluates the SAME run at several horizons, across loss ablations:

  base    - shipping defaults (feat=-2, no lab, no latent_reg)
  latreg  - + loss_weight.latent_reg=-2 (L2 on per-image latents)
  lab     - + loss_weight.lab=0 (reference layers/lab_loss.py role:
            chromaticity anchor against adversarial color drift)
  nofeat  - loss_weight.feat=None (kill the random-VGG perceptual term)

Env: ABL_PRETRAIN_ITERS (real steps, default 20000),
     ABL_GAN_ITERS (default 20000), ABL_EVAL_AT (comma steps,
     default "2000,10000,20000"), ABL_VARIANTS (default all),
     ABL_PLATFORM=cpu to force the CPU backend.

ONE process, sequential variants (the axon tunnel allows one client).
"""

import os
import sys
import time
import tempfile

if os.environ.get("ABL_PLATFORM") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu_quality_check import _fixture, _base

FIXED_LIGHT = os.environ.get("ABL_FIXED_LIGHT") == "1"
N_TRAIN = int(os.environ.get("ABL_NTRAIN", "16"))


def _fixture_fl():
    """Custom fixture: ABL_FIXED_LIGHT removes per-image lighting variance
    (kills the unseen-lighting PSNR floor); ABL_NTRAIN sets view density
    (16 views x 20k steps = 10k epoch-equivalents — deep view-overfit
    territory vs the reference's ~180 views x 6000 epochs)."""
    from texpose_tpu.data.fixture import generate_fixture
    cache = os.path.join(tempfile.gettempdir(),
                         f"texpose_qual_fixture_fl{N_TRAIN}")
    if not os.path.exists(os.path.join(cache, ".done")):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=N_TRAIN, n_test=2,
                         scene="scene_qual", image_scale=1.0, crop_res=128,
                         fixed_light=True)
        open(os.path.join(cache, ".done"), "w").close()
    return cache


def _get_fixture():
    return _fixture_fl() if FIXED_LIGHT else _fixture()


def _out_root():
    return os.path.join(
        tempfile.gettempdir(),
        f"texpose_qual_fl{N_TRAIN}" if FIXED_LIGHT else "texpose_qual")

VARIANTS = {
    "base": {},
    "latreg": {"latent_reg": -2},
    "lab": {"lab": 0},
    "nofeat": {"feat": None},
    "latreg_lab": {"latent_reg": -2, "lab": 0},
    # D gets the same 10x staircase lr decay as G (the engine supports
    # optim_disc.lr_end; constant-lr D vs decaying-lr G lets D dominate
    # late training)
    "dlr": {"optim_disc.lr_end": 1.e-5},
    "latreg_dlr": {"latent_reg": -2, "optim_disc.lr_end": 1.e-5},
    # control: train under GT poses — if the long-horizon PSNR decline
    # vanishes, the driver is noisy-pose misalignment x texture sharpening
    # (an eval-protocol property, not training pathology)
    "gtpose": {"data.pose_source": "gt"},
    # eval-side mitigation: EMA shadow of the latent tables (training
    # dynamics untouched); r3 candidate vs latreg for the 20k gate
    "ema": {"render.latent_ema": 0.999},
    "ema_latreg": {"render.latent_ema": 0.999, "latent_reg": -2},
    # latent-specific lr (r4: VERDICT item-1 mitigation candidate — latents
    # otherwise ride the head schedule from 1e-3; slow per-image latent
    # drift is the measured 20k-decline driver)
    "latlr": {"optim.lr_latent": 1.e-4},
    "latlr3": {"optim.lr_latent": 3.e-4},
    # r5 drift-ARREST candidate (VERDICT r4 item 4): pull each image's
    # latents toward the stop-gradient mean of its pose-neighborhood —
    # regularizes exactly the spread the topk_mean protocol averages over
    # (pose-aware, unlike the global latent_reg L2 which failed)
    "nbrreg": {"latent_nbr_reg": -2},
    "nbrreg1": {"latent_nbr_reg": -1},
}


def _set_dotted(cfg, key, value):
    node = cfg
    parts = key.split(".")
    for p in parts[:-1]:
        node = node[p]
    node[parts[-1]] = value


def pretrain(cache, iters):
    from texpose_tpu.utils.config import process_options
    from texpose_tpu.models.pretrain import PretrainEngine
    ck = os.path.join(_out_root(), "Duck", "pretrain_model.ckpt")
    stamp = ck + f".abl{iters}"
    if os.path.exists(stamp):
        print(f"PRETRAIN: reusing {ck}", flush=True)
        return
    cfg = _base("nerf_lm_pretrain.yaml", cache)
    cfg.output_root = _out_root()
    cfg.data.scene = "scene_qual"
    cfg.data.pose_source = "gt"
    cfg.nerf.depth.box_source = "gt_box"
    cfg.max_iter = iters
    cfg.name = "qual_pretrain"
    cfg = process_options(cfg)
    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    t0 = time.time()
    K = eng.scan_k()
    for it in range(0, cfg.max_iter, K):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    print(f"PRETRAIN: {iters} steps in {time.time()-t0:.0f}s, "
          f"loss={float(np.asarray(loss['all'])):.4f} "
          f"val={eng.validate(cfg.max_iter)}", flush=True)
    eng.save_checkpoint(cfg.max_iter)
    import shutil
    shutil.copyfile(os.path.join(cfg.output_path, "model.ckpt"), ck)
    open(stamp, "w").close()


def run_variant(cache, name, overrides, iters, eval_at, seed=0):
    from texpose_tpu.utils.config import process_options
    from texpose_tpu.models.texture_gan import TextureGANEngine
    cfg = _base("nerf_lm_adapt_gan.yaml", cache)
    cfg.output_root = _out_root()
    cfg.data.scene = "scene_qual"
    cfg.nerf.depth.box_source = "pred_box_init_calib"
    cfg.max_iter = iters
    cfg.name = f"abl_{name}"
    cfg.seed = seed
    cfg.resume_pretrain = True
    for k, v in overrides.items():
        if "." in k:
            _set_dotted(cfg, k, v)
        else:
            cfg.loss_weight[k] = v
    cfg = process_options(cfg)
    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    eng.restore_pretrained_checkpoint()
    K = eng.scan_k()
    marks = sorted(m for m in eval_at if m <= iters)
    results = []
    t0 = time.time()
    mi = 0
    for it in range(0, iters, K):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        done = it + K
        if mi < len(marks) and done >= marks[mi]:
            ev = eng.evaluate_full()    # config-default latent protocol
            # the eval-latent protocol is a RENDER-TIME choice, so every
            # candidate can be measured on the SAME training run: the
            # reference's random-pick anchor (:487-502, fragile to
            # single-latent drift), whole-table mean, and topk_mean at a
            # wider k (averaging more neighbors dilutes one drifted latent)
            prev_light = eng.cfg.render.get("light", "topk_mean")
            prev_k = int(eng.cfg.render.N_candidate)
            for tag, light, k in (("anchor", "anchor", prev_k),
                                  ("mean", "mean", prev_k),
                                  ("topk8", "topk_mean", 8),
                                  # r5 drift-arrest candidates: outlier-
                                  # robust aggregators over the same 8
                                  # nearest-pose candidates (drift is a FEW
                                  # bad rows — seed 2's topk8 fell 1.6 dB at
                                  # 20k while the 64-row whole-table mean
                                  # stayed flat, QUAL_r5.json)
                                  ("topk8med", "topk_median", 8),
                                  ("topk8rob", "topk_robust", 8)):
                eng.cfg.render.light = light
                eng.cfg.render.N_candidate = k
                e2 = eng.evaluate_full()
                ev[f"psnr_{tag}"], ev[f"ssim_{tag}"] = e2["psnr"], e2["ssim"]
            eng.cfg.render.light = prev_light
            eng.cfg.render.N_candidate = prev_k
            eva = {"psnr": ev["psnr_anchor"], "ssim": ev["ssim_anchor"]}
            # a mark fires at the first dispatch boundary >= the nominal
            # step; record the REAL step count so horizons aren't
            # mislabeled when scan_k doesn't divide the mark
            ev["step_actual"] = done
            results.append((marks[mi], ev))
            cur = {k: round(float(np.asarray(v)), 4)
                   for k, v in sorted(loss.items())}
            print(f"  [{name}] @{marks[mi]:6d} (real {done}): "
                  f"psnr={ev['psnr']:.2f} "
                  f"ssim={ev['ssim']:.3f} ref-anchor {eva['psnr']:.2f}/"
                  f"{eva['ssim']:.3f} ({done/(time.time()-t0):.0f} it/s) "
                  f"loss={cur}", flush=True)
            mi += 1
    host = {k: float(np.asarray(v)) for k, v in loss.items()}
    assert all(np.isfinite(v) for v in host.values()), (name, host)
    return results


def main():
    cache = _get_fixture()
    p_iters = int(os.environ.get("ABL_PRETRAIN_ITERS", "20000"))
    g_iters = int(os.environ.get("ABL_GAN_ITERS", "20000"))
    eval_at = [int(x) for x in os.environ.get(
        "ABL_EVAL_AT", "2000,10000,20000").split(",")]
    names = os.environ.get("ABL_VARIANTS",
                           "base,latreg,lab,nofeat").split(",")
    seeds = [int(s) for s in os.environ.get("ABL_SEEDS", "0").split(",")]
    pretrain(cache, p_iters)
    # table[name][seed] = [(mark, ev), ...]
    table = {}
    for name in names:
        table[name] = {}
        for seed in seeds:
            print(f"=== variant {name} seed {seed} ({VARIANTS[name]}) ===",
                  flush=True)
            table[name][seed] = run_variant(cache, name, VARIANTS[name],
                                            g_iters, eval_at, seed=seed)

    def _means(rows_by_seed, field="psnr"):
        """mark -> mean <field> across seeds."""
        marks = [m for m, _ in next(iter(rows_by_seed.values()))]
        return {m: float(np.mean([dict(rows)[m][field]
                                  for rows in rows_by_seed.values()]))
                for m in marks}

    PROTOCOLS = ("psnr", "psnr_anchor", "psnr_mean", "psnr_topk8",
                 "psnr_topk8med", "psnr_topk8rob")

    print("\n=== SUMMARY (psnr by real step; mean over "
          f"{len(seeds)} seed(s)) ===", flush=True)
    for name, rows_by_seed in table.items():
        for field in PROTOCOLS:
            try:
                mean = _means(rows_by_seed, field)
            except KeyError:
                continue
            cells = "  ".join(f"@{m}: {v:.2f}" for m, v in mean.items())
            per_seed = "; ".join(
                f"s{s}: " + "/".join(f"{dict(rows)[m][field]:.2f}"
                                     for m in sorted(dict(rows)))
                for s, rows in rows_by_seed.items())
            print(f"{name:10s} {field:12s} {cells}   [{per_seed}]",
                  flush=True)

    # driver-visible quality artifact: per-variant per-seed psnr/ssim by
    # horizon; the long-horizon gates evaluate the MEAN across seeds of the
    # FIRST variant (the shipped defaults) — single-run gating was swallowed
    # by the fixture's own +-0.4 dB band (VERDICT r3 weak item 1)
    if os.environ.get("ABL_JSON"):
        import json
        out = {
            "fixture": {"fixed_light": FIXED_LIGHT, "n_train": N_TRAIN,
                        "pretrain_iters": p_iters, "gan_iters": g_iters,
                        "seeds": seeds},
            "variants": {
                name: {str(seed): [{"step": m,
                                    **{k: round(float(v), 4)
                                       for k, v in ev.items()}}
                                   for m, ev in rows]
                       for seed, rows in rows_by_seed.items()}
                for name, rows_by_seed in table.items()},
            "mean_psnr": {name: {str(m): round(v, 4)
                                 for m, v in _means(rbs).items()}
                          for name, rbs in table.items()},
        }
        # per-protocol seed-mean gates on the first (shipped-defaults)
        # variant: which render-time latent protocol survives 20k steps
        proto_gates = {}
        for field in PROTOCOLS:
            try:
                bm = _means(table[names[0]], field)
            except KeyError:
                continue
            g = {"mean_psnr": {str(m): round(v, 4) for m, v in bm.items()}}
            if {2000, 10000} <= set(bm):
                g["gate_10k_ge_2k"] = bool(bm[10000] >= bm[2000])
            if {10000, 20000} <= set(bm):
                g["gate_20k_ge_10k_minus_1db"] = bool(
                    bm[20000] >= bm[10000] - 1.0)
            proto_gates[field] = g
        out["protocol_gates"] = proto_gates
        # per-variant per-seed 20k decline (peak-to-20k drop per seed, plus
        # the cross-seed 20k spread) — the drift signature the r5 gate
        # watches beyond the seed-mean (VERDICT r4 weak item 4)
        drift = {}
        for name, rows_by_seed in table.items():
            by_proto = {}
            for f in ("psnr_topk8", "psnr_topk8med", "psnr_topk8rob",
                      "psnr"):
                per_seed = {}
                vals_20k = []
                for seed, rows in rows_by_seed.items():
                    d = dict(rows)
                    if 20000 not in d or f not in d[20000]:
                        continue
                    peak = max(ev[f] for ev in d.values())
                    per_seed[str(seed)] = {
                        "psnr_20k": round(float(d[20000][f]), 4),
                        "decline_from_peak": round(
                            float(peak - d[20000][f]), 4)}
                    vals_20k.append(float(d[20000][f]))
                if vals_20k:
                    by_proto[f] = {
                        "per_seed": per_seed,
                        "spread_20k": round(max(vals_20k) - min(vals_20k),
                                            4)}
                if f == "psnr_topk8" and vals_20k:
                    # r4-compatible top-level shape (psnr_topk8 primary)
                    drift[name] = {"per_seed": per_seed,
                                   "spread_20k": by_proto[f]["spread_20k"],
                                   "protocol": "psnr_topk8"}
            if name in drift:
                drift[name]["by_protocol"] = by_proto
        out["drift_20k"] = drift
        by_mark = _means(table[names[0]])
        if {2000, 10000} <= set(by_mark):
            out["gate_10k_ge_2k"] = bool(by_mark[10000] >= by_mark[2000])
        if {10000, 20000} <= set(by_mark):
            out["gate_20k_ge_10k_minus_1db"] = bool(
                by_mark[20000] >= by_mark[10000] - 1.0)
        with open(os.environ["ABL_JSON"], "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {os.environ['ABL_JSON']}", flush=True)


if __name__ == "__main__":
    main()
