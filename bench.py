"""Benchmark: texture-GAN training throughput (rays/sec/chip) at the
reference workload envelope (BASELINE.md): 8 x 16x16 patches = 2048 rays/step,
64 samples/ray, 8x256 trunk + 256-wide heads, generator+discriminator
updates in one jitted step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.json
`"published": {}`); the denominator is an estimated A100 throughput for the
reference PyTorch step — ~10 it/s x 2048 rays = 20480 rays/s — so
vs_baseline ≈ speedup over the reference per chip (target ≥10).
"""

import json
import os
import sys
import time
import tempfile

import numpy as np

A100_REFERENCE_RAYS_PER_SEC = 20480.0
# v5e-1 peak bf16 throughput — the roofline every reading is audited against
V5E_PEAK_BF16_TFLOPS = 197.0
# Estimated reference full-frame eval throughput on A100: ~150 sequential
# 2048-ray chunk renders per 480x640 frame (SURVEY.md §3 hot loop #4) at
# ~10 it/s ≈ 0.07 views/s; only the masked object subset renders, so ~0.3
# views/s is a fair denominator for a ~15%-coverage LineMOD crop.
A100_REFERENCE_VIEWS_PER_SEC = 0.3


def _bench_cfg(cache, here, output_sub):
    """Shared benchmark config bootstrap (both metrics must measure the
    same model/data envelope).  Callers run process_options exactly ONCE
    after applying their overrides."""
    from texpose_tpu.utils.config import load_yaml
    cfg = load_yaml(os.path.join(here, "configs", "nerf_lm_adapt_gan.yaml"))
    cfg.yaml = "configs/nerf_lm_adapt_gan.yaml"
    cfg.data.root = cache
    cfg.data.splits_root = os.path.join(cache, "splits")
    cfg.data.object = "ball"
    cfg.nerf.depth.box_source = "pred_box_init_calib"
    cfg.output_root = os.path.join(tempfile.gettempdir(), output_sub)
    return cfg


def field_flops_per_step(cfg):
    """Analytic matmul-FLOP lower bound of one texture train step: the ST
    field fwd + head bwd over M = batch·patch²·samples rows.  Trunk is
    frozen (fwd only); the fused bwd recomputes the heads and forms dW/dX
    (≈3× head fwd).  Composite / discriminator / VGG convs are excluded —
    the bound is what the MFU column audits against, so under-counting is
    the safe direction.
    """
    L3 = int(cfg.arch.posenc.L_3D)
    Lv = int(cfg.arch.posenc.L_view)
    in3, inv = 6 * L3 + 3, 6 * Lv + 3
    skip = set(cfg.arch.skip)

    def dims(spec, d_in):
        # mirrors nn/fields.py init logic: skip layers concat the posenc
        ds, prev = [], d_in
        for li, d in enumerate(spec[1:]):
            d_prev = prev + (in3 if li in skip else 0)
            ds.append((d_prev, d))
            prev = d
        return ds

    feat = dims(list(cfg.arch.layers_feat), in3)
    F = feat[-1][1]        # trunk feature width (the density col is +1 on
    #                        the last layer — ~2·in extra flops, ignored)
    rgb_in = F + inv + 3 + int(cfg.nerf.N_latent_light)
    rgb = dims(list(cfg.arch.layers_rgb), rgb_in)
    trans = dims(list(cfg.arch.layers_trans),
                 F + int(cfg.nerf.N_latent_trans))
    t = sum(2 * a * b for a, b in feat)
    h = sum(2 * a * b for a, b in rgb) + sum(2 * a * b for a, b in trans)
    M = int(cfg.batch_size) * int(cfg.patch_size) ** 2 \
        * int(cfg.nerf.sample_intvs)
    return M * (t + h + 3 * h)               # fwd + (recompute+dW+dX) bwd


def _cycled_test_split(cache, n_frames):
    """Derived scene dir whose test.txt cycles the fixture's test entries
    to n_frames lines — every index still pays the full per-frame
    disk→device→render→metrics→PNG pipeline (same trick as
    tools/bench_eval_envelope.py)."""
    import shutil
    split_src = os.path.join(cache, "splits", "lm", "ball", "scene_all")
    scene = f"scene_e2e{n_frames}"
    split_dst = os.path.join(cache, "splits", "lm", "ball", scene)
    os.makedirs(split_dst, exist_ok=True)
    test_lines = [ln for ln in open(os.path.join(split_src, "test.txt"))
                  if ln.strip()]
    with open(os.path.join(split_dst, "test.txt"), "w") as f:
        for i in range(n_frames):
            f.write(test_lines[i % len(test_lines)])
    for name in ("train.txt", "val.txt"):
        shutil.copy(os.path.join(split_src, name),
                    os.path.join(split_dst, name))
    return scene


def eval_views_per_sec(cache, here, reps=5):
    """480x640 novel-view synthesis throughput: (render-only views/s,
    end-to-end views/s, e2e frame count).

    Render-only repeats the masked full-frame render of one cached device
    frame (the kernel-envelope number).  End-to-end streams an
    N-frame cycled split through evaluate_full — disk load, device
    transfer, render, on-device metrics, PNG export — the number a user
    of the reference's eval workload (README.md:49-64) actually sees
    (VERDICT r4: these differed by 13×; bench.py must carry both)."""
    import jax
    import jax.numpy as jnp
    from texpose_tpu.utils.config import process_options
    from texpose_tpu.models.texture_gan import TextureGANEngine

    cfg = _bench_cfg(cache, here, "texpose_bench_eval_out")
    cfg.syn2real = True
    # official metric is 480x640; the env knob exists for CPU smoke tests
    cfg.data.image_size = json.loads(
        os.environ.get("BENCH_EVAL_SIZE", "[480, 640]"))
    cfg = process_options(cfg)
    cfg.max_iter = 10

    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test", prefetch_train=False)
    eng.build_networks()
    eng.setup_optimizer()
    frame = eng.eval_frame(0)
    lt = jnp.zeros((1, cfg.nerf.N_latent_trans))
    ll = eng.state["latents"]["light"][0:1]
    out = eng._render_frame_st(frame, lt, ll, masked=True)   # compile
    jax.block_until_ready(out["rgb_static"])
    # median of per-frame times: the tunnel's sporadic latency spikes land
    # on individual frames, and a single spiked frame inside a mean drove
    # the r3 "views/s regression" (6.97 in-bench vs 10.02 standalone)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = eng._render_frame_st(frame, lt, ll, masked=True)
        jax.block_until_ready(out["rgb_static"])
        times.append(time.perf_counter() - t0)
    render_only = 1.0 / float(np.median(times))

    # ---- end-to-end sweep on the SAME engine (render jits stay warm) ----
    # N=256: at N=64 the sweep's fixed overhead (evaluate_full setup,
    # prefetcher spin-up, final aggregation ≈ 5 s) dominated the ~50 ms/frame
    # steady state and read 7.66 views/s where the standalone 1869-frame
    # envelope (EVAL_ENVELOPE.json) measures 19.9; 256 frames amortize the
    # fixed cost to <30% while keeping the sweep under ~30 s of bench wall
    n_e2e = int(os.environ.get("BENCH_EVAL_E2E_N", "256"))
    e2e = None
    if n_e2e > 0:
        # guarded: an e2e failure must not discard the render-only metric
        # that was already measured above
        try:
            eng.cfg.data.scene = _cycled_test_split(cache, n_e2e)
            eng.eval_data = eng.make_dataset("test")
            eng._eval_cache = (None, None)
            # compile the full per-frame eval pipeline (compact
            # render+metrics jit) off the clock — steady-state is the
            # measured quantity
            eng.warm_eval(0)
            t0 = time.perf_counter()
            eng.evaluate_full()
            e2e = n_e2e / (time.perf_counter() - t0)
        except Exception as exc:                      # noqa: BLE001
            print(f"[bench] e2e eval sweep failed: {exc!r}",
                  file=sys.stderr, flush=True)
    return render_only, e2e, n_e2e


def pretrain_rays_per_sec(here):
    """Geometry-pretrain train-step throughput (rays/s) at the reference
    envelope (options/nerf_lm_pretrain.yaml:26-30: 2048 rays × 64 samples),
    same scan-fused blocking-read timing as the texture metric."""
    import jax
    from texpose_tpu.utils.config import load_yaml, process_options
    from texpose_tpu.models.pretrain import PretrainEngine

    # the qual fixture (ONE definition — tools/tpu_quality_check._fixture)
    sys.path.insert(0, os.path.join(here, "tools"))
    from tpu_quality_check import _fixture
    cache = _fixture()
    cfg = load_yaml(os.path.join(here, "configs", "nerf_lm_pretrain.yaml"))
    cfg.yaml = "configs/nerf_lm_pretrain.yaml"
    cfg.data.root = cache
    cfg.data.splits_root = os.path.join(cache, "splits")
    cfg.data.object = "ball"
    cfg.data.scene = "scene_qual"
    cfg.data.pose_source = "gt"
    cfg.nerf.depth.box_source = "gt_box"
    cfg.output_root = os.path.join(tempfile.gettempdir(),
                                   "texpose_bench_pre_out")
    cfg.max_iter = 100000
    if os.environ.get("BENCH_SCAN_STEPS"):
        cfg.scan_steps = int(os.environ["BENCH_SCAN_STEPS"])
    cfg = process_options(cfg)

    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    K = eng.scan_k()
    for _ in range(3):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    jax.block_until_ready(loss["all"])
    chunk_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(3):
            eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        jax.block_until_ready(loss["all"])
        chunk_times.append((time.perf_counter() - t0) / (3 * K))
    return int(cfg.nerf.rand_rays) / float(np.median(chunk_times))


def main():
    import jax
    import jax.numpy as jnp
    from texpose_tpu.data.fixture import generate_fixture
    from texpose_tpu.utils.config import process_options
    from texpose_tpu.models.texture_gan import TextureGANEngine

    here = os.path.dirname(os.path.abspath(__file__))

    # fixture data at the production crop size (cached across runs)
    cache = os.path.join(tempfile.gettempdir(), "texpose_bench_fixture_v1")
    marker = os.path.join(cache, ".done")
    if not os.path.exists(marker):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=16, n_test=1, scene="scene_all",
                         image_scale=1.0, crop_res=128)
        open(marker, "w").close()
    cfg = _bench_cfg(cache, here, "texpose_bench_out")
    cfg = process_options(cfg)
    cfg.max_iter = 100000
    # perf A/B knob: dispatch fusion depth (gcd-clamped to freq hooks)
    if os.environ.get("BENCH_SCAN_STEPS"):
        cfg.scan_steps = int(os.environ["BENCH_SCAN_STEPS"])

    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()

    rays_per_step = int(cfg.batch_size) * int(cfg.patch_size) ** 2
    scan_k = eng.scan_k()          # steps fused per dispatch (lax.scan)

    # warmup (compile + first steps)
    warmup = 10
    for it in range(warmup):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    jax.block_until_ready(loss["all"])

    # chunked timing with a blocking read per chunk; the TPU tunnel adds
    # sporadic latency spikes, so record the full chunk distribution and
    # make the MEDIAN the headline (min kept as the best-case figure)
    n_steps = int(os.environ.get("BENCH_STEPS", "100"))
    n_chunks = 5
    per_chunk = max(n_steps // n_chunks, 1)
    chunk_times = []
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        for _ in range(per_chunk):
            eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        jax.block_until_ready(loss["all"])
        chunk_times.append((time.perf_counter() - t0) / per_chunk)
    median = float(np.median(chunk_times))
    best = float(np.min(chunk_times))

    # self-audit: an analytic FLOP lower bound caps any physically possible
    # reading (CLAUDE.md measurement warning — unscanned timings through
    # the tunnel have reported >500 TFLOPs); a reading above the roofline
    # is a measurement bug, never a result
    flops_step = field_flops_per_step(cfg) * scan_k
    backend = jax.default_backend()
    mfu = {}
    if backend == "tpu":
        for name, t in (("mfu_pct", median), ("mfu_pct_min", best)):
            mfu[name] = round(
                100 * flops_step / t / (V5E_PEAK_BF16_TFLOPS * 1e12), 2)
        if mfu["mfu_pct_min"] > 100:
            raise RuntimeError(
                f"physically impossible reading: min chunk implies "
                f"{mfu['mfu_pct_min']:.0f}% of the {V5E_PEAK_BF16_TFLOPS} "
                f"TFLOPs bf16 roofline — timing did not block on the "
                f"dispatch chain")

    rays_per_sec = rays_per_step * scan_k / median
    result = {
        "metric": "texture_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / A100_REFERENCE_RAYS_PER_SEC, 3),
        "value_min_chunk": round(rays_per_step * scan_k / best, 1),
        **mfu,
    }

    # secondary headline metric (BASELINE.md): 480x640 novel-view synthesis
    # throughput.  Guarded — a failure here must not lose the primary number.
    if os.environ.get("BENCH_EVAL", "1") != "0":
        try:
            # release the training engine's HBM (state pytree + batch +
            # jit executables hold multiple GB) before building the eval
            # engine — in-process pressure from the train bench measurably
            # slowed the eval renders (r3: 6.97 in-bench vs 10.02
            # standalone for the identical masked render)
            del eng, loss
            import gc
            gc.collect()
            vps, vps_e2e, n_e2e = eval_views_per_sec(
                cache, here, reps=int(os.environ.get("BENCH_EVAL_REPS", "9")))
            result["views_per_sec_480x640"] = round(vps, 3)
            result["views_vs_baseline"] = round(
                vps / A100_REFERENCE_VIEWS_PER_SEC, 3)
            if vps_e2e is not None:
                # end-to-end streaming evaluate_full (disk→device→render→
                # metrics→PNG) — the user-facing number; render-only above
                # is the kernel envelope (r4 verdict: carry both)
                result["views_per_sec_e2e"] = round(vps_e2e, 3)
                result["views_e2e_frames"] = n_e2e
        except Exception as e:    # noqa: BLE001
            print(f"eval views/sec bench failed: {e!r}", file=sys.stderr)

    # pretrain engine throughput (BASELINE.md ≥300k bar; VERDICT r4 item 5:
    # track per round).  Guarded like the eval metric.
    if os.environ.get("BENCH_PRETRAIN", "1") != "0":
        try:
            import gc
            gc.collect()
            pre = pretrain_rays_per_sec(here)
            result["pretrain_rays_per_sec"] = round(pre, 1)
            result["pretrain_vs_baseline"] = round(
                pre / A100_REFERENCE_RAYS_PER_SEC, 3)
        except Exception as e:    # noqa: BLE001
            print(f"pretrain bench failed: {e!r}", file=sys.stderr)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
