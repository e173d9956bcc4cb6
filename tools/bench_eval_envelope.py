"""Rehearse the reference's REAL eval envelope: a ~1869-frame 480x640
syn2real test split (reference README.md:49-64 — the LineMOD Duck test set)
streamed through evaluate_full end-to-end (per-frame disk load -> device
transfer -> masked render -> metrics -> PNG dump), timing the whole sweep
and asserting device memory stays O(1 frame) (models/base.py:105-133
streaming contract).

Usage:
  python tools/bench_eval_envelope.py               # full 1869 @ 480x640 (TPU)
  EVAL_N=8 EVAL_HW=96,128 python tools/bench_eval_envelope.py   # CPU smoke

Writes EVAL_ENVELOPE.json at the repo root:
  {"frames": N, "wall_s": ..., "views_per_s": ..., "psnr": ...,
   "peak_hbm_mb": ..., "hbm_delta_mb": ..., "o1_frame_memory": true}
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EVAL_N = int(os.environ.get("EVAL_N", "1869"))
HW = tuple(int(x) for x in os.environ.get("EVAL_HW", "480,640").split(","))
OUT_JSON = os.environ.get("EVAL_JSON", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "EVAL_ENVELOPE.json"))


def _mem_mb():
    """Device memory in use (MB) — TPU backends report memory_stats;
    CPU returns None (the O(1) check then falls back to host RSS)."""
    import jax
    stats = jax.local_devices()[0].memory_stats() or {}
    b = stats.get("bytes_in_use")
    return None if b is None else b / 1e6


def _peak_mb():
    import jax
    stats = jax.local_devices()[0].memory_stats() or {}
    b = stats.get("peak_bytes_in_use")
    return None if b is None else b / 1e6


def _rss_mb():
    """Host resident-set size (MB) — informational on the axon backend:
    the tunnel client retains a host copy of EVERY upload for the life of
    the process (tools/probe_axon_leak.py — 100 raw device_puts leak their
    exact byte count; del/.delete()/block_until_ready reclaim nothing), so
    RSS grows by ~uploaded-bytes regardless of framework behavior."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1e3  # kB → MB
    except OSError:
        pass
    return None


def _live_device_mb():
    """Client-tracked live device-array bytes (MB) — the O(1)-frame
    contract is about DEVICE footprint; this is the measurable signal on
    backends whose memory_stats() is None (the axon tunnel)."""
    import jax
    return sum(a.size * a.dtype.itemsize for a in jax.live_arrays()) / 1e6


def main():
    from texpose_tpu.utils.config import load_yaml, process_options
    from texpose_tpu.models.texture_gan import TextureGANEngine
    from texpose_tpu.data.fixture import generate_fixture
    import jax

    cache = os.path.join(tempfile.gettempdir(), "texpose_bench_fixture_v1")
    if not os.path.exists(os.path.join(cache, ".done")):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=16, n_test=1, scene="scene_all",
                         image_scale=1.0, crop_res=128)
        open(os.path.join(cache, ".done"), "w").close()

    # synthetic long split: cycle the fixture's test entries to EVAL_N lines
    # in a derived scene dir (same frames on disk — every index still does
    # the full per-frame disk->device->render->metrics->PNG pipeline)
    split_src = os.path.join(cache, "splits", "lm", "ball", "scene_all")
    scene = f"scene_env{EVAL_N}"
    split_dst = os.path.join(cache, "splits", "lm", "ball", scene)
    os.makedirs(split_dst, exist_ok=True)
    test_lines = [ln for ln in open(os.path.join(split_src, "test.txt"))
                  if ln.strip()]
    with open(os.path.join(split_dst, "test.txt"), "w") as f:
        for i in range(EVAL_N):
            f.write(test_lines[i % len(test_lines)])
    for name in ("train.txt", "val.txt"):
        shutil.copy(os.path.join(split_src, name),
                    os.path.join(split_dst, name))

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_yaml(os.path.join(here, "configs", "nerf_lm_adapt_gan.yaml"))
    cfg.yaml = "x"
    cfg = process_options(cfg)
    cfg.data.root = cache
    cfg.data.splits_root = os.path.join(cache, "splits")
    cfg.data.object = "ball"
    cfg.data.scene = scene
    cfg.nerf.depth.box_source = "pred_box_init_calib"
    out_root = os.path.join(tempfile.gettempdir(), "texpose_eval_envelope")
    shutil.rmtree(out_root, ignore_errors=True)
    cfg.output_root = out_root
    cfg.syn2real = True
    cfg.data.image_size = list(HW)
    cfg = process_options(cfg)
    cfg.max_iter = 10

    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test", prefetch_train=False)
    eng.build_networks()
    eng.setup_optimizer()
    n = len(eng.eval_data)
    assert n == EVAL_N, (n, EVAL_N)

    # warm the compile caches on one frame so the sweep times steady-state
    # (render + metrics + PNG-payload jits — the r4 envelope left the
    # metrics compile inside the clock: ~45 s of its 71 s wall at N=100)
    eng.warm_eval(0)
    eng._eval_cache = (None, None)

    m0, r0, lv0 = _mem_mb(), _rss_mb(), _live_device_mb()
    t0 = time.perf_counter()
    res = eng.evaluate_full()
    wall = time.perf_counter() - t0
    m1, r1, lv1 = _mem_mb(), _rss_mb(), _live_device_mb()
    peak = _peak_mb()

    views_s = n / wall
    delta = None if (m0 is None or m1 is None) else m1 - m0
    rss_delta = None if (r0 is None or r1 is None) else r1 - r0
    live_delta = lv1 - lv0
    # O(1 frame): the whole sweep may not grow DEVICE memory by more than
    # a generous multiple of one 480x640 frame (~7.4 MB) + jit workspace.
    # Preference order: device stats (HBM, 512 MB budget) → client-tracked
    # live device-array bytes (512 MB budget — the axon backend reports no
    # memory_stats).  Host RSS is recorded but NOT the gate: the axon
    # client retains every upload's host copy for the process lifetime
    # (tools/probe_axon_leak.py), so RSS grows ~uploaded-bytes/frame on
    # any backend-honest streaming sweep.
    if delta is not None:
        o1 = bool(delta < 512.0)
        o1_basis = "hbm"
    else:
        o1 = bool(live_delta < 512.0)
        o1_basis = "live_device_bytes"
    out = {"frames": n, "hw": list(HW), "wall_s": round(wall, 2),
           "views_per_s": round(views_s, 3),
           "psnr": round(float(res["psnr"]), 3),
           "mem_before_mb": m0 and round(m0, 1),
           "mem_after_mb": m1 and round(m1, 1),
           "hbm_delta_mb": delta and round(delta, 1),
           "peak_hbm_mb": peak and round(peak, 1),
           "live_device_before_mb": round(lv0, 1),
           "live_device_after_mb": round(lv1, 1),
           "live_device_delta_mb": round(live_delta, 1),
           "rss_before_mb": r0 and round(r0, 1),
           "rss_after_mb": r1 and round(r1, 1),
           "rss_delta_mb": rss_delta and round(rss_delta, 1),
           "rss_note": ("axon client retains host copies of uploads "
                        "(~payload bytes/frame; see "
                        "tools/probe_axon_leak.py)"),
           "o1_frame_memory": o1, "o1_basis": o1_basis}
    print(json.dumps(out), flush=True)
    with open(OUT_JSON, "w") as f:
        json.dump(out, f, indent=1)
    shutil.rmtree(out_root, ignore_errors=True)
    assert o1 is not False, (
        f"device memory grew over the sweep ({o1_basis}: "
        f"hbm_delta={delta} MB, live_delta={live_delta} MB)")


if __name__ == "__main__":
    main()
