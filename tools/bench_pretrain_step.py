"""Dev utility: steady-state pretrain train-step time (compile excluded).

Timing pattern: scan-fused dispatches with a HOST-blocking read of the
final loss.  On the axon tunnel, `jax.block_until_ready` on an unscanned
per-dispatch chain reports physically impossible times (the transport acks
before the optimizer tail lands — see CLAUDE.md measurement warning);
amortizing scan_k real steps per dispatch and converting the loss to a
numpy scalar is the only trustworthy pattern.

Env: PRE_SCAN (default 100) — steps fused per dispatch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from tpu_quality_check import _fixture, _base
    from texpose_tpu.utils.config import process_options
    from texpose_tpu.models.pretrain import PretrainEngine

    cache = _fixture()
    cfg = _base("nerf_lm_pretrain.yaml", cache)
    cfg.data.scene = "scene_qual"
    cfg.data.pose_source = "gt"
    cfg.nerf.depth.box_source = "gt_box"
    cfg.max_iter = 100000
    cfg.name = "bench_pretrain"
    cfg.scan_steps = int(os.environ.get("PRE_SCAN", "100"))
    cfg = process_options(cfg)
    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    K = eng.scan_k()
    print(f"scan_k {K}", flush=True)
    for _ in range(3):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    float(np.asarray(loss["all"]))          # block: all prior work done
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(3):
            eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        float(np.asarray(loss["all"]))      # blocking read via host transfer
        best = min(best, (time.perf_counter() - t0) / (3 * K))
    rays = int(cfg.nerf.rand_rays)
    print(f"pretrain step: {best*1000:.3f} ms ({rays/best:.0f} rays/s)",
          flush=True)


if __name__ == "__main__":
    main()
