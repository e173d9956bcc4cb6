"""Dev utility: steady-state pretrain train-step time (compile excluded)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


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
    cfg = process_options(cfg)
    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    for it in range(10):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    jax.block_until_ready(loss["all"])
    n = 200
    t0 = time.perf_counter()
    for it in range(10, 10 + n):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    jax.block_until_ready(loss["all"])
    dt = (time.perf_counter() - t0) / n
    print(f"pretrain step: {dt*1000:.2f} ms "
          f"({int(cfg.nerf.rand_rays)/dt:.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()
