"""Dev utility: print the qual-pretrain loss curve (per-component) to
diagnose the plateau seen in tools/tpu_quality_check.py.

Env: DBG_PLATFORM=cpu forces the CPU backend (else whatever jax picks),
DBG_ITERS (default 1500), DBG_EVERY (default 100).
"""

import os
import sys
import time

if os.environ.get("DBG_PLATFORM") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tpu_quality_check import _fixture, _base


def main():
    import jax
    from texpose_tpu.utils.config import process_options
    from texpose_tpu.models.pretrain import PretrainEngine

    print("backend:", jax.default_backend(), flush=True)
    cache = _fixture()
    cfg = _base("nerf_lm_pretrain.yaml", cache)
    cfg.data.scene = "scene_qual"
    cfg.data.pose_source = "gt"
    cfg.nerf.depth.box_source = "gt_box"
    cfg.max_iter = int(os.environ.get("DBG_ITERS", "1500"))
    cfg.name = "dbg_pretrain"
    cfg = process_options(cfg)

    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()

    every = int(os.environ.get("DBG_EVERY", "100"))
    t0 = time.time()
    K = eng.scan_k()
    for it in range(0, cfg.max_iter, K):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        if it % every < K or it + K >= cfg.max_iter:
            host = {k: round(float(np.asarray(v)), 5) for k, v in
                    sorted(loss.items())}
            print(f"it={it:5d} t={time.time()-t0:7.1f}s {host}", flush=True)
    print("val:", eng.validate(cfg.max_iter), flush=True)


if __name__ == "__main__":
    main()
