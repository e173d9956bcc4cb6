"""Dev utility: validate scan-fused pretrain dispatch on TPU (time + loss)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from tpu_quality_check import _fixture, _base
from texpose_tpu.utils.config import process_options
from texpose_tpu.models.pretrain import PretrainEngine

cache = _fixture()
cfg = _base("nerf_lm_pretrain.yaml", cache)
cfg.data.scene = "scene_qual"; cfg.data.pose_source = "gt"
cfg.nerf.depth.box_source = "gt_box"; cfg.max_iter = 100000
cfg.name = "scan_check"
cfg = process_options(cfg)
eng = PretrainEngine(cfg); eng.load_dataset(); eng.build_networks(); eng.setup_optimizer()
print("scan_k:", eng.scan_k(), flush=True)
losses = []
for i in range(3):
    t0 = time.perf_counter()
    eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    v = float(np.asarray(loss["all"]))     # forces completion
    dt = time.perf_counter() - t0
    losses.append(v)
    print(f"dispatch {i}: {dt*1000:.2f} ms, loss={v:.5f}, "
          f"it={int(np.asarray(eng.state['it']))}", flush=True)
