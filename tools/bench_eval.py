"""Dev utility: 480x640 full-frame novel-view synthesis throughput
(views/sec) — the second headline metric in BASELINE.json."""

import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from texpose_tpu.utils.config import load_yaml, process_options
    from texpose_tpu.models.texture_gan import TextureGANEngine
    from texpose_tpu.data.fixture import generate_fixture

    cache = os.path.join(tempfile.gettempdir(), "texpose_bench_fixture_v1")
    if not os.path.exists(os.path.join(cache, ".done")):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=16, n_test=1, scene="scene_all",
                         image_scale=1.0, crop_res=128)
        open(os.path.join(cache, ".done"), "w").close()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_yaml(os.path.join(here, "configs", "nerf_lm_adapt_gan.yaml"))
    cfg.yaml = "x"
    cfg = process_options(cfg)
    cfg.data.root = cache
    cfg.data.splits_root = os.path.join(cache, "splits")
    cfg.data.object = "ball"
    cfg.nerf.depth.box_source = "pred_box_init_calib"
    cfg.output_root = os.path.join(tempfile.gettempdir(), "texpose_evalbench")
    cfg.syn2real = True
    cfg.data.image_size = [480, 640]
    cfg = process_options(cfg)
    cfg.max_iter = 10

    eng = TextureGANEngine(cfg)
    eng.load_dataset(eval_split="test", prefetch_train=False)
    eng.build_networks()
    eng.setup_optimizer()
    frame = eng.eval_frame(0)
    lt = jnp.zeros((1, cfg.nerf.N_latent_trans))
    ll = eng.state["latents"]["light"][0:1]
    cov = float((np.asarray(frame["obj_mask"]) > 0).mean())
    print(f"object coverage: {cov:.3f}", flush=True)

    for masked, label in [(True, "masked"), (False, "full")]:
        out = eng._render_frame_st(frame, lt, ll, masked=masked)
        jax.block_until_ready(out["rgb_static"])
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = eng._render_frame_st(frame, lt, ll, masked=masked)
            jax.block_until_ready(out["rgb_static"])
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt*1000:.1f} ms/frame = {1/dt:.2f} views/s "
              f"({cfg.H*cfg.W/dt/1e6:.2f}M rays/s)", flush=True)


if __name__ == "__main__":
    main()
