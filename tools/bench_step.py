"""Dev utility: time the flagship texture-GAN train step on the current
backend (used for TPU perf iteration; bench.py is the official benchmark)."""

import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


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
    cfg.output_root = os.path.join(tempfile.gettempdir(), "texpose_prof")
    cfg = process_options(cfg)
    cfg.max_iter = 100000
    for override in sys.argv[1:]:
        k, v = override.split("=", 1)
        import yaml as _yaml
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = _yaml.safe_load(v)

    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    st = eng.state
    for it in range(10):
        st, loss = eng.step_fn(st, eng.train_batch)
    jax.block_until_ready(loss["all"])
    n = 200
    t0 = time.perf_counter()
    for it in range(10, 10 + n):
        st, loss = eng.step_fn(st, eng.train_batch)
    jax.block_until_ready(loss["all"])
    dt = (time.perf_counter() - t0) / n
    rays = int(cfg.batch_size) * int(cfg.patch_size) ** 2
    print(f"step: {dt * 1000:.2f} ms, {rays / dt:.0f} rays/s", flush=True)


if __name__ == "__main__":
    main()
