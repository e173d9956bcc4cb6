"""Dev probe: per-stage cost breakdown of one end-to-end eval frame on the
real TPU tunnel (VERDICT r4 item 1 follow-up — the overlapped pipeline
landed but the measured envelope is still ~0.7 s/frame vs 0.08 s render).

Stages timed per frame over a small cycled split (fresh frame objects each
iteration so device_put cannot cache):
  load      dataset[i] disk load (host)
  put       jax.device_put of the [None]-batched sample (+ bytes by key)
  render    _render_frame_st(..., masked=True) + block on rgb_static
  metrics   _eval_metrics_fn dispatch + device_get (scalars + uint8 PNG)
  sync_loop the four above, synchronous
  pipe_loop engine.evaluate_full() per-frame wall (the shipped pipeline)

These are 50-500 ms stages — per-dispatch timing is trustworthy at this
scale (the CLAUDE.md scan-chaining rule is for sub-ms kernels).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("PROBE_N", "12"))
HW = tuple(int(x) for x in os.environ.get("PROBE_HW", "480,640").split(","))


def main():
    import jax
    import jax.numpy as jnp
    from texpose_tpu.utils.config import load_yaml, process_options
    from texpose_tpu.models.texture_gan import TextureGANEngine
    from texpose_tpu.data.fixture import generate_fixture

    cache = os.path.join(tempfile.gettempdir(), "texpose_bench_fixture_v1")
    if not os.path.exists(os.path.join(cache, ".done")):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=16, n_test=1, scene="scene_all",
                         image_scale=1.0, crop_res=128)
        open(os.path.join(cache, ".done"), "w").close()
    split_src = os.path.join(cache, "splits", "lm", "ball", "scene_all")
    scene = f"scene_probe{N}"
    split_dst = os.path.join(cache, "splits", "lm", "ball", scene)
    os.makedirs(split_dst, exist_ok=True)
    test_lines = [ln for ln in open(os.path.join(split_src, "test.txt"))
                  if ln.strip()]
    with open(os.path.join(split_dst, "test.txt"), "w") as f:
        for i in range(N):
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
    out_root = os.path.join(tempfile.gettempdir(), "texpose_probe_eval")
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

    # warm every jit on frame 0
    sample0 = eng.eval_data[0]
    frame0 = jax.device_put({k: np.asarray(v)[None]
                             for k, v in sample0.items()})
    lt = np.zeros((1, int(cfg.nerf.N_latent_trans)), np.float32)
    ll = np.asarray(eng.state["latents"]["light"][0:1])
    out = eng._render_frame_st(frame0, lt, ll,
                               obj_host=sample0["obj_mask"])
    jax.block_until_ready(out["rgb_static"])
    raw_hw = getattr(eng.eval_data, "raw_hw", None)
    mfn = eng._eval_metrics_fn(raw_hw)
    jax.device_get(mfn(out["rgb_static"], frame0["image"],
                       frame0["obj_mask"]))

    sizes = {k: int(np.asarray(v).nbytes) for k, v in sample0.items()}
    print("sample bytes by key:",
          json.dumps({k: v for k, v in sorted(
              sizes.items(), key=lambda kv: -kv[1])}), flush=True)
    print(f"total sample MB: {sum(sizes.values())/1e6:.2f}", flush=True)
    dt = {k: str(np.asarray(v).dtype) for k, v in sample0.items()}
    print("dtypes:", json.dumps(dt), flush=True)

    t_load, t_put, t_render, t_metrics, t_pull = [], [], [], [], []
    for i in range(N):
        t0 = time.perf_counter()
        sample = eng.eval_data[i]
        t1 = time.perf_counter()
        frame = jax.device_put({k: np.asarray(v)[None]
                                for k, v in sample.items()})
        jax.block_until_ready(frame)
        t2 = time.perf_counter()
        out = eng._render_frame_st(frame, lt, ll,
                                   obj_host=sample["obj_mask"])
        jax.block_until_ready(out["rgb_static"])
        t3 = time.perf_counter()
        res = mfn(out["rgb_static"], frame["image"], frame["obj_mask"])
        jax.block_until_ready(res)
        t4 = time.perf_counter()
        jax.device_get(res)
        t5 = time.perf_counter()
        t_load.append(t1 - t0)
        t_put.append(t2 - t1)
        t_render.append(t3 - t2)
        t_metrics.append(t4 - t3)
        t_pull.append(t5 - t4)
    for name, ts in (("load", t_load), ("put", t_put),
                     ("render+scatter", t_render), ("metrics", t_metrics),
                     ("pull(png)", t_pull)):
        a = np.array(ts) * 1000
        print(f"{name:15s} med {np.median(a):7.1f} ms   "
              f"min {a.min():7.1f}  max {a.max():7.1f}", flush=True)
    tot = (np.median(t_load) + np.median(t_put) + np.median(t_render)
           + np.median(t_metrics) + np.median(t_pull))
    print(f"sync per-frame total (medians): {tot*1000:.1f} ms "
          f"= {1/tot:.2f} views/s", flush=True)

    # shipped pipelined sweep on the same engine
    eng._eval_cache = (None, None)
    t0 = time.perf_counter()
    res = eng.evaluate_full()
    wall = time.perf_counter() - t0
    print(f"pipelined evaluate_full: {wall/N*1000:.1f} ms/frame "
          f"= {N/wall:.2f} views/s  psnr={res['psnr']:.2f}", flush=True)


if __name__ == "__main__":
    main()
