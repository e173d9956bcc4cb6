"""Dev utility: interleaved same-process A/B of the texture train step
between stock config and a set of dotted config overrides.  Both engines
are built in ONE process and their scan-fused dispatches timed alternately
with a blocking loss read, so tunnel drift (±30%) cancels.

Usage: python tools/ab_cfg.py "loss_weight.feat=null" [more.overrides=v] \
           [--rounds=6] [--engine=texture|pretrain]
"""

import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import yaml


def build(overrides, engine="texture", tag="a"):
    from texpose_tpu.utils.config import load_yaml, process_options
    from texpose_tpu.data.fixture import generate_fixture

    cache = os.path.join(tempfile.gettempdir(), "texpose_bench_fixture_v1")
    if not os.path.exists(os.path.join(cache, ".done")):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=16, n_test=1, scene="scene_all",
                         image_scale=1.0, crop_res=128)
        open(os.path.join(cache, ".done"), "w").close()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yml = ("nerf_lm_adapt_gan.yaml" if engine == "texture"
           else "nerf_lm_pretrain.yaml")
    cfg = load_yaml(os.path.join(here, "configs", yml))
    cfg.yaml = "x"
    cfg.data.root = cache
    cfg.data.splits_root = os.path.join(cache, "splits")
    cfg.data.object = "ball"
    cfg.output_root = os.path.join(tempfile.gettempdir(),
                                   f"texpose_ab_cfg_{engine}_{tag}")
    if engine == "texture":
        cfg.nerf.depth.box_source = "pred_box_init_calib"
    else:
        cfg.data.scene = "scene_qual"
        cfg.data.pose_source = "gt"
        cfg.nerf.depth.box_source = "gt_box"
    for k, v in overrides:
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    cfg = process_options(cfg)
    cfg.max_iter = 100000
    if engine == "texture":
        from texpose_tpu.models.texture_gan import TextureGANEngine
        eng = TextureGANEngine(cfg)
    else:
        from texpose_tpu.models.pretrain import PretrainEngine
        eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    return eng


def dispatch(eng):
    eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    return float(np.asarray(loss["all"]))   # blocking read


def main():
    rounds, engine, overrides = 6, "texture", []
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
        elif a.startswith("--engine="):
            engine = a.split("=", 1)[1]
        else:
            k, v = a.split("=", 1)
            overrides.append((k, yaml.safe_load(v) if v != "" else None))
    print(f"A/B overrides: {overrides} ({engine})", flush=True)
    eng_a = build(overrides, engine, "a")     # with overrides
    eng_b = build([], engine, "b")            # stock
    scan_k = eng_b.scan_k()
    rays = eng_b.rays_per_step() * scan_k
    for eng in (eng_a, eng_b):
        dispatch(eng)
        dispatch(eng)
    t_a, t_b = [], []
    for r in range(rounds):
        for name, eng, acc in (("ovr", eng_a, t_a), ("stock", eng_b, t_b)):
            t0 = time.perf_counter()
            dispatch(eng)
            dt = time.perf_counter() - t0
            acc.append(dt)
            print(f"round {r} {name:>5}: {dt/scan_k*1000:.3f} ms/step "
                  f"({rays/dt:.0f} rays/s)", flush=True)
    m_a, m_b = np.median(t_a), np.median(t_b)
    print(f"median override: {m_a/scan_k*1000:.3f} ms/step ({rays/m_a:.0f} rays/s)")
    print(f"median stock   : {m_b/scan_k*1000:.3f} ms/step ({rays/m_b:.0f} rays/s)")
    print(f"delta (stock-override): {(m_b-m_a)/scan_k*1000:+.3f} ms/step")


if __name__ == "__main__":
    main()
