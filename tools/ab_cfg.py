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
    if engine == "pretrain" and not os.path.exists(
            os.path.join(cache, "splits", "lm", "ball", "scene_qual",
                         "train.txt")):
        generate_fixture(cache, n_train=16, n_test=1, scene="scene_qual",
                         image_scale=1.0, crop_res=128)
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


def _set(cfg, k, v):
    node = cfg
    parts = k.split(".")
    for p in parts[:-1]:
        node = node[p]
    node[parts[-1]] = v


def main():
    rounds, engine, overrides = 6, "texture", []
    env_overrides = []
    for a in sys.argv[1:]:
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
        elif a.startswith("--engine="):
            engine = a.split("=", 1)[1]
        elif a.startswith("--env:"):
            k, v = a[len("--env:"):].split("=", 1)
            env_overrides.append((k, v))
        else:
            k, v = a.split("=", 1)
            overrides.append((k, yaml.safe_load(v) if v != "" else None))
    print(f"A/B overrides: {overrides} env {env_overrides} ({engine})",
          flush=True)
    # ONE engine, TWO step functions: dataset/params/opt state live in the
    # same buffers, so the comparison has no build-order HBM placement bias
    # (two-engine A/Bs measured the FIRST-built engine systematically
    # slower).  cfg is read at trace time, so each fn must be dispatched
    # once (traced) before cfg/env are flipped for the other.
    eng = build([], engine, "shared")
    scan_k = eng.scan_k()
    rays = eng.rays_per_step() * scan_k
    fn_stock = eng.step_fn
    dispatch(eng)                      # trace stock under stock cfg/env
    for k, v in overrides:
        _set(eng.cfg, k, v)
    for k, v in env_overrides:
        os.environ[k] = v
    fn_ovr = eng._make_train_step()
    eng.step_fn = fn_ovr
    dispatch(eng)                      # trace override variant
    # settle both
    for fn in (fn_stock, fn_ovr):
        eng.step_fn = fn
        dispatch(eng)
    t_a, t_b = [], []
    for r in range(rounds):
        for name, fn, acc in (("ovr", fn_ovr, t_a), ("stock", fn_stock, t_b)):
            eng.step_fn = fn
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
