"""Dev utility: interleaved same-process A/B of the texture train step with
the flat-input composite (TEXPOSE_COMPOSITE_FLAT) on vs off.  The knob is
read at trace time, so each engine is traced (first dispatch) with its env
value set before the other engine flips it.  Dispatches are then timed
alternately with a blocking loss read so tunnel drift cancels.

Usage: python tools/ab_composite_flat.py [rounds] [texture|pretrain]
"""

import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def build(flat, engine="texture"):
    from texpose_tpu.utils.config import load_yaml, process_options
    from texpose_tpu.data.fixture import generate_fixture

    cache = os.path.join(tempfile.gettempdir(), "texpose_bench_fixture_v1")
    if not os.path.exists(os.path.join(cache, ".done")):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=16, n_test=1, scene="scene_all",
                         image_scale=1.0, crop_res=128)
        open(os.path.join(cache, ".done"), "w").close()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yaml = ("nerf_lm_adapt_gan.yaml" if engine == "texture"
            else "nerf_lm_pretrain.yaml")
    cfg = load_yaml(os.path.join(here, "configs", yaml))
    cfg.yaml = "x"
    cfg.data.root = cache
    cfg.data.splits_root = os.path.join(cache, "splits")
    cfg.data.object = "ball"
    cfg.output_root = os.path.join(tempfile.gettempdir(),
                                   f"texpose_ab_cf_{engine}_{flat}")
    if engine == "texture":
        cfg.nerf.depth.box_source = "pred_box_init_calib"
        cfg = process_options(cfg)
        from texpose_tpu.models.texture_gan import TextureGANEngine
        eng = TextureGANEngine(cfg)
    else:
        cfg.data.scene = "scene_qual"
        cfg.data.pose_source = "gt"
        cfg.nerf.depth.box_source = "gt_box"
        cfg = process_options(cfg)
        from texpose_tpu.models.pretrain import PretrainEngine
        eng = PretrainEngine(cfg)
    cfg.max_iter = 100000
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    return eng


def dispatch(eng):
    eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    return float(np.asarray(loss["all"]))   # blocking read


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    engine = sys.argv[2] if len(sys.argv) > 2 else "texture"
    # trace+compile each engine under its own env value
    os.environ["TEXPOSE_COMPOSITE_FLAT"] = "1"
    eng_flat = build(True, engine)
    dispatch(eng_flat)          # trace happens here, env=1
    os.environ["TEXPOSE_COMPOSITE_FLAT"] = "0"
    eng_plain = build(False, engine)
    dispatch(eng_plain)         # traced with env=0
    scan_k = eng_flat.scan_k()
    rays = eng_flat.rays_per_step() * scan_k
    dispatch(eng_flat)
    dispatch(eng_plain)
    t_f, t_p = [], []
    for r in range(rounds):
        for name, eng, acc in (("flat", eng_flat, t_f),
                               ("plain", eng_plain, t_p)):
            t0 = time.perf_counter()
            dispatch(eng)
            dt = time.perf_counter() - t0
            acc.append(dt)
            print(f"round {r} {name:>5}: {dt/scan_k*1000:.3f} ms/step "
                  f"({rays/dt:.0f} rays/s)", flush=True)
    m_f, m_p = np.median(t_f), np.median(t_p)
    print(f"median flat : {m_f/scan_k*1000:.3f} ms/step ({rays/m_f:.0f} rays/s)")
    print(f"median plain: {m_p/scan_k*1000:.3f} ms/step ({rays/m_p:.0f} rays/s)")
    print(f"delta (plain-flat): {(m_p-m_f)/scan_k*1000:+.3f} ms/step")


if __name__ == "__main__":
    main()
