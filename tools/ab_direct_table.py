"""Dev utility: interleaved same-process A/B of the texture train step with
kernels.direct_table on vs off (grid_sample_table composed gather vs
gather-frames-then-grid_sample).  Two full engines are built in ONE process
and their scan-fused dispatches timed alternately with a blocking loss read,
so the documented tunnel drift (±30%) cancels out of the comparison.

Usage: python tools/ab_direct_table.py [rounds]
"""

import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def build(direct):
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
    cfg.data.root = cache
    cfg.data.splits_root = os.path.join(cache, "splits")
    cfg.data.object = "ball"
    cfg.nerf.depth.box_source = "pred_box_init_calib"
    cfg.output_root = os.path.join(tempfile.gettempdir(),
                                   f"texpose_ab_dt_{direct}")
    cfg.kernels.direct_table = direct
    cfg = process_options(cfg)
    cfg.max_iter = 100000
    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    return eng


def dispatch(eng):
    eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    return float(np.asarray(loss["all"]))   # blocking read


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    eng_on = build(True)
    eng_off = build(False)
    scan_k = eng_on.scan_k()
    rays = eng_on.rays_per_step() * scan_k
    # compile + settle both
    for eng in (eng_on, eng_off):
        dispatch(eng)
        dispatch(eng)
    t_on, t_off = [], []
    for r in range(rounds):
        for name, eng, acc in (("on", eng_on, t_on), ("off", eng_off, t_off)):
            t0 = time.perf_counter()
            dispatch(eng)
            dt = time.perf_counter() - t0
            acc.append(dt)
            print(f"round {r} {name:>3}: {dt/scan_k*1000:.3f} ms/step "
                  f"({rays/dt:.0f} rays/s)", flush=True)
    m_on, m_off = np.median(t_on), np.median(t_off)
    print(f"median direct_table=on : {m_on/scan_k*1000:.3f} ms/step "
          f"({rays/m_on:.0f} rays/s)")
    print(f"median direct_table=off: {m_off/scan_k*1000:.3f} ms/step "
          f"({rays/m_off:.0f} rays/s)")
    print(f"delta (off-on): {(m_off-m_on)/scan_k*1000:+.3f} ms/step")


if __name__ == "__main__":
    main()
