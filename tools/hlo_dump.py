"""Dev utility: compile the FULL texture train step on the TPU (AOT, no
execution) and report the optimized-HLO cost hotspots — transposes,
layout-change copies, and the largest fusion buffers.

The sin-band layout finding (make_sinw docstring) came from exactly this
dump on the render fwd; this script covers the whole engine step (G+D,
losses, optimizer) so layout surgery hiding in the VGG/discriminator/
optimizer tail is visible without any timing run.

Usage: python tools/hlo_dump.py [out.txt]   (runs one remote AOT compile)
"""

import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo")


def main():
    from texpose_tpu.data.fixture import generate_fixture
    from texpose_tpu.utils.config import process_options
    from texpose_tpu.models.texture_gan import TextureGANEngine
    from bench import _bench_cfg
    import jax

    cache = os.path.join(tempfile.gettempdir(), "texpose_bench_fixture_v1")
    marker = os.path.join(cache, ".done")
    if not os.path.exists(marker):
        os.makedirs(cache, exist_ok=True)
        generate_fixture(cache, n_train=16, n_test=1, scene="scene_all",
                         image_scale=1.0, crop_res=128)
        open(marker, "w").close()
    cfg = _bench_cfg(cache, "/root/repo", "texpose_hlodump_out")
    cfg = process_options(cfg)
    cfg.max_iter = 100000
    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()

    lowered = eng.step_fn.lower(eng.state, eng.train_batch)  # type: ignore
    comp = lowered.compile()
    txt = comp.as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlo_step.txt"
    open(out, "w").write(txt)

    def shape_bytes(s):
        m = re.match(r"(bf16|f32|s32|u32|pred|s8|u8)\[([\d,]*)\]", s)
        if not m:
            return 0
        dt = {"bf16": 2, "f32": 4, "s32": 4, "u32": 4, "pred": 1,
              "s8": 1, "u8": 1}[m.group(1)]
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        return n * dt

    print(f"optimized HLO: {len(txt.splitlines())} lines -> {out}")
    rows = []
    for line in txt.splitlines():
        s = line.strip().lstrip("%").lstrip("ROOT ").lstrip("%")
        m = re.match(r"\S+ = (\S+) (copy|transpose|fusion|custom-call)\(",
                     s)
        if not m:
            continue
        b = shape_bytes(m.group(1))
        if b >= 1 << 20:
            op = m.group(2)
            src = ""
            mm = re.search(r'source_file="([^"]+)" source_line=(\d+)', s)
            if mm:
                src = f"{os.path.basename(mm.group(1))}:{mm.group(2)}"
            rows.append((b, op, m.group(1)[:60], src))
    rows.sort(reverse=True)
    print("op-class buffers >= 1MB (copies/transposes are pure layout "
          "surgery):")
    for b, op, shape, src in rows[:40]:
        print(f"  {b / (1 << 20):8.1f} MB  {op:12s} {shape:60s} {src}")
    n_copy = sum(1 for r in rows if r[1] in ("copy", "transpose"))
    mb_copy = sum(r[0] for r in rows if r[1] in ("copy", "transpose"))
    print(f"TOTAL copy/transpose >=1MB: {n_copy} ops, "
          f"{mb_copy / (1 << 20):.1f} MB")


if __name__ == "__main__":
    main()
