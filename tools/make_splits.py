"""Generate split files (splits/<dataset>/<object>/<scene>/{train,val,test}.txt).

The reference ships hand-made split lists for 13 LineMOD objects
(/root/reference/splits/lm/**, lines of '<obj> <folder> <frame>'); this tool
recreates that asset layer either by importing an existing TexPose-style
splits tree, or by enumerating a BOP scene folder directly.

    # import from a reference checkout (files are data, layout-preserving)
    python tools/make_splits.py import --src /path/to/TexPose/splits --dst splits

    # generate from a BOP tree: every frame with a GT entry, val = 1 frame,
    # test fraction configurable
    python tools/make_splits.py generate --data_root dataset/lm \
        --folder 000009 --object duck --scene scene_all \
        --dst splits/lm --test_frac 0.1
"""

import argparse
import json
import os
import random
import shutil


def do_import(src, dst):
    n = 0
    for root, _, files in os.walk(src):
        for f in files:
            if not f.endswith(".txt"):
                continue
            rel = os.path.relpath(os.path.join(root, f), src)
            out = os.path.join(dst, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            shutil.copyfile(os.path.join(root, f), out)
            n += 1
    print(f"imported {n} split files → {dst}")


def do_generate(data_root, folder, obj, scene, dst, test_frac, val_n, seed):
    with open(os.path.join(data_root, folder, "scene_gt.json")) as f:
        scene_gt = json.load(f)
    frames = sorted(int(k) for k in scene_gt.keys())
    rng = random.Random(seed)
    shuffled = frames[:]
    rng.shuffle(shuffled)
    n_test = max(1, int(len(frames) * test_frac))
    test = sorted(shuffled[:n_test])
    train = sorted(shuffled[n_test:])
    val = train[:val_n]
    out_dir = os.path.join(dst, obj, scene)
    os.makedirs(out_dir, exist_ok=True)
    for name, rows in [("train", train), ("val", val), ("test", test)]:
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write("\n".join(f"{obj} {folder} {i}" for i in rows) + "\n")
    print(f"wrote {len(train)}/{len(val)}/{len(test)} train/val/test lines "
          f"→ {out_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("import")
    pi.add_argument("--src", required=True)
    pi.add_argument("--dst", default="splits")
    pg = sub.add_parser("generate")
    pg.add_argument("--data_root", required=True)
    pg.add_argument("--folder", required=True)
    pg.add_argument("--object", required=True)
    pg.add_argument("--scene", default="scene_all")
    pg.add_argument("--dst", default="splits/lm")
    pg.add_argument("--test_frac", type=float, default=0.1)
    pg.add_argument("--val_n", type=int, default=1)
    pg.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    if a.cmd == "import":
        do_import(a.src, a.dst)
    else:
        do_generate(a.data_root, a.folder, a.object, a.scene, a.dst,
                    a.test_frac, a.val_n, a.seed)
