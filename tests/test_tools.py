"""Tests for the tools/ utilities (split generation/import)."""

import os
import subprocess
import sys


from texpose_tpu.data.fixture import generate_fixture
from texpose_tpu.data import bop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_make_splits_generate(tmp_path):
    root = generate_fixture(str(tmp_path / "bop"), n_train=6, n_test=2,
                            image_scale=0.2, crop_res=32)
    dst = str(tmp_path / "newsplits" / "lm")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_splits.py"),
         "generate", "--data_root", os.path.join(root, "lm"),
         "--folder", "000001", "--object", "ball", "--scene", "scene_x",
         "--dst", dst, "--test_frac", "0.25"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = os.path.join(dst, "ball", "scene_x")
    train = bop.readlines(os.path.join(out, "train.txt"))
    test = bop.readlines(os.path.join(out, "test.txt"))
    val = bop.readlines(os.path.join(out, "val.txt"))
    assert len(train) + len(test) == 8 and len(test) == 2 and len(val) == 1
    obj, folder, frame = bop.split_line(train[0])
    assert obj == "ball" and folder == "000001" and 0 <= frame < 8
    # no overlap
    assert not set(train) & set(test)


def test_make_splits_import(tmp_path):
    src = tmp_path / "src" / "lm" / "duck" / "scene_all"
    src.mkdir(parents=True)
    (src / "train.txt").write_text("duck 000009 0\n")
    dst = str(tmp_path / "dst")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_splits.py"),
         "import", "--src", str(tmp_path / "src"), "--dst", dst],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(dst, "lm", "duck", "scene_all",
                                       "train.txt"))
