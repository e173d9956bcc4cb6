"""train_fleet.py smoke test: two tiny per-object runs complete and write
their own output dirs."""

import os
import subprocess
import sys

import pytest

from texpose_tpu.data.fixture import generate_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_fleet_two_objects(tmp_path):
    root = generate_fixture(str(tmp_path / "bop"), n_train=3, n_test=1,
                            scene="scene_naive", fixed_light=True,
                            image_scale=0.2, crop_res=32, obj="ball")
    # second object shares the same frames under a different split name
    import shutil
    src = os.path.join(root, "splits", "lm", "ball")
    dst = os.path.join(root, "splits", "lm", "cube")
    shutil.copytree(src, dst)
    for split in ("train", "val", "test"):
        p = os.path.join(dst, "scene_naive", f"{split}.txt")
        content = open(p).read().replace("ball", "cube")
        open(p, "w").write(content)

    out = str(tmp_path / "out")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_fleet.py"),
         "--yaml=configs/nerf_lm_pretrain.yaml",
         "--objects=ball,cube", "--group=fleet", "--",
         f"--data.root={root}",
         f"--data.splits_root={os.path.join(root, 'splits')}",
         "--data.scene=scene_naive", "--data.image_size=[32,32]",
         "--arch.layers_feat=[null,16,16]", "--arch.layers_rgb=[null,16,3]",
         "--arch.skip=[1]", "--arch.posenc.L_3D=2",
         "--nerf.sample_intvs=4", "--nerf.rand_rays=64",
         "--nerf.depth.box_source=gt_box",
         "--max_iter=2", "--freq.scalar=1", "--freq.val=100",
         "--freq.ckpt=100", "--freq.vis=100",
         "--compute_dtype=float32", f"--output_root={out}"],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    for obj in ("ball", "cube"):
        assert os.path.exists(os.path.join(out, "fleet", obj, "model.ckpt")), obj
