"""Full user-workflow integration test through the REAL CLIs.

Chains the exact pipeline a reference user runs (reference README.md:46-62):

    1. train.py --model=nerf_pretrain            (geometry pretrain)
    2. cp <run>/model.ckpt <group>/pretrain_model.ckpt
       (the reference expects this user-placed file, util.py:202-206)
    3. train.py --model=nerf_adapt_st_gan --resume_pretrain
    4. evaluate.py --model=nerf_adapt_st_gan --resume --syn2real

as subprocesses on the sphere fixture, and asserts the cross-run
contracts that no engine-level test can see:

  * --resume_pretrain actually transports the geometry trunk between two
    independent CLI processes (bitwise ckpt compare),
  * the trunk stays frozen through real GAN CLI training (reference
    freezes mlp_feat during texture adaptation),
  * evaluate.py --syn2real exports full-frame PNGs at the raw size plus
    quant.txt with finite metrics from a third process that only shares
    the checkpoint on disk.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(__file__))

from texpose_tpu.data.fixture import generate_fixture
from test_pretrain_e2e import tiny_pretrain_cfg
from test_texture_gan_e2e import tiny_gan_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(script, args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, os.path.join(REPO, script)] + args,
                       capture_output=True, text=True, cwd=REPO, timeout=600,
                       env=env)
    assert r.returncode == 0, (f"{script} {' '.join(args)}\n"
                               f"{r.stdout[-3000:]}\n{r.stderr[-3000:]}")
    return r


def _dump_yaml(cfg, path):
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, default_flow_style=False,
                       sort_keys=False)
    return path


def _trunk_leaves(ckpt_path):
    z = np.load(ckpt_path)
    return {k: z[k] for k in z.files if "mlp_feat" in k}


@pytest.mark.slow
def test_full_cli_pipeline(tmp_path):
    root = generate_fixture(str(tmp_path / "bop"), n_train=6, n_test=1,
                            scene="scene_all",
                            image_scale=0.25, crop_res=32)
    out = str(tmp_path / "out")

    # -- tiny configs written as the yaml files the CLIs consume.  The
    # pretrain arch must match the GAN arch (the trunk transfers).
    gan_cfg = tiny_gan_cfg(root, tmp_path)
    pre_cfg = tiny_pretrain_cfg(root, tmp_path)
    pre_cfg.arch = gan_cfg.arch.copy()
    pre_cfg.arch.posenc = {"L_3D": gan_cfg.arch.posenc.L_3D, "L_view": None}
    pre_cfg.data.scene = "scene_all"
    pre_cfg.max_iter = 4
    pre_cfg.nerf.sample_intvs = 8
    pre_cfg.nerf.rand_rays = 256
    gan_cfg.max_iter = 4
    for cfg in (pre_cfg, gan_cfg):
        cfg.output_root = out
        cfg.group = "pipe"
    pre_yaml = _dump_yaml(pre_cfg, str(tmp_path / "pre.yaml"))
    gan_yaml = _dump_yaml(gan_cfg, str(tmp_path / "gan.yaml"))

    # -- stage 1: geometry pretrain through the real CLI
    _run_cli("train.py", [f"--yaml={pre_yaml}", "--name=pretrain"])
    pre_ckpt = os.path.join(out, "pipe", "pretrain", "model.ckpt")
    assert os.path.exists(pre_ckpt)
    assert os.path.exists(os.path.join(out, "pipe", "pretrain",
                                       "options.yaml"))

    # -- stage 2: place the group-level pretrain checkpoint where
    # --resume_pretrain looks for it (reference util.py:202-206)
    group_ckpt = os.path.join(out, "pipe", "pretrain_model.ckpt")
    shutil.copyfile(pre_ckpt, group_ckpt)

    # -- stage 3: texture-GAN adaptation resuming the pretrained trunk
    r = _run_cli("train.py", [f"--yaml={gan_yaml}", "--name=gan",
                              "--resume_pretrain"])
    assert "restored geometry trunk" in r.stdout
    gan_ckpt = os.path.join(out, "pipe", "gan", "model.ckpt")
    assert os.path.exists(gan_ckpt)

    # the trunk transported from the pretrain process AND stayed frozen
    # through GAN training (texture adaptation trains heads + latents only)
    pre_trunk = _trunk_leaves(pre_ckpt)
    gan_trunk = _trunk_leaves(gan_ckpt)
    assert pre_trunk, "pretrain ckpt has no mlp_feat leaves"
    common = [k for k in pre_trunk if k in gan_trunk]
    assert common, (f"no shared trunk keypaths between ckpts: "
                    f"{sorted(pre_trunk)[:3]} vs {sorted(gan_trunk)[:3]}")
    for k in common:
        np.testing.assert_array_equal(pre_trunk[k], gan_trunk[k],
                                      err_msg=f"trunk leaf {k} changed "
                                      f"during GAN CLI training")

    # -- stage 4: full-frame syn2real evaluation from a fresh process
    _run_cli("evaluate.py", [
        f"--yaml={gan_yaml}", "--name=gan", "--resume", "--syn2real",
        "--data.image_size=[60,80]", "--data.raw_size=[120,160]"])
    view_dir = os.path.join(out, "pipe", "gan", "test_view_last")
    files = sorted(os.listdir(view_dir))
    assert len(files) == 1
    import cv2
    img = cv2.imread(os.path.join(view_dir, files[0]))
    assert img is not None and img.shape == (120, 160, 3)
    quant = os.path.join(out, "pipe", "gan", "quant.txt")
    assert os.path.exists(quant)
    lines = open(quant).read().splitlines()
    header = lines[0].lstrip("# ").split()
    assert "psnr" in header
    rows = [ln.split() for ln in lines[1:] if ln.strip()]
    assert len(rows) == 1
    psnr = float(rows[0][header.index("psnr")])
    assert np.isfinite(psnr)
