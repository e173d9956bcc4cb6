"""End-to-end tests of the pretrained-weight porting path.

This environment ships no pretrained VGG/AlexNet weights (no torchvision
cache, no egress), so the perceptual/LPIPS stacks run on random features by
default.  These tests prove the PIPELINE is exact: a user who supplies the
standard torchvision `vgg19-dcbb9e9d.pth` state dict (or LPIPS weights)
gets features that match the torch implementation the reference uses
(/root/reference/layers/perceptual_loss.py:28-36 builds
vgg19.features[0..14] inclusive — conv3_3 pre-ReLU — with ImageNet
normalization; LPIPS per external/PerceptualSimilarity semantics).

Method: synthesize a random state dict with the REAL torchvision layout,
run tools/port_weights.py's torchvision-free path, load the npz through
nn/vgg.load_vgg19_npz / nn/lpips.load_lpips_npz, and compare against a
torch oracle built from the same weights.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from texpose_tpu.nn.vgg import load_vgg19_npz, vgg19_features  # noqa: E402
from texpose_tpu.nn.lpips import (ALEX_CONVS, load_lpips_npz,  # noqa: E402
                                  lpips_distance)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


# --------------------------------------------------------------------- VGG19

# torchvision vgg19 'E' features[0:15]: indices of convs and pools
_VGG_LAYOUT = [("conv", 0, 3, 64), ("conv", 2, 64, 64), ("pool", 4),
               ("conv", 5, 64, 128), ("conv", 7, 128, 128), ("pool", 9),
               ("conv", 10, 128, 256), ("conv", 12, 256, 256),
               ("conv", 14, 256, 256)]


def _torch_vgg_oracle(sd, x):
    """Replicates reference contentFunc(final_layer=14) + ImageNet norm."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    h = (x - mean) / std
    last_conv = 14
    for item in _VGG_LAYOUT:
        if item[0] == "pool":
            h = tnn.functional.max_pool2d(h, 2, 2)
        else:
            _, idx, cin, cout = item
            w = sd[f"features.{idx}.weight"]
            b = sd[f"features.{idx}.bias"]
            h = tnn.functional.conv2d(h, w, b, padding=1)
            if idx != last_conv:              # layer 14 output is pre-ReLU
                h = tnn.functional.relu(h)
    return h


def test_vgg19_port_path_parity(tmp_path):
    from port_weights import port_vgg19
    g = torch.Generator().manual_seed(0)
    sd = {}
    for item in _VGG_LAYOUT:
        if item[0] != "conv":
            continue
        _, idx, cin, cout = item
        sd[f"features.{idx}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn((cout,), generator=g) * 0.01
    # distractor keys a full-model state dict would carry
    sd["classifier.0.weight"] = torch.zeros((2, 2))
    sd["features.1.num_batches_tracked"] = torch.zeros(())

    pth = str(tmp_path / "fake_vgg19.pth")
    npz = str(tmp_path / "vgg19_feat14.npz")
    torch.save(sd, pth)
    port_vgg19(npz, state_dict=pth)

    params = load_vgg19_npz(npz)
    x = torch.rand((2, 3, 32, 32), generator=g)
    want = _torch_vgg_oracle(sd, x).detach().numpy()
    got = np.asarray(vgg19_features(params, jnp.asarray(x.numpy())))
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-4


def test_vgg19_port_accepts_features_only_dict(tmp_path):
    from port_weights import port_vgg19
    g = torch.Generator().manual_seed(1)
    sd = {}
    for item in _VGG_LAYOUT:
        if item[0] != "conv":
            continue
        _, idx, cin, cout = item
        sd[f"{idx}.weight"] = torch.randn((cout, cin, 3, 3), generator=g)
        sd[f"{idx}.bias"] = torch.randn((cout,), generator=g)
    pth = str(tmp_path / "fake_features.pth")
    npz = str(tmp_path / "out.npz")
    torch.save(sd, pth)
    port_vgg19(npz, state_dict=pth)
    data = np.load(npz)
    assert _rel(data["features.0.weight"], sd["0.weight"].numpy()) == 0.0


# --------------------------------------------------------------------- LPIPS

def _torch_lpips_oracle(npz_path, x, y):
    """Replicates pip lpips.LPIPS(net='alex', spatial=False) semantics:
    scaling layer, AlexNet relu1-5 taps, unit-normalize, non-negative 1x1
    lins, spatial mean, sum over taps
    (external/PerceptualSimilarity/models/networks_basic.py)."""
    data = np.load(npz_path)
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(inp):
        h = (inp - shift) / scale
        out = []
        for i, (ks, cin, cout, stride, pad) in enumerate(ALEX_CONVS):
            if i in (1, 2):
                h = tnn.functional.max_pool2d(h, 3, 2)
            w = torch.from_numpy(data[f"conv{i}.weight"])
            b = torch.from_numpy(data[f"conv{i}.bias"])
            h = tnn.functional.relu(
                tnn.functional.conv2d(h, w, b, stride=stride, padding=pad))
            out.append(h)
        return out

    def unit(t):
        return t / (t.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)

    fx, fy = feats(x), feats(y)
    total = torch.zeros(x.shape[0])
    for i, (a, b) in enumerate(zip(fx, fy)):
        lin = torch.from_numpy(
            np.maximum(data[f"lin{i}.weight"].reshape(-1), 0.0)).float()
        d = (unit(a) - unit(b)) ** 2
        d = (d * lin.view(1, -1, 1, 1)).sum(dim=1)
        total = total + d.mean(dim=(1, 2))
    return total


def _make_real_shaped_vgg_npz(tmp_path, seed=3):
    """Synthetic state dict with the REAL torchvision vgg19 features[0..14]
    layout, ported through tools/port_weights.py."""
    from port_weights import port_vgg19
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for item in _VGG_LAYOUT:
        if item[0] != "conv":
            continue
        _, idx, cin, cout = item
        sd[f"features.{idx}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn((cout,), generator=g) * 0.01
    pth = str(tmp_path / "vgg19.pth")
    npz = str(tmp_path / "vgg19_feat14.npz")
    torch.save(sd, pth)
    port_vgg19(npz, state_dict=pth)
    return npz


def _make_real_shaped_lpips_npz(tmp_path, seed=4):
    """npz with the exact keypaths cfg.lpips_weights expects:
    conv{0..4}.weight/.bias (AlexNet features) + lin{0..4}.weight
    (LPIPS 1x1 calibration)."""
    rng = np.random.default_rng(seed)
    keep = {}
    for i, (ks, cin, cout, _, _) in enumerate(ALEX_CONVS):
        keep[f"conv{i}.weight"] = rng.normal(
            0, 0.05, (cout, cin, ks, ks)).astype(np.float32)
        keep[f"conv{i}.bias"] = rng.normal(0, 0.01, (cout,)).astype(
            np.float32)
        keep[f"lin{i}.weight"] = np.abs(rng.normal(
            0, 1, (1, cout, 1, 1))).astype(np.float32)
    npz = str(tmp_path / "lpips_alex.npz")
    np.savez(npz, **keep)
    return npz


def test_weights_drop_full_system(tmp_path):
    """Rehearse the real-weights drop end-to-end (VERDICT r4 item 5): with
    cfg.vgg_weights / cfg.lpips_weights pointing at real-shaped npz files,
    a short GAN train + evaluate must (a) feed the LOADED VGG params into
    the feat loss, (b) produce a quant.txt whose perceptual column is
    'lpips' (calibrated), not 'lpips_uncal', with zero code changes."""
    import jax
    from texpose_tpu.data.fixture import generate_fixture
    from texpose_tpu.models.texture_gan import TextureGANEngine
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_texture_gan_e2e import tiny_gan_cfg

    root = generate_fixture(str(tmp_path / "bop"), n_train=6, n_test=1,
                            scene="scene_all", image_scale=0.25, crop_res=32)
    vgg_npz = _make_real_shaped_vgg_npz(tmp_path)
    lpips_npz = _make_real_shaped_lpips_npz(tmp_path)

    cfg = tiny_gan_cfg(root, tmp_path)
    cfg.vgg_weights = vgg_npz
    cfg.lpips_weights = lpips_npz
    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()

    # (a) the engine's VGG params ARE the ported file's (feat loss consumes
    # self.vgg_params in the jitted step closure)
    ported = np.load(vgg_npz)
    got0 = np.asarray(jax.tree_util.tree_leaves(eng.vgg_params)[0])
    want0 = ported["features.0.weight"]
    matched = any(
        np.asarray(leaf).shape == want0.transpose(2, 3, 1, 0).shape
        and np.allclose(np.asarray(leaf), want0.transpose(2, 3, 1, 0))
        or np.asarray(leaf).shape == want0.shape
        and np.allclose(np.asarray(leaf), want0)
        for leaf in jax.tree_util.tree_leaves(eng.vgg_params))
    assert matched, "loaded VGG params do not contain the ported conv0"

    for _ in range(3):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
    assert np.isfinite(float(np.asarray(loss["feat"])))

    # (b) eval flips to calibrated LPIPS with zero code changes
    res = eng.evaluate_full()
    assert np.isfinite(res["psnr"])
    assert eng.lpips_key == "lpips"
    quant = open(os.path.join(cfg.output_path, "quant.txt")).read()
    assert "lpips" in quant and "lpips_uncal" not in quant


def test_lpips_load_path_parity(tmp_path):
    rng = np.random.default_rng(0)
    keep = {}
    for i, (ks, cin, cout, _, _) in enumerate(ALEX_CONVS):
        keep[f"conv{i}.weight"] = rng.normal(
            0, 0.05, (cout, cin, ks, ks)).astype(np.float32)
        keep[f"conv{i}.bias"] = rng.normal(0, 0.01, (cout,)).astype(
            np.float32)
        keep[f"lin{i}.weight"] = np.abs(rng.normal(
            0, 1, (1, cout, 1, 1))).astype(np.float32)
    npz = str(tmp_path / "lpips_alex.npz")
    np.savez(npz, **keep)

    params = load_lpips_npz(npz)
    g = torch.Generator().manual_seed(2)
    x = torch.rand((2, 3, 64, 64), generator=g) * 2 - 1
    y = torch.rand((2, 3, 64, 64), generator=g) * 2 - 1
    want = _torch_lpips_oracle(npz, x, y).numpy()
    got = np.asarray(lpips_distance(params, jnp.asarray(x.numpy()),
                                    jnp.asarray(y.numpy())))
    assert _rel(got, want) < 1e-4
