"""Train-time image augmentation (reference data/base.py:75-100 parity)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from texpose_tpu.data.augment import (generate_augmentation,
                                      apply_augmentation)


def _img(seed=0, H=8, W=10):
    return np.random.RandomState(seed).rand(3, H, W).astype(np.float32)


def _noop(**kw):
    aug = dict(brightness=1.0, contrast=1.0, saturation=1.0, hue=0.0,
               flip=False, rot_angle=0.0)
    aug.update(kw)
    return aug


def test_color_ops_match_torchvision_semantics():
    img = _img()
    # brightness: blend toward black
    out = apply_augmentation(img, _noop(brightness=0.5))
    np.testing.assert_allclose(out, img * 0.5, atol=1e-6)
    # saturation 0 → per-pixel grayscale (torchvision coefficients)
    out = apply_augmentation(img, _noop(saturation=0.0))
    gray = (np.array([0.2989, 0.587, 0.114], np.float32)[:, None, None]
            * img).sum(0)
    np.testing.assert_allclose(out, np.broadcast_to(gray, img.shape),
                               atol=1e-6)
    # contrast 0 → constant mean gray level
    out = apply_augmentation(img, _noop(contrast=0.0))
    np.testing.assert_allclose(out, np.full_like(img, gray.mean()),
                               atol=1e-6)
    # hue: full turn is identity
    out = apply_augmentation(img, _noop(hue=1.0))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_geometric_ops():
    img = _img()
    out = apply_augmentation(img, _noop(flip=True))
    np.testing.assert_array_equal(out, img[:, :, ::-1])
    # 180° rotation ≈ flip both axes (interior exact for even dims)
    out = apply_augmentation(img, _noop(rot_angle=180.0))
    np.testing.assert_allclose(out[:, 1:-1, 1:-1],
                               img[:, ::-1, ::-1][:, 1:-1, 1:-1], atol=1e-3)


def test_generate_augmentation_ranges():
    cfg = {"brightness": 0.2, "contrast": 0.1, "saturation": 0.3,
           "hue": 0.05, "hflip": True, "rotate": 10.0}
    rng = np.random.default_rng(0)
    for _ in range(50):
        a = generate_augmentation(cfg, rng)
        assert 0.8 <= a["brightness"] <= 1.2
        assert 0.9 <= a["contrast"] <= 1.1
        assert 0.7 <= a["saturation"] <= 1.3
        assert -0.05 <= a["hue"] <= 0.05
        assert -10.0 <= a["rot_angle"] <= 10.0
    # empty cfg → identity parameters
    a = generate_augmentation({}, rng)
    assert a == _noop()


def test_dataset_wiring(tmp_path_factory):
    from texpose_tpu.data.fixture import generate_fixture
    from texpose_tpu.data.lm import LineMODDataset
    from test_texture_gan_e2e import tiny_gan_cfg
    root = generate_fixture(str(tmp_path_factory.mktemp("bop")),
                            n_train=2, n_test=1, scene="scene_all",
                            image_scale=0.25, crop_res=32)
    cfg = tiny_gan_cfg(root, tmp_path_factory.mktemp("out"))
    ds = LineMODDataset(cfg, split="train", splits_root=cfg.data.splits_root)
    base = ds[0]["image"]

    cfg.data.augment = {"brightness": 0.4, "hflip": True}
    ds_aug = LineMODDataset(cfg, split="train",
                            splits_root=cfg.data.splits_root)
    a1 = ds_aug[0]["image"]
    assert a1.shape == base.shape and a1.dtype == base.dtype
    assert not np.allclose(a1, base)                  # actually augmented
    np.testing.assert_array_equal(a1, ds_aug[0]["image"])  # deterministic

    # eval split ignores augmentation
    ds_val = LineMODDataset(cfg, split="val", splits_root=cfg.data.splits_root)
    ds_val_plain = LineMODDataset(tiny_gan_cfg(root,
                                               tmp_path_factory.mktemp("o2")),
                                  split="val",
                                  splits_root=cfg.data.splits_root)
    np.testing.assert_array_equal(ds_val[0]["image"],
                                  ds_val_plain[0]["image"])
