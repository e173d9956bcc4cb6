"""Tests for patch/ray samplers and the loss library."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from texpose_tpu import sampling as S
from texpose_tpu.models import losses as L
from texpose_tpu import geometry as G
from texpose_tpu.ops.grid_sample import grid_sample


def test_flex_patch_bounds(key):
    coords, scales = S.flex_patch_coords(key, nbatch=8, patch_size=16,
                                         iteration=0)
    assert coords.shape == (8, 16, 16, 2) and scales.shape == (8, 1, 1, 1)
    assert float(jnp.abs(coords).max()) <= 1.0 + 1e-6
    # at iteration 0 with anneal, min scale is capped at 0.8
    assert float(scales.min()) >= 0.8 - 1e-6


def test_flex_patch_anneal(key):
    lo0, hi0 = S.current_scale_bounds(0)
    lo_late, _ = S.current_scale_bounds(100000)
    assert lo0 == 0.8 and lo_late == 0.25 and hi0 == 1.0
    _, scales_late = S.flex_patch_coords(key, 64, 16, iteration=100000)
    assert float(scales_late.min()) < 0.5  # anneal reached wide range


def test_full_image_coords_roundtrip(rng):
    img = jnp.asarray(rng.normal(size=(1, 3, 9, 11)).astype(np.float32))
    coords, _ = S.full_image_coords(1, 9, 11)
    out = grid_sample(img, coords, mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_get_rays_matches_pixel_rays(rng):
    """Full-image patch coords must reproduce (arange-grid) per-pixel rays."""
    H, W = 12, 16
    intr = jnp.asarray(np.array([[[40., 0, 8], [0, 40., 6], [0, 0, 1]]], np.float32))
    from scipy.spatial.transform import Rotation as ScipyR
    R = ScipyR.random(1, random_state=5).as_matrix().astype(np.float32)
    pose = G.pose_from_Rt(R, rng.normal(size=(1, 3)).astype(np.float32))
    coords, _ = S.full_image_coords(1, H, W)
    center, ray = S.get_rays(intr, coords, pose, H, W)
    # oracle: get_center_and_ray with 0.0 offset (ray sampler uses arange)
    c_ref, r_ref = G.get_center_and_ray(pose, intr, H, W, center_offset=0.0)
    np.testing.assert_allclose(center.reshape(1, -1, 3), c_ref, atol=1e-4)
    np.testing.assert_allclose(ray.reshape(1, -1, 3), r_ref, atol=1e-4)


def test_get_bounds(rng):
    H, W = 8, 8
    z_near = jnp.asarray(np.full((1, H * W), 2.0, np.float32))
    z_far = jnp.asarray(np.full((1, H * W), 4.0, np.float32))
    coords, _ = S.rescale_patch_coords(1, 4, scale=0.5)
    zn, zf = S.get_bounds(coords, z_near, z_far, H, W)
    np.testing.assert_allclose(zn, 2.0, atol=1e-6)
    np.testing.assert_allclose(zf, 4.0, atol=1e-6)


# ----------------------------------------------------------------- losses

def test_basic_losses():
    x = jnp.array([1.0, 2.0, 3.0])
    assert float(L.mse_loss(x, x)) == 0.0
    assert abs(float(L.l1_loss(x, 0.0)) - 2.0) < 1e-6
    d1 = jnp.ones((1, 4, 1))
    d2 = jnp.ones((1, 4, 1)) * 2
    # 1 - 1/2 = 0.5
    assert abs(float(L.scale_invariant_depth_loss(d1, d2)) - 0.5) < 1e-4
    # symmetric
    assert abs(float(L.scale_invariant_depth_loss(d2, d1)) - 0.5) < 1e-4


def test_uncert_losses():
    rgb = jnp.zeros((1, 3, 4, 4))
    img = jnp.ones((1, 3, 4, 4))
    unc = jnp.full((1, 1, 4, 4), 2.0)
    mask = jnp.ones((1, 1, 4, 4))
    val = float(L.uncertainty_render_loss(rgb, img, unc, mask))
    assert abs(val - 3 * (1 / 4)) < 1e-4  # 3 channels × 1/σ² each, /mask.sum
    assert abs(float(L.uncertainty_reg_loss(jnp.ones((2, 2)))) - 5.0) < 1e-6
    dens = jnp.stack([jnp.zeros((2, 3)), jnp.full((2, 3), 0.7)], axis=-1)
    assert abs(float(L.transient_reg_loss(dens)) - 0.7) < 1e-6


def test_lab_loss_ignores_lightness():
    # two grays differ only in L channel → ab loss 0
    a = jnp.full((1, 3, 4, 4), 0.2)
    b = jnp.full((1, 3, 4, 4), 0.8)
    loss, fv, rv = L.lab_loss(a, b)
    assert float(loss) < 1e-6
    # red vs green differ in ab
    red = jnp.zeros((1, 3, 4, 4)).at[:, 0].set(1.0)
    green = jnp.zeros((1, 3, 4, 4)).at[:, 1].set(1.0)
    loss2, _, _ = L.lab_loss(red, green)
    assert float(loss2) > 0.01


def test_gan_loss_matches_bce():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    logits = np.array([-2.0, 0.5, 3.0], np.float32)
    for target in (0, 1):
        ours = float(L.gan_loss(jnp.asarray(logits), target))
        theirs = F.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.full((3,), float(target))).item()
        assert abs(ours - theirs) < 1e-5
    # wgan convention in the reference: loss = (2·target − 1)·mean(d_out)
    assert abs(float(L.gan_loss(jnp.asarray(logits), 1, "wgan"))
               - logits.mean()) < 1e-6


def test_r1_penalty_quadratic():
    # D(x) = sum(3x) → grad = 3 everywhere → penalty = 9 * numel_per_sample
    patch = jnp.ones((2, 3, 4, 4))
    pen = L.r1_penalty(lambda x: 3 * x.sum(axis=(1, 2, 3)), patch)
    assert abs(float(pen) - 9 * 3 * 4 * 4) < 1e-4


def test_summarize_loss():
    total, out = L.summarize_loss(
        {"render": jnp.array(2.0), "mask": jnp.array(1.0), "skip": jnp.array(5.0)},
        {"render": 0, "mask": -1, "skip": None})
    assert abs(float(total) - (2.0 + 0.1)) < 1e-6
    assert "all" in out
