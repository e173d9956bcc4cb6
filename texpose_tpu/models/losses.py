"""Loss library for all training stages.

Capability parity:
  * L1/MSE/scale-invariant-depth/point losses → reference model/base.py:215-239
  * uncertainty-weighted render, mask, uncert-reg 5+log(σ²)/2, transient
    density reg → model/nerf_adapt_st_gan.py:747-776
  * Lab chromaticity (ab channels only, mask-weighted SmoothL1) →
    layers/lab_loss.py
  * GAN losses (standard BCE-with-logits / WGAN) + R1-style gradient
    penalty → model/nerf_adapt_st_gan.py:794-826
  * log-scale 10**w loss weighting → model/base.py:145-157

TPU delta: the R1 penalty is jax.grad of the discriminator output sum w.r.t.
the input patch (one extra backward through the conv stack, fused by XLA)
instead of torch autograd.grad with retain_graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.color import rgb_to_lab, normalize_lab


def l1_loss(pred, label=0.0):
    return jnp.abs(pred - label).mean()


def mse_loss(pred, label=0.0):
    return ((pred - label) ** 2).mean()


def masked_mse_loss(pred, label, mask, eps=1e-5):
    """Σ mask·(pred−label)² / (Σ mask + ε)."""
    return (mask * (pred - label) ** 2).sum() / (mask.sum() + eps)


def scale_invariant_depth_loss(depth_pred, depth_target, mask=None):
    """1 − min/max ratio loss (reference model/base.py:223-231)."""
    mn = jnp.minimum(depth_pred, depth_target)
    mx = jnp.maximum(depth_pred, depth_target)
    loss = 1 - mn / (mx + 1e-5)
    if mask is not None:
        mask = mask.astype(loss.dtype)
        return (loss * mask).sum() / (mask.sum() + 1e-5)
    return loss.mean()


def point_loss(point_pred, point_target, mask):
    """Robust Geman-McClure-style point loss (model/base.py:233-239)."""
    e = jnp.linalg.norm(point_pred - point_target, axis=-1, keepdims=True)
    c = 2 * jax.lax.stop_gradient(
        jnp.quantile(e, 0.5, axis=1, keepdims=True))
    loss = -jnp.expm1(-0.5 * (e / c) ** 2)
    mask = mask.astype(loss.dtype)
    return (loss * mask).sum() / (mask.sum() + 1e-5)


def uncertainty_render_loss(rgb, image, uncert, mask, eps=1e-5):
    """σ²-weighted masked MSE (model/nerf_adapt_st_gan.py:750)."""
    return (mask * ((image - rgb) ** 2 / uncert ** 2)).sum() / (mask.sum() + eps)


def uncertainty_reg_loss(uncert):
    """5 + E[log σ²]/2 (model/nerf_adapt_st_gan.py:760)."""
    return 5.0 + jnp.log(uncert ** 2).mean() / 2


def transient_reg_loss(density_samples):
    """Mean transient density (model/nerf_adapt_st_gan.py:763)."""
    return density_samples[..., -1].mean()


def smooth_l1(x, y, beta=1.0):
    d = jnp.abs(x - y)
    return jnp.where(d < beta, 0.5 * d ** 2 / beta, d - 0.5 * beta)


def lab_loss(fake, real, mask=None):
    """SmoothL1 on normalized ab channels only; returns
    (loss, fake_lab_vis, real_lab_vis) like the reference
    (layers/lab_loss.py:13-34)."""
    fake_lab = normalize_lab(rgb_to_lab(fake))
    real_lab = normalize_lab(rgb_to_lab(real))
    loss = smooth_l1(fake_lab[:, 1:], real_lab[:, 1:])
    if mask is not None:
        loss = (loss * mask).sum() / mask.sum()
    else:
        loss = loss.mean()
    fake_vis = jax.lax.stop_gradient(
        fake_lab.at[:, 0].set(real_lab[:, 0]))
    return loss, fake_vis, jax.lax.stop_gradient(real_lab)


# ------------------------------------------------------------------ GAN side

def gan_loss(d_out, target, gan_type="standard"):
    """d_out [B] logits; target ∈ {0,1}
    (model/nerf_adapt_st_gan.py:809-826)."""
    if gan_type == "standard":
        t = jnp.full_like(d_out, float(target))
        return jnp.mean(
            jnp.maximum(d_out, 0) - d_out * t + jnp.log1p(jnp.exp(-jnp.abs(d_out))))
    if gan_type == "wgan":
        return (2 * target - 1) * d_out.mean()
    raise NotImplementedError(gan_type)


def wgan_gp_reg(disc_fn, key, patch_real, patch_fake, center=1.0):
    """WGAN-GP: gradient penalty at random interpolates
    (reference model/nerf_adapt_st_gan.py:828-835)."""
    B = patch_real.shape[0]
    eps = jax.random.uniform(key, (B, 1, 1, 1))
    x = jax.lax.stop_gradient((1 - eps) * patch_real + eps * patch_fake)
    grad = jax.grad(lambda z: disc_fn(z).sum())(x)
    norm2 = (grad ** 2).reshape(B, -1).sum(axis=1)
    return ((jnp.sqrt(norm2 + 1e-12) - center) ** 2).mean()


def r1_penalty(disc_fn, patch):
    """E[‖∇_x D(x)‖²] per batch mean; disc_fn maps patch → [B] logits.

    Matches compute_grad2 (model/nerf_adapt_st_gan.py:794-807): grad of the
    SUM of outputs w.r.t. the input, squared, summed over non-batch dims,
    then meaned over the batch.
    """
    grad = jax.grad(lambda x: disc_fn(x).sum())(patch)
    B = patch.shape[0]
    return (grad ** 2).reshape(B, -1).sum(axis=1).mean()


# ------------------------------------------------------------- loss weighting

def summarize_loss(loss_dict, loss_weight):
    """Weighted sum with 10**w log-scale weights; keys with weight None are
    excluded (reference model/base.py:145-157).  Returns (loss_all, dict with
    'all' added)."""
    total = 0.0
    for key, value in loss_dict.items():
        if key == "all":
            continue
        w = loss_weight.get(key)
        if w is not None:
            total = total + (10.0 ** float(w)) * value
    out = dict(loss_dict)
    out["all"] = total
    return total, out
