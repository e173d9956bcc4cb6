"""VGG19 feature extractor for the perceptual loss.

Capability parity with /root/reference/layers/perceptual_loss.py:9-45: the
torchvision VGG19 `features` stack truncated after layer index 14 (conv3_3,
pre-activation), ImageNet mean/std normalization, L1/L2/both criteria.

Weights: this environment has no torchvision weight cache and no network
egress, so `init_vgg19` produces deterministic He-initialized filters, and
`load_vgg19_npz` ports real torchvision weights from an .npz of
{features.0.weight, features.0.bias, ...} (torch OIHW layout) when the user
provides one.  Random-feature perceptual losses are a studied, functional
fallback; quality parity with the reference requires ported weights — see
README (weights section).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# vgg19 'E' config up to the layer-14 cutoff used by the reference
# (conv, in, out) for indices 0,2,5,7,10,12,14; maxpool after 3 and 8
VGG19_CONVS = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
               (10, 128, 256), (12, 256, 256), (14, 256, 256)]
_POOL_AFTER = {1, 3}   # maxpools at torch indices 4 and 9 follow the 2nd and 4th convs

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def init_vgg19(key, dtype=jnp.float32):
    """Deterministic He-normal conv stack (3×3, HWIO)."""
    params = []
    keys = jax.random.split(key, len(VGG19_CONVS))
    for k, (_, cin, cout) in zip(keys, VGG19_CONVS):
        std = math.sqrt(2.0 / (9 * cin))
        params.append({
            "w": jax.random.normal(k, (3, 3, cin, cout), dtype) * std,
            "b": jnp.zeros((cout,), dtype),
        })
    return params


def load_vgg19_npz(path):
    """Port torchvision vgg19 weights from an npz with torch state-dict keys
    (features.N.weight [out,in,3,3] → HWIO)."""
    data = np.load(path)
    params = []
    for idx, cin, cout in VGG19_CONVS:
        w = data[f"features.{idx}.weight"]          # [out,in,3,3]
        b = data[f"features.{idx}.bias"]
        params.append({
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(b),
        })
    return params


def vgg19_features(params, x, dtype=None):
    """x [B,3,H,W] in [0,1] → conv3_3 features [B,256,H/4,W/4].

    Applies ImageNet normalization, then conv/relu/pool exactly as
    torchvision features[0:15].  With ``dtype`` (e.g. bf16), conv inputs and
    weights run in that dtype with f32 accumulation — the TPU-native compute
    path (the f32 conv stack runs at the MXU's quarter rate); the returned
    features are f32 either way.
    """
    x = (x - IMAGENET_MEAN[None, :, None, None]) / IMAGENET_STD[None, :, None, None]
    if dtype is not None:
        # standard TPU mixed precision: the whole stack runs in `dtype`
        # (uniform dtypes keep the conv VJP well-typed); upcast at the end
        x = x.astype(dtype)
    for i, p in enumerate(params):
        w = p["w"] if dtype is None else p["w"].astype(dtype)
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            **({} if dtype is not None
               else dict(preferred_element_type=jnp.float32)))
        x = x + p["b"][None, :, None, None].astype(x.dtype)
        if i != len(params) - 1:                    # layer 14 output is pre-ReLU
            x = jnp.maximum(x, jnp.zeros((), x.dtype))
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return x.astype(jnp.float32)


def perceptual_loss_pairs(params, pairs, loss_type="l2", dtype=None):
    """Batched perceptual loss: pairs = [(fake_i, real_i, weight_i), ...]
    all [B,3,H,W].  ONE VGG forward over the concatenated batch instead of
    2·len(pairs) separate feature passes — on TPU the standalone 16×16-patch
    convs are dispatch-bound, so this is a ~4× reduction in small-kernel
    launches for the texture stage's two-term loss
    (reference model/nerf_adapt_st_gan.py:766-769).  ``dtype`` routes the
    conv stack through the MXU's fast path (vgg19_features)."""
    stacked = jnp.concatenate(
        [x for f, r, _ in pairs for x in (f, r)], axis=0)
    feats = vgg19_features(params, stacked, dtype)
    B = pairs[0][0].shape[0]
    total = 0.0
    for i, (_, _, w) in enumerate(pairs):
        f_fake = feats[2 * i * B:(2 * i + 1) * B]
        f_real = jax.lax.stop_gradient(feats[(2 * i + 1) * B:(2 * i + 2) * B])
        if loss_type == "l1":
            d = jnp.abs(f_fake - f_real).mean()
        elif loss_type == "l2":
            d = ((f_fake - f_real) ** 2).mean()
        else:
            d = (jnp.abs(f_fake - f_real).mean()
                 + ((f_fake - f_real) ** 2).mean())
        total = total + w * d
    return total


def perceptual_loss(params, fake, real, loss_type="l2"):
    """Feature-space distance; `real` features are stop-gradiented
    (reference perceptual_loss.py:38-45)."""
    f_fake = vgg19_features(params, fake)
    f_real = jax.lax.stop_gradient(vgg19_features(params, real))
    if loss_type == "l1":
        return jnp.abs(f_fake - f_real).mean()
    if loss_type == "l2":
        return ((f_fake - f_real) ** 2).mean()
    if loss_type == "both":
        return (jnp.abs(f_fake - f_real).mean()
                + ((f_fake - f_real) ** 2).mean())
    raise NotImplementedError(loss_type)
