"""LPIPS perceptual distance (AlexNet backbone + linear calibration) in JAX.

Capability parity with the pip `lpips.LPIPS(net="alex")` the reference uses
at eval (model/nerf_adapt_st_gan.py:31,363) and the vendored
PerceptualSimilarity (external/PerceptualSimilarity/models/networks_basic.py):
  * input scaling layer (shift/scale constants), inputs in [-1, 1]
  * AlexNet features tapped after each of the 5 ReLUs
  * per-channel unit-normalization of each tap
  * 1x1 non-negative linear weights per layer, spatial average, sum

Weights: this image has no torchvision/lpips caches and no egress, so
`init_lpips` gives deterministic random backbone + uniform linear weights —
structurally exact, calibration pending; `load_lpips_npz` ports real weights
(see tools/port_weights.py).  Metrics computed with random weights are
labeled `lpips_rand` by the eval harness.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# (kernel, in, out, stride, pad); maxpool 3/2 after taps 1 and 2
ALEX_CONVS = [(11, 3, 64, 4, 2), (5, 64, 192, 1, 2), (3, 192, 384, 1, 1),
              (3, 384, 256, 1, 1), (3, 256, 256, 1, 1)]
_POOL_BEFORE = {1, 2}      # pool applied before convs 1 and 2 (0-indexed)

SHIFT = jnp.array([-0.030, -0.088, -0.188])
SCALE = jnp.array([0.458, 0.448, 0.450])


def init_lpips(key, dtype=jnp.float32):
    """Deterministic random backbone + uniform non-negative linear heads."""
    convs = []
    keys = jax.random.split(key, len(ALEX_CONVS) + 1)
    for k, (ks, cin, cout, _, _) in zip(keys, ALEX_CONVS):
        std = math.sqrt(2.0 / (ks * ks * cin))
        convs.append({
            "w": jax.random.normal(k, (ks, ks, cin, cout), dtype) * std,
            "b": jnp.zeros((cout,), dtype),
        })
    lins = [jnp.ones((c[2],), dtype) / c[2] for c in ALEX_CONVS]
    return {"convs": convs, "lins": lins}


def load_lpips_npz(path):
    """Port weights from an npz produced by tools/port_weights.py
    (torch OIHW conv layouts)."""
    data = np.load(path)
    convs = []
    for i in range(len(ALEX_CONVS)):
        w = data[f"conv{i}.weight"]            # [out,in,k,k]
        b = data[f"conv{i}.bias"]
        convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                      "b": jnp.asarray(b)})
    lins = [jnp.asarray(np.maximum(data[f"lin{i}.weight"].reshape(-1), 0.0))
            for i in range(len(ALEX_CONVS))]
    return {"convs": convs, "lins": lins}


def _alex_features(convs, x):
    """x [B,3,H,W] scaled input → list of 5 post-ReLU feature maps."""
    feats = []
    for i, (p, (ks, cin, cout, stride, pad)) in enumerate(zip(convs,
                                                              ALEX_CONVS)):
        if i in _POOL_BEFORE:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 1, 3, 3), (1, 1, 2, 2), "VALID")
        x = jax.lax.conv_general_dilated(
            x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=jnp.float32)
        x = jnp.maximum(x + p["b"][None, :, None, None], 0.0)
        feats.append(x)
    return feats


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt((x ** 2).sum(axis=1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(params, x, y):
    """x, y [B,3,H,W] in [-1,1] → [B] perceptual distances."""
    xs = (x - SHIFT[None, :, None, None]) / SCALE[None, :, None, None]
    ys = (y - SHIFT[None, :, None, None]) / SCALE[None, :, None, None]
    fx = _alex_features(params["convs"], xs)
    fy = _alex_features(params["convs"], ys)
    total = 0.0
    for a, b, lin in zip(fx, fy, params["lins"]):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2   # [B,C,h,w]
        d = (d * lin[None, :, None, None]).sum(axis=1)       # [B,h,w]
        total = total + d.mean(axis=(1, 2))
    return total
