"""LPIPS structural tests (random-weight backbone)."""

import numpy as np
import jax
import jax.numpy as jnp

from texpose_tpu.nn.lpips import (init_lpips, lpips_distance, ALEX_CONVS,
                                  _alex_features)


def test_lpips_properties(key):
    params = init_lpips(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 64, 64)) * 2 - 1
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 64, 64)) * 2 - 1
    d_xx = lpips_distance(params, x, x)
    d_xy = lpips_distance(params, x, y)
    d_yx = lpips_distance(params, y, x)
    assert d_xx.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_xx), 0.0, atol=1e-6)
    assert (np.asarray(d_xy) > 0).all()
    np.testing.assert_allclose(np.asarray(d_xy), np.asarray(d_yx), rtol=1e-5)


def test_alexnet_feature_shapes(key):
    """Tap shapes must match torchvision AlexNet.features on 64x64 input."""
    params = init_lpips(key)
    x = jnp.zeros((1, 3, 64, 64))
    feats = _alex_features(params["convs"], x)
    # conv1 k11 s4 p2 on 64: floor((64+4-11)/4)+1 = 15 (torch semantics);
    # pool3/2 -> 7; conv2 -> 7; pool -> 3; conv3/4/5 -> 3
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 64, 15, 15), (1, 192, 7, 7), (1, 384, 3, 3),
                      (1, 256, 3, 3), (1, 256, 3, 3)], shapes
    assert len(ALEX_CONVS) == 5


def test_lpips_sensitivity_monotone(key):
    """Larger perturbations → larger distance (sanity of the metric)."""
    params = init_lpips(key)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 64, 64)) * 2 - 1
    noise = jax.random.normal(jax.random.PRNGKey(4), x.shape)
    d_small = float(lpips_distance(params, x, x + 0.05 * noise)[0])
    d_big = float(lpips_distance(params, x, x + 0.5 * noise)[0])
    assert d_big > d_small > 0
