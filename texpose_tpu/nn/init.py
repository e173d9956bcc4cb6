"""Weight initializers matching the reference's TensorFlow-style init
(/root/reference/layers/nerf.py:48-59): Xavier-uniform with ReLU gain √2 for
hidden layers, gain 1 for output layers, and the split 'first' mode for the
trunk's final layer where the density row gets gain 1 and the feature rows
get gain √2.  Biases are zero.

Weights are stored [in, out] (JAX matmul convention; the torch reference
stores [out, in] — fan computations account for this).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

RELU_GAIN = math.sqrt(2.0)


def xavier_uniform(key, in_dim, out_dim, gain=1.0, dtype=jnp.float32):
    bound = gain * math.sqrt(6.0 / (in_dim + out_dim))
    return jax.random.uniform(key, (in_dim, out_dim), dtype, -bound, bound)


def dense_init(key, in_dim, out_dim, out_mode=None, dtype=jnp.float32):
    """Initialize one dense layer {w [in,out], b [out]}.

    out_mode: None → hidden (gain √2); 'all' → output (gain 1);
    'first' → first output unit gain 1, rest gain √2 (each slice gets its
    own fan_out as in torch xavier on a sliced weight).
    """
    if out_mode is None:
        w = xavier_uniform(key, in_dim, out_dim, RELU_GAIN, dtype)
    elif out_mode == "all":
        w = xavier_uniform(key, in_dim, out_dim, 1.0, dtype)
    elif out_mode == "first":
        k1, k2 = jax.random.split(key)
        w_first = xavier_uniform(k1, in_dim, 1, 1.0, dtype)
        w_rest = xavier_uniform(k2, in_dim, out_dim - 1, RELU_GAIN, dtype)
        w = jnp.concatenate([w_first, w_rest], axis=1)
    else:
        raise ValueError(out_mode)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def conv_init(key, kh, kw, in_ch, out_ch, gain=None, dtype=jnp.float32):
    """Conv kernel [kh,kw,in,out] (HWIO), DCGAN-style N(0, 0.02) when gain is
    None (torch Conv2d default for the reference discriminator is kaiming,
    but spectral norm renormalizes scale anyway; N(0,0.02) keeps σ≈const)."""
    if gain is None:
        w = jax.random.normal(key, (kh, kw, in_ch, out_ch), dtype) * 0.02
    else:
        fan_in = kh * kw * in_ch
        fan_out = kh * kw * out_ch
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(key, (kh, kw, in_ch, out_ch), dtype, -bound, bound)
    return {"w": w}
