"""Dense-layer primitives with mixed-precision matmuls.

TPU-first: the hot path casts activations/weights to a compute dtype
(bfloat16 by default on TPU) while accumulating in float32 via
preferred_element_type — this is what keeps the 8×256 field MLP on the MXU
at full throughput.  Params always live in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense(params, x, compute_dtype=None):
    """y = x @ w + b with f32 accumulation."""
    w, b = params["w"], params["b"]
    if compute_dtype is not None and compute_dtype != jnp.float32:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y + b


def relu(x):
    return jnp.maximum(x, 0.0)


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def softplus(x):
    return jax.nn.softplus(x)


DENSITY_ACTIVATIONS = {
    "softplus": jax.nn.softplus,
    "relu": relu,
    "relu_": relu,
    "softplus_": jax.nn.softplus,
    "abs": jnp.abs,
    "abs_": jnp.abs,
    "sigmoid": jax.nn.sigmoid,
    "sigmoid_": jax.nn.sigmoid,
    "exp": jnp.exp,
    "exp_": jnp.exp,
}
