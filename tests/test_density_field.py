"""Density-only field (reference layers/nerf_density.py equivalent)."""

import numpy as np
import jax
import jax.numpy as jnp

from texpose_tpu.nn.fields import (init_nerf_density,
                                   forward_samples_density,
                                   composite_density)
from texpose_tpu.utils.config import Config, process_options


def test_density_field(key):
    cfg = process_options(Config({
        "arch": {"layers_feat": [None, 16, 16, 16], "skip": [1],
                 "posenc": {"L_3D": 2}, "density_activ": "softplus",
                 "tf_init": True},
        "nerf": {"view_dep": False, "density_noise_reg": None,
                 "depth": {"scale": 10, "range": [0, 3]}},
        "data": {"image_size": [4, 4]}, "c2f": None,
        "kernels": {"fused_trunk": False},
    }))
    params = init_nerf_density(key, cfg)
    assert set(params) == {"mlp_feat"}
    center = jnp.zeros((2, 5, 3))
    ray = jnp.ones((2, 5, 3))
    ds = jnp.broadcast_to(jnp.linspace(1, 3, 8)[None, None, :, None],
                          (2, 5, 8, 1))
    dens = forward_samples_density(params, cfg, center, ray, ds)
    assert dens.shape == (2, 5, 8)
    assert (np.asarray(dens) >= 0).all()           # softplus
    out = composite_density(dens, ds, ray)
    assert out["depth"].shape == (2, 5, 1)
    assert out["opacity"].shape == (2, 5, 1)
    assert "rgb" not in out
    o = np.asarray(out["opacity"])
    assert ((o >= 0) & (o <= 1 + 1e-5)).all()
