"""Tests for fields / discriminator / vgg: shapes, freezing, spectral norm."""

import numpy as np
import jax
import jax.numpy as jnp

from texpose_tpu.utils.config import Config
from texpose_tpu import nn as N


def pretrain_cfg():
    """Mirror of options/nerf_lm_pretrain.yaml architecture."""
    return Config({
        "arch": {
            "layers_feat": [None, 256, 256, 256, 256, 256, 256, 256, 256],
            "layers_rgb": [None, 256, 256, 256, 3],
            "skip": [4],
            "posenc": {"L_3D": 10, "L_view": None},
            "density_activ": "softplus",
            "tf_init": True,
        },
        "nerf": {"view_dep": False, "density_noise_reg": None,
                 "sample_intvs": 64, "setbg_opaque": False},
        "c2f": [0.1, 0.5],
    })


def gan_cfg(patch_size=16):
    """Mirror of options/nerf_lm_adapt_gan.yaml architecture."""
    return Config({
        "arch": {
            "layers_feat": [None, 256, 256, 256, 256, 256, 256, 256, 256],
            "layers_rgb": [None, 256, 256, 256, 3],
            "layers_trans": [None, 256, 256, 256, 5],
            "skip": [4],
            "posenc": {"L_3D": 10, "L_view": 4},
            "density_activ": "softplus",
            "tf_init": True,
        },
        "nerf": {"view_dep": True, "density_noise_reg": None,
                 "N_latent_trans": 16, "N_latent_light": 48,
                 "min_uncert": 0.05, "sample_intvs": 64},
        "c2f": {"range": None, "start": None},
        "gan": {"type": "standard", "scale_conditional": True,
                "geo_conditional": True, "geo_c2f": None,
                "L_nocs": None, "L_scale": 4, "L_normal": None},
        "patch_size": patch_size,
    })


def test_nerf_param_shapes(key):
    cfg = pretrain_cfg()
    params = N.init_nerf(key, cfg)
    in3d = 3 + 6 * 10
    assert params["mlp_feat"][0]["w"].shape == (in3d, 256)
    assert params["mlp_feat"][4]["w"].shape == (256 + in3d, 256)
    assert params["mlp_feat"][7]["w"].shape == (256, 257)
    assert params["mlp_rgb"][0]["w"].shape == (256 + 3, 256)
    assert params["mlp_rgb"][-1]["w"].shape == (256, 3)


def test_nerf_forward(key):
    cfg = pretrain_cfg()
    params = N.init_nerf(key, cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 4, 3)) * 0.3
    rgb, density = N.apply_nerf(params, cfg, pts, progress=jnp.array(1.0))
    assert rgb.shape == (2, 5, 4, 3) and density.shape == (2, 5, 4)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1
    assert float(density.min()) >= 0  # softplus
    # c2f progress changes the output
    rgb0, _ = N.apply_nerf(params, cfg, pts, progress=jnp.array(0.0))
    assert np.abs(np.asarray(rgb0) - np.asarray(rgb)).max() > 1e-4


def test_forward_samples_shapes(key):
    cfg = pretrain_cfg()
    params = N.init_nerf(key, cfg)
    B, R, Ns = 2, 7, 8
    center = jnp.zeros((B, R, 3))
    ray = jnp.ones((B, R, 3))
    depth = jnp.linspace(1, 2, Ns).reshape(1, 1, Ns, 1).repeat(R, 1).repeat(B, 0)
    rgb, dens = N.forward_samples_nerf(params, cfg, center, ray, depth,
                                       progress=jnp.array(1.0))
    assert rgb.shape == (B, R, Ns, 3) and dens.shape == (B, R, Ns)


def test_st_field_shapes_and_frozen_trunk(key):
    cfg = gan_cfg()
    params = N.init_nerf_st(key, cfg)
    B, R, Ns = 2, 6, 4
    pts = jax.random.normal(jax.random.PRNGKey(2), (B, R, Ns, 3)) * 0.3
    ray_unit = jnp.tile(jnp.array([0.0, 0, 1]), (B, R, Ns, 1))
    lt = jax.random.normal(jax.random.PRNGKey(3), (B, 16))
    ll = jax.random.normal(jax.random.PRNGKey(4), (B, 48))
    rgb, dens, unc = N.apply_nerf_st(params, cfg, pts, ray_unit, lt, ll,
                                     progress=jnp.array(1.0))
    assert rgb.shape == (B, R, Ns, 3, 2)
    assert dens.shape == (B, R, Ns, 2)
    assert unc.shape == (B, R, Ns, 1)

    # trunk gradients must be exactly zero (frozen geometry)
    def loss_fn(p):
        r, d, u = N.apply_nerf_st(p, cfg, pts, ray_unit, lt, ll,
                                  progress=jnp.array(1.0))
        return (r ** 2).mean() + (d ** 2).mean() + (u ** 2).mean()

    grads = jax.grad(loss_fn)(params)
    feat_gnorm = sum(float(jnp.abs(g["w"]).max()) for g in grads["mlp_feat"])
    rgb_gnorm = sum(float(jnp.abs(g["w"]).max()) for g in grads["mlp_rgb"])
    trans_gnorm = sum(float(jnp.abs(g["w"]).max()) for g in grads["mlp_trans"])
    assert feat_gnorm == 0.0
    assert rgb_gnorm > 0 and trans_gnorm > 0


def test_st_latent_conditioning(key):
    cfg = gan_cfg()
    params = N.init_nerf_st(key, cfg)
    B, R, Ns = 1, 3, 2
    pts = jnp.ones((B, R, Ns, 3)) * 0.2
    ray_unit = jnp.tile(jnp.array([0.0, 0, 1]), (B, R, Ns, 1))
    lt = jnp.zeros((B, 16))
    rgb1, _, _ = N.apply_nerf_st(params, cfg, pts, ray_unit, lt,
                                 jnp.zeros((B, 48)), progress=jnp.array(1.0))
    rgb2, _, _ = N.apply_nerf_st(params, cfg, pts, ray_unit, lt,
                                 jnp.ones((B, 48)), progress=jnp.array(1.0))
    # light latent affects static rgb
    assert np.abs(np.asarray(rgb1[..., 0]) - np.asarray(rgb2[..., 0])).max() > 1e-5


def test_discriminator_shapes_and_sn(key):
    cfg = gan_cfg(patch_size=16)
    params, state = N.init_discriminator(key, cfg)
    B = 4
    x = jax.random.normal(jax.random.PRNGKey(5), (B, 9, 16, 16))
    scales = jnp.ones((B, 1, 1, 1)) * 0.5
    logits, new_state = N.apply_discriminator(params, state, cfg, x, scales)
    assert logits.shape == (B,)
    # training mode updates power-iteration state
    assert any(float(jnp.abs(a - b).max()) > 0
               for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state)))
    _, eval_state = N.apply_discriminator(params, state, cfg, x, scales,
                                          training=False)
    assert all(float(jnp.abs(a - b).max()) == 0
               for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(eval_state)))


def test_spectral_norm_normalizes(key):
    w = jax.random.normal(key, (4, 4, 8, 16)) * 3.0
    u = jnp.ones((16,)) / 4.0
    # run power iteration to convergence
    for _ in range(50):
        w_sn, u = N.sn_apply(w, u, training=True)
    sigma_max = np.linalg.svd(np.asarray(w).reshape(-1, 16), compute_uv=False)[0]
    w_after = np.asarray(w_sn).reshape(-1, 16)
    np.testing.assert_allclose(np.linalg.svd(w_after, compute_uv=False)[0],
                               sigma_max / sigma_max, atol=1e-3)


def test_discriminator_sizes_32_64(key):
    for ps in (32, 64):
        cfg = gan_cfg(patch_size=ps)
        params, state = N.init_discriminator(key, cfg)
        x = jnp.zeros((2, 9, ps, ps))
        logits, _ = N.apply_discriminator(params, state, cfg, x,
                                          jnp.ones((2, 1, 1, 1)))
        assert logits.shape == (2,)


def test_instance_norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 5 + 2
    y = N.instance_norm(x)
    np.testing.assert_allclose(np.asarray(y.mean(axis=(2, 3))), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.var(axis=(2, 3))), 1, atol=1e-3)


def test_vgg_features_and_perceptual(key):
    params = N.init_vgg19(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 32, 32))
    f = N.vgg19_features(params, x)
    assert f.shape == (1, 256, 8, 8)
    assert float(N.perceptual_loss(params, x, x)) == 0.0
    y = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 32, 32))
    assert float(N.perceptual_loss(params, x, y)) > 0


def test_vgg_bf16_matches_f32_and_differentiates(key):
    """The mixed-precision VGG path (engine compute dtype) returns f32
    features close to the f32 stack and has a well-typed input VJP."""
    import jax.numpy as jnp
    params = N.init_vgg19(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 16, 16))
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 16, 16))
    f32 = N.vgg19_features(params, x)
    bf16 = N.vgg19_features(params, x, dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32),
                               rtol=0.1, atol=0.05)
    loss = lambda z: N.perceptual_loss_pairs(
        params, [(z, y, 1.0), (z * 0.5, y, 5.0)], dtype=jnp.bfloat16)
    v, g = jax.value_and_grad(loss)(x)
    v32 = N.perceptual_loss_pairs(params, [(x, y, 1.0), (x * 0.5, y, 5.0)])
    assert g.dtype == jnp.float32 and np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(float(v), float(v32), rtol=0.02)


def test_sn_normalize_once_matches_inline(key):
    """sn_normalize_disc + normalized=True must reproduce the inline
    per-call spectral normalization exactly (logits AND new u state) —
    the train step reuses one normalization across the batched GAN pass,
    the R1 input-grad pass, and WGAN-GP."""
    cfg = gan_cfg(patch_size=16)
    params, state = N.init_discriminator(key, cfg)
    B = 4
    x = jax.random.normal(jax.random.PRNGKey(5), (B, 9, 16, 16))
    scales = jnp.ones((B, 1, 1, 1)) * 0.5
    ref_logits, ref_state = N.apply_discriminator(params, state, cfg, x,
                                                  scales)
    psn, sn2 = N.sn_normalize_disc(params, state)
    got_logits, got_state = N.apply_discriminator(psn, sn2, cfg, x, scales,
                                                  normalized=True)
    np.testing.assert_array_equal(np.asarray(got_logits),
                                  np.asarray(ref_logits))
    for a, b in zip(jax.tree.leaves(ref_state), jax.tree.leaves(got_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # eval mode leaves u untouched
    _, s_eval = N.sn_normalize_disc(params, state, training=False)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s_eval)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
