"""NeRF radiance fields as pure init/apply functions over param pytrees.

Capability parity:
  * coarse density+RGB field  → reference layers/nerf.py:15-154
  * static/transient/light field (frozen trunk, light-conditioned RGB head,
    transient head w/ uncertainty) → layers/nerf_static_transient_light.py

Design deltas (TPU-first, deliberate):
  * params are pytrees; "freezing" the trunk is jax.lax.stop_gradient on its
    outputs + an optax mask (models/texture_gan.py), replacing
    requires_grad=False + torch.no_grad (reference :87-100,236-239).
  * `progress` is a traced f32 scalar (c2f anneal without recompiles); the
    reference stores it as an nn.Parameter it mutates from the engine.
  * density noise uses an explicit PRNG key.
  * all matmuls route through nn.mlp.dense → MXU with f32 accumulation;
    compute_dtype=bfloat16 is supported end-to-end.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.posenc import posenc_with_identity, positional_encoding
from .init import dense_init
from .mlp import dense, relu, DENSITY_ACTIVATIONS


def get_layer_dims(layers):
    """[None, h1, ..., out] → [(in,out) per layer] (reference util.py:277-279)."""
    return list(zip(layers[:-1], layers[1:]))


def _c2f(cfg):
    """Normalize the two c2f config shapes to (range, start_freq).

    pretrain yaml uses a flat `c2f: [start, end]`; the adapt-gan yaml uses
    `c2f: {range: [s,e], start: k}` (reference layers/nerf.py:145 vs
    layers/nerf_static_transient_light.py:224-229).
    """
    c2f = cfg.get("c2f", None)
    if c2f is None:
        return None, 0
    if isinstance(c2f, dict):
        rng = c2f.get("range", None)
        start = c2f.get("start", None) or 0
        return (tuple(rng) if rng is not None else None), start
    return tuple(c2f), 0


def input_3d_dim(cfg):
    return 3 + 6 * cfg.arch.posenc.L_3D if cfg.arch.get("posenc") else 3


def input_view_dim(cfg):
    if not cfg.arch.get("posenc") or not cfg.arch.posenc.get("L_view"):
        return 3
    return 3 + 6 * cfg.arch.posenc.L_view


# ----------------------------------------------------------------- trunk MLP

def init_trunk(key, cfg):
    """Feature/density trunk: layers_feat with skip connections; final layer
    emits [density, feat...] (reference layers/nerf.py:22-32)."""
    in3d = input_3d_dim(cfg)
    dims = get_layer_dims(cfg.arch.layers_feat)
    layers = []
    keys = jax.random.split(key, len(dims))
    for li, (k_in, k_out) in enumerate(dims):
        if li == 0:
            k_in = in3d
        if li in cfg.arch.skip:
            k_in += in3d
        if li == len(dims) - 1:
            k_out += 1
        mode = "first" if (cfg.arch.tf_init and li == len(dims) - 1) else None
        layers.append(dense_init(keys[li], k_in, k_out,
                                 out_mode=mode if cfg.arch.tf_init else None))
    return layers


def _c2f_band_weights(cfg, L, progress):
    """Per-frequency window w_k as a traced [L] vector (ops/posenc.py
    semantics); ones when c2f disabled or progress absent."""
    c2f_range, c2f_start = _c2f(cfg)
    if c2f_range is None or progress is None:
        return jnp.ones((L,), jnp.float32)
    from ..ops.posenc import c2f_band_weights
    return c2f_band_weights(L, progress, c2f_range, c2f_start)


def _use_fused_trunk(cfg):
    if not cfg.arch.get("posenc"):
        return False
    if not cfg.get("kernels", {}).get("fused_trunk", True):
        return False
    try:
        from ..kernels.fused_trunk import fused_trunk_available
        if not fused_trunk_available():
            return False
        import jax as _jax
        return _jax.default_backend() == "tpu"
    except Exception:
        return False


def run_trunk(layers, cfg, points, progress=None, mode=None, density_key=None,
              compute_dtype=None):
    """posenc + trunk with backend selection: fused Pallas kernel on TPU
    (kernels/fused_trunk.py), plain XLA elsewhere.  points are RAW [...,3].
    Returns (feat [...,F], density [...]) with noise/activation applied.

    The kernel is used only when the trunk is NOT being trained
    (mode != 'train'): its custom_vjp backward rematerializes the plain
    forward, which would make a training step slower than plain XLA.  The
    texture stage's train path routes through the fully-fused ST kernels
    instead (apply_nerf_st_fused)."""
    if mode != "train" and _use_fused_trunk(cfg):
        from ..kernels.fused_trunk import fused_trunk_forward
        L = cfg.arch.posenc.L_3D
        shape = points.shape[:-1]
        flat = points.reshape(-1, 3)
        c2f_w = _c2f_band_weights(cfg, L, progress)
        ws = [lp["w"] for lp in layers]
        bs = [lp["b"] for lp in layers]
        feat, density = fused_trunk_forward(
            flat, c2f_w, ws, bs, tuple(cfg.arch.skip), L,
            compute_dtype=compute_dtype)
        # no density-noise branch here: this path is gated on
        # mode != "train" and noise is train-only
        density = DENSITY_ACTIVATIONS[cfg.arch.density_activ](density)
        return (feat.reshape(*shape, feat.shape[-1]),
                density.reshape(shape))
    points_enc = _encode_points(cfg, points, progress)
    return apply_trunk(layers, cfg, points_enc, mode, density_key,
                       compute_dtype)


def apply_trunk(layers, cfg, points_enc, mode=None, density_key=None,
                compute_dtype=None):
    """Run the trunk → (feat [..,F], density [..]).  ReLU after every layer
    including the last (post-split), matching layers/nerf.py:69-80."""
    feat = points_enc
    n = len(layers)
    density = None
    for li, lp in enumerate(layers):
        if li in cfg.arch.skip:
            feat = jnp.concatenate([feat, points_enc], axis=-1)
        feat = dense(lp, feat, compute_dtype)
        if li == n - 1:
            density = feat[..., 0]
            noise = cfg.nerf.get("density_noise_reg")
            if noise and mode == "train" and density_key is not None:
                density = density + jax.random.normal(
                    density_key, density.shape, density.dtype) * noise
            density = DENSITY_ACTIVATIONS[cfg.arch.density_activ](density)
            feat = feat[..., 1:]
        feat = relu(feat)
    return feat, density


# --------------------------------------------------------- coarse NeRF field

def init_nerf(key, cfg):
    k_feat, k_rgb = jax.random.split(key)
    params = {"mlp_feat": init_trunk(k_feat, cfg)}
    feat_dim = cfg.arch.layers_feat[-1]
    dims = get_layer_dims(cfg.arch.layers_rgb)
    rgb_layers = []
    keys = jax.random.split(k_rgb, len(dims))
    for li, (k_in, k_out) in enumerate(dims):
        if li == 0:
            k_in = feat_dim + (input_view_dim(cfg) if cfg.nerf.view_dep else 0) + 3
        mode = "all" if (cfg.arch.tf_init and li == len(dims) - 1) else None
        rgb_layers.append(dense_init(keys[li], k_in, k_out, out_mode=mode))
    params["mlp_rgb"] = rgb_layers
    return params


def _encode_points(cfg, points, progress):
    if cfg.arch.get("posenc"):
        c2f_range, c2f_start = _c2f(cfg)
        return posenc_with_identity(points, cfg.arch.posenc.L_3D, progress,
                                    c2f_range, c2f_start)
    return points


def _encode_view(cfg, ray_unit, progress, c2f=False):
    if cfg.arch.get("posenc") and cfg.arch.posenc.get("L_view"):
        c2f_range, c2f_start = _c2f(cfg) if c2f else (None, 0)
        return posenc_with_identity(ray_unit, cfg.arch.posenc.L_view,
                                    progress, c2f_range, c2f_start)
    return ray_unit


def _use_fused_coarse(cfg, M, mode, tile=512):
    """Route the coarse field through the fused train kernels
    (kernels/fused_coarse_field.py): full trunk+head fwd AND bwd in VMEM
    (the pretrain stage trains the trunk)."""
    if not cfg.get("kernels", {}).get("fused_coarse", True):
        return False
    if not cfg.arch.get("posenc"):
        return False
    if cfg.nerf.get("density_noise_reg") and mode == "train":
        return False
    if M % tile != 0:
        return False
    try:
        from ..kernels.fused_coarse_field import fused_coarse_available
        if not fused_coarse_available():
            return False
        import jax as _jax
        from ..kernels import force_interpret
        return _jax.default_backend() == "tpu" or force_interpret()
    except Exception:
        return False


def apply_nerf_raw(params, cfg, points, ray_unit=None, progress=None,
                   compute_dtype=None, tile=512, interpret=False):
    """Fused-kernel coarse field returning RAW head outputs (no
    activations): (rgb_raw [M,3], dens_raw [M,1]) — the input contract of
    kernels/fused_composite_coarse.fused_composite_coarse."""
    from ..kernels.fused_coarse_field import fused_coarse_field
    from ..kernels.fused_trunk import _freq
    from ..kernels import force_interpret
    interpret = interpret or force_interpret()
    L3 = cfg.arch.posenc.L_3D
    shape = points.shape[:-1]
    pts = points.reshape(-1, 3)
    if cfg.nerf.view_dep:
        if ray_unit.ndim == points.ndim - 1:
            # per-RAY dirs: encode N× fewer rows, broadcast the ENCODINGS
            # (the sin/cos transcendentals dominate the XLA glue cost)
            enc = _encode_view(cfg, ray_unit, progress)
            enc = jnp.broadcast_to(enc[..., None, :],
                                   shape + (enc.shape[-1],))
        else:
            enc = _encode_view(cfg, ray_unit, progress)
        enc = enc.reshape(pts.shape[0], -1)
    else:
        enc = None
    aux3 = jnp.stack([_freq(L3, pts.dtype),
                      _c2f_band_weights(cfg, L3, progress).astype(pts.dtype)])
    kcfg = cfg.get("kernels", {})
    return fused_coarse_field(
        pts, enc, params["mlp_feat"], params["mlp_rgb"], aux3,
        tuple(cfg.arch.skip), L3, tile=_fit_tile(tile, pts.shape[0]),
        compute_dtype=compute_dtype or jnp.bfloat16, interpret=interpret,
        subtiles_fwd=kcfg.get("coarse_subtiles_fwd"),
        subtiles_bwd=kcfg.get("coarse_subtiles_bwd"),
        enc_mode=kcfg.get("coarse_posenc"))


def apply_nerf_fused(params, cfg, points, ray_unit=None, progress=None,
                     compute_dtype=None, tile=512, interpret=False):
    """Fused-kernel coarse-field path; same outputs as apply_nerf."""
    shape = points.shape[:-1]
    rgb_raw, dens_raw = apply_nerf_raw(params, cfg, points, ray_unit,
                                       progress, compute_dtype, tile,
                                       interpret)
    rgb = jax.nn.sigmoid(rgb_raw).reshape(*shape, 3)
    density = DENSITY_ACTIVATIONS[cfg.arch.density_activ](
        dens_raw[:, 0]).reshape(shape)
    return rgb, density


def apply_nerf(params, cfg, points, ray_unit=None, progress=None, mode=None,
               density_key=None, compute_dtype=None):
    """points [...,3] (+ ray_unit [...,3] if view_dep) → (rgb [...,3],
    density [...])."""
    M = int(np.prod(points.shape[:-1]))
    if _use_fused_coarse(cfg, M, mode):
        return apply_nerf_fused(params, cfg, points, ray_unit, progress,
                                compute_dtype)
    feat, density = run_trunk(params["mlp_feat"], cfg, points, progress,
                              mode, density_key, compute_dtype)
    if cfg.nerf.view_dep:
        assert ray_unit is not None
        ray_enc = _encode_view(cfg, ray_unit, progress)
        feat = jnp.concatenate([feat, ray_enc, points], axis=-1)
    else:
        feat = jnp.concatenate([feat, points], axis=-1)
    n = len(params["mlp_rgb"])
    for li, lp in enumerate(params["mlp_rgb"]):
        feat = dense(lp, feat, compute_dtype)
        if li != n - 1:
            feat = relu(feat)
    rgb = jax.nn.sigmoid(feat)
    return rgb, density


def forward_samples_nerf(params, cfg, center, ray, depth_samples, progress=None,
                         mode=None, density_key=None, compute_dtype=None):
    """center/ray [B,R,3], depth_samples [B,R,N,1] → rgb [B,R,N,3],
    density [B,R,N] (reference layers/nerf.py:101-115)."""
    pts = center[..., None, :] + ray[..., None, :] * depth_samples
    if cfg.nerf.view_dep:
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        M = int(np.prod(pts.shape[:-1]))
        if not _use_fused_coarse(cfg, M, mode):
            # plain path wants per-row dirs; the fused path encodes the
            # per-RAY dirs and broadcasts the encodings (cheaper, exact)
            ray_unit = jnp.broadcast_to(ray_unit[..., None, :], pts.shape)
    else:
        ray_unit = None
    return apply_nerf(params, cfg, pts, ray_unit, progress, mode,
                      density_key, compute_dtype)


def use_fused_coarse_render(cfg, B, R, N, mode):
    """Gate for the fully-fused coarse render path (coarse field kernel →
    coarse composite kernel on raw outputs): the fused-field contract plus
    softplus density (hardcoded in the composite kernel) plus a ray count
    the composite's ray tiling divides."""
    if not cfg.get("kernels", {}).get("fused_composite", True):
        return False
    if cfg.arch.density_activ != "softplus":
        return False
    if (B * R) % 8:
        return False
    if not _use_fused_coarse(cfg, B * R * N, mode):
        return False
    try:
        from ..kernels.fused_composite_coarse import (
            fused_composite_coarse_available)
        return fused_composite_coarse_available()
    except Exception:
        return False


def use_fused_coarse_mega(cfg, B, R, N, mode):
    """Gate for the coarse field+composite MEGA-kernel
    (kernels/fused_coarse_render.py, fused forward + hybrid backward):
    the two-kernel fused contract must hold PLUS complete rays per
    compute subtile (coarse_mega_layout_ok)."""
    import os
    kcfg = cfg.get("kernels", {})
    knob = kcfg.get("coarse_mega")
    if knob is None:
        knob = os.environ.get("TEXPOSE_COARSE_MEGA", "1") == "1"
    if not knob:
        return False
    if not use_fused_coarse_render(cfg, B, R, N, mode):
        return False
    try:
        from ..kernels.fused_coarse_render import (
            fused_coarse_render_available, coarse_mega_layout_ok)
        if not fused_coarse_render_available():
            return False
    except Exception:
        return False
    sub_f = kcfg.get("coarse_subtiles_fwd") or os.environ.get(
        "TEXPOSE_COARSE_SUBTILES_FWD", "2")
    sub_b = kcfg.get("coarse_subtiles_bwd") or os.environ.get(
        "TEXPOSE_COARSE_SUBTILES_BWD", "1")
    M = B * R * N
    return coarse_mega_layout_ok(_fit_tile(512, M), int(sub_f),
                                 int(sub_b), M, N)


def forward_coarse_render(params, cfg, center, ray, depth_samples,
                          progress=None, compute_dtype=None,
                          interpret=False):
    """Mega-kernel coarse render: field + composite in one forward
    pallas_call (kernels/fused_coarse_render.py).  Same prep as
    forward_samples_nerf_raw and the same return contract as
    fused_composite_coarse."""
    from ..kernels.fused_coarse_render import fused_coarse_render
    from ..kernels.fused_trunk import _freq
    from ..kernels import force_interpret
    interpret = interpret or force_interpret()
    pts4 = center[..., None, :] + ray[..., None, :] * depth_samples
    B, R, N, _ = pts4.shape
    L3 = cfg.arch.posenc.L_3D
    pts = pts4.reshape(-1, 3)
    if cfg.nerf.view_dep:
        # per-RAY dirs: encode [B,R,3] and broadcast the ENCODINGS over
        # samples (see apply_nerf_raw)
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        enc = _encode_view(cfg, ray_unit, progress)
        enc = jnp.broadcast_to(enc[..., None, :],
                               (B, R, N, enc.shape[-1]))
        enc = enc.reshape(pts.shape[0], -1)
    else:
        enc = None
    aux3 = jnp.stack([_freq(L3, pts.dtype),
                      _c2f_band_weights(cfg, L3, progress).astype(pts.dtype)])
    kcfg = cfg.get("kernels", {})
    return fused_coarse_render(
        pts, enc, params["mlp_feat"], params["mlp_rgb"], aux3,
        tuple(cfg.arch.skip), L3, depth_samples, ray,
        tile=_fit_tile(512, pts.shape[0]),
        compute_dtype=compute_dtype or jnp.bfloat16, interpret=interpret,
        subtiles_fwd=kcfg.get("coarse_subtiles_fwd"),
        subtiles_bwd=kcfg.get("coarse_subtiles_bwd"),
        enc_mode=kcfg.get("coarse_posenc"))


def forward_samples_nerf_raw(params, cfg, center, ray, depth_samples,
                             progress=None, compute_dtype=None,
                             interpret=False):
    """Raw-output variant of forward_samples_nerf for the fused coarse
    composite path; returns (rgb_raw [M,3], dens_raw [M,1])."""
    pts = center[..., None, :] + ray[..., None, :] * depth_samples
    ray_unit = None
    if cfg.nerf.view_dep:
        # per-ray unit dirs: apply_nerf_raw encodes [B,R,3] and broadcasts
        # the encodings over samples (N× fewer transcendentals, exact)
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    from ..kernels import force_interpret
    return apply_nerf_raw(params, cfg, pts, ray_unit, progress,
                          compute_dtype,
                          interpret=interpret or force_interpret())


# ------------------------------------------------------- density-only field

def init_nerf_density(key, cfg):
    """Trunk-only field returning σ (reference layers/nerf_density.py:15-109:
    geometry-only utility variant)."""
    return {"mlp_feat": init_trunk(key, cfg)}


def forward_samples_density(params, cfg, center, ray, depth_samples,
                            progress=None, mode=None, density_key=None,
                            compute_dtype=None):
    """center/ray [B,R,3], depth_samples [B,R,N,1] → density [B,R,N]."""
    pts = center[..., None, :] + ray[..., None, :] * depth_samples
    _, density = run_trunk(params["mlp_feat"], cfg, pts, progress, mode,
                           density_key, compute_dtype)
    return density


def composite_density(density_samples, depth_samples, ray):
    """Depth/opacity-only compositing (reference layers/nerf_density.py
    composite: no RGB head)."""
    from ..ops.render import composite
    out = composite(jnp.zeros(density_samples.shape + (3,)),
                    density_samples, depth_samples, ray)
    return dict(depth=out["depth"], opacity=out["opacity"],
                prob=out["prob"])


# ----------------------------------------- static/transient/light NeRF field

def init_nerf_st(key, cfg):
    """Texture-stage field: frozen trunk + light-conditioned RGB head +
    transient head (reference layers/nerf_static_transient_light.py:16-61)."""
    k_feat, k_rgb, k_trans = jax.random.split(key, 3)
    params = {"mlp_feat": init_trunk(k_feat, cfg)}
    feat_dim = cfg.arch.layers_feat[-1]

    dims = get_layer_dims(cfg.arch.layers_rgb)
    rgb_layers = []
    keys = jax.random.split(k_rgb, len(dims))
    for li, (k_in, k_out) in enumerate(dims):
        if li == 0:
            k_in = (feat_dim
                    + (input_view_dim(cfg) if cfg.nerf.view_dep else 0)
                    + 3 + cfg.nerf.N_latent_light)
        mode = "all" if (cfg.arch.tf_init and li == len(dims) - 1) else None
        rgb_layers.append(dense_init(keys[li], k_in, k_out, out_mode=mode))
    params["mlp_rgb"] = rgb_layers

    if cfg.arch.get("layers_trans"):
        dims = get_layer_dims(cfg.arch.layers_trans)
        trans_layers = []
        keys = jax.random.split(k_trans, len(dims))
        for li, (k_in, k_out) in enumerate(dims):
            if li == 0:
                k_in = feat_dim + cfg.nerf.N_latent_trans
            mode = "all" if (cfg.arch.tf_init and li == len(dims) - 1) else None
            trans_layers.append(dense_init(keys[li], k_in, k_out, out_mode=mode))
        params["mlp_trans"] = trans_layers
    return params


def _use_fused_st(cfg, B, R, N, tile=1024):
    """Route the full ST-field through the fused Pallas fwd+bwd kernels
    (kernels/fused_st_field.py) when the layout contract holds."""
    if not cfg.get("kernels", {}).get("fused_st", True):
        return False
    if not (cfg.arch.get("posenc") and cfg.arch.posenc.get("L_view")
            and cfg.nerf.view_dep and cfg.arch.get("layers_trans")):
        return False
    if cfg.nerf.get("density_noise_reg"):
        return False
    if (R * N) % tile != 0:
        return False
    try:
        from ..kernels.fused_st_field import fused_st_available
        if not fused_st_available():
            return False
        from ..kernels import force_interpret
        import jax as _jax
        return _jax.default_backend() == "tpu" or force_interpret()
    except Exception:
        return False


def _fit_tile(tile, rows):
    """Largest power-of-two ≤ tile that divides rows.  The Pallas kernels
    tile the row axis in multiples of 8 (f32 sublane), so rows must be a
    multiple of 8 — raise rather than hand the grid a tile that silently
    misprocesses the tail."""
    if rows % 8:
        raise ValueError(
            f"fused-kernel row count must be a multiple of 8, got {rows}")
    t = min(tile, rows)
    while rows % t:
        t //= 2
    return max(t, 8)


def apply_nerf_st_raw(params, cfg, points, ray_unit, latent_trans,
                      latent_light, progress=None, compute_dtype=None,
                      tile_fwd=512, tile_bwd=512, interpret=False):
    """Fused-kernel ST field returning RAW head outputs (no activations):
    (rgb_raw [M,3], dens_raw [M,1], trans_raw [M,5]) with M = B·R·N —
    the input contract of kernels/fused_composite.fused_composite_st."""
    from ..kernels.fused_st_field import fused_st_field
    from ..kernels import force_interpret
    interpret = interpret or force_interpret()
    B, R, N, _ = points.shape
    L3 = cfg.arch.posenc.L_3D
    pts = points.reshape(-1, 3)
    if ray_unit.ndim == points.ndim - 1:
        # per-RAY dirs [B,R,3]: encode N× fewer rows and broadcast the
        # ENCODINGS — the sin/cos transcendentals are the dominant XLA
        # glue cost at the production envelope (measured ~1 ms/131k rows
        # vs ~0.02 ms/2048 rays; broadcast-after-encode is exact)
        ray_enc = _encode_view(cfg, ray_unit, progress, c2f=True)
        ray_enc = jnp.broadcast_to(ray_enc[..., None, :],
                                   (B, R, N, ray_enc.shape[-1]))
    else:
        ray_enc = _encode_view(cfg, ray_unit, progress, c2f=True)
    ray_enc = ray_enc.reshape(pts.shape[0], -1)
    from ..kernels.fused_trunk import _freq
    aux3 = jnp.stack([_freq(L3, pts.dtype),
                      _c2f_band_weights(cfg, L3, progress).astype(pts.dtype)])
    heads = {"mlp_rgb": params["mlp_rgb"], "mlp_trans": params["mlp_trans"]}
    kcfg = cfg.get("kernels", {})
    return fused_st_field(
        pts, ray_enc, latent_light, latent_trans, params["mlp_feat"], heads,
        aux3, tuple(cfg.arch.skip), L3, R * N,
        tile_fwd=_fit_tile(tile_fwd, R * N), tile_bwd=_fit_tile(tile_bwd,
                                                                R * N),
        compute_dtype=compute_dtype or jnp.bfloat16, interpret=interpret,
        subtiles_fwd=kcfg.get("st_subtiles_fwd"),
        subtiles_bwd=kcfg.get("st_subtiles_bwd"),
        fullblock=kcfg.get("st_trunk_fullblock"),
        packed=kcfg.get("st_pack_heads"),
        enc_mode=kcfg.get("st_posenc"),
        split_heads=kcfg.get("st_split_heads"),
        trunk_ilp=kcfg.get("st_trunk_ilp"))


def apply_nerf_st_fused(params, cfg, points, ray_unit, latent_trans,
                        latent_light, progress=None, compute_dtype=None,
                        tile_fwd=512, tile_bwd=512, interpret=False):
    """Fused-kernel ST-field path; same outputs as apply_nerf_st."""
    from .mlp import DENSITY_ACTIVATIONS
    B, R, N, _ = points.shape
    rgb_raw, dens_raw, trans_raw = apply_nerf_st_raw(
        params, cfg, points, ray_unit, latent_trans, latent_light, progress,
        compute_dtype, tile_fwd, tile_bwd, interpret)
    density = DENSITY_ACTIVATIONS[cfg.arch.density_activ](
        jax.lax.stop_gradient(dens_raw[:, 0]))
    rgb = jax.nn.sigmoid(rgb_raw)
    rgb_trans = jax.nn.sigmoid(trans_raw[:, :3])
    density_trans = jax.nn.softplus(trans_raw[:, 3])
    uncert = jax.nn.softplus(trans_raw[:, 4:5])
    sh = (B, R, N)
    rgb_pair = jnp.stack([rgb.reshape(*sh, 3), rgb_trans.reshape(*sh, 3)],
                         axis=-1)
    density_pair = jnp.stack([density.reshape(sh),
                              density_trans.reshape(sh)], axis=-1)
    return rgb_pair, density_pair, uncert.reshape(*sh, 1)


def apply_nerf_st(params, cfg, points, ray_unit, latent_trans, latent_light,
                  progress=None, mode=None, density_key=None,
                  compute_dtype=None):
    """points [B,R,N,3] → (rgb [B,R,N,3,2], density [B,R,N,2],
    uncert [B,R,N,1]).

    The trunk output is wrapped in stop_gradient — the geometry is frozen and
    only the RGB/transient heads (+ latents) learn, matching the reference's
    no_grad trunk (layers/nerf_static_transient_light.py:87-100).
    """
    B, R, N, _ = points.shape
    if "mlp_trans" in params and _use_fused_st(cfg, B, R, N):
        return apply_nerf_st_fused(params, cfg, points, ray_unit,
                                   latent_trans, latent_light, progress,
                                   compute_dtype)
    feat, density = run_trunk(params["mlp_feat"], cfg, points, progress,
                              mode, density_key, compute_dtype)
    feat = jax.lax.stop_gradient(feat)
    density = jax.lax.stop_gradient(density)

    # RGB head conditioned on the 48-d light latent
    if cfg.nerf.view_dep:
        assert ray_unit is not None
        ray_enc = _encode_view(cfg, ray_unit, progress, c2f=True)
        feat_rgb = jnp.concatenate([feat, ray_enc, points], axis=-1)
    else:
        feat_rgb = jnp.concatenate([feat, points], axis=-1)
    light = jnp.broadcast_to(latent_trans_shape(latent_light, B, R, N),
                             (B, R, N, latent_light.shape[-1]))
    feat_rgb = jnp.concatenate([feat_rgb, light], axis=-1)
    n = len(params["mlp_rgb"])
    for li, lp in enumerate(params["mlp_rgb"]):
        feat_rgb = dense(lp, feat_rgb, compute_dtype)
        if li != n - 1:
            feat_rgb = relu(feat_rgb)
    rgb = jax.nn.sigmoid(feat_rgb)

    if "mlp_trans" not in params:
        return rgb, density, None

    # transient head conditioned on the 16-d transient latent
    trans = jnp.broadcast_to(latent_trans_shape(latent_trans, B, R, N),
                             (B, R, N, latent_trans.shape[-1]))
    feat_trans = jnp.concatenate([feat, trans], axis=-1)
    n = len(params["mlp_trans"])
    for li, lp in enumerate(params["mlp_trans"]):
        feat_trans = dense(lp, feat_trans, compute_dtype)
        if li != n - 1:
            feat_trans = relu(feat_trans)
    rgb_trans = jax.nn.sigmoid(feat_trans[..., :3])
    density_trans = jax.nn.softplus(feat_trans[..., 3])
    uncert = jax.nn.softplus(feat_trans[..., 4:5])

    rgb_pair = jnp.stack([rgb, rgb_trans], axis=-1)            # [B,R,N,3,2]
    density_pair = jnp.stack([density, density_trans], axis=-1)  # [B,R,N,2]
    return rgb_pair, density_pair, uncert


def latent_trans_shape(latent, B, R, N):
    """[B,D] → [B,1,1,D] for broadcast over rays and samples."""
    return latent[:, None, None, :]


def forward_samples_nerf_st(params, cfg, center, ray, depth_samples,
                            latent_trans, latent_light, progress=None,
                            mode=None, density_key=None, compute_dtype=None):
    pts = center[..., None, :] + ray[..., None, :] * depth_samples
    if cfg.nerf.view_dep:
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        ray_unit = jnp.broadcast_to(ray_unit[..., None, :], pts.shape)
    else:
        ray_unit = None
    return apply_nerf_st(params, cfg, pts, ray_unit, latent_trans,
                         latent_light, progress, mode, density_key,
                         compute_dtype)


def use_fused_render(cfg, B, R, N):
    """Gate for the fully-fused render path (ST field kernel → composite
    kernel on raw outputs): requires the fused-field layout contract plus
    softplus density (hardcoded in the composite kernel)."""
    if not cfg.get("kernels", {}).get("fused_composite", True):
        return False
    if cfg.arch.density_activ != "softplus":
        return False
    if not _use_fused_st(cfg, B, R, N):
        return False
    try:
        from ..kernels.fused_composite import fused_composite_available
        return fused_composite_available()
    except Exception:
        return False


def use_fused_st_render(cfg, B, R, N, params):
    """Gate for the field+composite MEGA-kernel (kernels/fused_st_render.py,
    one fwd/bwd pallas_call pair): the two-kernel fused contract must hold
    PLUS the mega-only requirements — xext posenc, split heads, ≥2-layer
    heads, no trunk-fullblock/ILP experiments, and complete rays per
    compute subtile (mega_layout_ok)."""
    import os
    kcfg = cfg.get("kernels", {})
    # Default OFF: the interleaved on-TPU A/B (tools/ab_cfg.py
    # "kernels.st_mega=true") measured the mega path WORSE than the
    # two-kernel route in the full texture step twice — +0.44 ms/step with
    # raw [M,3]/[M,5] head-output residuals (5.98 vs 5.54, 6/6 rounds) and
    # +0.48 ms/step with the residuals emitted as channel PLANES straight
    # from the fwd kernel (6.01 vs 5.53, 6/6 rounds) — even though the
    # isolated scan-chained fwd won by 0.26 ms.  The hybrid-bwd residual
    # handoff costs more than the saved XLA↔Mosaic boundary REGARDLESS of
    # residual layout: the fwd kernel paying 8 extra f32 output streams is
    # the cost, not the XLA-side extraction.  Kept behind the knob with
    # full parity coverage (test_fused_st_render, check_kernel_parity_tpu
    # mega).
    knob = kcfg.get("st_mega")
    if knob is None:
        knob = os.environ.get("TEXPOSE_ST_MEGA", "0") == "1"
    if not knob:
        return False
    if not use_fused_render(cfg, B, R, N):
        return False
    enc_mode = kcfg.get("st_posenc") or os.environ.get(
        "TEXPOSE_ST_POSENC", "xext")
    split = kcfg.get("st_split_heads")
    if split is None:
        split = os.environ.get("TEXPOSE_ST_SPLIT_HEADS", "1") == "1"
    if enc_mode != "xext" or not split:
        return False
    if kcfg.get("st_trunk_fullblock") or kcfg.get("st_trunk_ilp"):
        return False
    # the mega hybrid bwd chains fused_st_field._run_bwd without the
    # fullblock variants — with the mega on, those knobs would silently
    # no-op and an A/B of them would be a false wash, so they gate the
    # mega off like trunk_fullblock/ilp above (env-only knobs)
    if os.environ.get("TEXPOSE_ST_BWD_FULLBLOCK", "0") == "1" \
            or os.environ.get("TEXPOSE_ST_HEADS_FULLBLOCK", "0") == "1":
        return False
    if len(params.get("mlp_rgb", ())) < 2 \
            or len(params.get("mlp_trans", ())) < 2:
        return False
    try:
        from ..kernels.fused_st_render import (fused_st_render_available,
                                               mega_layout_ok)
        if not fused_st_render_available():
            return False
    except Exception:
        return False
    sub_f = kcfg.get("st_subtiles_fwd") or os.environ.get(
        "TEXPOSE_ST_SUBTILES_FWD", "4")
    sub_b = kcfg.get("st_subtiles_bwd") or os.environ.get(
        "TEXPOSE_ST_SUBTILES_BWD", "2")
    M = B * R * N
    return mega_layout_ok(_fit_tile(512, R * N), _fit_tile(512, R * N),
                          int(sub_f), int(sub_b), M, N, R * N)


def forward_st_render(params, cfg, center, ray, depth_samples, latent_trans,
                      latent_light, min_uncert, progress=None,
                      compute_dtype=None, interpret=False):
    """Mega-kernel render: field + dual composite in one pallas_call pair
    (kernels/fused_st_render.py).  Same prep as forward_samples_nerf_st_raw
    and the same return contract as fused_composite_st."""
    from ..kernels.fused_st_render import fused_st_render
    from ..kernels import force_interpret
    interpret = interpret or force_interpret()
    pts4 = center[..., None, :] + ray[..., None, :] * depth_samples
    ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    B, R, N, _ = pts4.shape
    L3 = cfg.arch.posenc.L_3D
    pts = pts4.reshape(-1, 3)
    # per-RAY dirs: encode [B,R,3] and broadcast the ENCODINGS over samples
    # (see apply_nerf_st_raw)
    ray_enc = _encode_view(cfg, ray_unit, progress, c2f=True)
    ray_enc = jnp.broadcast_to(ray_enc[..., None, :],
                               (B, R, N, ray_enc.shape[-1]))
    ray_enc = ray_enc.reshape(pts.shape[0], -1)
    from ..kernels.fused_trunk import _freq
    aux3 = jnp.stack([_freq(L3, pts.dtype),
                      _c2f_band_weights(cfg, L3, progress).astype(pts.dtype)])
    heads = {"mlp_rgb": params["mlp_rgb"], "mlp_trans": params["mlp_trans"]}
    kcfg = cfg.get("kernels", {})
    return fused_st_render(
        pts, ray_enc, latent_light, latent_trans, params["mlp_feat"], heads,
        aux3, tuple(cfg.arch.skip), L3, R * N, depth_samples, ray,
        min_uncert=min_uncert,
        tile_fwd=_fit_tile(512, R * N), tile_bwd=_fit_tile(512, R * N),
        compute_dtype=compute_dtype or jnp.bfloat16, interpret=interpret,
        subtiles_fwd=kcfg.get("st_subtiles_fwd"),
        subtiles_bwd=kcfg.get("st_subtiles_bwd"),
        packed=kcfg.get("st_pack_heads"))


def forward_samples_nerf_st_raw(params, cfg, center, ray, depth_samples,
                                latent_trans, latent_light, progress=None,
                                compute_dtype=None, interpret=False):
    """Raw-output variant of forward_samples_nerf_st for the fused composite
    path; returns (rgb_raw [M,3], dens_raw [M,1], trans_raw [M,5])."""
    pts = center[..., None, :] + ray[..., None, :] * depth_samples
    # per-ray unit dirs: apply_nerf_st_raw encodes [B,R,3] and broadcasts
    # the encodings over samples (N× fewer transcendentals, exact)
    ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    return apply_nerf_st_raw(params, cfg, pts, ray_unit, latent_trans,
                             latent_light, progress, compute_dtype,
                             interpret=interpret)
