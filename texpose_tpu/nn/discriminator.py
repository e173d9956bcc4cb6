"""Patch discriminator: spectral-norm DCGAN conv stack + instance norm with
scale- and geometry-conditioning.

Capability parity with /root/reference/layers/discriminator.py (GRAF-derived):
  * imsize ∈ {16,32,64,128} conv pyramids ending at 1×1 spatial
  * scale-conditional 1×1-conv head fed [features, posenc(scale, L), scale]
  * geometry conditioning: input channels 3 (+3 NOCS +3 normal)
    (+ optional posenc of each with its own c2f window)
  * spectral norm on every conv

Design deltas (TPU-first, deliberate):
  * spectral norm's power-iteration vector `u` is explicit state threaded
    through apply (returned updated) instead of a mutated torch buffer —
    pure-function semantics under jit; one power iteration per step like
    torch's default.
  * `progress` for the geometric c2f window is a traced scalar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.posenc import positional_encoding
from .init import conv_init
from .mlp import leaky_relu


# ------------------------------------------------------------- spectral norm

def sn_apply(w, u, training):
    """Spectrally normalize conv kernel w [kh,kw,in,out] using power-iteration
    vector u [out].  Returns (w/σ, new_u).  Gradients flow through w only
    (u, v detached), matching torch.nn.utils.spectral_norm."""
    kh, kw, cin, cout = w.shape
    w_mat = w.reshape(kh * kw * cin, cout)                  # [in*, out]

    def _norm(v):
        return v / (jnp.linalg.norm(v) + 1e-12)

    w_sg = jax.lax.stop_gradient(w_mat)
    v = _norm(w_sg @ u)                                     # [in*]
    u_new = _norm(w_sg.T @ v)                               # [out]
    sigma = v @ (w_mat @ u_new)                             # grad flows via w_mat
    new_u = u_new if training else u
    return (w / sigma).astype(w.dtype), jax.lax.stop_gradient(new_u)


def instance_norm(x, eps=1e-5):
    """Per-sample per-channel spatial normalization (affine-free),
    InstanceNorm2d defaults."""
    mean = x.mean(axis=(2, 3), keepdims=True)
    var = x.var(axis=(2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _conv(x, w, stride, padding):
    # accumulate in at least f32 (bf16 inputs), exactly-typed for wider
    # inputs (the f64 trajectory oracles)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32))


# -------------------------------------------------------------- architecture

def _main_spec(imsize, nc, ndf, final_dim):
    """(kh, in, out, stride, pad, use_in) per conv, per reference
    discriminator.py:44-115."""
    if imsize == 128:
        spec = [(4, nc, ndf // 2, 2, 1, False),
                (4, ndf // 2, ndf, 2, 1, True),
                (4, ndf, ndf * 2, 2, 1, True),
                (4, ndf * 2, ndf * 4, 2, 1, True)]
    elif imsize == 64:
        spec = [(4, nc, ndf, 2, 1, False),
                (4, ndf, ndf * 2, 2, 1, True),
                (4, ndf * 2, ndf * 4, 2, 1, True)]
    elif imsize == 32:
        spec = [(4, nc, ndf * 2, 2, 1, True),
                (4, ndf * 2, ndf * 4, 2, 1, True)]
    elif imsize == 16:
        spec = [(4, nc, ndf * 4, 2, 1, True)]
    else:
        raise NotImplementedError(f"imsize {imsize}")
    spec += [(4, ndf * 4, ndf * 8, 2, 1, True),
             (4, ndf * 8, final_dim, 1, 0, False)]
    return spec


def disc_channels(cfg):
    nc = 3
    if cfg.gan.geo_conditional:
        nc += 6
    if cfg.gan.get("L_nocs"):
        nc += cfg.gan.L_nocs * 2 * 3
    if cfg.gan.get("L_normal"):
        nc += cfg.gan.L_normal * 2 * 3
    return nc


def init_discriminator(key, cfg, ndf=64):
    """Returns (params, sn_state).  sn_state holds the power-iteration u
    vectors (non-trainable)."""
    nc = disc_channels(cfg)
    final_dim = ndf if cfg.gan.scale_conditional else 1
    spec = _main_spec(cfg.patch_size, nc, ndf, final_dim)
    keys = jax.random.split(key, len(spec) + 4)
    params = {"main": [], "final": []}
    state = {"main": [], "final": []}
    for i, (k, cin, cout, s, p, use_in) in enumerate(spec):
        params["main"].append(conv_init(keys[i], k, k, cin, cout))
        state["main"].append(jnp.ones((cout,)) / jnp.sqrt(cout))
    if cfg.gan.scale_conditional:
        L_scale = cfg.gan.L_scale
        head_in = ndf + L_scale * 2 + 1
        for j, (cin, cout) in enumerate([(head_in, ndf), (ndf, ndf), (ndf, 1)]):
            params["final"].append(conv_init(keys[len(spec) + j], 1, 1, cin, cout))
            state["final"].append(jnp.ones((cout,)) / jnp.sqrt(cout))
    return params, state


def _posenc_image(x, L, progress=None, c2f_range=None):
    """Per-pixel posenc of an NCHW image: [B,C,h,w] → [B,2CL,h,w]
    (reference discriminator.py:145-170; frequency-major per channel)."""
    B, C, h, w = x.shape
    flat = x.reshape(B, C, h * w).transpose(0, 2, 1)        # [B,hw,C]
    enc = positional_encoding(flat, L, progress, c2f_range)  # [B,hw,2CL]
    return enc.transpose(0, 2, 1).reshape(B, 2 * C * L, h, w)


def sn_normalize_disc(params, state, training=True):
    """Spectrally normalize every conv weight ONCE: (params, u-state) →
    (normalized params, new u-state).

    A train step runs several discriminator passes over the SAME weights
    (batched real|fake pass, R1 input-grad pass, WGAN-GP pass, the
    generator's adversarial pass) and XLA cannot CSE the per-pass w/σ
    buffers across separate grad traces — the optimized HLO showed ~11
    materialized [4,4,256,512]-class weight buffers per step.  Normalizing
    once and passing ``normalized=True`` to apply_discriminator makes every
    extra pass reuse the same buffers.  Semantics are unchanged: torch's
    spectral_norm would see the same u (one power iteration per step — the
    extra reference forwards happen before the buffer update lands), so
    σ and w/σ are identical across the passes either way."""
    new_state = {"main": [], "final": []}
    out = {"main": [], "final": []}
    for grp in ("main", "final"):
        for p, u in zip(params.get(grp, []), state.get(grp, [])):
            w_sn, u_new = sn_apply(p["w"], u, training)
            out[grp].append({"w": w_sn})
            new_state[grp].append(u_new)
    return out, new_state


def apply_discriminator(params, state, cfg, x, scales=None, progress=None,
                        training=True, normalized=False):
    """x [B,nc_raw,h,w] (rgb | rgb+nocs+normal), scales [B,1,1,1] →
    (logits [B], new_sn_state).

    With ``normalized=True``, ``params`` must already hold spectrally
    normalized weights (sn_normalize_disc) and ``state`` is passed through
    untouched."""
    if not normalized:
        params, state = sn_normalize_disc(params, state, training)
    # ndf from the params (the second-to-last main conv always emits
    # ndf*8, _main_spec) — a hardcoded 64 here would silently disagree
    # with a non-default init_discriminator(ndf=...)
    ndf = params["main"][-2]["w"].shape[-1] // 8
    nc = disc_channels(cfg)
    final_dim = ndf if cfg.gan.scale_conditional else 1
    spec = _main_spec(cfg.patch_size, nc, ndf, final_dim)

    inputs = x
    if cfg.gan.geo_conditional:
        image, nocs, normal = jnp.split(x, 3, axis=1)
        parts = [image, nocs, normal]
        c2f_range = cfg.gan.get("geo_c2f")
        c2f_range = tuple(c2f_range) if c2f_range is not None else None
        if cfg.gan.get("L_nocs"):
            parts.append(_posenc_image(nocs, cfg.gan.L_nocs, progress, c2f_range))
        if cfg.gan.get("L_normal"):
            # reference uses L_nocs for the normal encoding too
            # (discriminator.py:133) — replicated for parity
            parts.append(_posenc_image(normal, cfg.gan.L_nocs, progress, c2f_range))
        inputs = jnp.concatenate(parts, axis=1)

    out = inputs
    for i, (kk, cin, cout, s, p, use_in) in enumerate(spec):
        out = _conv(out, params["main"][i]["w"], s, p)
        if use_in:
            out = instance_norm(out)
        if i != len(spec) - 1:
            out = leaky_relu(out)

    if cfg.gan.scale_conditional:
        scale_enc = _posenc_image(scales, cfg.gan.L_scale)   # [B,8,1,1]
        out = jnp.concatenate([out, scale_enc, scales], axis=1)
        out = leaky_relu(out)
        for j, pconv in enumerate(params["final"]):
            out = _conv(out, pconv["w"], 1, 0)
            if j != len(params["final"]) - 1:
                out = leaky_relu(out)
    return out.reshape(out.shape[0], -1).squeeze(-1), state
