"""Device-mesh parallelism.

The reference is strictly single-device (options.py:112-113 "disable
multi-GPU support"); this module is the TPU-native scaling layer SURVEY.md
§2c mandates:

  * data parallel: the per-step batch axis (images for pretrain, patches for
    the GAN stage) is sharded over a 1-D mesh with a sharding constraint —
    XLA's SPMD partitioner inserts the psum for gradient reduction over ICI.
  * "sequence" parallel: the H·W ray axis of full-frame rendering is the
    long axis (307,200 rays at 480×640).  `render_full_*_sharded` shard_maps
    the ray axis over the mesh; each chip renders its ray shard with the
    replicated field, and the output assembles without any collective (the
    out_spec concatenation IS the all_gather, performed lazily only if a
    replicated consumer needs it).

Collectives ride ICI; nothing here ever falls back to host transfers.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.render import render_rays_nerf, render_rays_nerf_st


def make_mesh(n_devices=None, axis="dp", devices=None):
    """1-D mesh over the first n visible devices."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_leading_axis(tree, mesh, axis="dp"):
    """device_put each leaf sharded over its leading axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def dp_constrain_batch(batch, mesh, axis="dp"):
    """Inside-jit constraint: shard every [B, ...] leaf over the mesh.

    Use after the on-device batch gather in a train step so the per-example
    render/disc work partitions across chips and XLA psums the grads.
    """
    s = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, s), batch)


def _pad_rays(HW, n_shards, chunk):
    """Smallest padded ray count divisible by n_shards with per-shard size
    divisible by chunk."""
    per = -(-HW // n_shards)
    per = -(-per // chunk) * chunk
    return per * n_shards, per


def _sharded_full_render(render_fn, mesh, axis, cfg, chunk):
    """Build a shard_map'd full-frame renderer.

    render_fn(ray_idx [B,R]) is the per-shard ray renderer (closure over
    params/pose/latents); returns dict of [B,R,C].
    """
    HW = cfg.H * cfg.W
    n = mesh.shape[axis]
    total, per = _pad_rays(HW, n, chunk)
    idx = jnp.minimum(jnp.arange(total, dtype=jnp.int32), HW - 1)

    def per_shard(idx_shard):
        # idx_shard [per] → lax.map over chunk-sized slices
        chunks = idx_shard.reshape(per // chunk, chunk)
        out = jax.lax.map(render_fn, chunks)     # [NC,B,chunk,C]
        return {k: jnp.moveaxis(v, 0, 1).reshape(v.shape[1], -1, v.shape[-1])
                for k, v in out.items()}

    shard_fn = jax.shard_map(
        per_shard, mesh=mesh, in_specs=P(axis),
        out_specs=P(None, axis), check_vma=False)
    out = shard_fn(idx)
    return {k: v[:, :HW] for k, v in out.items()}


def render_full_nerf_sharded(mesh, params, cfg, pose, intr, z_near, z_far,
                             key, progress=None, compute_dtype=None,
                             chunk=None, axis="dp"):
    """Multi-chip full-frame coarse-NeRF render (ray-axis sharded)."""
    B = pose.shape[0]
    chunk = chunk or cfg.nerf.rand_rays

    def body(ray_idx):
        idx = jnp.broadcast_to(ray_idx[None], (B, ray_idx.shape[0]))
        return render_rays_nerf(params, cfg, pose, intr, idx, z_near, z_far,
                                key, progress, mode="eval",
                                compute_dtype=compute_dtype)

    return _sharded_full_render(body, mesh, axis, cfg, chunk)


def masked_ray_indices_sharded(obj_mask, chunk, n_shards):
    """Host-side: object-ray indices padded so each of the n_shards gets an
    equal, chunk-divisible slice (the power-of-two bucketing of
    models.render.masked_ray_indices is preserved for power-of-two meshes,
    keeping the jit cache small).

    obj_mask [HW] → (idx [P] int32 with P % (chunk·n_shards) == 0, n_valid).
    """
    from ..models.render import masked_ray_indices
    idx_p, n = masked_ray_indices(obj_mask, chunk)
    unit = chunk * n_shards
    total = -(-len(idx_p) // unit) * unit
    # edge-padding DUPLICATES ray indices; the downstream
    # scatter_masked_st .at[idx].set is only well-defined because eval
    # rendering is per-ray deterministic (fixed key, no stratified
    # sampling) so every duplicate writes the same value.  A stochastic
    # eval path would make this scatter nondeterministic — pad with a
    # sentinel row instead if that ever lands.
    idx_p = np.pad(idx_p, (0, total - len(idx_p)), mode="edge")
    return idx_p, n


def render_masked_nerf_st_sharded(mesh, params, cfg, pose, intr, z_near,
                                  z_far, latent_trans, latent_light, key,
                                  ray_idx, progress=None, compute_dtype=None,
                                  chunk=None, axis="dp"):
    """Masked multi-chip ST render: the PADDED OBJECT-RAY index set — not
    H·W — shards over the mesh.  At the reference eval envelope (~10-20%
    object coverage) the full-frame shard does 5-10× redundant work per
    chip; sharding the bucketed index set keeps multi-chip eval strictly
    cheaper than single-chip (the reference's mask-prior acceleration,
    model/nerf_adapt_st_gan.py:652-679, on the mesh).

    ray_idx [P] from masked_ray_indices_sharded.  Returns dict of [B,P,C]
    aligned with ray_idx; scatter with models.render.scatter_masked_st.
    """
    B = pose.shape[0]
    chunk = chunk or cfg.nerf.rand_rays
    n = mesh.shape[axis]
    per = ray_idx.shape[0] // n

    def per_shard(idx_shard):
        chunks = idx_shard.reshape(per // chunk, chunk)

        def body(ci):
            idx = jnp.broadcast_to(ci[None], (B, chunk))
            out = render_rays_nerf_st(params, cfg, pose, intr, idx, z_near,
                                      z_far, latent_trans, latent_light,
                                      key, progress, mode="eval",
                                      compute_dtype=compute_dtype)
            return {k: v for k, v in out.items() if v.ndim == 3}

        out = jax.lax.map(body, chunks)
        return {k: jnp.moveaxis(v, 0, 1).reshape(v.shape[1], -1, v.shape[-1])
                for k, v in out.items()}

    shard_fn = jax.shard_map(per_shard, mesh=mesh, in_specs=P(axis),
                             out_specs=P(None, axis), check_vma=False)
    return shard_fn(ray_idx)


def render_full_nerf_st_sharded(mesh, params, cfg, pose, intr, z_near, z_far,
                                latent_trans, latent_light, key,
                                progress=None, compute_dtype=None,
                                chunk=None, axis="dp", obj_mask=None):
    """Multi-chip full-frame static/transient render (ray-axis sharded),
    with the reference's mask-fill defaults applied afterwards."""
    B = pose.shape[0]
    chunk = chunk or cfg.nerf.rand_rays

    def body(ray_idx):
        idx = jnp.broadcast_to(ray_idx[None], (B, ray_idx.shape[0]))
        out = render_rays_nerf_st(params, cfg, pose, intr, idx, z_near,
                                  z_far, latent_trans, latent_light, key,
                                  progress, mode="eval",
                                  compute_dtype=compute_dtype)
        # keep only rank-3 leaves for uniform assembly
        return {k: v for k, v in out.items() if v.ndim == 3}

    out = _sharded_full_render(body, mesh, axis, cfg, chunk)
    if obj_mask is not None:
        # Same defaults as the single-chip path (models/render.py:265-271)
        # and the reference's zero-filled scatter buffers
        # (model/nerf_adapt_st_gan.py:655-667): rgb* <- 0 outside the object,
        # uncert <- min_uncert, opacities/depth <- 0.
        m = obj_mask[..., None]
        min_u = cfg.nerf.get("min_uncert", 0.05)
        out["uncert"] = out["uncert"] * m + (1 - m) * min_u
        for k in ("rgb", "rgb_static", "rgb_transient", "opacity",
                  "opacity_static", "opacity_transient", "depth"):
            out[k] = out[k] * m
    return out
