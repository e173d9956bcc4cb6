"""Shared rendering paths for the training engines.

Capability parity:
  * random-ray render → reference model/nerf_pretrain.py:588-627 (gather
    center/ray/bounds at ray_idx, stratified sampling, field, composite)
  * chunked full-frame render → render_by_slices
    (model/nerf_pretrain.py:629-663, model/nerf_adapt_st_gan.py:633-680)
  * patch render for the GAN stage → model/nerf_adapt_st_gan.py:547-631

TPU-first design:
  * `render_rays_*` is one fused XLA program: gathers + posenc + MLP +
    composite all jit together; no NaN-retry loops (the reference's
    `while ray.isnan()` spin, model/nerf_pretrain.py:599-600, re-calls a
    deterministic function — dropped deliberately).
  * full-frame rendering replaces the Python chunk loop with `lax.map` over
    a statically-shaped [num_chunks, chunk] ray-index array — one compile,
    sequential chunks on-chip, no host round-trips.  The object-mask subset
    optimization of the reference is handled by rendering ALL rays and
    compositing defaults afterwards (mask-fill), which keeps shapes static;
    with the ray axis sharded across devices (parallel/), whole frames are
    rendered in a single pass anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.rays import (convert_NDC, pixel_grid,
                             img2cam, cam2world, to_hom)
from ..nn.fields import (forward_samples_nerf, forward_samples_nerf_st,
                         forward_samples_nerf_st_raw, use_fused_render,
                         forward_samples_nerf_raw, use_fused_coarse_render,
                         use_fused_st_render, use_fused_coarse_mega,
                         forward_coarse_render)
from ..ops.render import sample_depth, composite, composite_static_transient


def ray_batch_sample(values, ray_idx):
    """Gather per-ray values: values [B,HW,C], ray_idx [B,R] → [B,R,C]
    (reference model/nerf_pretrain.py:457-465)."""
    return jnp.take_along_axis(values, ray_idx[..., None], axis=1)


def gather_rays(pose, intr, ray_idx, z_near, z_far, H, W, ndc=False,
                z_pregathered=False):
    """Centers/rays/bounds for the selected pixels.

    pose [B,3,4], intr [B,3,3], ray_idx [B,R], z_near/z_far [B,HW] →
    (center [B,R,3], ray [B,R,3], near [B,R], far [B,R]).

    TPU note: instead of materializing the full [B,HW,3] grid and gathering
    (reference model/nerf_pretrain.py:601-606), the selected pixel coords are
    gathered first and only R pixels are unprojected — same math (the
    unprojection is linear per pixel), R/HW× less work and memory.

    z_pregathered: z_near/z_far are already per-ray [B,R] (gathered on
    HOST from the same index set — compact eval payloads avoid shipping
    the full [B,HW] z maps through the TPU tunnel).  Bitwise-identical to
    the device gather: both read the same f32 map values.
    """
    B, R = ray_idx.shape
    xy = pixel_grid(H, W, pose.dtype)                           # [HW,2]
    xy = jnp.take(xy, ray_idx.reshape(-1), axis=0).reshape(B, R, 2)
    grid_3D = img2cam(to_hom(xy), intr)                         # [B,R,3]
    center = cam2world(jnp.zeros_like(grid_3D), pose)
    ray = cam2world(grid_3D, pose) - center
    if z_pregathered:
        near, far = z_near, z_far
    else:
        near = ray_batch_sample(z_near[..., None], ray_idx)[..., 0]
        far = ray_batch_sample(z_far[..., None], ray_idx)[..., 0]
    if ndc:
        center, ray = convert_NDC(center, ray, intr)
    return center, ray, near, far


def render_rays_nerf(params, cfg, pose, intr, ray_idx, z_near, z_far, key,
                     progress=None, mode=None, compute_dtype=None):
    """Coarse-NeRF render of the selected rays →
    dict(rgb [B,R,3], depth [B,R,1], opacity [B,R,1])."""
    center, ray, near, far = gather_rays(
        pose, intr, ray_idx, z_near, z_far, cfg.H, cfg.W,
        ndc=cfg.camera.get("ndc", False))
    k_depth, k_density = jax.random.split(key)
    depth_samples = sample_depth(
        k_depth, near, far, cfg.nerf.sample_intvs,
        stratified=cfg.nerf.sample_stratified and mode == "train",
        param=cfg.nerf.depth.param)
    B, R = center.shape[0], center.shape[1]
    N = int(cfg.nerf.sample_intvs)
    if use_fused_coarse_mega(cfg, B, R, N, mode):
        # MEGA path: field + composite in ONE forward pallas_call — no
        # raw-output HBM round-trip on the forward
        # (kernels/fused_coarse_render.py; backward stays two-kernel)
        out = forward_coarse_render(params, cfg, center, ray,
                                    depth_samples, progress=progress,
                                    compute_dtype=compute_dtype)
        if cfg.nerf.get("setbg_opaque", False):
            out["rgb"] = out["rgb"] + 1.0 * (1.0 - out["opacity"])
        return out
    if use_fused_coarse_render(cfg, B, R, N, mode):
        # fully-fused path: coarse field kernel → coarse composite kernel
        # on RAW outputs (kernels/fused_composite_coarse.py) — removes the
        # activation tensors and cumsum transmittance chains (+ backward)
        # XLA otherwise materializes in HBM
        from ..kernels.fused_composite_coarse import fused_composite_coarse
        from ..kernels import force_interpret
        rgb_raw, dens_raw = forward_samples_nerf_raw(
            params, cfg, center, ray, depth_samples, progress=progress,
            compute_dtype=compute_dtype)
        out = fused_composite_coarse(
            rgb_raw, dens_raw, depth_samples, ray,
            interpret=force_interpret(),
            flat=cfg.get("kernels", {}).get("composite_flat"))
        if cfg.nerf.get("setbg_opaque", False):
            # XLA epilogue: gradient flows through the opacity column
            out["rgb"] = out["rgb"] + 1.0 * (1.0 - out["opacity"])
        return out
    rgb_samples, density_samples = forward_samples_nerf(
        params, cfg, center, ray, depth_samples, progress=progress,
        mode=mode, density_key=k_density, compute_dtype=compute_dtype)
    out = composite(rgb_samples, density_samples, depth_samples, ray,
                    setbg_opaque=cfg.nerf.get("setbg_opaque", False))
    return dict(rgb=out["rgb"], depth=out["depth"], opacity=out["opacity"])


def render_st_core(params, cfg, center, ray, near, far, latent_trans,
                   latent_light, key, progress=None, mode=None,
                   compute_dtype=None, want_density=False):
    """Shared ST render body: stratified sampling → field → dual composite.

    Routes through the fully-fused path (ST-field kernel → composite kernel
    on raw outputs, kernels/fused_composite.py) when the layout contract
    holds — this removes the [B,R,N,3,2] stacks, activation tensors and
    cumsum chains (plus their backward) that XLA otherwise materializes in
    HBM.  The fused dict carries 'trans_density_mean' (scalar) instead of
    per-sample 'density'.
    """
    k_depth, k_density = jax.random.split(key)
    depth_samples = sample_depth(
        k_depth, near, far, cfg.nerf.sample_intvs,
        stratified=cfg.nerf.sample_stratified and mode == "train",
        param=cfg.nerf.depth.param)
    B, R = near.shape
    N = int(cfg.nerf.sample_intvs)
    if use_fused_st_render(cfg, B, R, N, params):
        # MEGA path: field + composite in ONE fwd/bwd pallas_call pair —
        # no raw-output HBM round-trip, two XLA↔Mosaic boundaries per
        # step instead of four (kernels/fused_st_render.py)
        from ..nn.fields import forward_st_render
        return forward_st_render(
            params, cfg, center, ray, depth_samples, latent_trans,
            latent_light, cfg.nerf.get("min_uncert", 0.05),
            progress=progress, compute_dtype=compute_dtype)
    if use_fused_render(cfg, B, R, N):
        from ..kernels.fused_composite import fused_composite_st
        from ..kernels import force_interpret
        rgb_raw, dens_raw, trans_raw = forward_samples_nerf_st_raw(
            params, cfg, center, ray, depth_samples, latent_trans,
            latent_light, progress=progress, compute_dtype=compute_dtype)
        return fused_composite_st(
            rgb_raw, trans_raw, dens_raw, depth_samples, ray,
            min_uncert=cfg.nerf.get("min_uncert", 0.05),
            interpret=force_interpret(),
            flat=cfg.get("kernels", {}).get("composite_flat"))
    rgb_samples, density_samples, uncert_samples = forward_samples_nerf_st(
        params, cfg, center, ray, depth_samples, latent_trans, latent_light,
        progress=progress, mode=mode, density_key=k_density,
        compute_dtype=compute_dtype)
    out = composite_static_transient(
        rgb_samples, density_samples, depth_samples, ray, uncert_samples,
        min_uncert=cfg.nerf.get("min_uncert", 0.05))
    # both branches provide the transient-reg scalar under ONE key so
    # callers need no fused-vs-plain special case
    out["trans_density_mean"] = density_samples[..., -1].mean()
    if want_density:
        out["density"] = density_samples
    return out


def render_rays_nerf_st(params, cfg, pose, intr, ray_idx, z_near, z_far,
                        latent_trans, latent_light, key, progress=None,
                        mode=None, compute_dtype=None, z_pregathered=False):
    """Static/transient/light render of selected rays → the full composite
    dict (rgb, rgb_static, rgb_transient, uncert, depth, opacities...)."""
    center, ray, near, far = gather_rays(
        pose, intr, ray_idx, z_near, z_far, cfg.H, cfg.W,
        ndc=cfg.camera.get("ndc", False), z_pregathered=z_pregathered)
    out = render_st_core(params, cfg, center, ray, near, far, latent_trans,
                         latent_light, key, progress, mode, compute_dtype)
    # this function's contract is PER-RAY [B,R,C] leaves only: the scalar
    # and the per-sample compositing internals ([B,R,N]/[B,R,N,1]) would
    # assemble inconsistently across the chunked/scattered/sharded
    # full-frame paths (and an [B,HW,N] buffer is N× the frame footprint);
    # consumers needing them call render_st_core/composite directly
    for k in ("trans_density_mean", "alpha_static", "alpha_transient",
              "prob", "density"):
        out.pop(k, None)
    return out


def render_rays_nerf_hierarchical(params, cfg, pose, intr, ray_idx, z_near,
                                  z_far, key, progress=None, mode=None,
                                  compute_dtype=None):
    """Coarse + importance-sampled fine render (working implementation of
    the reference's vestigial nerf.fine_sampling flag).

    params = {"nerf": coarse field, "nerf_fine": fine field}.  Returns the
    coarse dict plus rgb_fine/depth_fine/opacity_fine.
    """
    from ..ops.render import sample_depth_from_pdf, union_sorted_depths
    center, ray, near, far = gather_rays(
        pose, intr, ray_idx, z_near, z_far, cfg.H, cfg.W,
        ndc=cfg.camera.get("ndc", False))
    k_depth, k_fine, k_density = jax.random.split(key, 3)
    stratified = cfg.nerf.sample_stratified and mode == "train"
    depth_samples = sample_depth(
        k_depth, near, far, cfg.nerf.sample_intvs,
        stratified=stratified, param=cfg.nerf.depth.param)
    rgb_s, dens_s = forward_samples_nerf(
        params["nerf"], cfg, center, ray, depth_samples, progress=progress,
        mode=mode, density_key=k_density, compute_dtype=compute_dtype)
    out_c = composite(rgb_s, dens_s, depth_samples, ray,
                      setbg_opaque=cfg.nerf.get("setbg_opaque", False))

    fine = sample_depth_from_pdf(
        k_fine, depth_samples, jax.lax.stop_gradient(out_c["prob"][..., 0]),
        cfg.nerf.sample_intvs_fine, stratified=stratified)
    depth_all = union_sorted_depths(depth_samples, fine)
    rgb_f, dens_f = forward_samples_nerf(
        params["nerf_fine"], cfg, center, ray, depth_all, progress=progress,
        mode=mode, density_key=k_density, compute_dtype=compute_dtype)
    out_f = composite(rgb_f, dens_f, depth_all, ray,
                      setbg_opaque=cfg.nerf.get("setbg_opaque", False))
    return dict(rgb=out_c["rgb"], depth=out_c["depth"],
                opacity=out_c["opacity"], rgb_fine=out_f["rgb"],
                depth_fine=out_f["depth"], opacity_fine=out_f["opacity"])


def _chunk_indices(HW, chunk):
    """[num_chunks, chunk] int32 ray indices covering 0..HW-1, last chunk
    padded by repeating the final index (harmless overdraw)."""
    num_chunks = -(-HW // chunk)
    idx = jnp.arange(num_chunks * chunk, dtype=jnp.int32)
    return jnp.minimum(idx, HW - 1).reshape(num_chunks, chunk)


def render_full_nerf(params, cfg, pose, intr, z_near, z_far, key,
                     progress=None, compute_dtype=None, chunk=None):
    """Full-frame coarse-NeRF render via lax.map over ray chunks.

    Returns dict with [B,HW,C] leaves.  Deterministic (mid-bin samples).
    """
    B = pose.shape[0]
    HW = cfg.H * cfg.W
    chunk = chunk or cfg.nerf.rand_rays
    chunks = _chunk_indices(HW, chunk)                          # [NC,chunk]

    def body(ray_idx):
        idx = jnp.broadcast_to(ray_idx[None], (B, ray_idx.shape[0]))
        return render_rays_nerf(params, cfg, pose, intr, idx, z_near, z_far,
                                key, progress, mode="eval",
                                compute_dtype=compute_dtype)

    out = jax.lax.map(body, chunks)                             # [NC,B,chunk,C]
    out = {k: jnp.moveaxis(v, 0, 1).reshape(B, -1, v.shape[-1])[:, :HW]
           for k, v in out.items()}
    return out


def masked_ray_indices(obj_mask, chunk):
    """Host-side: object-pixel ray indices padded to a power-of-two multiple
    of `chunk` (bucketing keeps the jit cache small while staying static —
    the reference's dynamic `nonzero` subset, model/nerf_adapt_st_gan.py:
    652-679, is not jit-compilable).

    obj_mask: [HW] numpy bool/float → (idx [P] int32, n_valid).
    """
    import numpy as np
    import math
    mask = np.asarray(obj_mask).reshape(-1) > 0
    idx = np.nonzero(mask)[0].astype(np.int32)
    n = max(len(idx), 1)
    buckets = chunk * (2 ** max(0, math.ceil(math.log2(n / chunk)))) \
        if n > chunk else chunk
    pad = buckets - len(idx)
    idx_p = np.pad(idx, (0, pad), mode="edge" if len(idx) else "constant")
    return idx_p, len(idx)


def render_rays_masked_st(params, cfg, pose, intr, ray_idx, z_near, z_far,
                          latent_trans, latent_light, key, progress=None,
                          compute_dtype=None, chunk=None):
    """Render an arbitrary padded index set [P] in chunks via lax.map;
    returns dict of [B,P,C]."""
    B = pose.shape[0]
    chunk = chunk or cfg.nerf.rand_rays
    P = ray_idx.shape[0]
    chunks = ray_idx.reshape(P // chunk, chunk)

    def body(ci):
        idx = jnp.broadcast_to(ci[None], (B, chunk))
        out = render_rays_nerf_st(params, cfg, pose, intr, idx, z_near,
                                  z_far, latent_trans, latent_light, key,
                                  progress, mode="eval",
                                  compute_dtype=compute_dtype)
        return {k: v for k, v in out.items() if v.ndim == 3}

    out = jax.lax.map(body, chunks)
    return {k: jnp.moveaxis(v, 0, 1).reshape(B, P, v.shape[-1])
            for k, v in out.items()}


def render_rays_masked_st_pre(params, cfg, pose, intr, ray_idx, z_near_pre,
                              z_far_pre, latent_trans, latent_light, key,
                              progress=None, compute_dtype=None, chunk=None):
    """render_rays_masked_st with HOST-pre-gathered z bounds.

    z_near_pre/z_far_pre are [B,P] aligned with ray_idx [P] — the compact
    eval payload gathers the object-ray subset of the z maps on host, so
    the full [B,HW] f32 maps (2.5 MB/frame at 480×640) never cross the
    TPU tunnel.  Values are the same f32 map reads → bitwise-identical
    rays; returns dict of [B,P,C] like render_rays_masked_st."""
    B = pose.shape[0]
    chunk = chunk or cfg.nerf.rand_rays
    P = ray_idx.shape[0]
    NC = P // chunk
    chunks = (ray_idx.reshape(NC, chunk),
              jnp.moveaxis(z_near_pre.reshape(B, NC, chunk), 1, 0),
              jnp.moveaxis(z_far_pre.reshape(B, NC, chunk), 1, 0))

    def body(args):
        ci, zn, zf = args
        idx = jnp.broadcast_to(ci[None], (B, chunk))
        out = render_rays_nerf_st(params, cfg, pose, intr, idx, zn, zf,
                                  latent_trans, latent_light, key,
                                  progress, mode="eval",
                                  compute_dtype=compute_dtype,
                                  z_pregathered=True)
        return {k: v for k, v in out.items() if v.ndim == 3}

    out = jax.lax.map(body, chunks)
    return {k: jnp.moveaxis(v, 0, 1).reshape(B, P, v.shape[-1])
            for k, v in out.items()}


def scatter_masked_st(cfg, out, ray_idx, n_valid, obj_mask):
    """Scatter masked-render results [B,P,C] into full [B,HW,C] buffers with
    the reference's defaults (rgb* ← 0 outside the object, uncert ←
    min_uncert, opacities/depth ← 0; model/nerf_adapt_st_gan.py:655-667)."""
    B = next(iter(out.values())).shape[0]
    HW = cfg.H * cfg.W
    min_u = cfg.nerf.get("min_uncert", 0.05)
    m = obj_mask.reshape(1, HW, 1)
    full = {}
    for k, v in out.items():
        C = v.shape[-1]
        if k == "uncert":
            default = jnp.full((B, HW, C), min_u)
        else:
            default = jnp.zeros((B, HW, C))
        buf = default.at[:, ray_idx].set(v)
        full[k] = jnp.where(m > 0, buf, default)
    return full


def render_full_nerf_st(params, cfg, pose, intr, z_near, z_far, latent_trans,
                        latent_light, key, progress=None, compute_dtype=None,
                        chunk=None, obj_mask=None):
    """Full-frame static/transient render via lax.map over ray chunks.

    If obj_mask [B,HW] is given, non-object pixels are composited to the
    reference's defaults after the fact (rgb* ← 0, uncert ← min_uncert,
    opacity/depth ← 0; model/nerf_adapt_st_gan.py:652-679).
    """
    B = pose.shape[0]
    HW = cfg.H * cfg.W
    chunk = chunk or cfg.nerf.rand_rays
    chunks = _chunk_indices(HW, chunk)

    def body(ray_idx):
        idx = jnp.broadcast_to(ray_idx[None], (B, ray_idx.shape[0]))
        return render_rays_nerf_st(params, cfg, pose, intr, idx, z_near,
                                   z_far, latent_trans, latent_light, key,
                                   progress, mode="eval",
                                   compute_dtype=compute_dtype)

    out = jax.lax.map(body, chunks)
    out = {k: jnp.moveaxis(v, 0, 1).reshape(B, -1, v.shape[-1])[:, :HW]
           if v.ndim == 4 else
           jnp.moveaxis(v, 0, 1).reshape(B, -1, *v.shape[3:])[:, :HW]
           for k, v in out.items()}
    if obj_mask is not None:
        m = obj_mask[..., None]
        min_u = cfg.nerf.get("min_uncert", 0.05)
        out["uncert"] = out["uncert"] * m + (1 - m) * min_u
        for k in ("rgb", "rgb_static", "rgb_transient", "opacity",
                  "opacity_static", "opacity_transient", "depth"):
            out[k] = out[k] * m
    return out
