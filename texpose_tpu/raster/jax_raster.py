"""JAX mesh rasterizer (TPU path).

Z-buffer triangle rasterization as a face-chunked reduction: for each chunk
of faces, every pixel evaluates edge functions against the whole chunk
(VPU-friendly [HW, chunk] elementwise work), keeps its nearest hit, and
chunks combine by z-min.  Matches the native rasterizer (csrc/raster.cpp)
and pytorch3d defaults: no backface culling, screen-space barycentrics,
pixel centers at +0.5.

Differentiable w.r.t. per-vertex attributes (interpolation is linear); the
preprocessing pipeline needs no geometry gradients (reference renders under
no_grad, compute_surfelinfo.py:99).  A soft silhouette (sigmoid edge
distance, product blend) mirrors pytorch3d's SoftSilhouetteShader for the
mask mode (tools/mvrenderer.py:94-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8
BIG = 1e30


def project_verts(verts_cam, K):
    """[V,3] camera-frame → (u [V], v [V], z [V]) pixel coords."""
    z = verts_cam[:, 2]
    iz = jnp.where(z > EPS, 1.0 / jnp.maximum(z, EPS), 0.0)
    u = K[0, 0] * verts_cam[:, 0] * iz + K[0, 2]
    v = K[1, 1] * verts_cam[:, 1] * iz + K[1, 2]
    return u, v, z


def _pixel_centers(H, W):
    py = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    return px.reshape(-1), py.reshape(-1)


def rasterize(verts_cam, faces, K, H, W, chunk=512):
    """→ (zbuf [H,W] (0=bg), face_id [H,W] (-1=bg), bary [H,W,3])."""
    u, v, z = project_verts(verts_cam, K)
    F = faces.shape[0]
    pad = (-F) % chunk
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    valid_face = jnp.concatenate(
        [jnp.ones((F,), bool), jnp.zeros((pad,), bool)])
    px, py = _pixel_centers(H, W)                           # [HW]

    fu = u[faces_p]                                          # [F',3]
    fv = v[faces_p]
    fz = z[faces_p]
    area = ((fu[:, 1] - fu[:, 0]) * (fv[:, 2] - fv[:, 0])
            - (fu[:, 2] - fu[:, 0]) * (fv[:, 1] - fv[:, 0]))
    ok = (valid_face & (jnp.abs(area) > EPS)
          & (fz > EPS).all(axis=1))                          # [F']
    inv_area = jnp.where(jnp.abs(area) > EPS, 1.0 / area, 0.0)

    n_chunks = faces_p.shape[0] // chunk

    def body(ci):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        cu, cv, cz = sl(fu), sl(fv), sl(fz)                  # [c,3]
        cia, cok = sl(inv_area), sl(ok)
        # edge functions: [HW, c]
        w0 = ((cu[None, :, 1] - px[:, None]) * (cv[None, :, 2] - py[:, None])
              - (cu[None, :, 2] - px[:, None]) * (cv[None, :, 1] - py[:, None])
              ) * cia[None]
        w1 = ((cu[None, :, 2] - px[:, None]) * (cv[None, :, 0] - py[:, None])
              - (cu[None, :, 0] - px[:, None]) * (cv[None, :, 2] - py[:, None])
              ) * cia[None]
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & cok[None]
        zp = w0 * cz[None, :, 0] + w1 * cz[None, :, 1] + w2 * cz[None, :, 2]
        zp = jnp.where(inside, zp, BIG)
        best = jnp.argmin(zp, axis=1)                        # [HW]
        take = lambda a: jnp.take_along_axis(a, best[:, None], 1)[:, 0]
        return (take(zp), best + ci * chunk,
                jnp.stack([take(w0), take(w1), take(w2)], -1))

    zs, fids, barys = jax.lax.map(body, jnp.arange(n_chunks))
    # combine chunks: per-pixel argmin over the chunk axis
    ci = jnp.argmin(zs, axis=0)                              # [HW]
    take = lambda a: jnp.take_along_axis(a, ci[None, ..., None]
                                         if a.ndim == 3 else ci[None],
                                         axis=0)[0]
    zbuf = take(zs)
    face_id = take(fids)
    bary = jnp.take_along_axis(barys, ci[None, :, None], axis=0)[0]
    hit = zbuf < BIG
    return (jnp.where(hit, zbuf, 0.0).reshape(H, W),
            jnp.where(hit, face_id, -1).astype(jnp.int32).reshape(H, W),
            jnp.where(hit[:, None], bary, 0.0).reshape(H, W, 3))


def interpolate(faces, face_id, bary, attrs):
    """Barycentric attribute interpolation: attrs [V,C] → [H,W,C]
    (pytorch3d interpolate_face_attributes equivalent)."""
    H, W = face_id.shape
    fid = jnp.maximum(face_id.reshape(-1), 0)
    tri = faces[fid]                                         # [HW,3]
    vals = attrs[tri]                                        # [HW,3,C]
    out = (vals * bary.reshape(-1, 3)[..., None]).sum(axis=1)
    out = jnp.where(face_id.reshape(-1, 1) >= 0, out, 0.0)
    return out.reshape(H, W, attrs.shape[-1])


def soft_silhouette(verts_cam, faces, K, H, W, sigma=1e-4, chunk=512):
    """Differentiable mask: alpha = 1 − Π_f (1 − sigmoid(d_f/σ)), d_f the
    signed squared pixel distance to face f in NDC-scaled units
    (pytorch3d SoftSilhouetteShader semantics, sigma=1e-4)."""
    u, v, z = project_verts(verts_cam, K)
    F = faces.shape[0]
    pad = (-F) % chunk
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], 0)
    valid = jnp.concatenate([jnp.ones((F,), bool), jnp.zeros((pad,), bool)])
    px, py = _pixel_centers(H, W)
    scale = 2.0 / min(H, W)                                 # px → NDC units

    fu, fv, fz = u[faces_p], v[faces_p], v[faces_p] * 0 + z[faces_p]
    area = ((fu[:, 1] - fu[:, 0]) * (fv[:, 2] - fv[:, 0])
            - (fu[:, 2] - fu[:, 0]) * (fv[:, 1] - fv[:, 0]))
    ok = valid & (jnp.abs(area) > EPS) & (fz > EPS).all(axis=1)
    n_chunks = faces_p.shape[0] // chunk

    def seg_dist2(pux, puy, ax, ay, bx, by):
        abx, aby = bx - ax, by - ay
        t = ((pux - ax) * abx + (puy - ay) * aby) / (abx ** 2 + aby ** 2 + EPS)
        t = jnp.clip(t, 0.0, 1.0)
        dx, dy = pux - (ax + t * abx), puy - (ay + t * aby)
        return dx ** 2 + dy ** 2

    def body(carry, ci):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        cu, cv = sl(fu), sl(fv)
        cok, cia = sl(ok), sl(area)
        w0 = ((cu[None, :, 1] - px[:, None]) * (cv[None, :, 2] - py[:, None])
              - (cu[None, :, 2] - px[:, None]) * (cv[None, :, 1] - py[:, None]))
        w1 = ((cu[None, :, 2] - px[:, None]) * (cv[None, :, 0] - py[:, None])
              - (cu[None, :, 0] - px[:, None]) * (cv[None, :, 2] - py[:, None]))
        w2 = cia[None] - w0 - w1
        inside = ((w0 * cia[None] >= 0) & (w1 * cia[None] >= 0)
                  & (w2 * cia[None] >= 0))
        d2 = jnp.minimum(
            seg_dist2(px[:, None], py[:, None], cu[None, :, 0], cv[None, :, 0],
                      cu[None, :, 1], cv[None, :, 1]),
            jnp.minimum(
                seg_dist2(px[:, None], py[:, None], cu[None, :, 1],
                          cv[None, :, 1], cu[None, :, 2], cv[None, :, 2]),
                seg_dist2(px[:, None], py[:, None], cu[None, :, 2],
                          cv[None, :, 2], cu[None, :, 0], cv[None, :, 0])))
        d2 = d2 * scale ** 2
        sgn = jnp.where(inside, 1.0, -1.0)
        p = jax.nn.sigmoid(sgn * d2 / sigma)
        p = jnp.where(cok[None], p, 0.0)
        log_keep = jnp.log1p(-jnp.clip(p, 0.0, 1.0 - 1e-6)).sum(axis=1)
        return carry + log_keep, None

    log_keep, _ = jax.lax.scan(body, jnp.zeros_like(px), jnp.arange(n_chunks))
    return (1.0 - jnp.exp(log_keep)).reshape(H, W)
