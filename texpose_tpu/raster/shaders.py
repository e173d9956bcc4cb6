"""Shading attribute builders + the renderer facade.

Capability parity with the reference's MVRenderer shaders
(/root/reference/tools/mvrenderer.py):
  * NOCS: vertices mean-centered, per-axis /max|·|, → [0,1]
    (SoftPhongNOCSShader, :695-731)
  * color: ambient-lit vertex colors = plain interpolation (AmbientLights
    SoftPhongShader, :105-113)
  * normal: interpolated per-vertex normals (area-weighted face-normal
    accumulation, pytorch3d verts_normals semantics)
  * mask: silhouette (hard coverage, or soft sigmoid blend on the JAX path)
  * depth: nearest-face camera z (fragments.zbuf, 0 at background — the
    reference's -1 background is only ever used via depth>0 checks,
    compute_surfelinfo.py:118)
  * normal_from_depth: image-space tangent cross product
    (compute_surfelinfo.py:37-55)

Convention note: the reference routes poses through a Rz(pi) "T_calib"
(mvrenderer.py:48-49) to convert OpenCV camera axes into pytorch3d's
convention; our rasterizers project directly in OpenCV convention, so no
calibration pose exists — outputs match the reference's.
"""

from __future__ import annotations

import numpy as np


def nocs_attrs(verts):
    """[V,3] → [V,3] NOCS in [0,1] (mean centroid, per-axis max-abs)."""
    c = verts.mean(axis=0, keepdims=True)
    d = verts - c
    return (d / np.abs(d).max(axis=0, keepdims=True) + 1.0) / 2.0


def vertex_normals(verts, faces):
    """Area-weighted per-vertex normals (pytorch3d verts_normals_packed)."""
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = np.cross(v1 - v0, v2 - v0)                       # area-weighted
    vn = np.zeros_like(verts)
    for i in range(3):
        np.add.at(vn, faces[:, i], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(norm, 1e-12)


def transform_verts(verts, pose):
    """[V,3] object-frame → camera-frame via [3,4] world→cam pose."""
    return verts @ pose[:, :3].T + pose[:, 3]


def normal_from_depth(pose, depth, intr, H, W):
    """Camera-frame normals from a depth map by central differences of the
    back-projected point map (reference compute_surfelinfo.py:37-55).

    pose [3,4] (world→cam), depth [H,W], intr [3,3] → [H,W,3] with the
    z-component flipped and zeroed outside depth>0, exactly as the
    reference (including the world-frame cross product).
    """
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], axis=-1)
    d_cam = pix @ np.linalg.inv(intr).T.astype(np.float32)
    R, t = pose[:, :3], pose[:, 3]
    cam_center = -R.T @ t
    d_world = d_cam @ R
    points = cam_center + d_world * depth[..., None]      # [H,W,3] world
    tu = points[1:-1, 2:] - points[1:-1, :-2]
    tv = points[2:, 1:-1] - points[:-2, 1:-1]
    n = np.cross(tu, tv)
    normal = np.zeros((H, W, 3), np.float32)
    normal[1:-1, 1:-1] = n
    norm = np.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / np.maximum(norm, 1e-12)
    normal[..., 2] *= -1
    return normal * (depth[..., None] > 0)


class MeshRenderer:
    """MVRenderer equivalent: render nocs/color/mask/normal (+depth) views
    of a CAD mesh under [B,3,4] poses (reference tools/mvrenderer.py:152-178).

    backend: 'native' (C++ z-buffer, host) or 'jax' (chunked XLA).
    """

    def __init__(self, verts, faces, colors=None, H=480, W=640,
                 backend="auto"):
        self.verts = np.asarray(verts, np.float32)
        self.faces = np.asarray(faces, np.int32)
        self.colors = None if colors is None else np.asarray(colors, np.float32)
        self.H, self.W = H, W
        self._nocs = nocs_attrs(self.verts)
        self._normals = vertex_normals(self.verts, self.faces)
        if backend == "auto":
            from . import native
            backend = "native" if native.available() else "jax"
        self.backend = backend

    def _rasterize(self, verts_cam, K):
        if self.backend == "native":
            from . import native
            return native.rasterize(verts_cam, self.faces, K, self.H, self.W)
        import jax.numpy as jnp
        from . import jax_raster
        z, f, b = jax_raster.rasterize(jnp.asarray(verts_cam),
                                       jnp.asarray(self.faces),
                                       jnp.asarray(K), self.H, self.W)
        return np.asarray(z), np.asarray(f), np.asarray(b)

    def _interp(self, face_id, bary, attrs):
        if self.backend == "native":
            from . import native
            return native.interpolate(self.faces, face_id, bary, attrs)
        import jax.numpy as jnp
        from . import jax_raster
        return np.asarray(jax_raster.interpolate(
            jnp.asarray(self.faces), jnp.asarray(face_id),
            jnp.asarray(bary), jnp.asarray(attrs)))

    def render(self, pose, K, mode="color", return_depth=True,
               features=None):
        """pose [B,3,4] (world→cam, mesh units), K [B,3,3] or [3,3] →
        images [B,H,W,C] (+ depth [B,H,W]).

        mode='feature' interpolates caller-provided per-vertex `features`
        [V,C] (the reference's SoftPhongFeatureShader role,
        tools/mvrenderer.py:927-956)."""
        pose = np.asarray(pose, np.float32)
        K = np.asarray(K, np.float32)
        if K.ndim == 2:
            K = np.broadcast_to(K[None], (len(pose), 3, 3))
        imgs, depths = [], []
        for b in range(len(pose)):
            verts_cam = transform_verts(self.verts, pose[b])
            zbuf, face_id, bary = self._rasterize(verts_cam, K[b])
            if mode == "nocs":
                img = self._interp(face_id, bary, self._nocs)
            elif mode == "color":
                if self.colors is None:
                    raise ValueError("mesh has no vertex colors")
                img = self._interp(face_id, bary, self.colors)
            elif mode == "normal":
                n = self._interp(face_id, bary, self._normals)
                norm = np.linalg.norm(n, axis=-1, keepdims=True)
                img = n / np.maximum(norm, 1e-12) * (face_id >= 0)[..., None]
            elif mode == "mask":
                img = (face_id >= 0).astype(np.float32)[..., None]
            elif mode == "feature":
                if features is None:
                    raise ValueError("mode='feature' needs per-vertex features")
                img = self._interp(face_id, bary,
                                   np.asarray(features, np.float32))
            else:
                raise NotImplementedError(mode)
            imgs.append(img)
            depths.append(zbuf)
        imgs = np.stack(imgs)
        depths = np.stack(depths)
        if return_depth:
            return imgs, depths
        return imgs
