"""Rasterizer tests: native C++ and JAX backends against the analytic
sphere, and against each other."""

import numpy as np
import pytest

from texpose_tpu.raster import (MeshRenderer, native, normal_from_depth,
                                nocs_attrs)
from texpose_tpu.data.fixture import (_icosphere, _orbit_pose,
                                      _render_sphere, CAM_K)

H, W = 120, 160
RADIUS = 60.0
DIST = 400.0


@pytest.fixture(scope="module")
def scene():
    K = CAM_K.copy()
    K[:2] *= 0.25
    verts, faces = _icosphere(RADIUS, subdiv=3)
    pose = _orbit_pose(0.7, 0.3, DIST).astype(np.float32)
    analytic = _render_sphere(pose, K, H, W, RADIUS, flat=True)
    return verts, faces, pose, K.astype(np.float32), analytic


@pytest.mark.skipif(not native.available(), reason="no g++")
def test_native_matches_analytic_sphere(scene):
    verts, faces, pose, K, analytic = scene
    r = MeshRenderer(verts, faces, H=H, W=W, backend="native")
    mask, depth = r.render(pose[None], K, mode="mask")
    hit = analytic["hit"]
    # icosphere(3) vs perfect sphere: small silhouette mismatch allowed
    agree = (mask[0, ..., 0] > 0) == hit
    assert agree.mean() > 0.995, agree.mean()
    # interior depth within 2% of analytic sphere depth
    interior = hit & (mask[0, ..., 0] > 0)
    err = np.abs(depth[0][interior] - analytic["depth_mm"][interior])
    assert np.median(err) / DIST < 0.01

    nocs, _ = r.render(pose[None], K, mode="nocs")
    err_n = np.abs(nocs[0][interior] - analytic["nocs"][interior])
    assert np.median(err_n) < 0.05


@pytest.mark.skipif(not native.available(), reason="no g++")
def test_jax_matches_native(scene):
    verts, faces, pose, K, _ = scene
    rn = MeshRenderer(verts, faces, H=H, W=W, backend="native")
    rj = MeshRenderer(verts, faces, H=H, W=W, backend="jax")
    mn, dn = rn.render(pose[None], K, mode="mask")
    mj, dj = rj.render(pose[None], K, mode="mask")
    # same coverage except boundary ties
    assert ((mn > 0) == (mj > 0)).mean() > 0.999
    both = (mn[0, ..., 0] > 0) & (mj[0, ..., 0] > 0)
    np.testing.assert_allclose(dn[0][both], dj[0][both], rtol=1e-3)

    nn, _ = rn.render(pose[None], K, mode="nocs")
    nj, _ = rj.render(pose[None], K, mode="nocs")
    assert np.median(np.abs(nn[0][both] - nj[0][both])) < 1e-3


def test_normal_from_depth_sphere(scene):
    verts, faces, pose, K, analytic = scene
    depth = analytic["depth_mm"].astype(np.float32)
    n = normal_from_depth(pose, depth, K, H, W)
    # compare against analytic camera-space normals on eroded interior
    import cv2
    interior = cv2.erode(analytic["hit"].astype(np.uint8),
                         np.ones((5, 5), np.uint8)) > 0
    # the reference computes the cross product on WORLD-frame points then
    # flips z (compute_surfelinfo.py:44-53) — undo the flip and compare to
    # world-frame analytic normals (normal_world = normal_cam @ R)
    R = pose[:, :3]
    n_ref = analytic["normal_cam"] @ R
    n_cmp = n.copy()
    n_cmp[..., 2] *= -1
    cos = (n_cmp * n_ref).sum(-1)[interior]
    assert np.median(np.abs(cos)) > 0.95, np.median(np.abs(cos))


def test_nocs_attrs_range():
    v = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    n = nocs_attrs(v)
    assert n.min() >= 0 and n.max() <= 1
