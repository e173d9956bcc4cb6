"""Ray generation / AABB / NDC tests against closed-form pinhole geometry."""

import numpy as np
import jax.numpy as jnp

from texpose_tpu import geometry as G


def make_intr(f=100.0, cx=32.0, cy=24.0):
    return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)


def test_rays_identity_pose():
    H, W = 48, 64
    intr = make_intr()[None]
    pose = G.pose_from_Rt(R=np.eye(3, dtype=np.float32)[None])
    center, ray = G.get_center_and_ray(pose, jnp.asarray(intr), H, W)
    assert center.shape == (1, H * W, 3) and ray.shape == (1, H * W, 3)
    np.testing.assert_allclose(center, 0, atol=1e-6)
    # ray through the principal point is +z
    idx = int(round(24.0 - 0.5)) * W + int(round(32.0 - 0.5))
    np.testing.assert_allclose(ray[0, idx], [0, 0, 1], atol=1e-2)
    # pinhole model: ray = K^-1 [u,v,1]
    u, v = 10.5, 30.5
    expect = np.linalg.inv(intr[0]) @ np.array([u, v, 1.0])
    np.testing.assert_allclose(ray[0, 30 * W + 10], expect, atol=1e-5)


def test_rays_transform_with_pose(rng):
    H, W = 8, 8
    intr = jnp.asarray(make_intr(50.0, 4.0, 4.0)[None])
    from scipy.spatial.transform import Rotation as ScipyR
    R = ScipyR.random(1, random_state=1).as_matrix().astype(np.float32)
    t = rng.normal(size=(1, 3)).astype(np.float32)
    pose = G.pose_from_Rt(R, t)
    center, ray = G.get_center_and_ray(pose, intr, H, W)
    # camera center in world = -R^T t
    expect_c = -(np.swapaxes(R, -1, -2) @ t[..., None])[..., 0]
    np.testing.assert_allclose(center[0, 0], expect_c[0], atol=1e-5)
    # ray directions are rotated versions of identity-pose rays
    pose_id = G.pose_from_Rt(R=np.eye(3, dtype=np.float32)[None])
    _, ray_id = G.get_center_and_ray(pose_id, intr, H, W)
    np.testing.assert_allclose(ray[0], np.asarray(ray_id[0]) @ R[0], atol=1e-5)


def test_points_from_depth():
    center = jnp.zeros((1, 4, 3))
    ray = jnp.tile(jnp.array([[0.0, 0, 1]]), (1, 4, 1)).reshape(1, 4, 3)
    depth = jnp.ones((1, 4, 5, 1)) * 2.0
    pts = G.get_3D_points_from_depth(center, ray, depth, multi_samples=True)
    assert pts.shape == (1, 4, 5, 3)
    np.testing.assert_allclose(pts[..., 2], 2.0)


def test_aabb_intersection():
    ray_o = jnp.array([[[0.0, 0, -5], [0.0, 0, -5], [10.0, 10, -5]]])
    ray_d = jnp.array([[[0.0, 0, 1], [0.0, 1, 0], [0.0, 0, 1]]])
    amin = jnp.array([-1.0, -1, -1])
    amax = jnp.array([1.0, 1, 1])
    t_near, t_far, valid = G.aabb_ray_intersection(amin, amax, ray_o, ray_d)
    np.testing.assert_allclose(t_near[0, 0], 4.0, atol=1e-5)
    np.testing.assert_allclose(t_far[0, 0], 6.0, atol=1e-5)
    assert bool(valid[0, 0]) and not bool(valid[0, 2])


def test_enlarge_diagonal():
    amin, amax = G.enlarge_diagonal(jnp.zeros(3), jnp.ones(3), alpha=0.5)
    np.testing.assert_allclose(amin, -0.25)
    np.testing.assert_allclose(amax, 1.25)


def test_world_cam_roundtrip(rng):
    from scipy.spatial.transform import Rotation as ScipyR
    R = ScipyR.random(2, random_state=3).as_matrix().astype(np.float32)
    t = rng.normal(size=(2, 3)).astype(np.float32)
    pose = G.pose_from_Rt(R, t)
    X = jnp.asarray(rng.normal(size=(2, 7, 3)).astype(np.float32))
    X_cam = G.world2cam(X, pose)
    X_back = G.cam2world(X_cam, pose)
    np.testing.assert_allclose(X_back, X, atol=1e-4)


def test_ndc_near_plane():
    center = jnp.array([[[0.0, 0, 0.5]]])
    ray = jnp.array([[[0.0, 0, 1.0]]])
    intr = jnp.asarray(make_intr()[None])
    c_ndc, r_ndc = G.convert_NDC(center, ray, intr, near=1.0)
    # center z lands on near plane: cnz = 1 - 2*near/cz with cz=1 → -1
    np.testing.assert_allclose(c_ndc[0, 0, 2], -1.0, atol=1e-5)
    np.testing.assert_allclose(r_ndc[0, 0, 2], 2.0, atol=1e-5)
