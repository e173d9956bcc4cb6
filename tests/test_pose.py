"""Property tests for pose algebra against closed-form / scipy references."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyR

from texpose_tpu import geometry as G


def random_rotations(rng, n):
    return ScipyR.random(n, random_state=rng.integers(1 << 30)).as_matrix().astype(np.float32)


def test_pose_construct_invert_compose(rng):
    R = random_rotations(rng, 4)
    t = rng.normal(size=(4, 3)).astype(np.float32)
    pose = G.pose_from_Rt(R, t)
    assert pose.shape == (4, 3, 4)
    # invert ∘ pose == identity
    ident = G.pose_compose_pair(pose, G.pose_invert(pose))
    np.testing.assert_allclose(ident[..., :3],
                               np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(ident[..., 3], 0, atol=1e-5)
    # compose order: first element applied first
    p1 = G.pose_from_Rt(t=np.array([[1.0, 0, 0]]))
    p2 = G.pose_from_Rt(R=random_rotations(rng, 1))
    x = rng.normal(size=(1, 5, 3)).astype(np.float32)
    via_compose = G.world2cam(x, G.pose_compose([p1, p2]))
    via_seq = G.world2cam(G.world2cam(x, p1), p2)
    np.testing.assert_allclose(via_compose, via_seq, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(8, 3)).astype(np.float32) * 0.5
    R = G.so3_to_SO3(w)
    R_ref = ScipyR.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    w_back = G.SO3_to_so3(R)
    np.testing.assert_allclose(w_back, w, atol=1e-4)


def test_so3_small_angle_stability():
    w = jnp.array([[1e-8, 0, 0], [0.0, 0, 0]])
    R = G.so3_to_SO3(w)
    assert not np.isnan(np.asarray(R)).any()
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-7)


def test_se3_exp_log_roundtrip(rng):
    wu = rng.normal(size=(8, 6)).astype(np.float32) * 0.4
    Rt = G.se3_to_SE3(wu)
    wu_back = G.SE3_to_se3(Rt)
    np.testing.assert_allclose(wu_back, wu, atol=1e-4)


def test_quaternion_roundtrip(rng):
    R = random_rotations(rng, 16)
    q = G.R_to_q(R)
    R_back = G.q_to_R(q)
    np.testing.assert_allclose(R_back, R, atol=1e-5)
    # product/inverse laws
    q2 = G.R_to_q(random_rotations(rng, 16))
    prod = G.q_product(q, G.q_invert(q))
    np.testing.assert_allclose(np.abs(prod[..., 0]), 1, atol=1e-5)
    np.testing.assert_allclose(prod[..., 1:], 0, atol=1e-5)
    R_prod = G.q_to_R(G.q_product(q, q2))
    np.testing.assert_allclose(R_prod, np.asarray(G.q_to_R(q)) @ np.asarray(G.q_to_R(q2)), atol=1e-5)


def test_rotation_6d(rng):
    R = random_rotations(rng, 8)
    d6 = G.matrix_to_rotation_6d(R)
    R_back = G.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(R_back, R, atol=1e-5)
    d9 = np.concatenate([np.asarray(d6), rng.normal(size=(8, 3)).astype(np.float32)], axis=-1)
    pose = G.pose_9d_to_matrix(jnp.asarray(d9))
    np.testing.assert_allclose(pose[..., :3], R, atol=1e-5)


def test_rotation_distance(rng):
    R1 = random_rotations(rng, 8)
    axis = np.array([0.0, 0, 1])
    for ang in [0.1, 0.5, 2.0]:
        R_delta = ScipyR.from_rotvec(axis * ang).as_matrix().astype(np.float32)
        d = G.rotation_distance(jnp.asarray(R1 @ R_delta), jnp.asarray(R1))
        np.testing.assert_allclose(d, ang, atol=1e-4)


def test_procrustes(rng):
    X0 = rng.normal(size=(50, 3)).astype(np.float32)
    R = random_rotations(rng, 1)[0]
    s, t = 2.3, np.array([0.5, -1.0, 2.0], np.float32)
    X1 = (X0 @ R.T) * s + t
    sim3 = G.procrustes_analysis(jnp.asarray(X0), jnp.asarray(X1))
    X1to0 = (np.asarray(X1) - np.asarray(sim3["t1"])) / np.asarray(sim3["s1"]) \
        @ np.asarray(sim3["R"]).T * np.asarray(sim3["s0"]) + np.asarray(sim3["t0"])
    np.testing.assert_allclose(X1to0, X0, atol=1e-3)


def test_taylor_series_match_trig():
    x = jnp.linspace(0.01, 3.0, 50)[:, None, None]
    # tolerance limited by f32 alternating-series cancellation at x≈π (the
    # reference's torch implementation has identical error)
    np.testing.assert_allclose(G.taylor_A(x), np.sin(x) / x, atol=2e-4)
    np.testing.assert_allclose(G.taylor_B(x), (1 - np.cos(x)) / x ** 2, atol=2e-4)
    np.testing.assert_allclose(G.taylor_C(x), (x - np.sin(x)) / x ** 3, atol=2e-4)


def test_compose_pose_residual_identity(rng):
    pose_src = G.pose_from_Rt(random_rotations(rng, 2), rng.normal(size=(2, 3)).astype(np.float32))
    ident = G.pose_from_Rt(R=np.eye(3, dtype=np.float32)[None].repeat(2, 0))
    out = G.compose_pose_residual(ident, pose_src)
    np.testing.assert_allclose(out, pose_src, atol=1e-5)
