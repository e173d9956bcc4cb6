"""Pose algebra on [..., 3, 4] camera poses [R|t], pure JAX.

Capability parity with the reference's camera.py pose/Lie/quaternion/6D
classes (/root/reference/camera.py:13-247), redesigned as pure functions over
jnp arrays (no classes, no device side-effects) so every op traces cleanly
under jit/vmap/grad and maps onto the VPU.

Conventions (identical to the reference):
  * a pose maps world → camera:  x_cam = R @ x_world + t
  * compose([p1, p2]) applies p1 first:  pose_new(x) = p2(p1(x))
  * so3/se3 exp/log use the Taylor expansions of sin(x)/x, (1-cos x)/x^2,
    (x-sin x)/x^3 rather than trig (stable near 0 AND branch-free for XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- pose [R|t]

def pose_from_Rt(R=None, t=None):
    """Construct a [...,3,4] pose from R [...,3,3] and/or t [...,3]."""
    assert R is not None or t is not None
    if R is None:
        t = jnp.asarray(t, jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), (*t.shape[:-1], 3, 3))
    elif t is None:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.zeros(R.shape[:-1], R.dtype)
    else:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.asarray(t, jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def pose_invert(pose):
    """Invert a [...,3,4] rigid pose (R assumed orthonormal)."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -(R_inv @ t)[..., 0]
    return pose_from_Rt(R_inv, t_inv)


def pose_compose_pair(pose_a, pose_b):
    """pose_new(x) = pose_b(pose_a(x))."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return pose_from_Rt(R_new, t_new)


def pose_compose(pose_list):
    """Compose a sequence; first element applied first."""
    out = pose_list[0]
    for p in pose_list[1:]:
        out = pose_compose_pair(out, p)
    return out


def pose_to_hom4(pose):
    """[...,3,4] → [...,4,4] homogeneous."""
    bottom = jnp.zeros((*pose.shape[:-2], 1, 4), pose.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([pose, bottom], axis=-2)


# ------------------------------------------------------------- Lie SO3 / SE3

def skew_symmetric(w):
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    O = jnp.zeros_like(w0)
    return jnp.stack([
        jnp.stack([O, -w2, w1], axis=-1),
        jnp.stack([w2, O, -w0], axis=-1),
        jnp.stack([-w1, w0, O], axis=-1),
    ], axis=-2)


def _taylor(x, nth, denom_step):
    """Shared alternating-series helper; denom_step(i) gives the factorial
    increment per term. Matches reference taylor_A/B/C conventions."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= denom_step(i)
        ans = ans + (-1.0) ** i * x ** (2 * i) / denom
    return ans


def taylor_A(x, nth=10):
    """sin(x)/x. (reference camera.py:121-128 — denom starts at 1 for i=0)"""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + (-1.0) ** i * x ** (2 * i) / denom
    return ans


def taylor_B(x, nth=10):
    """(1 - cos(x)) / x^2."""
    return _taylor(x, nth, lambda i: (2 * i + 1) * (2 * i + 2))


def taylor_C(x, nth=10):
    """(x - sin(x)) / x^3."""
    return _taylor(x, nth, lambda i: (2 * i + 2) * (2 * i + 3))


def so3_to_SO3(w):
    """Exponential map so(3) → SO(3) via Rodrigues w/ Taylor coefficients."""
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=w.dtype)
    return I + taylor_A(theta) * wx + taylor_B(theta) * (wx @ wx)


def SO3_to_so3(R, eps=1e-7):
    """Log map SO(3) → so(3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))
    theta = (theta % np.pi)[..., None, None]
    lnR = 1 / (2 * taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


def se3_to_SE3(wu):
    """Exponential map se(3) → SE(3): wu = [w(3), u(3)] → [...,3,4]."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=wu.dtype)
    R = I + taylor_A(theta) * wx + taylor_B(theta) * (wx @ wx)
    V = I + taylor_B(theta) * wx + taylor_C(theta) * (wx @ wx)
    return jnp.concatenate([R, V @ u[..., None]], axis=-1)


def SE3_to_se3(Rt, eps=1e-8):
    """Log map SE(3) → se(3)."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=Rt.dtype)
    A, B = taylor_A(theta), taylor_B(theta)
    invV = I - 0.5 * wx + (1 - A / (2 * B)) / (theta ** 2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


# --------------------------------------------------------------- quaternions

def q_to_R(q):
    """Unit quaternion [w,x,y,z] → rotation matrix [...,3,3]."""
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (qc ** 2 + qd ** 2), 2 * (qb * qc - qa * qd), 2 * (qa * qc + qb * qd)], axis=-1),
        jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb ** 2 + qd ** 2), 2 * (qc * qd - qa * qb)], axis=-1),
        jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd), 1 - 2 * (qb ** 2 + qc ** 2)], axis=-1),
    ], axis=-2)


def R_to_q(R, eps=1e-8):
    """Rotation matrix → quaternion, branch-free Shepperd-style variant.

    Uses the robust symmetric-matrix eigen formulation everywhere instead of
    the reference's sign-based formula + NaN rescue loop
    (camera.py:161-185) — identical output up to quaternion sign, and safe
    under jit (no data-dependent Python control flow).
    """
    R00, R01, R02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    R10, R11, R12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    R20, R21, R22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # four squared-magnitude candidates
    qa2 = jnp.maximum(0.0, 1 + R00 + R11 + R22) / 4
    qb2 = jnp.maximum(0.0, 1 + R00 - R11 - R22) / 4
    qc2 = jnp.maximum(0.0, 1 - R00 + R11 - R22) / 4
    qd2 = jnp.maximum(0.0, 1 - R00 - R11 + R22) / 4
    # candidate quaternions normalized by each dominant component
    def _safe(x):
        return jnp.sqrt(jnp.maximum(x, eps))
    qa = jnp.stack([4 * qa2, R21 - R12, R02 - R20, R10 - R01], axis=-1) / (4 * _safe(qa2))[..., None]
    qb = jnp.stack([R21 - R12, 4 * qb2, R01 + R10, R02 + R20], axis=-1) / (4 * _safe(qb2))[..., None]
    qc = jnp.stack([R02 - R20, R01 + R10, 4 * qc2, R12 + R21], axis=-1) / (4 * _safe(qc2))[..., None]
    qd = jnp.stack([R10 - R01, R02 + R20, R12 + R21, 4 * qd2], axis=-1) / (4 * _safe(qd2))[..., None]
    mags = jnp.stack([qa2, qb2, qc2, qd2], axis=-1)
    cands = jnp.stack([qa, qb, qc, qd], axis=-2)                 # [...,4,4]
    idx = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def q_invert(q):
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    norm2 = jnp.sum(q ** 2, axis=-1, keepdims=True)
    return jnp.stack([qa, -qb, -qc, -qd], axis=-1) / norm2


def q_product(q1, q2):
    a1, b1, c1, d1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    a2, b2, c2, d2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
        a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
        a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
        a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
    ], axis=-1)


# --------------------------------------------------- continuous 6D / 9D pose

def rotation_6d_to_matrix(d6):
    """Zhou et al. continuous 6D → rotation matrix via Gram-Schmidt."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R):
    return R[..., :2, :].reshape(*R.shape[:-2], 6)


def pose_9d_to_matrix(d9):
    """[...,9] = [6d rot, 3d trans] → [...,3,4]."""
    R = rotation_6d_to_matrix(d9[..., :6])
    return jnp.concatenate([R, d9[..., 6:, None]], axis=-1)


# --------------------------------------------------------- metrics & fitting

def rotation_distance(R1, R2, eps=1e-7):
    """Geodesic angle between rotations (broadcasts)."""
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))


def procrustes_analysis(X0, X1):
    """Similarity (sim3) aligning point set X1 [N,3] to X0 [N,3].

    Returns dict(t0, t1, s0, s1, R) such that
    X1to0 = (X1 - t1)/s1 @ R.T * s0 + t0.  SVD in float64 for stability
    (mirrors reference camera.py:353-370).
    """
    t0 = X0.mean(axis=0, keepdims=True)
    t1 = X1.mean(axis=0, keepdims=True)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = jnp.sqrt((X0c ** 2).sum(axis=-1).mean())
    s1 = jnp.sqrt((X1c ** 2).sum(axis=-1).mean())
    M = (X0c / s0).T @ (X1c / s1)
    U, S, Vt = jnp.linalg.svd(M.astype(jnp.float64), full_matrices=False)
    R = (U @ Vt).astype(X0.dtype)
    det = jnp.linalg.det(R)
    R = R.at[2].multiply(jnp.where(det < 0, -1.0, 1.0))
    return dict(t0=t0[0], t1=t1[0], s0=s0, s1=s1, R=R)


def angle_to_rotation_matrix(a, axis):
    """Rotation about one of X/Y/Z by angle(s) a (reference camera.py:280-289)."""
    roll = dict(X=1, Y=2, Z=0)[axis]
    O, I = jnp.zeros_like(a), jnp.ones_like(a)
    M = jnp.stack([
        jnp.stack([jnp.cos(a), -jnp.sin(a), O], axis=-1),
        jnp.stack([jnp.sin(a), jnp.cos(a), O], axis=-1),
        jnp.stack([O, O, I], axis=-1),
    ], axis=-2)
    return jnp.roll(M, (roll, roll), axis=(-2, -1))


def get_novel_view_poses(pose_anchor, N=60, scale=1.0, motion="wild"):
    """Circular novel-view poses around an anchor (camera.py:373-402)."""
    theta = jnp.arange(N) / N * 2 * np.pi
    if motion == "wild":
        R_x = angle_to_rotation_matrix(jnp.arcsin(jnp.sin(theta) * 0.3), "X")
        R_y = angle_to_rotation_matrix(jnp.arcsin(jnp.cos(theta) * 0.3), "Y")
        shift1 = pose_from_Rt(t=jnp.array([0.0, 0, 3 * scale]))
        shift2 = pose_from_Rt(t=jnp.array([0.0, 0, -1 * scale]))
    elif motion == "gentle":
        R_x = angle_to_rotation_matrix(jnp.arcsin(jnp.sin(theta) * 0.05), "X")
        R_y = angle_to_rotation_matrix(jnp.arcsin(jnp.cos(theta) * 0.05), "Y")
        shift1 = pose_from_Rt(t=jnp.array([0.0, 0, -4 * scale]))
        shift2 = pose_from_Rt(t=jnp.array([0.0, 0, 4 * scale]))
    else:
        raise NotImplementedError(motion)
    pose_rot = pose_from_Rt(R=R_y @ R_x)
    pose_oscil = pose_compose([jnp.broadcast_to(shift1, pose_rot.shape[:-2] + (3, 4)),
                               pose_rot,
                               jnp.broadcast_to(shift2, pose_rot.shape[:-2] + (3, 4))])
    return pose_compose([pose_oscil, jnp.broadcast_to(pose_anchor[None], pose_oscil.shape)])


def get_novel_view_poses_obj(pose_anchor, N=10):
    """Z-axis orbit of ±45° about an anchor pose (camera.py:394-402)."""
    theta = jnp.arange(-N / 2, N / 2) / N * 0.5 * np.pi
    R_z = angle_to_rotation_matrix(theta, "Z")
    pose_rot = pose_from_Rt(R=R_z)
    return pose_compose([pose_rot, jnp.broadcast_to(pose_anchor, pose_rot.shape)])


def compose_pose_residual(pose_refine, pose_source):
    """Apply a residual refinement in the source pose's rotation frame
    (camera.py:405-412)."""
    rot = pose_source[..., :3, :3]
    pose_rot = pose_from_Rt(R=rot)
    pose_rot_T = pose_from_Rt(R=jnp.swapaxes(rot, -1, -2))
    return pose_compose([pose_rot, pose_refine, pose_rot_T, pose_source])
