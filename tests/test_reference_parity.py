"""Golden parity tests that execute the reference implementation (torch CPU)
as an oracle against our JAX implementations.

Only runs where /root/reference exists; every comparison is on random
inputs, asserting numerical agreement of: Lie/quaternion/pose algebra, ray
generation, AABB intersection, rotation distance, procrustes, positional
encoding + c2f windowing, volume compositing, and SSIM.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    """Import reference modules with an easydict shim."""
    if "easydict" not in sys.modules:
        mod = types.ModuleType("easydict")

        class EasyDict(dict):
            def __init__(self, d=None, **kw):
                d = dict(d or {}, **kw)
                for k, v in d.items():
                    self[k] = v

            def __setitem__(self, k, v):
                if isinstance(v, dict) and not isinstance(v, EasyDict):
                    v = EasyDict(v)
                super().__setitem__(k, v)
                object.__setattr__(self, k, v) if False else None

            __getattr__ = dict.__getitem__

            def __setattr__(self, k, v):
                self[k] = v

        mod.EasyDict = EasyDict
        sys.modules["easydict"] = mod
    for name in ("ipdb", "visdom", "tensorboardX", "pytorch3d",
                 "pytorch3d.ops", "pytorch3d.ops.knn",
                 "pytorch3d.structures", "pytorch3d.structures.pointclouds",
                 "pytorch3d.loss", "pytorch3d.loss.chamfer",
                 "torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = []          # mark as package for submodule import
            stub.set_trace = lambda *a, **k: None
            stub.knn_gather = None
            stub.knn_points = None
            stub.Pointclouds = object
            stub._validate_chamfer_reduction_inputs = None
            stub._handle_pointcloud_input = None
            sys.modules[name] = stub
    sys.path.insert(0, REF)
    import camera as ref_camera
    ns = types.SimpleNamespace(camera=ref_camera,
                               EasyDict=sys.modules["easydict"].EasyDict)
    try:
        sys.path.insert(0, os.path.join(REF, "external", "pohsun_ssim"))
        import pytorch_ssim
        ns.pytorch_ssim = pytorch_ssim
    except Exception:
        ns.pytorch_ssim = None
    return ns


def t(x):
    return torch.from_numpy(np.asarray(x)).float()


def test_lie_parity(ref, rng):
    import jax.numpy as jnp
    from texpose_tpu.geometry.pose import (so3_to_SO3, SO3_to_so3,
                                           se3_to_SE3, SE3_to_se3)
    w = rng.normal(0, 0.7, (16, 3)).astype(np.float32)
    wu = rng.normal(0, 0.5, (16, 6)).astype(np.float32)
    R_ref = ref.camera.lie.so3_to_SO3(t(w)).numpy()
    R_ours = np.asarray(so3_to_SO3(jnp.asarray(w)))
    np.testing.assert_allclose(R_ours, R_ref, atol=1e-5)
    w_rt = np.asarray(SO3_to_so3(jnp.asarray(R_ref)))
    w_ref_rt = ref.camera.lie.SO3_to_so3(t(R_ref)).numpy()
    np.testing.assert_allclose(w_rt, w_ref_rt, atol=1e-4)
    P_ref = ref.camera.lie.se3_to_SE3(t(wu)).numpy()
    P_ours = np.asarray(se3_to_SE3(jnp.asarray(wu)))
    np.testing.assert_allclose(P_ours, P_ref, atol=1e-5)
    u_rt = np.asarray(SE3_to_se3(jnp.asarray(P_ref)))
    u_ref = ref.camera.lie.SE3_to_se3(t(P_ref)).numpy()
    np.testing.assert_allclose(u_rt, u_ref, atol=1e-4)


def test_quaternion_parity(ref, rng):
    import jax.numpy as jnp
    from texpose_tpu.geometry.pose import q_to_R, R_to_q, q_invert, q_product
    q = rng.normal(size=(8, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R_ref = ref.camera.quaternion.q_to_R(t(q)).numpy()
    np.testing.assert_allclose(np.asarray(q_to_R(jnp.asarray(q))), R_ref,
                               atol=1e-5)
    q_ref = ref.camera.quaternion.R_to_q(t(R_ref)).numpy()
    q_ours = np.asarray(R_to_q(jnp.asarray(R_ref)))
    np.testing.assert_allclose(np.abs(q_ours), np.abs(q_ref), atol=1e-4)
    qi_ref = ref.camera.quaternion.invert(t(q)).numpy()
    np.testing.assert_allclose(np.asarray(q_invert(jnp.asarray(q))), qi_ref,
                               atol=1e-5)
    q2 = rng.normal(size=(8, 4)).astype(np.float32)
    qp_ref = ref.camera.quaternion.product(t(q), t(q2)).numpy()
    np.testing.assert_allclose(
        np.asarray(q_product(jnp.asarray(q), jnp.asarray(q2))), qp_ref,
        atol=1e-4)


def test_pose_and_rays_parity(ref, rng):
    import jax.numpy as jnp
    from texpose_tpu.geometry.pose import (pose_from_Rt, pose_invert,
                                           pose_compose_pair,
                                           rotation_distance)
    from texpose_tpu.geometry.rays import get_center_and_ray
    from texpose_tpu.geometry.pose import so3_to_SO3

    w = rng.normal(0, 0.5, (4, 3)).astype(np.float32)
    R = np.asarray(so3_to_SO3(jnp.asarray(w)))
    tr = rng.normal(0, 1.0, (4, 3)).astype(np.float32)
    pose_ref = ref.camera.pose(R=t(R), t=t(tr)).numpy()
    pose_ours = np.asarray(pose_from_Rt(R=jnp.asarray(R), t=jnp.asarray(tr)))
    np.testing.assert_allclose(pose_ours, pose_ref, atol=1e-6)

    inv_ref = ref.camera.pose.invert(t(pose_ref)).numpy()
    np.testing.assert_allclose(np.asarray(pose_invert(jnp.asarray(pose_ref))),
                               inv_ref, atol=1e-5)

    comp_ref = ref.camera.pose.compose_pair(t(pose_ref), t(inv_ref)).numpy()
    np.testing.assert_allclose(
        np.asarray(pose_compose_pair(jnp.asarray(pose_ref),
                                     jnp.asarray(inv_ref))),
        comp_ref, atol=1e-5)

    rd_ref = ref.camera.rotation_distance(t(R[:2]), t(R[2:])).numpy()
    rd_ours = np.asarray(rotation_distance(jnp.asarray(R[:2]),
                                           jnp.asarray(R[2:])))
    np.testing.assert_allclose(rd_ours, rd_ref, atol=1e-4)

    # ray generation (reference needs an opt namespace)
    H, W = 12, 16
    opt = ref.EasyDict({"H": H, "W": W,
                        "camera": {"model": "perspective"},
                        "device": "cpu"})
    K = np.array([[[30.0, 0, 8], [0, 30.0, 6], [0, 0, 1]]], np.float32)
    center_ref, ray_ref = ref.camera.get_center_and_ray(
        opt, t(pose_ref[:1]), intr=t(K))
    center_ours, ray_ours = get_center_and_ray(jnp.asarray(pose_ref[:1]),
                                               jnp.asarray(K), H, W)
    np.testing.assert_allclose(np.asarray(center_ours), center_ref.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ray_ours), ray_ref.numpy(),
                               atol=1e-4)


def test_procrustes_parity(ref, rng):
    import jax.numpy as jnp
    from texpose_tpu.geometry.pose import procrustes_analysis
    X0 = rng.normal(size=(30, 3)).astype(np.float32)
    X1 = (X0 * 1.7) @ np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]],
                               np.float32) + np.float32([0.3, -0.2, 0.5])
    sim3_ref = ref.camera.procrustes_analysis(t(X0), t(X1))
    sim3_ours = procrustes_analysis(jnp.asarray(X0), jnp.asarray(X1))
    for k in ("t0", "t1", "s0", "s1", "R"):
        np.testing.assert_allclose(np.asarray(sim3_ours[k]),
                                   np.asarray(sim3_ref[k]), atol=1e-4,
                                   err_msg=k)


def test_nerf_forward_composite_parity(ref, rng):
    """Full coarse-NeRF forward_samples + composite vs the reference
    layers/nerf.py with IDENTICAL weights ported torch→JAX."""
    import jax
    import jax.numpy as jnp
    from texpose_tpu.utils.config import Config, process_options
    from texpose_tpu.nn.fields import init_nerf, forward_samples_nerf
    from texpose_tpu.ops.render import composite

    sys.path.insert(0, REF)
    from layers import nerf as ref_nerf

    opt = ref.EasyDict({
        "arch": {"layers_feat": [None, 32, 32, 32],
                 "layers_rgb": [None, 32, 3], "skip": [1],
                 "posenc": {"L_3D": 4, "L_view": None},
                 "density_activ": "softplus", "tf_init": True},
        "nerf": {"view_dep": False, "density_noise_reg": None,
                 "setbg_opaque": None,
                 "depth": {"param": "metric", "scale": 10, "range": [0, 3]}},
        "c2f": [0.1, 0.5],
        "device": "cpu",
        "H": 4, "W": 4,
    })
    torch.manual_seed(0)
    net = ref_nerf.NeRF(opt)
    net.progress.data.fill_(0.37)

    cfg = process_options(Config({
        "arch": dict(opt.arch), "nerf": dict(opt.nerf),
        "c2f": [0.1, 0.5], "data": {"image_size": [4, 4]},
        "kernels": {"fused_trunk": False},
    }))
    params = init_nerf(jax.random.PRNGKey(0), cfg)

    # port torch weights (linear [out,in] → ours [in,out])
    tl = list(net.mlp_feat) + list(net.mlp_rgb)
    ours = params["mlp_feat"] + params["mlp_rgb"]
    assert len(tl) == len(ours)
    for lin, dst in zip(tl, ours):
        dst["w"] = jnp.asarray(lin.weight.detach().numpy().T)
        dst["b"] = jnp.asarray(lin.bias.detach().numpy())

    B, R, N = 2, 5, 6
    center = rng.normal(size=(B, R, 3)).astype(np.float32)
    direction = rng.normal(size=(B, R, 3)).astype(np.float32)
    depth = np.sort(rng.uniform(2, 6, (B, R, N, 1)).astype(np.float32),
                    axis=2)

    rgb_ref, dens_ref = net.forward_samples(opt, t(center), t(direction),
                                            t(depth), mode="eval")
    out_ref = net.composite(opt, t(direction), rgb_ref, dens_ref, t(depth))
    rgb_ref_c, depth_ref_c, opac_ref, _ = [o.detach().numpy()
                                           for o in out_ref]

    rgb_ours, dens_ours = forward_samples_nerf(
        params, cfg, jnp.asarray(center), jnp.asarray(direction),
        jnp.asarray(depth), progress=jnp.asarray(0.37), mode="eval")
    np.testing.assert_allclose(np.asarray(rgb_ours),
                               rgb_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dens_ours),
                               dens_ref.detach().numpy(), atol=1e-5)
    out = composite(rgb_ours, dens_ours, jnp.asarray(depth),
                    jnp.asarray(direction))
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_ref_c, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth_ref_c,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["opacity"]), opac_ref,
                               atol=1e-5)


def test_ssim_parity(ref, rng):
    if ref.pytorch_ssim is None:
        pytest.skip("pohsun ssim not importable")
    import jax.numpy as jnp
    from texpose_tpu.ops.ssim import ssim
    a = rng.random((2, 3, 32, 32)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    s_ref = float(ref.pytorch_ssim.ssim(t(a), t(b)))
    s_ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(s_ref - s_ours) < 1e-4, (s_ref, s_ours)
