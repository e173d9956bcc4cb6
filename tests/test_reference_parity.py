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


def _st_opt(ref):
    return ref.EasyDict({
        "arch": {"layers_feat": [None, 32, 32, 32],
                 "layers_rgb": [None, 32, 3],
                 "layers_trans": [None, 32, 5], "skip": [1],
                 "posenc": {"L_3D": 4, "L_view": 2},
                 "density_activ": "softplus", "tf_init": True},
        "nerf": {"view_dep": True, "density_noise_reg": None,
                 "N_latent_trans": 8, "N_latent_light": 12,
                 "min_uncert": 0.05,
                 "depth": {"param": "metric", "scale": 10, "range": [0, 3]}},
        "c2f": {"range": [0.1, 0.6], "start": 1},
        "device": "cpu", "H": 4, "W": 4,
    })


def _port_linears(torch_layers, ours):
    import jax.numpy as jnp
    assert len(torch_layers) == len(ours)
    for lin, dst in zip(torch_layers, ours):
        dst["w"] = jnp.asarray(lin.weight.detach().numpy().T)
        dst["b"] = jnp.asarray(lin.bias.detach().numpy())


def _st_pair(ref, rng, progress=0.42):
    """(reference ST NeRF, our params+cfg) with identical weights."""
    import jax
    from texpose_tpu.utils.config import Config, process_options
    from texpose_tpu.nn.fields import init_nerf_st

    sys.path.insert(0, REF)
    from layers import nerf_static_transient_light as ref_st

    opt = _st_opt(ref)
    torch.manual_seed(1)
    net = ref_st.NeRF(opt)
    net.progress.data.fill_(progress)

    cfg = process_options(Config({
        "arch": dict(opt.arch), "nerf": dict(opt.nerf),
        "c2f": {"range": [0.1, 0.6], "start": 1},
        "data": {"image_size": [4, 4]},
        "kernels": {"fused_trunk": False, "fused_st": False},
    }))
    params = init_nerf_st(jax.random.PRNGKey(0), cfg)
    _port_linears(list(net.mlp_feat), params["mlp_feat"])
    _port_linears(list(net.mlp_rgb), params["mlp_rgb"])
    _port_linears(list(net.mlp_trans), params["mlp_trans"])
    return opt, net, cfg, params


def test_st_nerf_forward_parity(ref, rng):
    """Static/transient/light forward_samples vs the reference with copied
    weights and fixed latents (layers/nerf_static_transient_light.py:76-166)."""
    import jax.numpy as jnp
    from texpose_tpu.nn.fields import forward_samples_nerf_st

    opt, net, cfg, params = _st_pair(ref, rng)
    B, R, N = 2, 5, 6
    center = rng.normal(size=(B, R, 3)).astype(np.float32)
    direction = rng.normal(size=(B, R, 3)).astype(np.float32)
    depth = np.sort(rng.uniform(2, 6, (B, R, N, 1)).astype(np.float32), axis=2)
    lt = rng.normal(size=(B, 8)).astype(np.float32)
    ll = rng.normal(size=(B, 12)).astype(np.float32)

    rgb_ref, dens_ref, unc_ref = net.forward_samples(
        opt, t(center), t(direction), t(depth),
        latent_variable_trans=t(lt), latent_variable_light=t(ll), mode="eval")

    rgb_ours, dens_ours, unc_ours = forward_samples_nerf_st(
        params, cfg, jnp.asarray(center), jnp.asarray(direction),
        jnp.asarray(depth), jnp.asarray(lt), jnp.asarray(ll),
        progress=jnp.asarray(0.42), mode="eval")

    np.testing.assert_allclose(np.asarray(rgb_ours),
                               rgb_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dens_ours),
                               dens_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(unc_ours),
                               unc_ref.detach().numpy(), atol=1e-5)


def test_st_composite_parity(ref, rng):
    """Dual-density composite vs the reference 11-tuple on random samples
    (layers/nerf_static_transient_light.py:168-212): joint-T weighting for
    the combined rgb, own-T for rgb_static/transient, static-weight depth,
    prob_transient-integrated uncertainty + min_uncert floor."""
    import jax.numpy as jnp
    from texpose_tpu.ops.render import composite_static_transient

    sys.path.insert(0, REF)
    from layers import nerf_static_transient_light as ref_st

    opt = _st_opt(ref)
    B, R, N = 2, 7, 9
    rgb = rng.random((B, R, N, 3, 2)).astype(np.float32)
    dens = rng.random((B, R, N, 2)).astype(np.float32) * 2
    depth = np.sort(rng.uniform(2, 6, (B, R, N, 1)).astype(np.float32), axis=2)
    ray = rng.normal(size=(B, R, 3)).astype(np.float32)
    unc = rng.random((B, R, N, 1)).astype(np.float32)

    (rgb_r, rgb_s_r, rgb_t_r, depth_r, op_r, op_s_r, op_t_r, prob_r,
     unc_r, a_s_r, a_t_r) = [x.numpy() for x in ref_st.NeRF.composite(
        opt, t(ray), t(rgb), t(dens), t(depth), t(unc))]

    out = composite_static_transient(
        jnp.asarray(rgb), jnp.asarray(dens), jnp.asarray(depth),
        jnp.asarray(ray), jnp.asarray(unc), min_uncert=opt.nerf.min_uncert)

    for k, v in [("rgb", rgb_r), ("rgb_static", rgb_s_r),
                 ("rgb_transient", rgb_t_r), ("depth", depth_r),
                 ("opacity", op_r), ("opacity_static", op_s_r),
                 ("opacity_transient", op_t_r), ("prob", prob_r),
                 ("uncert", unc_r), ("alpha_static", a_s_r),
                 ("alpha_transient", a_t_r)]:
        np.testing.assert_allclose(np.asarray(out[k]), v, atol=1e-5,
                                   err_msg=k)


def test_discriminator_parity(ref, rng):
    """Scale+geometry-conditioned patch discriminator vs the reference with
    copied weights and spectral-norm u vectors
    (layers/discriminator.py:117-170)."""
    import jax.numpy as jnp
    from texpose_tpu.utils.config import Config, process_options
    from texpose_tpu.nn.discriminator import (init_discriminator,
                                              apply_discriminator)

    sys.path.insert(0, REF)
    from layers import discriminator as ref_disc_mod

    opt = ref.EasyDict({
        "patch_size": 16, "device": "cpu",
        "gan": {"scale_conditional": True, "geo_conditional": True,
                "geo_c2f": None, "L_nocs": 2, "L_normal": 2, "L_scale": 4},
    })
    torch.manual_seed(2)
    net = ref_disc_mod.Discriminator(opt)

    cfg = process_options(Config({
        "patch_size": 16, "gan": dict(opt.gan),
        "data": {"image_size": [16, 16]},
    }))
    import jax
    params, state = init_discriminator(jax.random.PRNGKey(0), cfg)

    def port_convs(seq, plist, slist):
        convs = [m for m in seq if isinstance(m, torch.nn.Conv2d)]
        assert len(convs) == len(plist), (len(convs), len(plist))
        for conv, dst, i in zip(convs, plist, range(len(plist))):
            w = conv.weight_orig.detach().numpy()        # [out,in,kh,kw]
            dst["w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
            slist[i] = jnp.asarray(conv.weight_u.detach().numpy().copy())

    port_convs(net.main, params["main"], state["main"])
    port_convs(net.final, params["final"], state["final"])

    B = 3
    x = rng.random((B, 9, 16, 16)).astype(np.float32)     # rgb+nocs+normal
    scale = rng.random((B, 1, 1, 1)).astype(np.float32)

    net.train()   # one power iteration from the (copied) stored u
    out_ref = net(opt, t(x), t(scale)).detach().numpy()

    out_ours, _ = apply_discriminator(params, state, cfg, jnp.asarray(x),
                                      jnp.asarray(scale), training=True)
    np.testing.assert_allclose(np.asarray(out_ours), out_ref, atol=2e-4)


def test_ray_sampler_parity(ref, rng):
    """Continuous-coordinate ray/bounds/image sampling vs the reference's
    grid_sample implementation (tools/ray_sampler.py:12-69)."""
    import jax.numpy as jnp
    from texpose_tpu.sampling.ray_sampler import get_rays, get_bounds, get_image

    # load by path — "tools" would collide with this repo's tools/ dir
    import importlib.util
    sys.path.insert(0, REF)
    spec = importlib.util.spec_from_file_location(
        "ref_ray_sampler", os.path.join(REF, "tools", "ray_sampler.py"))
    ref_rs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_rs)

    H, W = 24, 32
    B, h, w = 2, 5, 5
    opt = ref.EasyDict({"H": H, "W": W, "device": "cpu"})
    coords = (rng.random((B, h, w, 2)).astype(np.float32) * 1.6 - 0.8)
    K = np.broadcast_to(np.array(
        [[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32),
        (B, 3, 3)).copy()
    from texpose_tpu.geometry.pose import so3_to_SO3
    Rm = np.asarray(so3_to_SO3(jnp.asarray(
        rng.normal(0, 0.4, (B, 3)).astype(np.float32))))
    tr = rng.normal(0, 1, (B, 3)).astype(np.float32)
    pose = np.concatenate([Rm, tr[:, :, None]], axis=2).astype(np.float32)
    z_near = rng.uniform(2, 3, (B, H * W)).astype(np.float32)
    z_far = rng.uniform(5, 6, (B, H * W)).astype(np.float32)
    image = rng.random((B, 3, H, W)).astype(np.float32)

    c_ref, r_ref = ref_rs.RaySampler.get_rays(opt, t(K), t(coords), t(pose))
    c_ours, r_ours = get_rays(jnp.asarray(K), jnp.asarray(coords),
                              jnp.asarray(pose), H, W)
    np.testing.assert_allclose(np.asarray(c_ours), c_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_ours), r_ref.numpy(), atol=1e-5)

    zn_ref, zf_ref = ref_rs.RaySampler.get_bounds(opt, t(coords), t(z_near),
                                                  t(z_far))
    zn_ours, zf_ours = get_bounds(jnp.asarray(coords), jnp.asarray(z_near),
                                  jnp.asarray(z_far), H, W)
    np.testing.assert_allclose(np.asarray(zn_ours), zn_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(zf_ours), zf_ref.numpy(), atol=1e-5)

    im_ref = ref_rs.RaySampler.get_image(opt, t(coords), t(image))
    im_ours = get_image(jnp.asarray(coords), jnp.asarray(image))
    np.testing.assert_allclose(np.asarray(im_ours), im_ref.numpy(), atol=1e-5)


def test_crop_pipeline_parity(ref, rng):
    """CDPN crop trio vs reference data/lm.py:411-495 staticmethods on
    random windows (centered, border-clipped, and corner cases)."""
    import importlib
    import cv2
    if "plyfile" not in sys.modules:
        # cad_model.py imports plyfile (not installed); the crop statics
        # under test never touch it
        stub = types.ModuleType("plyfile")
        stub.PlyData = object
        sys.modules["plyfile"] = stub
    try:
        lm = importlib.import_module("data.lm")
    except Exception as e:       # pragma: no cover - env-specific
        pytest.skip(f"reference data.lm not importable: {e!r}")
    RefD = lm.Dataset
    from texpose_tpu.data.crops import (crop_by_pad, get_center_offset,
                                        preprocess_intrinsics)

    ht, wd, res = 120, 160, 64
    cases = [np.array([60.0, 80.0]),           # centered
             np.array([8.0, 80.0]),            # top-clipped
             np.array([112.0, 152.0]),         # bottom-right-clipped
             np.array([3.0, 4.0])]             # corner
    cases += [np.array([rng.uniform(0, ht), rng.uniform(0, wd)])
              for _ in range(4)]
    for center in cases:
        scale = float(rng.uniform(30, 150))
        img = rng.random((ht, wd, 3)).astype(np.float32)
        want = RefD.Crop_by_Pad(img, center, scale, res, 3,
                                cv2.INTER_LINEAR, True)
        got = crop_by_pad(img, center, scale, res, channel=3)
        np.testing.assert_allclose(got, want, atol=1e-6)

        # no-resize variant (used for depth maps)
        want_nr = RefD.Crop_by_Pad(img, center, scale, res, 3,
                                   cv2.INTER_LINEAR, False)
        got_nr = crop_by_pad(img, center, scale, res, channel=3,
                             resize=False)
        np.testing.assert_allclose(got_nr, want_nr, atol=1e-6)

        off_ref = RefD.get_center_offset(center, scale, ht, wd)
        off_got = get_center_offset(center, scale, ht, wd)
        np.testing.assert_allclose(off_got, off_ref, atol=0)

        K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]])
        resize = res / scale
        crop_center = center + off_ref
        want_K = RefD.preprocess_intrinsics(K.copy(), resize,
                                            crop_center.copy(), res)
        got_K = preprocess_intrinsics(K, resize, crop_center, res)
        np.testing.assert_allclose(got_K, want_K, atol=1e-4)

        edge_ref = RefD.get_edge((img[..., 0] > 0.5).astype(np.float32))
        from texpose_tpu.data.crops import get_edge
        edge_got = get_edge((img[..., 0] > 0.5).astype(np.float32))
        np.testing.assert_allclose(edge_got, edge_ref, atol=0)


def test_pretrain_graph_trajectory_parity(ref, rng):
    """STRETCH ORACLE (VERDICT r2 item 3): run the reference's actual
    nerf_pretrain Graph (render → mask+render losses → torch Adam) for 30
    CPU steps and our render/loss/optax stack for the same 30 steps from
    IDENTICAL weights on an identical batch; the loss trajectories must
    track.  Determinism: full-coverage ray set (rand_rays = B·HW),
    stratified sampling off, density noise off, c2f off — both sides
    become pure functions of the weights, so no RNG coordination is
    needed.  Reference: model/nerf_pretrain.py:449-586 (Graph),
    model/base.py train_iteration."""
    import types as _types

    def _stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = _types.ModuleType(name)
        m.__path__ = []
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    _stub("lpips", LPIPS=lambda **kw: None)
    _stub("kornia")
    _stub("kornia.geometry")
    _stub("kornia.geometry.linalg", inverse_transformation=None)
    _stub("pytorch3d.io", load_obj=None, load_ply=None)
    _stub("plyfile", PlyData=None, PlyElement=None)
    sys.modules["pytorch3d.structures"].Meshes = object
    sys.modules["pytorch3d.loss.chamfer"].chamfer_distance = None
    sys.path.insert(0, REF)
    import model.nerf_pretrain as ref_pretrain

    B, H, W, HW, N = 2, 8, 8, 64, 8
    opt = ref.EasyDict({
        "arch": {"layers_feat": [None, 32, 32, 32],
                 "layers_rgb": [None, 32, 3], "skip": [1],
                 "posenc": {"L_3D": 4, "L_view": None},
                 "density_activ": "softplus", "tf_init": True},
        "nerf": {"view_dep": False, "density_noise_reg": None,
                 "setbg_opaque": None, "mask_obj": True,
                 "depth": {"param": "metric", "scale": 10, "range": [0, 3]},
                 "sample_intvs": N, "sample_stratified": False,
                 "fine_sampling": False, "rand_rays": B * HW},
        "camera": {"ndc": False, "model": "perspective"},
        "loss_weight": {"render": 0, "mask": 0, "depth": None},
        "data": {"pose_source": "gt", "erode_mask_loss": False},
        "c2f": None, "device": "cpu", "H": H, "W": W,
    })
    torch.manual_seed(0)
    graph = ref_pretrain.Graph(opt)
    # the reference hardcodes .cuda() in ray_batch_sample — CPU shim
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **kw: self
    try:
        image = rng.uniform(size=(B, 3, H, W)).astype(np.float32)
        mask = (rng.uniform(size=(B, 1, H, W)) > 0.4).astype(np.float32)
        pose = np.tile(np.concatenate(
            [np.eye(3), [[0], [0], [3.0]]], 1)[None], (B, 1, 1)
        ).astype(np.float32)
        intr = np.tile(np.array([[20.0, 0, 4], [0, 20.0, 4], [0, 0, 1]],
                                np.float32)[None], (B, 1, 1))
        z_near = np.full((B, HW), 2.0, np.float32)
        z_far = np.full((B, HW), 4.0, np.float32)

        var = ref.EasyDict({
            "idx": torch.arange(B), "image": t(image),
            "obj_mask": t(mask), "pose": t(pose), "pose_init": t(pose),
            "intr": t(intr), "z_near": t(z_near), "z_far": t(z_far),
        })
        # fixed full-coverage ray set
        ref_pretrain.Graph.get_ray_idx = staticmethod(
            lambda o, v: (v.update(
                ray_idx=torch.arange(HW).repeat(len(v.idx), 1)) or v))

        steps = 30
        optim = torch.optim.Adam(graph.nerf.parameters(), lr=1e-3)
        ref_traj = []
        for _ in range(steps):
            var = graph.forward(opt, var, mode="train")
            loss = graph.compute_loss(opt, var, mode="train")
            total = loss.render + loss.mask
            optim.zero_grad()
            total.backward()
            optim.step()
            ref_traj.append(float(total))
    finally:
        torch.Tensor.cuda = orig_cuda

    # ---- our side: same init weights, same batch, same ray set ----
    import jax
    import jax.numpy as jnp
    import optax
    from texpose_tpu.utils.config import Config, process_options
    from texpose_tpu.nn.fields import init_nerf
    from texpose_tpu.models.render import render_rays_nerf, ray_batch_sample
    from texpose_tpu.models.losses import mse_loss, masked_mse_loss

    cfg = process_options(Config({
        "arch": dict(opt.arch), "nerf": dict(opt.nerf),
        "camera": dict(opt.camera), "c2f": None,
        "data": {"image_size": [H, W]},
        "kernels": {"fused_trunk": False, "fused_coarse": False},
    }))
    torch.manual_seed(0)
    net0 = ref_pretrain.NeRF(opt)          # same init as the graph's nerf
    params = init_nerf(jax.random.PRNGKey(0), cfg)
    for lin, dst in zip(list(net0.mlp_feat) + list(net0.mlp_rgb),
                        params["mlp_feat"] + params["mlp_rgb"]):
        dst["w"] = jnp.asarray(lin.weight.detach().numpy().T)
        dst["b"] = jnp.asarray(lin.bias.detach().numpy())

    ray_idx = jnp.tile(jnp.arange(HW)[None], (B, 1))
    image_j = jnp.asarray(image).reshape(B, 3, HW).transpose(0, 2, 1)
    mask_j = jnp.asarray(mask).reshape(B, HW, 1)
    img_s = ray_batch_sample(image_j, ray_idx)
    mask_s = ray_batch_sample(mask_j, ray_idx)

    def loss_fn(p):
        out = render_rays_nerf(p, cfg, jnp.asarray(pose), jnp.asarray(intr),
                               ray_idx, jnp.asarray(z_near),
                               jnp.asarray(z_far), jax.random.PRNGKey(0),
                               progress=None, mode="train")
        return (masked_mse_loss(out["rgb"], img_s, mask_s)
                + mse_loss(out["opacity"], mask_s))

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(lambda p, s: _adam_step(loss_fn, tx, p, s))
    ours_traj = []
    for _ in range(steps):
        (params, opt_state), v = step(params, opt_state)
        ours_traj.append(float(v))

    np.testing.assert_allclose(np.asarray(ours_traj), np.asarray(ref_traj),
                               rtol=2e-3, atol=2e-5)


def _adam_step(loss_fn, tx, params, opt_state):
    import jax
    import optax
    v, g = jax.value_and_grad(loss_fn)(params)
    upd, opt_state = tx.update(g, opt_state, params)
    return (optax.apply_updates(params, upd), opt_state), v


def test_texture_graph_trajectory_parity(ref, rng):
    """STRETCH ORACLE (texture stage): run the reference's actual
    nerf_adapt_st_gan Graph — ST-NeRF patch render → uncertainty-weighted
    render + uncert-reg + transient-reg losses → torch Adam over heads AND
    per-image latents (trunk frozen) — for 20 CPU steps from identical
    weights/latents on an identical batch with FIXED patch coords; our
    render_patch + losses + optax stack must track the loss trajectory.
    GAN/VGG/Lab terms are off (gan=None; PerceptualLoss/LabLoss are
    environment-blocked and stubbed).  Reference:
    model/nerf_adapt_st_gan.py:412-792."""
    import types as _types

    def _stub(name, **attrs):
        if name in sys.modules:
            m = sys.modules[name]
        else:
            m = _types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
        for k, v in attrs.items():
            setattr(m, k, v)
        return m

    _stub("lpips", LPIPS=lambda **kw: None)
    _stub("kornia")
    _stub("kornia.geometry")
    _stub("kornia.geometry.linalg", inverse_transformation=None)
    _stub("kornia.geometry.conversions", angle_axis_to_rotation_matrix=None)
    _stub("kornia.color", rgb_to_lab=None)
    _stub("pytorch3d.io", load_obj=None, load_ply=None, IO=object,
          ply_io=None)
    _stub("plyfile", PlyData=None, PlyElement=None)
    # tools/__init__.py star-imports mvrenderer → the full pytorch3d
    # renderer surface must exist as inert names (shaders are subclassed
    # at module level)
    _stub("pytorch3d.renderer", PerspectiveCameras=object,
          RasterizationSettings=object, MeshRenderer=object,
          MeshRasterizer=object, SoftSilhouetteShader=object,
          SoftPhongShader=object, AmbientLights=object,
          HardPhongShader=object)
    _stub("pytorch3d.renderer.mesh")
    _stub("pytorch3d.renderer.mesh.renderer", MeshRendererWithFragments=object)
    _stub("pytorch3d.renderer.mesh.rasterizer", Fragments=object)
    _stub("pytorch3d.renderer.blending", BlendParams=object,
          softmax_rgb_blend=None)
    _stub("pytorch3d.transforms", matrix_to_rotation_6d=None,
          rotation_6d_to_matrix=None)
    sys.modules["pytorch3d.ops"].interpolate_face_attributes = None
    sys.modules["pytorch3d.structures"].Meshes = object
    sys.modules["pytorch3d.loss.chamfer"].chamfer_distance = None
    sys.path.insert(0, REF)
    import model.nerf_adapt_st_gan as ref_gan

    B, H, W, HW, N, P = 2, 8, 8, 64, 8, 4
    opt = _st_opt(ref)
    opt.update({
        "gan": None, "batch_size": B, "patch_size": P,
        "loss_weight": ref.EasyDict({
            "render": 0, "mask": None, "uncert": 0, "trans_reg": 0,
            "feat": None, "lab": None, "gan_nerf": None}),
        "data": ref.EasyDict({"pose_source": "gt"}),
        "camera": ref.EasyDict({"ndc": False, "model": "perspective"}),
        "H": H, "W": W, "device": "cpu",
    })
    opt.nerf.update({"rand_rays": B * P * P, "sample_intvs": N,
                     "sample_stratified": False, "mask_obj": True,
                     "setbg_opaque": None, "fine_sampling": False})

    # VGG/kornia-backed loss modules are environment-blocked; terms are off
    orig_pl, orig_ll = ref_gan.PerceptualLoss, ref_gan.LabLoss
    orig_cuda = torch.Tensor.cuda
    ref_gan.PerceptualLoss = lambda: None
    ref_gan.LabLoss = lambda: None
    torch.Tensor.cuda = lambda self, *a, **kw: self
    try:
        torch.manual_seed(1)
        graph = ref_gan.Graph(opt)
        graph.nerf.progress.data.fill_(0.42)
        torch.manual_seed(2)
        graph.latent_vars_trans = torch.nn.Embedding(
            B, opt.nerf.N_latent_trans)
        torch.nn.init.normal_(graph.latent_vars_trans.weight)
        graph.latent_vars_light = torch.nn.Embedding(
            B, opt.nerf.N_latent_light)
        torch.nn.init.normal_(graph.latent_vars_light.weight)

        image = rng.uniform(size=(B, 3, H, W)).astype(np.float32)
        mask = (rng.uniform(size=(B, 1, H, W)) > 0.3).astype(np.float32)
        pose = np.tile(np.concatenate(
            [np.eye(3), [[0], [0], [3.0]]], 1)[None], (B, 1, 1)
        ).astype(np.float32)
        intr = np.tile(np.array([[20.0, 0, 4], [0, 20.0, 4], [0, 0, 1]],
                                np.float32)[None], (B, 1, 1))
        z_near = np.full((B, HW), 2.0, np.float32)
        z_far = np.full((B, HW), 4.0, np.float32)
        coords = rng.uniform(-0.9, 0.9, (B, P, P, 2)).astype(np.float32)

        var = ref.EasyDict({
            "idx": torch.arange(B), "image": t(image), "obj_mask": t(mask),
            "pose": t(pose), "pose_init": t(pose), "intr": t(intr),
            "z_near": t(z_near), "z_far": t(z_far),
            "ray_idx": t(coords), "ray_scales": torch.ones(B, 1, 1, 1),
        })
        steps = 20
        optim = torch.optim.Adam(
            [p for p in graph.nerf.parameters() if p.requires_grad],
            lr=1e-3)
        optim.add_param_group(
            dict(params=graph.latent_vars_light.parameters(), lr=1e-3))
        optim.add_param_group(
            dict(params=graph.latent_vars_trans.parameters(), lr=1e-3))
        ref_traj = []
        for _ in range(steps):
            var = graph.nerf_forward(opt, var, mode="train")
            loss = graph.compute_loss(opt, var, mode="train",
                                      train_step="nerf")
            total = loss.render + loss.uncert + loss.trans_reg
            optim.zero_grad()
            total.backward()
            optim.step()
            ref_traj.append(float(total))
        lt0 = graph.latent_vars_trans.weight.detach().numpy()
        ll0 = graph.latent_vars_light.weight.detach().numpy()
    finally:
        ref_gan.PerceptualLoss, ref_gan.LabLoss = orig_pl, orig_ll
        torch.Tensor.cuda = orig_cuda

    # ---- our side ----
    import jax
    import jax.numpy as jnp
    import optax
    from texpose_tpu.utils.config import Config, process_options
    from texpose_tpu.nn.fields import init_nerf_st
    from texpose_tpu.models.texture_gan import (render_patch,
                                                sample_patch_images)
    from texpose_tpu.models.losses import (uncertainty_reg_loss)

    cfg = process_options(Config({
        "arch": dict(opt.arch), "nerf": dict(opt.nerf),
        "camera": dict(opt.camera),
        "c2f": {"range": [0.1, 0.6], "start": 1},
        "data": {"image_size": [H, W]},
        "kernels": {"fused_trunk": False, "fused_st": False,
                    "fused_composite": False},
    }))
    torch.manual_seed(1)
    import layers.nerf_static_transient_light as ref_st
    net0 = ref_st.NeRF(opt)
    params = init_nerf_st(jax.random.PRNGKey(0), cfg)
    _port_linears(list(net0.mlp_feat), params["mlp_feat"])
    _port_linears(list(net0.mlp_rgb), params["mlp_rgb"])
    _port_linears(list(net0.mlp_trans), params["mlp_trans"])
    torch.manual_seed(2)
    e_t = torch.nn.Embedding(B, opt.nerf.N_latent_trans)
    torch.nn.init.normal_(e_t.weight)
    e_l = torch.nn.Embedding(B, opt.nerf.N_latent_light)
    torch.nn.init.normal_(e_l.weight)

    trunk = params["mlp_feat"]
    gen = {"heads": {"mlp_rgb": params["mlp_rgb"],
                     "mlp_trans": params["mlp_trans"]},
           "latents": {"trans": jnp.asarray(e_t.weight.detach().numpy()),
                       "light": jnp.asarray(e_l.weight.detach().numpy())}}
    batch = {"image": jnp.asarray(image), "obj_mask": jnp.asarray(mask)}
    coords_j = jnp.asarray(coords)
    sup = sample_patch_images(cfg, batch, coords_j)
    m_s, img_s = sup["mask"], sup["image"]

    def loss_fn(g):
        nerf_params = dict(g["heads"], mlp_feat=trunk)
        out = render_patch(
            nerf_params, cfg, jnp.asarray(pose), jnp.asarray(intr),
            coords_j, jnp.asarray(z_near), jnp.asarray(z_far),
            g["latents"]["trans"], g["latents"]["light"],
            jax.random.PRNGKey(0), jnp.asarray(0.42), mode="train",
            compute_dtype=jnp.float32)
        rgb = out["rgb"].reshape(B, P, P, 3).transpose(0, 3, 1, 2)
        unc = out["uncert"].reshape(B, P, P, 1).transpose(0, 3, 1, 2)
        render = (m_s * ((img_s - rgb) ** 2 / unc ** 2)).sum() \
            / (m_s.sum() + 1e-5)
        return (render + uncertainty_reg_loss(out["uncert"])
                + out["trans_density_mean"])

    tx = optax.adam(1e-3)
    opt_state = tx.init(gen)

    @jax.jit
    def step(g, s):
        v, grads = jax.value_and_grad(loss_fn)(g)
        upd, s = tx.update(grads, s, g)
        return optax.apply_updates(g, upd), s, v

    ours_traj = []
    for _ in range(steps):
        gen, opt_state, v = step(gen, opt_state)
        ours_traj.append(float(v))

    np.testing.assert_allclose(np.asarray(ours_traj), np.asarray(ref_traj),
                               rtol=2e-3, atol=2e-5)
    # the latent tables land in the same place too
    np.testing.assert_allclose(np.asarray(gen["latents"]["trans"]), lt0,
                               rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gen["latents"]["light"]), ll0,
                               rtol=5e-3, atol=5e-5)


def test_disc_trainstep_trajectory_parity(ref, rng):
    """TRAJECTORY ORACLE (discriminator side): run the reference's actual
    disc_trainstep semantics — spectral-normed patch Discriminator forward
    on fixed real/fake patches, BCE real/fake losses, R1 input-gradient
    penalty via compute_grad2 (create_graph double-grad), torch RMSprop —
    for 25 CPU steps, and assert our sn_normalize_disc /
    apply_discriminator / gan_loss / vjp-R1 / optax-rmsprop stack tracks
    the loss trajectory from identical weights.  Both sides run float64:
    the R1 double-grad + power iteration amplify f32 rounding into ~1e-2
    trajectory drift by step 10 (measured), while the f64 trajectories
    agree to rtol 1e-6 — i.e. the semantics are exactly equal.

    The reference advances the spectral-norm power-iteration vector u on
    EVERY training-mode forward (torch pre-forward hook), so within one
    disc step the real pass sees u after one iteration and the fake pass
    after two; the oracle mirrors that cadence exactly.  (Production
    batches both passes into one — a documented deliberate delta; u
    converges to the same principal vector either way.)  Reference:
    model/nerf_adapt_st_gan.py:129-171,778-807, layers/discriminator.py,
    optimizer at model/nerf_adapt_st_gan.py:84-87 with
    options/nerf_lm_adapt_gan.yaml:76-79,98-100 loss weights."""
    import torch.nn.functional as torch_F
    from torch import autograd

    sys.path.insert(0, REF)
    from layers import discriminator as ref_disc_mod

    B, steps = 3, 25
    w_reg = 10.0 ** 1          # gan_reg_real: 1 (yaml default); fake reg off
    opt = ref.EasyDict({
        "patch_size": 16, "device": "cpu",
        "gan": {"scale_conditional": True, "geo_conditional": False,
                "geo_c2f": None, "L_nocs": 0, "L_normal": 0, "L_scale": 4},
    })
    torch.manual_seed(3)
    net = ref_disc_mod.Discriminator(opt).double()
    net.train()

    x_real = rng.uniform(size=(B, 3, 16, 16))
    x_fake = rng.uniform(size=(B, 3, 16, 16))
    scales = rng.uniform(0.3, 1.0, (B, 1, 1, 1))

    optim = torch.optim.RMSprop(net.parameters(), lr=1e-4)
    scales_t = torch.from_numpy(scales)
    ref_traj = []
    for _ in range(steps):
        optim.zero_grad()
        xr = torch.from_numpy(x_real).requires_grad_()
        xf = torch.from_numpy(x_fake).requires_grad_()
        d_real = net(opt, xr, scales_t)
        d_fake = net(opt, xf, scales_t)
        loss_r = torch_F.binary_cross_entropy_with_logits(
            d_real, torch.ones_like(d_real))
        loss_f = torch_F.binary_cross_entropy_with_logits(
            d_fake, torch.zeros_like(d_fake))
        # disc_trainstep: weighted real BCE backward (retain), then the R1
        # penalty from the SAME d_real graph, then the fake BCE
        loss_r.backward(retain_graph=True)
        g_in = autograd.grad(d_real.sum(), xr, create_graph=True,
                             retain_graph=True, only_inputs=True)[0]
        reg = g_in.pow(2).view(B, -1).sum(1).mean()
        (w_reg * reg).backward()
        loss_f.backward()
        optim.step()
        ref_traj.append(float(loss_r + loss_f + w_reg * reg))

    # ---- our side ----
    import jax
    import jax.numpy as jnp
    import optax
    from texpose_tpu.utils.config import Config, process_options
    from texpose_tpu.nn.discriminator import (init_discriminator,
                                              apply_discriminator,
                                              sn_normalize_disc)
    from texpose_tpu.models.losses import gan_loss
    from texpose_tpu.models.optim import make_disc_optimizer

    cfg = process_options(Config({
        "patch_size": 16, "gan": dict(opt.gan),
        "data": {"image_size": [16, 16]},
        "optim_disc": {"lr": 1e-4, "algo": "RMSprop"},
    }))

    with jax.enable_x64(True):
        params, state = init_discriminator(jax.random.PRNGKey(0), cfg)

        def port_convs(seq, plist, slist):
            convs = [m for m in seq if isinstance(m, torch.nn.Conv2d)]
            assert len(convs) == len(plist), (len(convs), len(plist))
            for i, (conv, dst) in enumerate(zip(convs, plist)):
                w = conv.weight_orig.detach().numpy().astype(np.float64)
                dst["w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
                slist[i] = jnp.asarray(
                    conv.weight_u.detach().numpy().astype(np.float64))

        # fresh net with the same seed = net's exact starting weights/u
        torch.manual_seed(3)
        net0 = ref_disc_mod.Discriminator(opt)
        port_convs(net0.main, params["main"], state["main"])
        port_convs(net0.final, params["final"], state["final"])

        xr_j, xf_j = jnp.asarray(x_real), jnp.asarray(x_fake)
        scales_j = jnp.asarray(scales)

        def loss_fn(p, s):
            psn1, s1 = sn_normalize_disc(p, s)
            d_real, pull = jax.vjp(
                lambda x: apply_discriminator(psn1, s1, cfg, x, scales_j,
                                              normalized=True)[0], xr_j)
            psn2, s2 = sn_normalize_disc(p, s1)
            d_fake, _ = apply_discriminator(psn2, s2, cfg, xf_j, scales_j,
                                            normalized=True)
            g_in, = pull(jnp.ones_like(d_real))
            reg = (g_in ** 2).reshape(B, -1).sum(axis=1).mean()
            total = (gan_loss(d_real, 1) + gan_loss(d_fake, 0) + w_reg * reg)
            return total, s2

        tx = make_disc_optimizer(cfg, steps, steps)
        opt_state = tx.init(params)

        @jax.jit
        def step(p, s, o):
            (tot, s2), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, s)
            upd, o = tx.update(grads, o, p)
            return optax.apply_updates(p, upd), s2, o, tot

        ours_traj = []
        for _ in range(steps):
            params, state, opt_state, tot = step(params, state, opt_state)
            ours_traj.append(float(tot))

        np.testing.assert_allclose(np.asarray(ours_traj),
                                   np.asarray(ref_traj), rtol=1e-6)
        # the trained weights land in the same place too (first + last conv)
        ref_convs = [m for m in net.main if isinstance(m, torch.nn.Conv2d)]
        for i in (0, len(ref_convs) - 1):
            w_ref = ref_convs[i].weight_orig.detach().numpy() \
                .transpose(2, 3, 1, 0)
            np.testing.assert_allclose(np.asarray(params["main"][i]["w"]),
                                       w_ref, rtol=1e-6, atol=1e-7)


def test_import_reference_checkpoint(ref, rng, tmp_path):
    """tools/import_reference_ckpt: a torch checkpoint saved in the
    reference's exact layout ({epoch, iter, graph} with graph children
    nerf/discriminator/latent_vars_*, util.py:244-263) converts to our
    flat-npz keypaths; every converted leaf equals a direct weight port
    and the result overlays cleanly onto an engine-style state template
    via merge_flat_into_tree (the cfg.init_weights load path)."""
    import importlib.util as iu
    import jax
    import jax.numpy as jnp
    from texpose_tpu.utils.config import Config, process_options
    from texpose_tpu.nn.fields import init_nerf_st
    from texpose_tpu.nn.discriminator import init_discriminator
    from texpose_tpu.utils import checkpoint as ckpt_mod

    sys.path.insert(0, REF)
    from layers import nerf_static_transient_light as ref_st
    from layers import discriminator as ref_disc_mod

    N_train = 5
    opt = _st_opt(ref)
    d_opt = ref.EasyDict({
        "patch_size": 16, "device": "cpu",
        "gan": {"scale_conditional": True, "geo_conditional": False,
                "geo_c2f": None, "L_nocs": 0, "L_normal": 0, "L_scale": 4},
    })
    torch.manual_seed(1)
    net = ref_st.NeRF(opt)
    torch.manual_seed(2)
    disc = ref_disc_mod.Discriminator(d_opt)
    e_t = torch.nn.Embedding(N_train, opt.nerf.N_latent_trans)
    e_l = torch.nn.Embedding(N_train, opt.nerf.N_latent_light)

    graph = {}
    for name, mod in (("nerf", net), ("discriminator", disc),
                      ("latent_vars_trans", e_t), ("latent_vars_light", e_l)):
        for k, v in mod.state_dict().items():
            graph[f"{name}.{k}"] = v
    src = str(tmp_path / "ref_model.ckpt")
    dst = str(tmp_path / "imported.ckpt")
    torch.save({"epoch": 3, "iter": 1234, "graph": graph}, src)

    spec = iu.spec_from_file_location(
        "import_reference_ckpt",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "import_reference_ckpt.py"))
    tool = iu.module_from_spec(spec)
    spec.loader.exec_module(tool)
    flat, leftovers = tool.convert_checkpoint(src, dst)
    assert int(flat["step"]) == 1234
    assert leftovers == [], leftovers

    # converted leaves == a direct port of the same modules
    cfg = process_options(Config({
        "arch": dict(opt.arch), "nerf": dict(opt.nerf),
        "c2f": {"range": [0.1, 0.6], "start": 1},
        "data": {"image_size": [16, 16]},
        "patch_size": 16, "gan": dict(d_opt.gan),
    }))
    params = init_nerf_st(jax.random.PRNGKey(0), cfg)
    _port_linears(list(net.mlp_feat), params["mlp_feat"])
    _port_linears(list(net.mlp_rgb), params["mlp_rgb"])
    _port_linears(list(net.mlp_trans), params["mlp_trans"])
    for head in ("mlp_feat", "mlp_rgb", "mlp_trans"):
        for i, lp in enumerate(params[head]):
            np.testing.assert_array_equal(
                flat[f"params/nerf/{head}/{i}/w"], np.asarray(lp["w"]))
            np.testing.assert_array_equal(
                flat[f"params/nerf/{head}/{i}/b"], np.asarray(lp["b"]))
    for grp, seq in (("main", disc.main), ("final", disc.final)):
        convs = [m for m in seq if isinstance(m, torch.nn.Conv2d)]
        for k, conv in enumerate(convs):
            np.testing.assert_array_equal(
                flat[f"params/disc/{grp}/{k}/w"],
                conv.weight_orig.detach().numpy().transpose(2, 3, 1, 0))
            np.testing.assert_array_equal(
                flat[f"sn_state/{grp}/{k}"],
                conv.weight_u.detach().numpy())
    np.testing.assert_array_equal(flat["latents/trans"],
                                  e_t.weight.detach().numpy())
    np.testing.assert_array_equal(flat["latents/light"],
                                  e_l.weight.detach().numpy())

    # overlays onto an engine-style state template (the init_weights path)
    d_params, sn_state = init_discriminator(jax.random.PRNGKey(1), cfg)
    fresh = init_nerf_st(jax.random.PRNGKey(2), cfg)
    state = {"params": {"nerf": fresh, "disc": d_params},
             "latents": {"trans": jnp.zeros((N_train,
                                             opt.nerf.N_latent_trans)),
                         "light": jnp.zeros((N_train,
                                             opt.nerf.N_latent_light))},
             "sn_state": sn_state, "step": np.int32(0)}
    loaded = ckpt_mod.load_checkpoint_flat(dst)
    merged, n_hit, skipped = ckpt_mod.merge_flat_into_tree(state, loaded)
    assert skipped == [], skipped
    # every non-step leaf of the template got filled from the checkpoint
    n_leaves = len(jax.tree_util.tree_leaves(state))
    assert n_hit == n_leaves, (n_hit, n_leaves)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["nerf"]["mlp_rgb"][0]["w"]),
        np.asarray(params["mlp_rgb"][0]["w"]))
    np.testing.assert_array_equal(np.asarray(merged["latents"]["light"]),
                                  e_l.weight.detach().numpy())


def test_pretrain_env_graph_trajectory_parity(ref, rng):
    """TRAJECTORY ORACLE (env-lighting pretrain — the last un-oracled
    reference Graph): run the reference's actual nerf_pretrain_env Graph
    (GT poses, view-dependent NeRF, render+mask+scale-invariant-depth
    losses, torch Adam with the env variant's PER-ITERATION ExponentialLR)
    for 25 CPU steps and our render/loss/optax stack for the same 25 steps
    from IDENTICAL weights on an identical batch; the loss trajectories
    must track.  Determinism: full-coverage ray set, stratified sampling
    off, density noise off, c2f off.  Reference:
    model/nerf_pretrain_env.py:429-562 (Graph), :59-87 (per-iter
    sched.step), model/base.py:223-231 (scale_invariant_depth_loss),
    options/nerf_lm_env.yaml (view_dep + ExponentialLR via lr_end)."""
    import types as _types

    def _stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = _types.ModuleType(name)
        m.__path__ = []
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    _stub("lpips", LPIPS=lambda **kw: None)
    _stub("kornia")
    _stub("kornia.geometry")
    _stub("kornia.geometry.linalg", inverse_transformation=None)
    _stub("pytorch3d.io", load_obj=None, load_ply=None)
    _stub("plyfile", PlyData=None, PlyElement=None)
    sys.modules["pytorch3d.structures"].Meshes = object
    sys.modules["pytorch3d.loss.chamfer"].chamfer_distance = None
    sys.path.insert(0, REF)
    import model.nerf_pretrain_env as ref_env

    B, H, W, HW, N = 2, 8, 8, 64, 8
    opt = ref.EasyDict({
        "arch": {"layers_feat": [None, 32, 32, 32],
                 "layers_rgb": [None, 32, 3], "skip": [1],
                 "posenc": {"L_3D": 4, "L_view": 2},
                 "density_activ": "softplus", "tf_init": True},
        "nerf": {"view_dep": True, "density_noise_reg": None,
                 "setbg_opaque": None, "mask_obj": True,
                 "depth": {"param": "metric", "scale": 10, "range": [0, 3]},
                 "sample_intvs": N, "sample_stratified": False,
                 "fine_sampling": False, "rand_rays": B * HW},
        "camera": {"ndc": False, "model": "perspective"},
        "loss_weight": {"render": 0, "mask": 0, "depth": 0},
        "data": {"pose_source": "gt", "erode_mask_loss": False},
        "c2f": None, "device": "cpu", "H": H, "W": W,
    })
    torch.manual_seed(3)
    graph = ref_env.Graph(opt)
    # snapshot init weights BEFORE training (numpy) for our side
    w0 = [(lin.weight.detach().numpy().T.copy(),
           lin.bias.detach().numpy().copy())
          for lin in list(graph.nerf.mlp_feat) + list(graph.nerf.mlp_rgb)]

    # env ExponentialLR semantics: gamma from lr_end, sched.step() PER
    # ITERATION (nerf_pretrain_env.py:53-55, :79)
    lr0, lr_end, max_iter = 1e-3, 1e-4, 100
    gamma = (lr_end / lr0) ** (1.0 / max_iter)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **kw: self
    try:
        image = rng.uniform(size=(B, 3, H, W)).astype(np.float32)
        mask = (rng.uniform(size=(B, 1, H, W)) > 0.4).astype(np.float32)
        depth_gt = rng.uniform(2.0, 4.0, size=(B, HW)).astype(np.float32)
        pose = np.tile(np.concatenate(
            [np.eye(3), [[0], [0], [3.0]]], 1)[None], (B, 1, 1)
        ).astype(np.float32)
        intr = np.tile(np.array([[20.0, 0, 4], [0, 20.0, 4], [0, 0, 1]],
                                np.float32)[None], (B, 1, 1))
        z_near = np.full((B, HW), 2.0, np.float32)
        z_far = np.full((B, HW), 4.0, np.float32)

        var = ref.EasyDict({
            "idx": torch.arange(B), "image": t(image),
            "obj_mask": t(mask), "depth_gt": t(depth_gt),
            "pose": t(pose), "pose_init": t(pose),
            "intr": t(intr), "z_near": t(z_near), "z_far": t(z_far),
        })
        # fixed full-coverage ray set (the env sampler repeats one random
        # set across the batch — full coverage makes that deterministic)
        ref_env.Graph.get_ray_idx = staticmethod(
            lambda o, v: (v.update(
                ray_idx=torch.arange(HW).repeat(len(v.idx), 1)) or v))

        steps = 25
        optim = torch.optim.Adam(graph.nerf.parameters(), lr=lr0)
        sched = torch.optim.lr_scheduler.ExponentialLR(optim, gamma)
        ref_traj = []
        for _ in range(steps):
            var = graph.forward(opt, var, mode="train")
            loss = graph.compute_loss(opt, var, mode="train")
            total = loss.render + loss.mask + loss.depth
            optim.zero_grad()
            total.backward()
            optim.step()
            sched.step()
            ref_traj.append(float(total))
    finally:
        torch.Tensor.cuda = orig_cuda

    # ---- our side: same init weights, same batch, same ray set ----
    import jax
    import jax.numpy as jnp
    import optax
    from texpose_tpu.utils.config import Config, process_options
    from texpose_tpu.nn.fields import init_nerf
    from texpose_tpu.models.render import render_rays_nerf, ray_batch_sample
    from texpose_tpu.models.losses import (mse_loss, masked_mse_loss,
                                           scale_invariant_depth_loss)

    cfg = process_options(Config({
        "arch": dict(opt.arch), "nerf": dict(opt.nerf),
        "camera": dict(opt.camera), "c2f": None,
        "data": {"image_size": [H, W]},
        "kernels": {"fused_trunk": False, "fused_coarse": False},
    }))
    params = init_nerf(jax.random.PRNGKey(0), cfg)
    for (w, b), dst in zip(w0, params["mlp_feat"] + params["mlp_rgb"]):
        dst["w"] = jnp.asarray(w)
        dst["b"] = jnp.asarray(b)

    ray_idx = jnp.tile(jnp.arange(HW)[None], (B, 1))
    image_j = jnp.asarray(image).reshape(B, 3, HW).transpose(0, 2, 1)
    mask_j = jnp.asarray(mask).reshape(B, HW, 1)
    depth_j = jnp.asarray(depth_gt).reshape(B, HW, 1)
    img_s = ray_batch_sample(image_j, ray_idx)
    mask_s = ray_batch_sample(mask_j, ray_idx)
    depth_s = ray_batch_sample(depth_j, ray_idx)

    def loss_fn(p):
        out = render_rays_nerf(p, cfg, jnp.asarray(pose), jnp.asarray(intr),
                               ray_idx, jnp.asarray(z_near),
                               jnp.asarray(z_far), jax.random.PRNGKey(0),
                               progress=None, mode="train")
        return (masked_mse_loss(out["rgb"], img_s, mask_s)
                + mse_loss(out["opacity"], mask_s)
                + scale_invariant_depth_loss(out["depth"], depth_s, mask_s))

    tx = optax.adam(optax.exponential_decay(lr0, transition_steps=1,
                                            decay_rate=gamma))
    opt_state = tx.init(params)
    step = jax.jit(lambda p, s: _adam_step(loss_fn, tx, p, s))
    ours_traj = []
    for _ in range(steps):
        (params, opt_state), v = step(params, opt_state)
        ours_traj.append(float(v))

    np.testing.assert_allclose(np.asarray(ours_traj), np.asarray(ref_traj),
                               rtol=2e-3, atol=2e-5)


def test_novel_view_pose_parity(ref, rng):
    """Oracle: novel-view orbit generators and residual-pose composition
    vs the reference (camera.py:373-412) — the video/novel-view path's
    pose math (used by generate_videos_synthesis in every Model)."""
    from texpose_tpu.geometry import pose as G
    import jax.numpy as jnp

    def rand_R():
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        return (q * np.sign(np.linalg.det(q))).astype(np.float32)

    anchor = np.concatenate(
        [rand_R(), rng.normal(size=(3, 1)).astype(np.float32)], 1)

    for motion in ("wild", "gentle"):
        want = ref.camera.get_novel_view_poses(
            None, t(anchor), N=6, scale=1.3, motion=motion).numpy()
        got = np.asarray(G.get_novel_view_poses(
            jnp.asarray(anchor), N=6, scale=1.3, motion=motion))
        np.testing.assert_allclose(got, want, atol=2e-5)

    want = ref.camera.get_novel_view_poses_obj(None, t(anchor), N=8).numpy()
    got = np.asarray(G.get_novel_view_poses_obj(jnp.asarray(anchor), N=8))
    np.testing.assert_allclose(got, want, atol=2e-5)

    B = 4
    refine = np.stack([np.concatenate(
        [rand_R(), 0.1 * rng.normal(size=(3, 1)).astype(np.float32)], 1)
        for _ in range(B)])
    source = np.stack([np.concatenate(
        [rand_R(), rng.normal(size=(3, 1)).astype(np.float32)], 1)
        for _ in range(B)])
    want = ref.camera.compose_pose_residual(t(refine), t(source)).numpy()
    got = np.asarray(G.compose_pose_residual(jnp.asarray(refine),
                                             jnp.asarray(source)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_point_loss_parity(ref, rng):
    """Oracle: the robust Geman-McClure point loss vs the reference
    (model/base.py:233-239) — pins the torch.quantile interpolation and
    the 2×median detached scale."""
    import importlib
    sys.path.insert(0, REF)
    ref_base = importlib.import_module("model.base")
    import jax.numpy as jnp
    from texpose_tpu.models import losses as L

    B, HW = 3, 64
    pred = rng.normal(size=(B, HW, 3)).astype(np.float32)
    target = rng.normal(size=(B, HW, 3)).astype(np.float32)
    mask = (rng.uniform(size=(B, HW, 1)) > 0.3).astype(np.float32)

    self = types.SimpleNamespace()  # unbound method → any self works
    want = float(ref_base.Graph.point_loss(
        self, t(pred), t(target), t(mask)))
    got = float(L.point_loss(jnp.asarray(pred), jnp.asarray(target),
                             jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_sample_depth_inverse_parity(ref, rng):
    """Oracle: deterministic depth sampling in both parametrizations vs
    the reference Graph.sample_depth (model/nerf_pretrain_env.py:641-662,
    identical in every Graph) — pins the inverse 1/(d+1e-8) convention."""
    import importlib
    import types as _types
    for name, attrs in [("lpips", {"LPIPS": lambda **kw: None}),
                        ("kornia", {}), ("kornia.geometry", {}),
                        ("kornia.geometry.linalg",
                         {"inverse_transformation": None}),
                        ("pytorch3d.io", {"load_obj": None,
                                          "load_ply": None}),
                        ("plyfile", {"PlyData": None, "PlyElement": None})]:
        if name not in sys.modules:
            m = _types.ModuleType(name)
            m.__path__ = []
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
    sys.modules["pytorch3d.structures"].Meshes = object
    sys.modules["pytorch3d.loss.chamfer"].chamfer_distance = None
    sys.path.insert(0, REF)
    ref_env = importlib.import_module("model.nerf_pretrain_env")
    import jax
    import jax.numpy as jnp
    from texpose_tpu.ops.render import sample_depth

    B, R, N = 2, 7, 9
    near = rng.uniform(1.0, 2.0, size=(B, R)).astype(np.float32)
    far = near + rng.uniform(0.5, 2.0, size=(B, R)).astype(np.float32)
    for param in ("metric", "inverse"):
        opt = ref.EasyDict({
            "device": "cpu", "H": 1, "W": R,
            "nerf": {"sample_intvs": N, "sample_stratified": False,
                     "depth": {"param": param}},
        })
        want = ref_env.Graph.sample_depth(
            opt, B, (t(near), t(far)), num_rays=R).numpy()
        got = np.asarray(sample_depth(jax.random.PRNGKey(0),
                                      jnp.asarray(near), jnp.asarray(far),
                                      N, stratified=False, param=param))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
