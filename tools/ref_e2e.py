"""End-to-end Model-loop parity: run the REFERENCE's actual Model.train()
pipeline (both stages) on the sphere fixture, then run OUR pipeline on the
same fixture, and compare loss curves + final evaluate_full PSNR.

This is the one parity claim the per-Graph trajectory oracles
(tests/test_reference_parity.py) can't make: the reference's epoch/DataLoader
ordering, latent init, per-epoch scheduler stepping, and the staged
pretrain -> GAN checkpoint handoff (reference model/base.py:87-143,
model/nerf_pretrain.py:80-106, model/nerf_adapt_st_gan.py:173-232,
util.py:202-224 restore_pretrain_partial_checkpoint) executed end-to-end by
the reference's own code on data its own data/lm.py loader reads.

What runs verbatim from /root/reference: options.py (yaml + overrides),
data/lm.py + data/base.py (crops, masks, box ranges, DataLoader),
model/base.py + model/nerf_pretrain.py + model/nerf_adapt_st_gan.py
(Model.train loops, Graphs, losses, optimizers, schedulers, checkpoint
save/restore), external/pohsun_ssim.  What is stubbed (environment-blocked
deps only, same policy as tests/test_reference_parity.py): easydict, visdom,
tensorboard writer, torchvision (re-implemented to_tensor/to_pil_image/
center_crop/make_grid), pytorch3d/plyfile/kornia (unused code paths), lpips
(eval-only metric, returns 0 on both sides), and layers/perceptual_loss.py's
torchvision-VGG19 constructor — replaced by the SAME conv stack loading the
SAME .npz weights our engine loads via cfg.vgg_weights, so the feat loss is
numerically the same function on both sides (reference
layers/perceptual_loss.py:9-45 semantics preserved: ImageNet normalize,
truncate after features[14], MSE on detached real features).

Usage:
  python tools/ref_e2e.py                   # full run, writes REF_E2E.json
  E2E_PRETRAIN_ITERS=120 E2E_GAN_EPOCHS=60 python tools/ref_e2e.py  # quick

Runs entirely on CPU (torch + JAX_PLATFORMS=cpu); never touches the TPU.
"""

import json
import os
import shutil
import sys
import types

# FORCE cpu: the harness environment pre-sets JAX_PLATFORMS=axon (the real
# TPU tunnel, one client at a time) — setdefault would silently leave the
# "ours" stage on the TPU, concurrent with whatever else holds the tunnel
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)

import torch

# ---------------------------------------------------------------- knobs
PRETRAIN_ITERS = int(os.environ.get("E2E_PRETRAIN_ITERS", "800"))
GAN_EPOCHS = int(os.environ.get("E2E_GAN_EPOCHS", "1000"))
N_TRAIN = int(os.environ.get("E2E_NTRAIN", "8"))
N_TEST = int(os.environ.get("E2E_NTEST", "2"))
OUT = os.environ.get("E2E_OUT", "/tmp/ref_e2e")
JSON_OUT = os.environ.get("E2E_JSON", os.path.join(REPO, "REF_E2E.json"))
EVAL_REPEATS = int(os.environ.get("E2E_EVAL_REPEATS", "5"))
SEED = int(os.environ.get("E2E_SEED", "0"))

ARCH_FEAT = [None, 64, 64, 64, 64]
ARCH_RGB = [None, 64, 3]
ARCH_TRANS = [None, 64, 5]
SKIP = [2]
L_3D = 6
SAMPLE_INTVS = 32
RAND_RAYS = 512
BATCH_GAN = 8
PATCH = 16

VGG_NPZ = os.path.join(OUT, "vgg19_rand.npz")

# ---------------------------------------------------------------- stubs


def _stub_module(name, **attrs):
    if name in sys.modules:
        m = sys.modules[name]
    else:
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


class _EasyDict(dict):
    """dict with attribute access (the reference's easydict contract)."""

    def __init__(self, d=None, **kw):
        super().__init__()
        for k, v in dict(d or {}, **kw).items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _EasyDict):
            v = _EasyDict(v)
        super().__setitem__(k, v)

    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


def _to_tensor(pic):
    """torchvision.transforms.functional.to_tensor for HWC uint8/float
    ndarrays and PIL images (the only inputs the reference data layer
    passes)."""
    import PIL.Image
    if isinstance(pic, PIL.Image.Image):
        pic = np.array(pic)
    arr = np.asarray(pic)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
    if t.dtype == torch.uint8:
        t = t.float().div(255.0)
    else:
        t = t.float()
    return t


def _to_pil_image(t):
    import PIL.Image
    arr = t.detach().cpu().numpy()
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
    arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    return PIL.Image.fromarray(arr)


def _center_crop(t, size):
    h, w = t.shape[-2:]
    th, tw = (size, size) if isinstance(size, int) else size
    i, j = (h - th) // 2, (w - tw) // 2
    return t[..., i:i + th, j:j + tw]


def _make_grid(t, nrow=8, pad_value=0.0, **kw):
    return t[0] if t.ndim == 4 else t


class _NoopWriter:
    def __init__(self, *a, **kw):
        pass

    def __getattr__(self, name):
        return lambda *a, **kw: None


class _LPIPSStub(torch.nn.Module):
    def __init__(self, *a, **kw):
        super().__init__()

    def to(self, *a, **kw):
        return self

    def forward(self, a, b):
        return torch.zeros(())


def _build_vgg_npz(path, seed=42):
    """He-init VGG19-features weights (through torchvision index 14) in the
    torch state-dict layout both sides load: our nn/vgg.py load_vgg19_npz and
    the reference-side PerceptualLoss below."""
    convs = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
             (10, 128, 256), (12, 256, 256), (14, 256, 256)]
    rng = np.random.RandomState(seed)
    data = {}
    for idx, cin, cout in convs:
        std = np.sqrt(2.0 / (9 * cin))
        data[f"features.{idx}.weight"] = (
            rng.randn(cout, cin, 3, 3).astype(np.float32) * std)
        data[f"features.{idx}.bias"] = np.zeros(cout, np.float32)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **data)
    return path


def _torch_vgg_from_npz(path, final_layer=14):
    """torchvision.models.vgg19().features[:final_layer+1] equivalent built
    from the npz — conv/relu with maxpools at torch indices 4 and 9."""
    data = np.load(path)
    seq = torch.nn.Sequential()
    conv_idx = [0, 2, 5, 7, 10, 12, 14]
    pool_idx = {4, 9}
    for i in range(final_layer + 1):
        if i in conv_idx:
            w = torch.from_numpy(data[f"features.{i}.weight"])
            b = torch.from_numpy(data[f"features.{i}.bias"])
            conv = torch.nn.Conv2d(w.shape[1], w.shape[0], 3, padding=1)
            with torch.no_grad():
                conv.weight.copy_(w)
                conv.bias.copy_(b)
            seq.add_module(str(i), conv)
        elif i in pool_idx:
            seq.add_module(str(i), torch.nn.MaxPool2d(2, 2))
        else:
            seq.add_module(str(i), torch.nn.ReLU(inplace=False))
    return seq


class _RefPerceptualLoss(torch.nn.Module):
    """Reference layers/perceptual_loss.py:9-45 with the torchvision
    pretrained-VGG19 constructor swapped for the shared npz weights (the
    only environment-blocked piece)."""

    def __init__(self, type="l2", reduction="mean", final_layer=14):
        super().__init__()
        self.model = _torch_vgg_from_npz(VGG_NPZ, final_layer)
        self.model.eval()
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        self.normalize = lambda x: (x - mean.to(x.device)) / std.to(x.device)
        if type == "l1":
            self.criterion = torch.nn.L1Loss(reduction=reduction)
        elif type == "l2":
            self.criterion = torch.nn.MSELoss(reduction=reduction)
        else:
            raise NotImplementedError

    def __call__(self, fakeIm, realIm):
        f_fake = self.model.forward(self.normalize(fakeIm))
        f_real = self.model.forward(self.normalize(realIm))
        return self.criterion(f_fake, f_real.detach())


class _RefLabLossStub(torch.nn.Module):
    """Constructed by the reference Graph but never called (loss_weight.lab
    is None in the GAN yaml)."""

    def forward(self, *a, **kw):
        raise NotImplementedError("lab loss is off in this comparison")


def install_stubs():
    _stub_module("easydict", EasyDict=_EasyDict)
    _stub_module("visdom", Visdom=_NoopWriter)
    _stub_module("ipdb", set_trace=lambda *a, **k: None)
    # tensorboard writer (torch.utils.tensorboard needs the tensorboard pkg)
    try:
        import torch.utils.tensorboard  # noqa: F401
    except Exception:
        _stub_module("torch.utils.tensorboard", SummaryWriter=_NoopWriter)
    tv = _stub_module("torchvision")
    tr = _stub_module("torchvision.transforms")
    trf = _stub_module("torchvision.transforms.functional",
                       to_tensor=_to_tensor, to_pil_image=_to_pil_image,
                       center_crop=_center_crop,
                       hflip=lambda t: torch.flip(t, [-1]))
    tvu = _stub_module("torchvision.utils", make_grid=_make_grid)
    tvm = _stub_module("torchvision.models")
    tv.transforms = tr
    tv.utils = tvu
    tv.models = tvm
    tr.functional = trf

    class _ColorJitter:
        @staticmethod
        def get_params(*a, **kw):
            raise NotImplementedError("augment off in this comparison")

    tr.ColorJitter = _ColorJitter
    # pytorch3d / plyfile / kornia: imported at module top, unused at runtime
    _stub_module("pytorch3d")
    _stub_module("pytorch3d.io", load_obj=None, load_ply=None)
    _stub_module("pytorch3d.structures", Meshes=object)
    _stub_module("pytorch3d.structures.pointclouds", Pointclouds=object)
    _stub_module("pytorch3d.loss")
    _stub_module("pytorch3d.loss.chamfer", chamfer_distance=None,
                 _validate_chamfer_reduction_inputs=None,
                 _handle_pointcloud_input=None)
    _stub_module("pytorch3d.ops", interpolate_face_attributes=None)
    _stub_module("pytorch3d.ops.knn", knn_gather=None, knn_points=None)
    # tools/__init__.py star-imports mvrenderer → the full pytorch3d
    # renderer surface must exist as inert names (same set as
    # tests/test_reference_parity.py)
    _stub_module("pytorch3d.io", load_obj=None, load_ply=None, IO=object,
                 ply_io=None)
    _stub_module("pytorch3d.renderer", PerspectiveCameras=object,
                 RasterizationSettings=object, MeshRenderer=object,
                 MeshRasterizer=object, SoftSilhouetteShader=object,
                 SoftPhongShader=object, AmbientLights=object,
                 HardPhongShader=object)
    _stub_module("pytorch3d.renderer.mesh")
    _stub_module("pytorch3d.renderer.mesh.renderer",
                 MeshRendererWithFragments=object)
    _stub_module("pytorch3d.renderer.mesh.rasterizer", Fragments=object)
    _stub_module("pytorch3d.renderer.blending", BlendParams=object,
                 softmax_rgb_blend=None)
    _stub_module("pytorch3d.transforms", matrix_to_rotation_6d=None,
                 rotation_6d_to_matrix=None)
    _stub_module("plyfile", PlyData=None, PlyElement=None)
    _stub_module("kornia")
    _stub_module("kornia.geometry")
    _stub_module("kornia.geometry.linalg", inverse_transformation=None)
    _stub_module("kornia.geometry.conversions",
                 angle_axis_to_rotation_matrix=None)
    _stub_module("kornia.color", rgb_to_lab=None)
    _stub_module("lpips", LPIPS=_LPIPSStub)
    # the two environment-blocked loss layers, swapped for shared-weight
    # equivalents BEFORE model.* imports resolve them
    _stub_module("layers.perceptual_loss", PerceptualLoss=_RefPerceptualLoss)
    _stub_module("layers.lab_loss", LabLoss=_RefLabLossStub)


# ------------------------------------------------------------ ref driver


def _ref_options(model, yaml_name, workdir, overrides):
    import options as ref_options
    opt_cmd = sys.modules["easydict"].EasyDict(
        dict(model=model, yaml=yaml_name, **overrides))
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        opt = ref_options.set(opt_cmd=opt_cmd)
    finally:
        os.chdir(cwd)
    # keys the reference supplies on its CLI (options.py safe_check would
    # interactively prompt for them, so set them after options.set)
    if "c2f" not in opt:
        opt["c2f"] = None
    return opt


def _common_overrides(data_root, output_root):
    return {
        "group": "E2E", "seed": SEED, "cpu": True,
        "output_root": output_root,
        "data": {"root": data_root, "object": "ball", "scene": "scene_e2e",
                 "num_workers": 2},
        "arch": {"layers_feat": ARCH_FEAT, "layers_rgb": ARCH_RGB,
                 "skip": SKIP, "posenc": {"L_3D": L_3D}},
        "nerf": {"sample_intvs": SAMPLE_INTVS, "rand_rays": RAND_RAYS},
        "freq": {"scalar": 100, "vis": 10 ** 9, "val": 10 ** 9,
                 "ckpt": 10 ** 9},
        "tb": None, "visdom": None,
    }


def run_ref_pretrain(workdir, data_root, output_root):
    install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    over = _common_overrides(data_root, output_root)
    over["max_iter"] = PRETRAIN_ITERS
    over["name"] = "pretrain"
    opt = _ref_options("nerf_pretrain", "nerf_lm_pretrain", workdir, over)

    import importlib
    import util as ref_util
    model_mod = importlib.import_module("model.nerf_pretrain")
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **kw: self
    cwd = os.getcwd()
    os.chdir(workdir)   # split paths are cwd-relative in data/lm.py
    try:
        m = model_mod.Model(opt)
        m.load_dataset(opt)
        m.build_networks(opt)
        m.setup_optimizer(opt)
        m.restore_checkpoint(opt)
        m.tb = _NoopWriter()

        # record the loss curve through the REAL train loop
        curve = []
        orig_ti = model_mod.Model.train_iteration

        def traced_ti(self, opt, var, loader):
            loss = orig_ti(self, opt, var, loader)
            curve.append(float(loss.all.detach()))
            return loss

        model_mod.Model.train_iteration = traced_ti
        try:
            m.train(opt)
        finally:
            model_mod.Model.train_iteration = orig_ti
        m.save_checkpoint(opt, ep=None, it=opt.max_iter)
        # the reference user workflow: hand-place the pretrain ckpt where
        # restore_pretrain_partial_checkpoint looks (util.py:205)
        shutil.copy(os.path.join(opt.output_path, "model.ckpt"),
                    os.path.join(output_root, "E2E", "pretrain_model.ckpt"))
        m.graph.eval()
        m.evaluate_full(opt)
        psnr = _read_quant(os.path.join(opt.output_path, "quant.txt"))
    finally:
        os.chdir(cwd)
        torch.Tensor.cuda = orig_cuda
    return {"curve": curve, "eval_psnr": psnr}


def run_ref_gan(workdir, data_root, output_root):
    install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    over = _common_overrides(data_root, output_root)
    over["name"] = "gan"
    over["max_epoch"] = GAN_EPOCHS
    over["batch_size"] = BATCH_GAN
    over["patch_size"] = PATCH
    over["resume_pretrain"] = True
    over["arch"]["layers_trans"] = ARCH_TRANS
    over["arch"]["posenc"]["L_view"] = 4
    over["nerf"]["N_latent_trans"] = 16
    over["nerf"]["N_latent_light"] = 48
    opt = _ref_options("nerf_adapt_st_gan", "nerf_lm_adapt_gan", workdir,
                       over)

    import importlib
    model_mod = importlib.import_module("model.nerf_adapt_st_gan")
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **kw: self
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        m = model_mod.Model(opt)
        m.load_dataset(opt)
        m.build_networks(opt)
        m.setup_optimizer(opt)
        m.restore_pretrained_checkpoint(opt)
        m.restore_checkpoint(opt)
        m.tb = _NoopWriter()

        curve = []
        orig_ti = model_mod.Model.train_iteration

        def traced_ti(self, opt, var, loader):
            gloss, dloss = orig_ti(self, opt, var, loader)
            curve.append(float(gloss.all.detach()))
            return gloss, dloss

        model_mod.Model.train_iteration = traced_ti
        try:
            m.train(opt)
        finally:
            model_mod.Model.train_iteration = orig_ti

        # evaluate_full repeats: the anchor protocol random-picks among the
        # top-3 nearest train latents per frame (nerf_adapt_st_gan.py:487-502)
        # — average the pick noise out
        psnrs = []
        for _ in range(EVAL_REPEATS):
            m.evaluate_full(opt)
            psnrs.append(_read_quant(os.path.join(opt.output_path,
                                                  "quant.txt")))
    finally:
        os.chdir(cwd)
        torch.Tensor.cuda = orig_cuda
    return {"curve": curve, "eval_psnr": float(np.mean(psnrs)),
            "eval_psnr_all": psnrs}


def _read_quant(path):
    rows = [line.split() for line in open(path) if line.strip()]
    return float(np.mean([float(r[1]) for r in rows]))


# ------------------------------------------------------------ our driver


def run_ours(data_root, output_root):
    """Our actual pipeline (the same engine surface train.py drives) with
    configs matched key-for-key to the reference overrides above."""
    from texpose_tpu.utils.config import load_yaml, process_options
    from texpose_tpu.models.pretrain import PretrainEngine
    from texpose_tpu.models.texture_gan import TextureGANEngine

    def _cfg(yaml_name, name, **extra):
        cfg = load_yaml(os.path.join(REPO, "configs", yaml_name))
        cfg.yaml = "x"
        cfg = process_options(cfg)
        cfg.data.splits_root = os.path.join(data_root, "splits")
        cfg.group = "E2E"
        cfg.name = name
        cfg.seed = SEED
        cfg.output_root = output_root
        cfg.data.root = data_root
        cfg.data.object = "ball"
        cfg.data.scene = "scene_e2e"
        cfg.arch.layers_feat = list(ARCH_FEAT)
        cfg.arch.layers_rgb = list(ARCH_RGB)
        cfg.arch.skip = list(SKIP)
        cfg.arch.posenc.L_3D = L_3D
        cfg.nerf.sample_intvs = SAMPLE_INTVS
        cfg.nerf.rand_rays = RAND_RAYS
        cfg.freq.val = 10 ** 9
        cfg.freq.ckpt = 10 ** 9
        cfg.freq.vis = 10 ** 9
        for k, v in extra.items():
            parts = k.split(".")
            tgt = cfg
            for p in parts[:-1]:
                tgt = tgt[p]
            tgt[parts[-1]] = v
        return process_options(cfg)

    curves = {}
    # ---- stage 1: pretrain
    cfg = _cfg("nerf_lm_pretrain.yaml", "pretrain",
               **{"max_iter": PRETRAIN_ITERS,
                  "nerf.depth.box_source": "gt_box"})
    eng = PretrainEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    K = eng.scan_k()
    curve = []
    for it in range(0, PRETRAIN_ITERS, K):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        curve.append(float(np.asarray(loss["all"])))
    curves["pretrain"] = curve
    ev = eng.evaluate_full()
    pre_psnr = float(ev["psnr"])
    eng.save_checkpoint(it=PRETRAIN_ITERS)
    pre_dir = os.path.join(output_root, "E2E", "pretrain")
    shutil.copy(os.path.join(pre_dir, "model.ckpt"),
                os.path.join(output_root, "E2E", "pretrain_model.ckpt"))
    del eng

    # ---- stage 2: texture GAN, trunk restored from stage 1
    cfg = _cfg("nerf_lm_adapt_gan.yaml", "gan",
               **{"max_epoch": GAN_EPOCHS, "batch_size": BATCH_GAN,
                  "patch_size": PATCH,
                  "arch.layers_trans": list(ARCH_TRANS),
                  "nerf.N_latent_trans": 16, "nerf.N_latent_light": 48,
                  "nerf.depth.box_source": "pred_box_init_calib",
                  "resume_pretrain": True,
                  "vgg_weights": VGG_NPZ,
                  "render.light": "anchor"})
    n_iters = GAN_EPOCHS * N_TRAIN // BATCH_GAN
    cfg.max_iter = n_iters
    eng = TextureGANEngine(cfg)
    eng.load_dataset()
    eng.build_networks()
    eng.setup_optimizer()
    eng.restore_pretrained_checkpoint()
    K = eng.scan_k()
    curve = []
    for it in range(0, n_iters, K):
        eng.state, loss = eng.step_fn(eng.state, eng.train_batch)
        curve.append(float(np.asarray(loss["all"])))
    curves["gan"] = curve
    psnrs = []
    for r in range(EVAL_REPEATS):
        eng.cfg.render.eval_seed = r    # vary the anchor protocol's pick
        psnrs.append(float(eng.evaluate_full()["psnr"]))
    return {"pretrain_curve": curves["pretrain"],
            "pretrain_eval_psnr": pre_psnr,
            "gan_curve": curves["gan"],
            "gan_eval_psnr": float(np.mean(psnrs)),
            "gan_eval_psnr_all": psnrs}


# ------------------------------------------------------------------ main


def main():
    os.makedirs(OUT, exist_ok=True)
    workdir = os.path.join(OUT, "refwork")
    data_root = os.path.join(OUT, "data")
    ref_out = os.path.join(OUT, "ref_output")
    ours_out = os.path.join(OUT, "ours_output")
    os.makedirs(os.path.join(workdir), exist_ok=True)
    os.makedirs(os.path.join(ref_out, "E2E"), exist_ok=True)
    os.makedirs(os.path.join(ours_out, "E2E"), exist_ok=True)

    # fixture (written by our package; pure numpy/cv2 — no jax touched yet)
    from texpose_tpu.data.fixture import generate_fixture
    if not os.path.isdir(os.path.join(data_root, "lm", "000001")):
        print("generating fixture...", flush=True)
        generate_fixture(data_root, n_train=N_TRAIN, n_test=N_TEST,
                         scene="scene_e2e", fixed_light=True, seed=0)
    _build_vgg_npz(VGG_NPZ)

    # reference workdir: its options/ tree + the fixture's splits
    for link, target in [("options", os.path.join(REF, "options")),
                         ("splits", os.path.join(data_root, "splits")),
                         ("external", os.path.join(REF, "external"))]:
        p = os.path.join(workdir, link)
        if not os.path.exists(p):
            os.symlink(target, p)

    stage = os.environ.get("E2E_STAGE", "all")
    # stages ACCUMULATE into JSON_OUT (each ref stage is ~20-30 CPU-min —
    # a later kill or a staged re-run must not lose completed results)
    results = {}
    if os.path.exists(JSON_OUT):
        with open(JSON_OUT) as f:
            results = json.load(f)
    results["config"] = {"pretrain_iters": PRETRAIN_ITERS,
                         "gan_epochs": GAN_EPOCHS, "n_train": N_TRAIN,
                         "n_test": N_TEST, "seed": SEED,
                         "arch_feat": ARCH_FEAT, "rand_rays": RAND_RAYS,
                         "sample_intvs": SAMPLE_INTVS,
                         "eval_repeats": EVAL_REPEATS}

    def _dump():
        with open(JSON_OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {JSON_OUT}", flush=True)

    if stage in ("all", "ref", "ref_pretrain"):
        print("=== reference pretrain (real Model.train) ===", flush=True)
        results["ref_pretrain"] = run_ref_pretrain(workdir, data_root,
                                                   ref_out)
        print(f"ref pretrain: final loss "
              f"{results['ref_pretrain']['curve'][-1]:.4f} "
              f"eval PSNR {results['ref_pretrain']['eval_psnr']:.2f}",
              flush=True)
        _dump()
    if stage in ("all", "ref", "ref_gan"):
        print("=== reference GAN (real Model.train) ===", flush=True)
        results["ref_gan"] = run_ref_gan(workdir, data_root, ref_out)
        print(f"ref gan: final loss {results['ref_gan']['curve'][-1]:.4f} "
              f"eval PSNR {results['ref_gan']['eval_psnr']:.2f}", flush=True)
        _dump()
    if stage in ("all", "ours"):
        print("=== ours (engine pipeline) ===", flush=True)
        results["ours"] = run_ours(data_root, ours_out)
        print(f"ours pretrain: eval PSNR "
              f"{results['ours']['pretrain_eval_psnr']:.2f}; "
              f"gan eval PSNR {results['ours']['gan_eval_psnr']:.2f}",
              flush=True)

    if "ref_pretrain" in results and "ref_gan" in results \
            and "ours" in results:
        # signed delta = ours − ref; the parity claim is "match OR BEAT",
        # so the gate is one-sided: ours may not be WORSE than the
        # reference by more than 0.5 dB (being better passes).
        dp = (results["ours"]["pretrain_eval_psnr"]
              - results["ref_pretrain"]["eval_psnr"])
        dg = (results["ours"]["gan_eval_psnr"]
              - results["ref_gan"]["eval_psnr"])
        results["delta_pretrain_psnr"] = dp
        results["delta_gan_psnr"] = dg
        results["band_db"] = 0.5
        results["gate_pretrain"] = dp >= -0.5
        results["gate_gan"] = dg >= -0.5
        print(f"Δpretrain {dp:+.3f} dB (gate {results['gate_pretrain']}), "
              f"Δgan {dg:+.3f} dB (gate {results['gate_gan']})", flush=True)

    _dump()


if __name__ == "__main__":
    main()
