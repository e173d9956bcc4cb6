"""Geometry-pretrain engine: fit a coarse NeRF to synthetic masked crops.

Capability parity with /root/reference/model/nerf_pretrain.py:
  * whole-split per-iteration training (var = train_data.all, :91-92)
  * one shared randperm ray subset per step across all images (:495-501)
  * losses: mask MSE(opacity), scale-invariant depth, masked render MSE
    (:537-586), weighted 10**w (model/base.py:145-157)
  * BARF c2f progress annealing (:74-78)
  * pose source gt-vs-predicted switch for train mode (:503-509)
  * full-frame validate/evaluate with PSNR(+SSIM) and PNG export (:172-239)

TPU-first: the entire iteration — ray choice, stratified sampling, field MLP,
composite, three losses, Adam update — is ONE jitted, state-donating XLA
program; annealed progress and the PRNG key are traced arguments, so the
program compiles exactly once.
"""

from __future__ import annotations

import os

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import optax

from .base import Engine
from .render import render_rays_nerf, render_full_nerf, ray_batch_sample
from .losses import (masked_mse_loss, mse_loss, scale_invariant_depth_loss,
                     summarize_loss)
from ..nn.fields import init_nerf
from ..ops.ssim import ssim
from ..utils.log import log
from ..utils.metrics import mse_to_psnr, write_quant
from ..utils import checkpoint as ckpt


class PretrainEngine(Engine):
    """model=nerf_pretrain equivalent."""

    field_init = staticmethod(init_nerf)
    pose_source_fixed = None       # env variant forces "gt"

    # ------------------------------------------------------------- networks

    def build_networks(self, key=None):
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(cfg.get("seed", 0))
        log.info("building networks...")
        k1, k2 = jax.random.split(key)
        params = {"nerf": self.field_init(k1, cfg)}
        if cfg.nerf.get("fine_sampling"):
            # working hierarchical sampling (the reference only allocates
            # nerf_fine, model/nerf_pretrain.py:454-455)
            params["nerf_fine"] = self.field_init(k2, cfg)
        self.state = dict(params=params)
        return self.state

    def setup_optimizer(self):
        cfg = self.cfg
        # torch-oracled construction (models/optim.py): per-iteration
        # ExponentialLR with the yaml's literal gamma when given (reference
        # model/nerf_pretrain.py:70-72,94 — lr decays by gamma^max_iter,
        # NOT to lr_end), else the env variant's (lr_end/lr)^(1/max_iter)
        from .optim import make_pretrain_optimizer
        self.optimizer = make_pretrain_optimizer(cfg, self.max_iter())
        self.state["opt_state"] = self.optimizer.init(self.state["params"])
        self.state["key"] = jax.random.PRNGKey(self.cfg.get("seed", 0))
        self.state["it"] = jnp.asarray(0, jnp.int32)
        self.step_fn = self._make_train_step()

    # ------------------------------------------------------------ train step

    def get_pose(self, batch, mode):
        source = self.pose_source_fixed or self.cfg.data.pose_source
        if mode == "train" and source == "predicted":
            return batch["pose_init"]
        return batch["pose"]

    def compute_loss(self, cfg, out, batch, ray_idx=None):
        """Shared train/val loss computation (reference :537-586).

        out: render dict (rgb/depth/opacity [B,R,C]); ray_idx None means
        full-frame (validation) tensors.
        """
        B = batch["image"].shape[0]
        HW = cfg.H * cfg.W
        image = batch["image"].reshape(B, 3, HW).transpose(0, 2, 1)
        mask = batch["obj_mask"].reshape(B, HW, 1)
        mask_loss_src = batch.get("erode_mask", batch["obj_mask"]) \
            if cfg.data.get("erode_mask_loss") else batch["obj_mask"]
        mask_obj = mask_loss_src.reshape(B, HW, 1)
        depth_gt = batch["depth_gt"].reshape(B, HW, 1)
        if ray_idx is not None:
            image = ray_batch_sample(image, ray_idx)
            mask = ray_batch_sample(mask, ray_idx)
            mask_obj = ray_batch_sample(mask_obj, ray_idx)
            depth_gt = ray_batch_sample(depth_gt, ray_idx)

        loss = {}
        lw = cfg.loss_weight
        if lw.get("mask") is not None:
            loss["mask"] = mse_loss(out["opacity"], mask)
        if lw.get("depth") is not None:
            loss["depth"] = scale_invariant_depth_loss(
                out["depth"], depth_gt, mask_obj)
        if lw.get("render") is not None:
            if cfg.nerf.get("mask_obj"):
                loss["render"] = masked_mse_loss(out["rgb"], image, mask_obj)
            else:
                loss["render"] = mse_loss(out["rgb"], image)
        if "rgb_fine" in out and lw.get("render_fine") is not None:
            if cfg.nerf.get("mask_obj"):
                loss["render_fine"] = masked_mse_loss(out["rgb_fine"], image,
                                                      mask_obj)
            else:
                loss["render_fine"] = mse_loss(out["rgb_fine"], image)
        return loss

    def _make_train_step(self):
        cfg = self.cfg
        max_iter = self.max_iter()
        B = len(self.train_data)
        HW = cfg.H * cfg.W
        R = max(cfg.nerf.rand_rays // B, 1)
        optimizer = self.optimizer
        use_c2f = cfg.get("c2f") is not None

        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            ray_sharding = NamedSharding(mesh, P(None, "dp"))
            assert R % mesh.shape["dp"] == 0, \
                f"rays-per-image {R} must divide the mesh ({mesh.shape})"

        def loss_fn(params, batch, key, it):
            # key/it arrive from the state pytree — nothing is transferred
            # from the host per step (eager per-step key splits and scalar
            # uploads were measurable dispatch overhead on the tunnel)
            progress = it.astype(jnp.float32) / max_iter if use_c2f else None
            k_perm, k_render = jax.random.split(key)
            ray_idx = jax.random.permutation(k_perm, HW)[:R]
            ray_idx = jnp.broadcast_to(ray_idx[None], (B, R))
            if mesh is not None:
                # DP over the ray axis: each chip renders a ray shard; XLA
                # psums the loss/grad reduction over ICI
                ray_idx = jax.lax.with_sharding_constraint(ray_idx,
                                                           ray_sharding)
            pose = self.get_pose(batch, "train")
            if cfg.nerf.get("fine_sampling"):
                from .render import render_rays_nerf_hierarchical
                out = render_rays_nerf_hierarchical(
                    params, cfg, pose, batch["intr"], ray_idx,
                    batch["z_near"], batch["z_far"], k_render, progress,
                    mode="train", compute_dtype=_compute_dtype(cfg))
            else:
                out = render_rays_nerf(
                    params["nerf"], cfg, pose, batch["intr"], ray_idx,
                    batch["z_near"], batch["z_far"], k_render, progress,
                    mode="train",
                    compute_dtype=_compute_dtype(cfg))
            if mesh is not None:
                out = {k: jax.lax.with_sharding_constraint(v, ray_sharding)
                       for k, v in out.items()}
            loss = self.compute_loss(cfg, out, batch, ray_idx)
            total, loss = summarize_loss(loss, cfg.loss_weight)
            return total, loss

        def step(state, batch):
            key, sub = jax.random.split(state["key"])
            it = state["it"]
            (_, loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"], batch, sub, it)
            updates, opt_state = optimizer.update(
                grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            return dict(params=params, opt_state=opt_state, key=key,
                        it=it + 1), loss

        from .base import finalize_step
        return finalize_step(step, self.scan_k())

    # ------------------------------------------------------------ validation

    def _render_frame(self, params, frame, progress=None):
        """Full-frame render of a single [1,...] batch slice → [1,HW,C] dict.

        With cfg.mesh active the H·W ray axis shard_maps over the device
        mesh (parallel/mesh.py render_full_nerf_sharded — SURVEY §2c
        "sequence"=rays); single-chip otherwise."""
        if not hasattr(self, "_render_jit"):
            cfg = self.cfg
            mesh = self.mesh

            @jax.jit
            def fn(params, pose, intr, z_near, z_far, progress):
                if mesh is not None:
                    from ..parallel import render_full_nerf_sharded
                    return render_full_nerf_sharded(
                        mesh, params, cfg, pose, intr, z_near, z_far,
                        jax.random.PRNGKey(0), progress=progress,
                        compute_dtype=_compute_dtype(cfg))
                return render_full_nerf(
                    params, cfg, pose, intr, z_near, z_far,
                    jax.random.PRNGKey(0),
                    progress=progress, compute_dtype=_compute_dtype(cfg))
            self._render_jit = fn
        progress = jnp.asarray(1.0 if progress is None else progress)
        return self._render_jit(params, frame["pose"], frame["intr"],
                                frame["z_near"], frame["z_far"], progress)

    def validate(self, it):
        cfg = self.cfg
        n = min(len(self.eval_data), cfg.data.get("val_sub") or 1)
        progress = it / self.max_iter() if cfg.get("c2f") is not None else 1.0
        losses = []
        for i in range(n):
            frame = self.eval_frame(i)
            out = self._render_frame(self.state["params"]["nerf"], frame,
                                     progress)
            loss = self.compute_loss(cfg, out, frame)
            _, loss = summarize_loss(loss, cfg.loss_weight)
            losses.append({k: float(np.asarray(v)) for k, v in loss.items()})
        mean = {k: float(np.mean([l[k] for l in losses])) for k in losses[0]}
        if "render" in mean:
            mean["PSNR"] = float(mse_to_psnr(jnp.asarray(mean["render"])))
        self.writer.scalars(it, mean, split="val")
        log.info(f"[val {it}] " + " ".join(f"{k}={v:.4g}"
                                           for k, v in mean.items()))
        return mean

    def _depth_gt_range(self, zs, dmax):
        """Heatmap range for the depth_gt panel (reference
        model/nerf_pretrain.py depth_gt from_range; the env variant
        overrides with fixed fractions of depth.scale)."""
        return (0.7 * zs, dmax)

    def _z_near_range(self, zs, z_near):
        """Heatmap range for the z_near panel."""
        return (0.9 * zs, float(z_near.max()))

    def visualize(self, it, split="train"):
        """Render the first eval frame and dump rgb/depth/opacity panels
        (reference model/nerf_pretrain.py:125-164 TB images, produced as
        PNGs + optional TB here)."""
        from ..utils import vis
        cfg = self.cfg
        frame = self.eval_frame(0)
        progress = it / self.max_iter() if cfg.get("c2f") is not None else 1.0
        out = self._render_frame(self.state["params"]["nerf"], frame,
                                 progress)
        H, W = cfg.H, cfg.W
        rgb = np.asarray(out["rgb"]).reshape(1, H, W, 3).transpose(0, 3, 1, 2)
        depth = np.asarray(out["depth"]).reshape(1, 1, H, W)
        opac = np.asarray(out["opacity"]).reshape(1, 1, H, W)
        image = np.asarray(frame["image"])
        mask = np.asarray(frame["obj_mask"]).reshape(1, 1, H, W)
        # masked display uses the eroded mask when the loss does
        # (reference :128-132)
        lmask = (np.asarray(frame["erode_mask"]).reshape(1, 1, H, W)
                 if cfg.data.get("erode_mask_loss") and "erode_mask" in frame
                 else mask)
        depth_gt = np.asarray(frame["depth_gt"]).reshape(1, 1, H, W)
        z_near = np.asarray(frame["z_near"]).reshape(1, 1, H, W)
        depth_err = np.abs(depth - depth_gt) * mask
        vis_dir = os.path.join(cfg.output_path, "vis")
        zs = cfg.nerf.depth.scale
        dmax = max(float(depth.max()), 1e-6)
        panels = {
            "image": (image, (0, 1), None),
            "rgb": (rgb, (0, 1), None),
            "image_masked": (image * lmask + (1 - lmask), (0, 1), None),
            "pred_mask": (opac, (0, 1), None),
            "gt_mask": (mask, (0, 1), None),
            "depth": (depth * mask, (0.7 * zs, dmax), "plasma"),
            "depth_gt": (depth_gt, self._depth_gt_range(zs, dmax), "plasma"),
            "depth_error": (depth_err,
                            (0, float(np.quantile(depth_err, 0.99))),
                            "turbo"),
            "z_near": (z_near, self._z_near_range(zs, z_near), "plasma"),
        }
        for name, (img, rng, cmap) in panels.items():
            vis.tb_image(self.writer, it, split, name,
                         vis.preprocess_vis_image(img, rng, cmap))
            vis.dump_image_grid(
                os.path.join(vis_dir, f"{it:06d}_{name}.png"), img, rng, cmap)

    # ------------------------------------------------------------ evaluation

    def _eval_metrics_fn(self):
        """Device-side per-frame metrics + PNG payloads in one jit (see
        texture_gan._eval_metrics_fn — same pipeline rationale: only
        scalars + uint8 images cross the tunnel per frame)."""
        if hasattr(self, "_eval_metrics_jit"):
            return self._eval_metrics_jit
        cfg = self.cfg
        lpips_params, _ = self._ensure_lpips()
        from ..nn.lpips import lpips_distance

        @jax.jit
        def fn(rgb_flat, opac_flat, image, obj_mask):
            rgb = rgb_flat.reshape(cfg.H, cfg.W, 3)
            opac = opac_flat.reshape(cfg.H, cfg.W)
            # raw mask values (matches the pre-pipeline host path exactly;
            # dataset masks are {0,1} floats)
            mask = obj_mask.reshape(cfg.H, cfg.W, 1).astype(jnp.float32)
            img = image.reshape(3, cfg.H, cfg.W).transpose(1, 2, 0) * mask
            p = mse_to_psnr(jnp.mean((rgb - img) ** 2))
            rgb_t = rgb.transpose(2, 0, 1)[None]
            img_t = img.transpose(2, 0, 1)[None]
            s = ssim(rgb_t, img_t)
            lp = jnp.mean(lpips_distance(lpips_params, rgb_t * 2 - 1,
                                         img_t * 2 - 1))
            png = (jnp.clip(rgb, 0.0, 1.0) * 255.0
                   ).astype(jnp.uint8)[..., ::-1]
            png_op = (jnp.clip(opac, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            return p, s, lp, png, png_op

        self._eval_metrics_jit = fn
        return fn

    def _eval_compact_transform(self):
        """Compact eval payload for the full-frame pretrain eval: uint8
        image/mask (bitwise-lossless — dataset images are uint8/255 PNGs,
        masks {0,1}) + the f32 z maps the full-frame render reads at every
        pixel; loss-only keys (depth_gt, erode_mask) stay on host.  ~3.7
        vs ~8.6 MB/frame through the tunnel — and the axon client retains
        every uploaded byte for the process lifetime
        (tools/probe_axon_leak.py), so payload bytes are also a host-RSS
        leak rate on long sweeps."""
        if self.mesh is not None or not (
                self.cfg.get("render") or {}).get("eval_compact", True):
            return None

        def transform(sample):
            return {
                "image_u8": np.rint(np.asarray(sample["image"]) * 255.0
                                    ).astype(np.uint8)[None],
                "obj_mask_u8": (np.asarray(sample["obj_mask"]) > 0
                                ).astype(np.uint8)[None],
                "pose": np.asarray(sample["pose"], np.float32)[None],
                "intr": np.asarray(sample["intr"], np.float32)[None],
                "z_near": np.asarray(sample["z_near"], np.float32)[None],
                "z_far": np.asarray(sample["z_far"], np.float32)[None],
                "frame_index": np.asarray(sample["frame_index"],
                                          np.int32)[None],
            }
        return transform

    def _eval_compact_fn(self):
        """ONE jitted dispatch per eval frame: full-frame render + metrics
        + PNG payloads from the compact uint8 payload (same outputs as
        _render_frame → _eval_metrics_fn, one XLA program)."""
        if hasattr(self, "_eval_compact_jit"):
            return self._eval_compact_jit
        cfg = self.cfg
        lpips_params, _ = self._ensure_lpips()
        from ..nn.lpips import lpips_distance

        @jax.jit
        def fn(params, pose, intr, z_near, z_far, image_u8, mask_u8):
            out = render_full_nerf(
                params, cfg, pose, intr, z_near, z_far,
                jax.random.PRNGKey(0), progress=jnp.asarray(1.0),
                compute_dtype=_compute_dtype(cfg))
            rgb = out["rgb"].reshape(cfg.H, cfg.W, 3)
            opac = out["opacity"].reshape(cfg.H, cfg.W)
            mask = mask_u8.reshape(cfg.H, cfg.W, 1).astype(jnp.float32)
            img = image_u8.reshape(3, cfg.H, cfg.W).transpose(1, 2, 0) \
                .astype(jnp.float32) / 255.0 * mask
            p = mse_to_psnr(jnp.mean((rgb - img) ** 2))
            rgb_t = rgb.transpose(2, 0, 1)[None]
            img_t = img.transpose(2, 0, 1)[None]
            s = ssim(rgb_t, img_t)
            lp = jnp.mean(lpips_distance(lpips_params, rgb_t * 2 - 1,
                                         img_t * 2 - 1))
            png = (jnp.clip(rgb, 0.0, 1.0) * 255.0
                   ).astype(jnp.uint8)[..., ::-1]
            png_op = (jnp.clip(opac, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            return p, s, lp, png, png_op

        self._eval_compact_jit = fn
        return fn

    def evaluate_full(self):
        """Render every eval frame, metric it, export PNGs + quant.txt
        (reference model/nerf_pretrain.py:172-239).  Pipelined like
        texture_gan.evaluate_full: prefetch thread + on-device metrics +
        writer-thread PNG encodes, results materialized one frame behind;
        compact uint8 payloads when the route applies."""
        from collections import deque
        from ..utils.pipeline import AsyncWriter
        cfg = self.cfg
        rgb_dir = os.path.join(cfg.output_path, "rgb")
        op_dir = os.path.join(cfg.output_path, "opacity")
        os.makedirs(rgb_dir, exist_ok=True)
        os.makedirs(op_dir, exist_ok=True)
        metrics_fn = self._eval_metrics_fn()
        transform = self._eval_compact_transform()
        rows = [None] * len(self.eval_data)
        pending = deque()

        def _flush_one(writer):
            i, fi, res = pending.popleft()
            p, s, lp, png, png_op = jax.device_get(res)
            rows[i] = {"psnr": float(p), "ssim": float(s),
                       self.lpips_key: float(lp)}
            writer.submit(cv2.imwrite,
                          os.path.join(rgb_dir, f"{fi:06d}.png"),
                          np.ascontiguousarray(png))
            writer.submit(cv2.imwrite,
                          os.path.join(op_dir, f"{fi:06d}.png"),
                          np.ascontiguousarray(png_op))

        with AsyncWriter() as writer:
            for i, frame, sample in self.eval_frames(transform=transform):
                if "image_u8" in frame:
                    res = self._eval_compact_fn()(
                        self.state["params"]["nerf"], frame["pose"],
                        frame["intr"], frame["z_near"], frame["z_far"],
                        frame["image_u8"], frame["obj_mask_u8"])
                else:
                    out = self._render_frame(self.state["params"]["nerf"],
                                             frame)
                    res = metrics_fn(out["rgb"], out["opacity"],
                                     frame["image"], frame["obj_mask"])
                pending.append((i, int(sample["frame_index"]), res))
                if len(pending) >= 2:
                    _flush_one(writer)
            while pending:
                _flush_one(writer)
        mean_psnr = float(np.mean([r["psnr"] for r in rows]))
        mean_ssim = float(np.mean([r["ssim"] for r in rows]))
        log.info(f"PSNR: {mean_psnr:8.2f}")
        log.info(f"SSIM: {mean_ssim:8.2f}")
        write_quant(cfg.output_path, rows)
        return dict(psnr=mean_psnr, ssim=mean_ssim)


    def generate_videos_synthesis(self, N=60, fps=30):
        """Render an N-frame novel-view orbit around the first eval pose and
        write rgb_%d.png / depth_%d.png + optional mp4s via ffmpeg
        (reference model/nerf_pretrain.py:241-305 novel-view path)."""
        import subprocess
        from ..geometry.pose import get_novel_view_poses
        cfg = self.cfg
        novel_path = os.path.join(cfg.output_path, "novel_view")
        os.makedirs(novel_path, exist_ok=True)
        frame = self.eval_frame(0)
        pose_novel = np.asarray(get_novel_view_poses(
            jnp.asarray(frame["pose"][0]), N=N,
            scale=cfg.nerf.depth.scale * 0.03, motion="gentle"))
        # orbit poses saved for downstream pose-estimator supervision
        # (reference :283 novel_pose.npy)
        np.save(os.path.join(novel_path, "novel_pose.npy"), pose_novel)
        zs = cfg.nerf.depth.scale
        for i in range(N):
            f = dict(frame, pose=jnp.asarray(pose_novel[i:i + 1]))
            out = self._render_frame(self.state["params"]["nerf"], f)
            rgb = np.asarray(out["rgb"]).reshape(cfg.H, cfg.W, 3)
            depth = np.asarray(out["depth"]).reshape(cfg.H, cfg.W)
            cv2.imwrite(os.path.join(novel_path, f"rgb_{i}.png"),
                        (np.clip(rgb, 0, 1) * 255)[..., ::-1].astype(np.uint8))
            dvis = np.clip((depth - 0.7 * zs) / (0.6 * zs), 0, 1)
            cv2.imwrite(os.path.join(novel_path, f"depth_{i}.png"),
                        (dvis * 255).astype(np.uint8))
        for kind in ("rgb", "depth"):
            try:
                subprocess.run(
                    ["ffmpeg", "-y", "-framerate", str(fps), "-i",
                     os.path.join(novel_path, f"{kind}_%d.png"),
                     "-pix_fmt", "yuv420p",
                     os.path.join(cfg.output_path,
                                  f"novel_view_{kind}.mp4")],
                    check=True, capture_output=True, timeout=300)
            except (FileNotFoundError, subprocess.SubprocessError):
                log.warn(f"ffmpeg unavailable — kept {kind} PNG frames only")
        return novel_path


class PretrainEnvEngine(PretrainEngine):
    """model=nerf_pretrain_env equivalent: identical skeleton, poses always
    GT (reference model/nerf_pretrain_env.py:483-485), view-dependent field
    config, ExponentialLR gamma from lr_end (:52-57 — same formula as the
    base optimizer here)."""

    pose_source_fixed = "gt"

    def _depth_gt_range(self, zs, dmax):
        # reference model/nerf_pretrain_env.py:119-131 uses fixed
        # (0.6, 0.8)*depth.scale heatmap normalization
        return (0.6 * zs, 0.8 * zs)

    def _z_near_range(self, zs, z_near):
        return (0.6 * zs, 0.8 * zs)


def _compute_dtype(cfg):
    d = cfg.get("compute_dtype", "float32")
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(d)]
