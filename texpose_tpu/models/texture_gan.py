"""Texture-GAN learner: the flagship engine.

Capability parity with /root/reference/model/nerf_adapt_st_gan.py:
  * static/transient/light NeRF on real crops under predicted poses, frozen
    geometry trunk (:54-60, layers/nerf_static_transient_light.py)
  * per-image trainable latent tables: transient 16-d, light 48-d (:56-60)
  * FlexPatchSampler patch rays (:430-434) + grid-sampled supervision
  * patch GAN with scale+geometry conditioning (:505-513), alternating
    generator/discriminator steps with R1-style grad penalty (:108-171)
  * losses: uncertainty-weighted render, uncert reg, transient reg,
    VGG perceptual, Lab, GAN (:712-792)
  * eval-time light-latent selection by top-k rotation distance (:487-502)
  * full-frame synthesis w/ white-bg mask fill + PSNR/SSIM(+LPIPS) and
    PNG export (:319-383)

TPU-first design (deliberate deltas):
  * ONE jitted train step contains the generator update AND the
    discriminator update (two optax states) — replacing two .backward()
    passes + toggle_grad; "freezing" is structural: each loss_fn only
    receives the params it trains, the other side enters via closure with
    stop_gradient semantics (jax.grad w.r.t. the first arg only).
  * the per-step batch is gathered on-device from the prefetched whole-split
    pytree with a random choice — no DataLoader processes.
  * spectral-norm power-iteration vectors are explicit state threaded
    through the step.
  * patch-scale anneal + discriminator c2f progress are traced scalars.
"""

from __future__ import annotations

import os

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import optax

from .base import Engine
from .render import render_full_nerf_st
from .losses import (gan_loss, lab_loss, mse_loss, summarize_loss,
                     uncertainty_reg_loss, wgan_gp_reg)
from ..nn.fields import init_nerf_st
from ..nn.discriminator import (init_discriminator, apply_discriminator,
                                sn_normalize_disc)
from ..nn.vgg import (init_vgg19, load_vgg19_npz, perceptual_loss_pairs)
from ..ops.grid_sample import grid_sample, grid_sample_table
from ..ops.ssim import ssim
from ..sampling.patch import flex_patch_coords, current_scale_bounds
from ..sampling.ray_sampler import get_rays, get_bounds
from ..utils.log import log
from ..utils.metrics import mse_to_psnr, write_quant
from ..utils import vis
from .pretrain import _compute_dtype


def render_patch(nerf_params, cfg, pose, intr, coords, z_near, z_far,
                 latent_trans, latent_light, key, progress, mode,
                 compute_dtype=None, z_tables=None, idx=None):
    """Patch-coordinate render (reference render() train path :547-631).

    coords [B,h,w,2] in [-1,1] → composite dict with [B,hw,C] leaves plus
    'density' [B,hw,N,2'].

    With ``z_tables=(z_near_all, z_far_all)`` ([N,HW] whole-split tables) and
    ``idx`` [B], the depth bounds are sampled straight out of the tables
    (frame index composed into the pixel gather) instead of materializing the
    gathered [B,HW] maps — see grid_sample_table.  ``z_near``/``z_far`` are
    ignored in that mode.
    """
    B, h, w, _ = coords.shape
    center, ray = get_rays(intr, coords, pose, cfg.H, cfg.W)
    center = center.reshape(B, h * w, 3)
    ray = ray.reshape(B, h * w, 3)
    if z_tables is not None:
        zn_all, zf_all = z_tables
        Nf = zn_all.shape[0]
        zn_all = zn_all.reshape(Nf, 1, cfg.H, cfg.W).astype(jnp.float32)
        zf_all = zf_all.reshape(Nf, 1, cfg.H, cfg.W).astype(jnp.float32)
        near = grid_sample_table(zn_all, idx, coords, "bilinear",
                                 align_corners=True)[:, 0]
        far = grid_sample_table(zf_all, idx, coords, "bilinear",
                                align_corners=True)[:, 0]
    else:
        near, far = get_bounds(coords, z_near, z_far, cfg.H, cfg.W)
    near = near.reshape(B, h * w)
    far = far.reshape(B, h * w)
    from .render import render_st_core
    return render_st_core(nerf_params, cfg, center, ray, near, far,
                          latent_trans, latent_light, key, progress, mode,
                          compute_dtype, want_density=True)


def sample_patch_images(cfg, batch, coords, tables=None, idx=None):
    """Grid-sample supervision signals at patch coords
    (reference compute_loss :726-731 + sample_geometry :444-461).

    Returns dict of [B,C,h,w]: image, image_syn (bilinear, align=True);
    mask, mask_syn (nearest); nocs/normal (bilinear·mask_syn).

    With ``tables`` (whole-split [N,...] pixel tables) and ``idx`` [B], each
    signal is sampled straight out of its table via grid_sample_table — the
    per-step [B,C,H,W] frame gathers never materialize (they showed up as a
    full-step HLO hotspot: gather + layout transposes to read h·w px/frame).
    Math is identical: masks here are {0,positive} so binarize-after-sample
    equals sample-after-binarize for nearest mode, and out-of-bounds reads
    are zero in both paths.
    """
    B = coords.shape[0]
    H, W = cfg.H, cfg.W
    if tables is not None:
        def samp(key, mode, align=False):
            t = tables[key]
            if t.ndim != 4:
                t = t.reshape(t.shape[0], 1, H, W)
            return grid_sample_table(t, idx, coords, mode,
                                     align_corners=align)
        out = {
            "image": samp("image", "bilinear", True),
            "mask": (samp("obj_mask", "nearest") > 0).astype(jnp.float32),
        }
        if "image_syn" in tables:
            out["image_syn"] = samp("image_syn", "bilinear", True)
            out["mask_syn"] = (samp("mask_syn", "nearest") > 0).astype(
                jnp.float32)
        else:
            out["image_syn"] = out["image"]
            out["mask_syn"] = out["mask"]
        if "nocs_pred" in tables:
            out["nocs"] = samp("nocs_pred", "bilinear", True) \
                * out["mask_syn"]
            out["normal"] = samp("normal_pred", "bilinear", True) \
                * out["mask_syn"]
        return out
    image = batch["image"]
    obj_mask = (batch["obj_mask"] > 0).astype(jnp.float32).reshape(B, 1, H, W)
    out = {
        "image": grid_sample(image, coords, "bilinear", align_corners=True),
        "mask": grid_sample(obj_mask, coords, "nearest"),
    }
    if "image_syn" in batch:
        mask_syn = (batch["mask_syn"] > 0).astype(jnp.float32).reshape(B, 1, H, W)
        out["image_syn"] = grid_sample(batch["image_syn"], coords, "bilinear",
                                       align_corners=True)
        out["mask_syn"] = grid_sample(mask_syn, coords, "nearest")
    else:
        out["image_syn"] = out["image"]
        out["mask_syn"] = out["mask"]
    if "nocs_pred" in batch:
        nocs = grid_sample(batch["nocs_pred"], coords, "bilinear",
                           align_corners=True)
        normal = grid_sample(batch["normal_pred"], coords, "bilinear",
                             align_corners=True)
        out["nocs"] = nocs * out["mask_syn"]
        out["normal"] = normal * out["mask_syn"]
    return out


class TextureGANEngine(Engine):
    """model=nerf_adapt_st_gan equivalent."""

    # ------------------------------------------------------------------ data

    def make_dataset(self, split):
        if self.cfg.get("syn2real"):
            # full-frame dataset for BOTH splits, like the reference's
            # dataset_name = dataset + 'syn2real' (:34-38)
            from ..data.lmsyn2real import LineMODSyn2RealDataset
            return LineMODSyn2RealDataset(
                self.cfg, split=split,
                subset=self._split_subset(split),
                multi_obj=self.cfg.data.get("multi_obj", False),
                splits_root=self.cfg.data.get("splits_root", "splits"))
        return super().make_dataset(split)

    def load_dataset(self, eval_split="val", prefetch_train=True):
        super().load_dataset(eval_split=eval_split,
                             prefetch_train=prefetch_train)
        self.pose_anchor = np.asarray(
            self.train_data.get_all_camera_poses(source="gt"))

    # ------------------------------------------------------------- networks

    def build_networks(self, key=None):
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(cfg.get("seed", 0))
        k_nerf, k_disc, k_lt, k_ll, k_vgg = jax.random.split(key, 5)
        log.info("building networks (st-nerf + discriminator + latents)...")
        params = {"nerf": init_nerf_st(k_nerf, cfg)}
        sn_state = None
        if cfg.get("gan") is not None:
            params["disc"], sn_state = init_discriminator(k_disc, cfg)
        N = len(self.train_data)
        latents = {
            "trans": jax.random.normal(k_lt, (N, cfg.nerf.N_latent_trans)),
            "light": jax.random.normal(k_ll, (N, cfg.nerf.N_latent_light)),
        }
        vgg_path = cfg.get("vgg_weights")
        if vgg_path and os.path.exists(str(vgg_path)):
            self.vgg_params = load_vgg19_npz(str(vgg_path))
            log.info(f"loaded VGG19 weights from {vgg_path}")
        else:
            self.vgg_params = init_vgg19(k_vgg)
            if self.cfg.loss_weight.get("feat") is not None:
                log.warn("no vgg_weights provided — perceptual loss uses "
                         "random (fixed) features")
        self.state = dict(params=params, latents=latents, sn_state=sn_state)
        if cfg.render.get("latent_ema"):
            # EMA shadow of the latent tables, read by the eval protocols:
            # mitigates the slow per-image latent drift behind the
            # long-horizon PSNR decline (CLAUDE.md ablations) without
            # touching training dynamics
            self.state["latents_ema"] = jax.tree_util.tree_map(
                jnp.array, latents)
        return self.state

    def max_iter(self):
        cfg = self.cfg
        if cfg.get("max_iter"):
            return int(cfg.max_iter)
        return int(cfg.max_epoch * len(self.train_data) // cfg.batch_size)

    def setup_optimizer(self):
        cfg = self.cfg
        max_iter = self.max_iter()
        steps_per_epoch = max(len(self.train_data) // cfg.batch_size, 1)
        # torch-oracled construction (models/optim.py;
        # tests/test_optim_parity.py)
        from .optim import make_generator_optimizer, make_disc_optimizer
        self.opt_nerf = make_generator_optimizer(cfg, max_iter,
                                                 steps_per_epoch)
        # only the heads + latents train — the trunk is frozen (reference
        # freezes via requires_grad=False + no_grad; here it is excluded
        # from BOTH the grad computation and the optimizer, so its vjp is
        # never even built)
        gen_params = {"heads": self._trainable_heads(),
                      "latents": self.state["latents"]}
        self.state["opt_nerf"] = self.opt_nerf.init(gen_params)
        if cfg.get("gan") is not None:
            self.opt_disc = make_disc_optimizer(cfg, max_iter,
                                                steps_per_epoch)
            self.state["opt_disc"] = self.opt_disc.init(
                self.state["params"]["disc"])
        self.state["key"] = jax.random.PRNGKey(cfg.get("seed", 0))
        self.state["it"] = jnp.asarray(0, jnp.int32)
        self.step_fn = self._make_train_step()

    # ------------------------------------------------------------ train step

    def _trainable_heads(self):
        return {k: v for k, v in self.state["params"]["nerf"].items()
                if k != "mlp_feat"}

    def _make_train_step(self):
        cfg = self.cfg
        max_iter = self.max_iter()
        B = int(cfg.batch_size)
        N = len(self.train_data)
        lw = cfg.loss_weight
        use_gan = cfg.get("gan") is not None
        dtype = _compute_dtype(cfg)
        vgg_params = self.vgg_params
        patch_cfg = cfg.get("patch", {})
        nbr_table = None
        if lw.get("latent_nbr_reg") is not None:
            # static pose-neighborhood table (train poses are fixed); k
            # matches the eval protocol's N_candidate
            nbr_table = jnp.asarray(self._pose_neighbor_table(
                int(cfg.render.N_candidate)))

        def gen_forward(gen_params, trunk, disc_params, sn_state, batch,
                        tables, idx, coords, scales, key, progress):
            latent_trans = gen_params["latents"]["trans"][idx]
            latent_light = gen_params["latents"]["light"][idx]
            nerf_params = dict(gen_params["heads"], mlp_feat=trunk)
            pose = batch["pose_init"] if cfg.data.pose_source == "predicted" \
                else batch["pose"]
            z_tables = None
            if tables is not None and "z_near" in tables:
                z_tables = (tables["z_near"], tables["z_far"])
            out = render_patch(
                nerf_params, cfg, pose, batch["intr"], coords,
                batch.get("z_near"), batch.get("z_far"), latent_trans,
                latent_light, key, progress, mode="train",
                compute_dtype=dtype, z_tables=z_tables, idx=idx)
            h = w = int(cfg.patch_size)
            rgb = out["rgb"].reshape(B, h, w, 3).transpose(0, 3, 1, 2)
            uncert = out["uncert"].reshape(B, h, w, 1).transpose(0, 3, 1, 2)
            sup = sample_patch_images(cfg, batch, coords, tables=tables,
                                      idx=idx)

            loss = {}
            mask, image = sup["mask"], sup["image"]
            if lw.get("render") is not None:
                if cfg.nerf.get("mask_obj"):
                    loss["render"] = (mask * ((image - rgb) ** 2
                                              / uncert ** 2)).sum() \
                        / (mask.sum() + 1e-5)
                else:
                    loss["render"] = mse_loss(rgb, image)
            if lw.get("mask") is not None:
                opac = out["opacity"].reshape(B, h, w, 1).transpose(0, 3, 1, 2)
                loss["mask"] = mse_loss(opac, mask)
            if lw.get("uncert") is not None:
                loss["uncert"] = uncertainty_reg_loss(out["uncert"])
            if lw.get("trans_reg") is not None:
                # provided by BOTH composite branches (fused reduces it
                # in-kernel; plain computes density[...,-1].mean())
                loss["trans_reg"] = out["trans_density_mean"]
            if lw.get("latent_reg") is not None:
                # L2 on the per-image latent rows in the batch: keeps the
                # light/transient embeddings in-distribution so eval-time
                # anchor selection stays meaningful (TPU-native extension;
                # counteracts long-horizon latent divergence — see CLAUDE.md
                # "Open questions" r1)
                loss["latent_reg"] = ((latent_trans ** 2).mean()
                                      + (latent_light ** 2).mean())
            if lw.get("latent_nbr_reg") is not None:
                # pose-aware drift arrest (TPU-native extension): pull each
                # batch image's latents toward the stop-gradient mean of its
                # POSE-NEIGHBORHOOD's latents — the exact quantity the
                # topk_mean eval protocol reads (:487-502 robustified).
                # Unlike the global latent_reg L2 (which shrinks toward 0
                # and measured weak), this penalizes only the spread that
                # hurts eval.
                nt = nbr_table[idx]                       # [B, k]
                nm_l = jax.lax.stop_gradient(
                    gen_params["latents"]["light"][nt].mean(axis=1))
                nm_t = jax.lax.stop_gradient(
                    gen_params["latents"]["trans"][nt].mean(axis=1))
                loss["latent_nbr_reg"] = (
                    ((latent_light - nm_l) ** 2).mean()
                    + ((latent_trans - nm_t) ** 2).mean())
            if lw.get("feat") is not None:
                mask_pad = ((sup["mask_syn"] == 1) & (mask == 0)).astype(
                    rgb.dtype)
                # VGG convs run in the engine compute dtype (bf16 default)
                # with f32 accumulation — same policy as the render core
                loss["feat"] = perceptual_loss_pairs(vgg_params, [
                    (rgb, image * mask + sup["image_syn"] * mask_pad, 1.0),
                    (rgb * mask + image * (1 - mask), image, 5.0)],
                    dtype=dtype)
            if lw.get("lab") is not None:
                loss["lab"], _, _ = lab_loss(rgb, sup["image_syn"],
                                             mask=sup["mask_syn"])
            if use_gan and lw.get("gan_nerf") is not None:
                patch_fake = rgb
                if cfg.gan.geo_conditional:
                    patch_fake = jnp.concatenate(
                        [rgb, sup["nocs"], sup["normal"]], axis=1)
                d_fake, _ = apply_discriminator(
                    jax.lax.stop_gradient(disc_params), sn_state, cfg,
                    patch_fake, scales, progress, training=False)
                loss["gan_nerf"] = gan_loss(d_fake, 1, cfg.gan.type)
            total, loss = summarize_loss(loss, lw)
            return total, (loss, rgb, sup)

        def disc_loss_fn(disc_params, sn_state, patch_real, patch_fake,
                         scales, progress, key):
            # ONE discriminator pass over [real; fake] (the standalone
            # 16×16-patch conv stack is dispatch-bound — batching halves the
            # launches; spectral norm sees a single power iteration, exactly
            # like the reference's per-step double forward would after one
            # update).  Weights are spectrally normalized ONCE and reused by
            # the R1 / WGAN-GP passes below — the per-pass w/σ buffers were
            # an HLO hotspot (sn_normalize_disc docstring).
            psn, sn2 = sn_normalize_disc(disc_params, sn_state)
            both = jnp.concatenate([patch_real, patch_fake], axis=0)
            scales2 = jnp.concatenate([scales, scales], axis=0)

            def d_apply(x):
                return apply_discriminator(psn, sn2, cfg, x, scales2,
                                           progress, normalized=True)[0]

            need_r = lw.get("gan_reg_real") is not None
            need_f = lw.get("gan_reg_fake") is not None
            if need_r or need_f:
                # ONE forward serves both the GAN loss and the R1 input-grad
                # (vjp reuses the forward residuals; the old separate
                # jax.grad re-ran the full D forward)
                d_both, d_pullback = jax.vjp(d_apply, both)
            else:
                d_both = d_apply(both)
            d_real, d_fake = d_both[:B], d_both[B:]
            loss = {
                "gan_disc_real": gan_loss(d_real, 1, cfg.gan.type),
                "gan_disc_fake": gan_loss(d_fake, 0, cfg.gan.type),
            }
            total = (10.0 ** float(lw.gan_disc_real) * loss["gan_disc_real"]
                     + 10.0 ** float(lw.gan_disc_fake) * loss["gan_disc_fake"])
            # R1-style penalties: ∇ of D(x).sum() w.r.t. the input patch
            # (reference compute_grad2 :794-807, applied in disc_trainstep).
            # One input-grad over the concatenated batch serves both halves.
            if need_r or need_f:
                sel = jnp.concatenate([
                    jnp.full((B,), 1.0 if need_r else 0.0),
                    jnp.full((B,), 1.0 if need_f else 0.0)]).astype(
                    d_both.dtype)
                g, = d_pullback(sel)
                if need_r:
                    reg = (g[:B] ** 2).reshape(B, -1).sum(axis=1).mean()
                    loss["gan_reg_real"] = reg
                    total = total + 10.0 ** float(lw.gan_reg_real) * reg
                if need_f:
                    reg = (g[B:] ** 2).reshape(B, -1).sum(axis=1).mean()
                    loss["gan_reg_fake"] = reg
                    total = total + 10.0 ** float(lw.gan_reg_fake) * reg
            # WGAN-GP: gradient penalty at random real/fake interpolates
            # (reference wgan_gp_reg, model/nerf_adapt_st_gan.py:828-835).
            if cfg.gan.type == "wgan" and lw.get("gan_gp") is not None:
                gp = wgan_gp_reg(
                    lambda x: apply_discriminator(
                        disc_params, sn_state, cfg, x, scales,
                        progress)[0],
                    key, patch_real, patch_fake)
                loss["gan_gp"] = gp
                total = total + 10.0 ** float(lw.gan_gp) * gp
            return total, (loss, sn2)

        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            dp = NamedSharding(mesh, P("dp"))
            assert B % mesh.shape["dp"] == 0, \
                f"batch_size {B} must divide the mesh ({mesh.shape})"

        kcfg = cfg.get("kernels", {})
        direct_table = kcfg.get("direct_table")
        if direct_table is None:
            direct_table = os.environ.get(
                "TEXPOSE_DIRECT_TABLE", "0") not in ("0", "", "false")
        # whole-split pixel tables eligible for direct-table sampling: the
        # per-step x[idx] gather of these [N,C,H,W] leaves (to read h·w
        # px/frame) showed as a full-step HLO hotspot (gather + layout
        # transposes) — but the composed scattered per-pixel gather measured
        # WORSE on v5e: interleaved same-process A/B (tools/ab_direct_table)
        # = +0.57 ms/step vs the full-frame gather (6.12 vs 5.56), so the
        # default stays off; the path is kept (proven bitwise-equivalent)
        # for shapes where the frame gather dominates
        table_keys = ("image", "image_syn", "obj_mask", "mask_syn",
                      "nocs_pred", "normal_pred", "z_near", "z_far")
        # timing-only ablation knobs (env, never config): used by
        # tools/ab_cfg.py --env:... to price step stages IN SITU (the r3
        # lesson: isolated probes and cross-process deltas mislead at
        # <0.3 ms).  Both change training semantics — A/B timing only.
        #   TEXPOSE_DEBUG_PREGATHER=1  fixed first-B batch, no per-step
        #                              random choice + whole-split gather
        #   TEXPOSE_DEBUG_NO_OPT=1     generator grads computed but the
        #                              Adam/schedule update skipped
        dbg_pregather = os.environ.get("TEXPOSE_DEBUG_PREGATHER") == "1"
        dbg_no_opt = os.environ.get("TEXPOSE_DEBUG_NO_OPT") == "1"

        def step(state, batch_all):
            # key/it live in the state — zero per-step host transfers
            key, k_batch, k_patch, k_render, k_gp = jax.random.split(
                state["key"], 5)
            it = state["it"]
            progress = it.astype(jnp.float32) / max_iter
            idx = jax.random.choice(k_batch, N, (B,), replace=B > N)
            tables = None
            gathered = batch_all
            if direct_table:
                # z tables must be per-pixel maps ([N,HW]) for the composed
                # gather; scalar-range datasets fall back to x[idx] for them
                tables = {k: v for k, v in batch_all.items()
                          if k in table_keys
                          and not (k in ("z_near", "z_far") and v.ndim < 2)}
                gathered = {k: v for k, v in batch_all.items()
                            if k not in tables}
            if dbg_pregather:
                idx = jnp.arange(B, dtype=jnp.int32)
                batch = jax.tree_util.tree_map(lambda x: x[:B], gathered)
            else:
                batch = jax.tree_util.tree_map(lambda x: x[idx], gathered)
            if mesh is not None:
                # DP over the patch-batch axis: one patch render + disc
                # column per chip; grads psum over ICI
                batch = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(x, dp), batch)
            coords, scales = flex_patch_coords(
                k_patch, B, int(cfg.patch_size), iteration=it,
                min_scale=patch_cfg.get("min_scale", 0.25),
                max_scale=patch_cfg.get("max_scale", 1.0),
                scale_anneal=patch_cfg.get("scale_anneal", 0.0002))
            if mesh is not None:
                coords = jax.lax.with_sharding_constraint(coords, dp)
                scales = jax.lax.with_sharding_constraint(scales, dp)

            # ---- generator (heads + latents) step; trunk frozen ----
            trunk = state["params"]["nerf"]["mlp_feat"]
            gen_params = {"heads": {k: v for k, v in
                                    state["params"]["nerf"].items()
                                    if k != "mlp_feat"},
                          "latents": state["latents"]}
            grads, (gloss, rgb, sup) = jax.grad(
                gen_forward, has_aux=True)(
                gen_params, trunk, state["params"].get("disc"),
                state["sn_state"], batch, tables, idx, coords, scales,
                k_render, progress)
            if dbg_no_opt:
                # consume grads so the bwd still runs; skip the update
                opt_nerf = state["opt_nerf"]
                gen_params = jax.tree_util.tree_map(
                    lambda p, g: p + 0.0 * g, gen_params, grads)
            else:
                updates, opt_nerf = self.opt_nerf.update(
                    grads, state["opt_nerf"], gen_params)
                gen_params = optax.apply_updates(gen_params, updates)
            new_state = dict(state)
            new_state["params"] = dict(state["params"],
                                       nerf=dict(gen_params["heads"],
                                                 mlp_feat=trunk))
            new_state["latents"] = gen_params["latents"]
            new_state["opt_nerf"] = opt_nerf
            ema_d = cfg.render.get("latent_ema")
            if ema_d:
                new_state["latents_ema"] = jax.tree_util.tree_map(
                    lambda e, l: ema_d * e + (1.0 - ema_d) * l,
                    state["latents_ema"], gen_params["latents"])

            # ---- discriminator step (reuses the pre-update render) ----
            dloss = {}
            if use_gan:
                rgb_d = jax.lax.stop_gradient(rgb)
                mask, mask_syn = sup["mask"], sup["mask_syn"]
                mask_pad = ((mask_syn == 1) & (mask == 0)).astype(rgb_d.dtype)
                patch_real = sup["image"] * mask + rgb_d * mask_pad
                patch_fake = rgb_d
                if cfg.gan.geo_conditional:
                    patch_real = jnp.concatenate(
                        [patch_real, sup["nocs"], sup["normal"]], axis=1)
                    patch_fake = jnp.concatenate(
                        [patch_fake, sup["nocs"], sup["normal"]], axis=1)
                dgrads, (dloss, sn2) = jax.grad(
                    disc_loss_fn, has_aux=True)(
                    state["params"]["disc"], state["sn_state"], patch_real,
                    patch_fake, scales, progress, k_gp)
                dupd, opt_disc = self.opt_disc.update(
                    dgrads, state["opt_disc"], state["params"]["disc"])
                new_state["params"]["disc"] = optax.apply_updates(
                    state["params"]["disc"], dupd)
                new_state["opt_disc"] = opt_disc
                new_state["sn_state"] = sn2

            new_state["key"] = key
            new_state["it"] = it + 1
            loss_out = dict(gloss)
            loss_out.update(dloss)
            return new_state, loss_out

        from .base import finalize_step
        return finalize_step(step, self.scan_k())

    def rays_per_step(self):
        return int(self.cfg.batch_size) * int(self.cfg.patch_size) ** 2

    # -------------------------------------------------------------- val/eval

    def _pose_neighbor_table(self, k):
        """[N, k] int32: for every train image, the k nearest train images
        by geodesic rotation distance (self included at distance 0) — the
        pose neighborhood the topk_mean eval protocol averages over."""
        R = self.pose_anchor[:, :, :3]
        Rd = R[:, None] @ np.swapaxes(R[None], -2, -1)
        tr = Rd[..., 0, 0] + Rd[..., 1, 1] + Rd[..., 2, 2]
        d = np.arccos(np.clip((tr - 1) / 2, -1 + 1e-7, 1 - 1e-7))
        np.fill_diagonal(d, 0.0)
        k = min(int(k), d.shape[0])
        return np.argsort(d, axis=1)[:, :k].astype(np.int32)

    def _anchor_distances(self, pose):
        """Host-side geodesic rotation distance to every anchor pose —
        numpy so the per-frame eval loop pays zero device round trips
        (same math as geometry.pose.rotation_distance)."""
        Rd = pose[None, :, :3] @ np.swapaxes(
            self.pose_anchor[:, :, :3], -2, -1)
        tr = Rd[..., 0, 0] + Rd[..., 1, 1] + Rd[..., 2, 2]
        return np.arccos(np.clip((tr - 1) / 2, -1 + 1e-7, 1 - 1e-7))

    def _select_light_latent(self, pose, k=None, rng=None):
        """Top-k rotation-distance anchor poses → random pick among them
        (reference :487-502)."""
        k = k or int(self.cfg.render.N_candidate)
        cand = np.argsort(self._anchor_distances(np.asarray(pose)))[:k]
        rng = rng or np.random.default_rng(0)
        return int(cand[rng.integers(len(cand))])

    def _eval_latents_table(self):
        """Latent tables read by the eval protocols: the EMA shadow when
        cfg.render.latent_ema is active (long-horizon drift mitigation),
        else the live training tables (reference behavior)."""
        return self.state.get("latents_ema") or self.state["latents"]

    def _host_latents_table(self):
        """One-shot host pull of the eval latent tables (they are constant
        for the duration of an eval sweep)."""
        return {k: np.asarray(v)
                for k, v in dict(self._eval_latents_table()).items()}

    def _latent_norm_z(self, tab):
        """Robust per-row latent-norm z-scores (median/MAD) per table —
        the statistic the drift monitor alarms on; the topk_robust eval
        protocol uses it to reject drifted rows before averaging.  A plain
        z-score saturates at sqrt(N-1) for a single extreme outlier, so it
        could NEVER flag the exact failure mode this watches for (one
        drifted row)."""
        out = {}
        for name, t in tab.items():
            norms = np.linalg.norm(np.asarray(t), axis=1)
            med = float(np.median(norms))
            mad = float(np.median(np.abs(norms - med)))
            out[name] = np.abs(norms - med) / (1.4826 * mad + 1e-6)
        return out

    def _topk_latents(self, pose, k=None, tab=None, mode="mean"):
        """Aggregate of the top-k nearest-pose latents.  Robust extension of
        the reference's random-pick-among-top-k (:487-502): measured on the
        64-view fixed-light fixture, a single drifted per-image latent costs
        the anchor protocol ~4.6 dB at 20k steps while the averaged latent
        stays flat (CLAUDE.md, long-horizon ablations).

        ``mode`` selects the aggregator (== the suffix of render.light):
        * "mean"   — plain mean (render.light=topk_mean)
        * "median" — per-dimension median over the k candidates; robust to
          <k/2 drifted rows with no threshold to tune
        * "robust" — drop candidates whose latent-norm robust-z (the drift
          monitor's statistic) exceeds render.topk_z (default 6.0), then
          mean the survivors.  Identical to "mean" on a clean table.  The
          z-filter needs >=8 table rows (MAD is noise below that — a 4-row
          random init measured z~8); smaller tables fall back to "mean".

        Pure host numpy; pass ``tab`` (from _host_latents_table) to amortize
        the device→host latent pull over a sweep."""
        k = k or int(self.cfg.render.N_candidate)
        cand = np.argsort(self._anchor_distances(np.asarray(pose)))[:k]
        if tab is None:
            tab = self._host_latents_table()
        if mode == "median":
            ll = np.median(tab["light"][cand], axis=0, keepdims=True)
            lt = np.median(tab["trans"][cand], axis=0, keepdims=True)
            return lt.astype(tab["trans"].dtype), ll.astype(tab["light"].dtype)
        if mode == "robust" and len(tab["light"]) >= 8:
            z = self._latent_norm_z(tab)
            zmax = np.maximum(z["light"][cand], z["trans"][cand])
            keep = zmax <= float(self.cfg.render.get("topk_z") or 6.0)
            if not keep.any():
                keep = zmax == zmax.min()
            cand = cand[keep]
        elif mode not in ("mean", "robust"):
            raise ValueError(f"unknown topk latent mode '{mode}'")
        ll = tab["light"][cand].mean(axis=0, keepdims=True)
        lt = tab["trans"][cand].mean(axis=0, keepdims=True)
        return lt, ll

    def _render_frame_st(self, frame, latent_trans, latent_light,
                         masked=True, obj_host=None):
        """Full-frame render.  With masked=True and sparse object coverage,
        only object rays render (bucketed static shapes) and defaults fill
        the rest — the reference's mask-prior acceleration
        (model/nerf_adapt_st_gan.py:652-679) made jit-static.

        obj_host: optional host copy of the frame's object mask — the
        bucketed-route decision needs it on host, and reading it from the
        device frame costs a per-frame device→host transfer through the
        TPU tunnel."""
        cfg = self.cfg
        obj = np.asarray(frame["obj_mask"] if obj_host is None
                         else obj_host).reshape(-1)
        coverage = float((obj > 0).mean())
        chunk = int(cfg.nerf.rand_rays)
        if self.mesh is not None:
            # cfg.mesh active → ray-axis shard_map over the device mesh
            # (SURVEY §2c "sequence"=rays; parallel/mesh.py).  With sparse
            # object coverage the BUCKETED object-ray set shards (each chip
            # renders a slice of the padded index set, not of H·W) —
            # multi-chip eval stays strictly cheaper than single-chip.
            if masked and 0 < coverage < 0.5:
                return self._render_frame_st_sharded_masked(
                    frame, latent_trans, latent_light, obj, chunk)
            return self._render_frame_st_sharded(frame, latent_trans,
                                                 latent_light, masked)
        if masked and 0 < coverage < 0.5:
            from .render import (masked_ray_indices, render_rays_masked_st,
                                 scatter_masked_st)
            idx_p, _n = masked_ray_indices(obj, chunk)
            cachekey = ("masked", len(idx_p))
            if not hasattr(self, "_render_jits"):
                self._render_jits = {}
            if cachekey not in self._render_jits:
                @jax.jit
                def fn(params, pose, intr, z_near, z_far, lt, ll, idx):
                    return render_rays_masked_st(
                        params, cfg, pose, intr, idx, z_near, z_far, lt, ll,
                        jax.random.PRNGKey(0), progress=jnp.asarray(1.0),
                        compute_dtype=_compute_dtype(cfg), chunk=chunk)
                self._render_jits[cachekey] = fn
            out = self._render_jits[cachekey](
                self.state["params"]["nerf"], frame["pose"], frame["intr"],
                frame["z_near"], frame["z_far"], latent_trans, latent_light,
                jnp.asarray(idx_p))
            return scatter_masked_st(cfg, out, jnp.asarray(idx_p), _n,
                                     (frame["obj_mask"] > 0).astype(
                                         jnp.float32))
        if not hasattr(self, "_render_jit"):
            @jax.jit
            def fn(params, pose, intr, z_near, z_far, lt, ll, obj_mask):
                return render_full_nerf_st(
                    params, cfg, pose, intr, z_near, z_far, lt, ll,
                    jax.random.PRNGKey(0), progress=jnp.asarray(1.0),
                    compute_dtype=_compute_dtype(cfg),
                    obj_mask=obj_mask)
            self._render_jit = fn
        obj_mask = (frame["obj_mask"].reshape(1, -1) > 0).astype(jnp.float32) \
            if masked else jnp.ones((1, cfg.H * cfg.W), jnp.float32)
        return self._render_jit(self.state["params"]["nerf"], frame["pose"],
                                frame["intr"], frame["z_near"],
                                frame["z_far"], latent_trans, latent_light,
                                obj_mask)

    def _render_frame_st_sharded_masked(self, frame, latent_trans,
                                        latent_light, obj, chunk):
        """Multi-chip masked render: the padded object-ray index set shards
        over the mesh (parallel.render_masked_nerf_st_sharded); defaults
        fill the background exactly like the single-chip bucketed path."""
        cfg = self.cfg
        from ..parallel import (masked_ray_indices_sharded,
                                render_masked_nerf_st_sharded)
        from .render import scatter_masked_st
        idx_p, _n = masked_ray_indices_sharded(obj, chunk,
                                               self.mesh.shape["dp"])
        cachekey = ("sharded_masked", len(idx_p))
        if not hasattr(self, "_render_jits"):
            self._render_jits = {}
        if cachekey not in self._render_jits:
            mesh = self.mesh

            @jax.jit
            def fn(params, pose, intr, z_near, z_far, lt, ll, idx):
                return render_masked_nerf_st_sharded(
                    mesh, params, cfg, pose, intr, z_near, z_far, lt, ll,
                    jax.random.PRNGKey(0), idx, progress=jnp.asarray(1.0),
                    compute_dtype=_compute_dtype(cfg), chunk=chunk)
            self._render_jits[cachekey] = fn
        out = self._render_jits[cachekey](
            self.state["params"]["nerf"], frame["pose"], frame["intr"],
            frame["z_near"], frame["z_far"], latent_trans, latent_light,
            jnp.asarray(idx_p))
        return scatter_masked_st(cfg, out, jnp.asarray(idx_p), _n,
                                 (frame["obj_mask"] > 0).astype(jnp.float32))

    def _render_frame_st_sharded(self, frame, latent_trans, latent_light,
                                 masked=True):
        """Multi-chip full-frame render: rays shard over the mesh, outputs
        assemble via the shard_map out_spec (the lazy all_gather); the
        reference's mask-fill defaults apply afterwards, matching the
        single-chip path (tested for equality in tests/test_parallel.py)."""
        cfg = self.cfg
        if not hasattr(self, "_render_jit_sharded"):
            from ..parallel import render_full_nerf_st_sharded
            mesh = self.mesh

            @jax.jit
            def fn(params, pose, intr, z_near, z_far, lt, ll, obj_mask):
                return render_full_nerf_st_sharded(
                    mesh, params, cfg, pose, intr, z_near, z_far, lt, ll,
                    jax.random.PRNGKey(0), progress=jnp.asarray(1.0),
                    compute_dtype=_compute_dtype(cfg), obj_mask=obj_mask)
            self._render_jit_sharded = fn
        obj_mask = (frame["obj_mask"].reshape(1, -1) > 0).astype(jnp.float32) \
            if masked else jnp.ones((1, cfg.H * cfg.W), jnp.float32)
        return self._render_jit_sharded(
            self.state["params"]["nerf"], frame["pose"], frame["intr"],
            frame["z_near"], frame["z_far"], latent_trans, latent_light,
            obj_mask)

    def validate(self, it):
        """Full-frame validation with the main loss suite (reference
        validate → compute_loss(mode='val') :712-777 + val PSNR :241-245;
        latents of image 0, like the reference's render val path :595).

        ``cfg.render.val_light`` (default off — reference parity) switches
        the val latents to an eval protocol — any ``topk_*`` aggregator or
        ``mean`` — so the val curve tracks the same quantity the quality
        gate measures (per-image latent drift is invisible to the image-0
        protocol).  Unknown values raise."""
        cfg = self.cfg
        n = min(len(self.eval_data), cfg.data.get("val_sub") or 1)
        val_light = cfg.render.get("val_light")
        if val_light not in (None, "mean") \
                and not str(val_light).startswith("topk_"):
            raise ValueError(f"unknown render.val_light '{val_light}'")
        lt = self.state["latents"]["trans"][0:1]
        ll = self.state["latents"]["light"][0:1]
        tab = self._host_latents_table() if val_light else None
        if val_light == "mean":
            lt = tab["trans"].mean(axis=0, keepdims=True)
            ll = tab["light"].mean(axis=0, keepdims=True)
        rows = []
        for i in range(n):
            frame = self.eval_frame(i)
            if val_light and val_light.startswith("topk_"):
                lt, ll = self._topk_latents(np.asarray(frame["pose"])[0],
                                            tab=tab, mode=val_light[5:])
            out = self._render_frame_st(frame, lt, ll)
            mask = (frame["obj_mask"] > 0).astype(jnp.float32).reshape(1, -1, 1)
            image = frame["image"].reshape(1, 3, -1).transpose(0, 2, 1)
            mse = mse_loss(out["rgb"], image * mask)
            row = {"PSNR": float(mse_to_psnr(mse))}
            if cfg.loss_weight.get("render") is not None:
                row["render"] = float(
                    (mask * ((image - out["rgb"]) ** 2 / out["uncert"] ** 2)
                     ).sum() / (mask.sum() + 1e-5))
            if cfg.loss_weight.get("uncert") is not None:
                row["uncert"] = float(uncertainty_reg_loss(out["uncert"]))
            rows.append(row)
        mean = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
        self.writer.scalars(it, mean, split="val")
        log.info("[val %d] %s" % (it, " ".join(f"{k}={v:.4g}"
                                               for k, v in mean.items())))
        if cfg.render.get("drift_monitor", True):
            self.monitor_latent_drift(it)
        return mean

    def monitor_latent_drift(self, it, z_thresh=6.0, psnr_drop_db=1.0):
        """Latent-drift telemetry (VERDICT r4 item 4): per-image latent
        norms + every eval protocol's val PSNR, logged to metrics.jsonl
        (split 'drift') each freq.val, with an alarm when a latent norm
        goes z_thresh sigmas off its table or the topk-k protocol falls
        psnr_drop_db below its best-so-far.  The r2/r3 drift was invisible
        until a 20k-step QUAL run; this makes it a training-time signal."""
        cfg = self.cfg
        tab = self._host_latents_table()
        rec = {}
        alarms = []
        zs = self._latent_norm_z(tab)
        for name, t in tab.items():
            norms = np.linalg.norm(np.asarray(t), axis=1)
            z = zs[name]
            z_max = float(z.max())
            rec[f"latent_{name}_norm_mean"] = float(norms.mean())
            rec[f"latent_{name}_norm_max"] = float(norms.max())
            rec[f"latent_{name}_z_max"] = z_max
            # MAD is noise at tiny tables (a 4-row random init alarmed at
            # z≈8); the alarm needs ≥8 rows, telemetry is always logged
            if z_max > z_thresh and len(norms) >= 8:
                alarms.append(f"latent_{name} robust-z={z_max:.1f} "
                              f"(row {int(z.argmax())})")
        # per-protocol val PSNR on the first eval frame (the quantity the
        # QUAL gate measures, per protocol, every freq.val instead of once
        # per 20k-step offline run)
        frame = self.eval_frame(0)
        pose = np.asarray(frame["pose"])[0]
        mask = (np.asarray(frame["obj_mask"]) > 0).astype(np.float32
                                                          ).reshape(1, -1, 1)
        image = np.asarray(frame["image"]).reshape(1, 3, -1
                                                   ).transpose(0, 2, 1) * mask
        zero_lt = np.zeros((1, int(cfg.nerf.N_latent_trans)), np.float32)
        protocols = {}
        li = self._select_light_latent(pose,
                                       rng=np.random.default_rng(int(it)))
        protocols["anchor"] = (tab["trans"][li:li + 1], tab["light"][li:li + 1])
        protocols["topk3"] = self._topk_latents(pose, k=3, tab=tab)
        protocols["topk8"] = self._topk_latents(pose, k=8, tab=tab)
        protocols["topk8med"] = self._topk_latents(pose, k=8, tab=tab,
                                                   mode="median")
        protocols["topk8rob"] = self._topk_latents(pose, k=8, tab=tab,
                                                   mode="robust")
        protocols["mean"] = (tab["trans"].mean(axis=0, keepdims=True),
                             tab["light"].mean(axis=0, keepdims=True))
        for pname, (lt, ll) in protocols.items():
            if cfg.render.transient == "zero":
                lt = zero_lt
            out = self._render_frame_st(frame, lt, ll)
            mse = float(np.asarray(jnp.mean(
                (jnp.asarray(image) - out["rgb_static"]) ** 2)))
            rec[f"psnr_{pname}"] = float(-10.0 * np.log10(mse + 1e-10))
        hist = getattr(self, "_drift_psnr_hist", [])
        cur = rec["psnr_topk8"]
        if len(hist) >= 2 and max(hist) - cur > psnr_drop_db:
            alarms.append(f"psnr_topk8 {cur:.2f} dB is "
                          f"{max(hist) - cur:.2f} below its best "
                          f"({max(hist):.2f})")
        hist.append(cur)
        self._drift_psnr_hist = hist
        rec["drift_alarm"] = float(bool(alarms))
        if alarms:
            log.warn(f"latent drift alarm @ {it}: " + "; ".join(alarms))
        self.writer.scalars(it, rec, split="drift")
        return rec

    def visualize(self, it, split="train"):
        """Full-frame panels of the first eval frame: rgb / rgb_static /
        rgb_transient / uncert / depth, plus a one-time camera-pose plot
        (reference model/nerf_adapt_st_gan.py:250-311 TB images)."""
        from ..utils import vis
        cfg = self.cfg
        frame = self.eval_frame(0)
        lt = self.state["latents"]["trans"][0:1]
        ll = self.state["latents"]["light"][0:1]
        out = self._render_frame_st(frame, lt, ll)
        H, W = cfg.H, cfg.W
        vis_dir = os.path.join(cfg.output_path, "vis")

        def img(key, c):
            return np.asarray(out[key]).reshape(1, H, W, c).transpose(0, 3, 1, 2)

        zs = cfg.nerf.depth.scale
        image = np.asarray(frame["image"]).reshape(1, 3, H, W)
        gt_mask = (np.asarray(frame["obj_mask"]).reshape(1, 1, H, W) > 0
                   ).astype(np.float32)
        depth_gt = np.asarray(frame["depth_gt"]).reshape(1, 1, H, W)
        z_near = np.asarray(frame["z_near"]).reshape(1, 1, H, W)
        depth_err = np.abs(img("depth", 1) - depth_gt) * gt_mask
        color_err = ((img("rgb", 3) - image * gt_mask) ** 2
                     ).mean(axis=1, keepdims=True)
        panels = {
            "image": (image, (0, 1), None),
            "image_masked": (image * gt_mask, (0, 1), None),
            "rgb": (img("rgb", 3), (0, 1), None),
            "rgb_static": (img("rgb_static", 3), (0, 1), None),
            "rgb_transient": (img("rgb_transient", 3), (0, 1), None),
            "pred_mask": (img("opacity_static", 1), (0, 1), None),
            "gt_mask": (gt_mask, (0, 1), None),
            "depth": (img("depth", 1) * gt_mask, (0.8 * zs, 1.1 * zs),
                      "plasma"),
            "depth_gt": (depth_gt, (0.8 * zs, 1.1 * zs), "plasma"),
            "z_near": (z_near, (0.6 * zs, float(z_near.max())), "plasma"),
            "depth_error": (depth_err,
                            (0, float(np.quantile(depth_err, 0.99))),
                            "turbo"),
            "color_error": (color_err,
                            (0, float(np.quantile(color_err, 0.95))),
                            "turbo"),
            "uncert": (img("uncert", 1),
                       (float(np.asarray(out["uncert"]).min()),
                        float(np.quantile(np.asarray(out["uncert"]), 0.99))),
                       "viridis"),
        }
        for name, (im, rng, cmap) in panels.items():
            vis.tb_image(self.writer, it, split, name,
                         vis.preprocess_vis_image(im, rng, cmap))
            vis.dump_image_grid(
                os.path.join(vis_dir, f"{it:06d}_{name}.png"), im, rng, cmap)
        cam_png = os.path.join(vis_dir, "cameras.png")
        if not os.path.exists(cam_png):
            vis.plot_cameras(self.pose_anchor, cam_png)

    def _eval_metrics_fn(self, raw_hw):
        """One jitted device-side metrics+export step per frame: mask, the
        optional upscale to raw resolution (ops.image.resize_bilinear —
        cv2.INTER_LINEAR float parity), PSNR/SSIM/LPIPS, and the uint8 BGR
        PNG payload.  Only 3 scalars + one uint8 image cross the tunnel per
        frame — the r4 pipeline pulled the f32 render to host, resized with
        cv2, and re-uploaded both images for each metric
        (EVAL_ENVELOPE r4: 0.926 views/s e2e vs 12.44 render-only)."""
        key = ("evalmetrics", raw_hw)
        if not hasattr(self, "_render_jits"):
            self._render_jits = {}
        if key in self._render_jits:
            return self._render_jits[key]
        cfg = self.cfg
        need = raw_hw is not None and tuple(raw_hw) != (cfg.H, cfg.W)
        lpips_params, _ = self._ensure_lpips()
        from ..ops.image import resize_bilinear
        from ..nn.lpips import lpips_distance

        @jax.jit
        def fn(rgb_flat, image, obj_mask):
            rgb = rgb_flat.reshape(cfg.H, cfg.W, 3)
            # raw mask values (matches the pre-pipeline host path exactly;
            # dataset masks are {0,1} floats)
            mask = obj_mask.reshape(cfg.H, cfg.W, 1).astype(jnp.float32)
            img = image.reshape(3, cfg.H, cfg.W).transpose(1, 2, 0) * mask
            if need:
                rgb = resize_bilinear(rgb, tuple(raw_hw))
                img = resize_bilinear(img, tuple(raw_hw))
            p = mse_to_psnr(jnp.mean((rgb - img) ** 2))
            rgb_t = rgb.transpose(2, 0, 1)[None]
            img_t = img.transpose(2, 0, 1)[None]
            s = ssim(rgb_t, img_t)
            lp = jnp.mean(lpips_distance(lpips_params, rgb_t * 2 - 1,
                                         img_t * 2 - 1))
            png = (jnp.clip(rgb, 0.0, 1.0) * 255.0
                   ).astype(jnp.uint8)[..., ::-1]
            return p, s, lp, png

        self._render_jits[key] = fn
        return fn

    # -------------------------------------------- compact streaming eval
    # The remote-TPU tunnel serializes host↔device transfers with compute
    # dispatches, so per-frame BYTES are wall-clock even with a prefetch
    # thread (tools/probe_eval_stages r5: device_put of the 7.37 MB f32
    # frame = 117 ms of the 268 ms/frame end-to-end eval budget).  The
    # compact route uploads a bitwise-lossless sparse payload instead —
    # everything object-ray-subset: [P,3] uint8 GT pixels (dataset images
    # ARE uint8/255 PNGs and every metric compares against image*mask,
    # i.e. a scatter of exactly those pixels into zeros —
    # data/lmsyn2real.py:69,91), the [P] indices, and the [P] z bounds
    # gathered on host (render_rays_masked_st_pre): ~15 bytes/object-ray,
    # ~0.7 MB/frame vs the original 7.37 — and pulls back a sparse [P,3]
    # uint8 PNG payload instead of the full frame.  Render + scatter +
    # metrics + PNG payload run as ONE jit dispatch per frame.

    def _eval_compact_transform(self):
        """EvalPrefetcher transform for the compact payload, or None when
        the compact route can't serve this engine/config (mesh sharding,
        scene_vis export, render.eval_compact=false).  Dense/empty frames
        (coverage outside (0,0.5)) fall back per-frame to the standard f32
        payload — the full-frame render route needs the whole z maps."""
        cfg = self.cfg
        if self.mesh is not None or cfg.data.scene == "scene_vis" \
                or not cfg.render.get("eval_compact", True):
            return None
        chunk = int(cfg.nerf.rand_rays)
        from .render import masked_ray_indices

        def transform(sample):
            obj = np.asarray(sample["obj_mask"]).reshape(-1)
            coverage = float((obj > 0).mean())
            if not (0.0 < coverage < 0.5):
                return {k: np.asarray(v)[None] for k, v in sample.items()}
            idx_p, _n = masked_ray_indices(obj, chunk)
            # stash the host copy on the (per-call-fresh) sample dict so
            # the consumer thread doesn't recompute the 307k-pixel nonzero
            # per frame (and pulling frame["idx"] back would cost a tunnel
            # round trip)
            sample["_idx_host"] = idx_p
            z_near = np.asarray(sample["z_near"], np.float32).reshape(-1)
            z_far = np.asarray(sample["z_far"], np.float32).reshape(-1)
            img = np.asarray(sample["image"])
            # the GT goes up SPARSE: every metric compares against
            # image*mask, which is exactly a scatter of the object pixels
            # into zeros — uploading [P,3] uint8 instead of the full
            # [3,H,W] image + [H*W] mask is bitwise-identical and cuts
            # ~1.2 MB/frame of serialized tunnel transfer
            img_u8 = np.rint(img * 255.0).astype(np.uint8)
            return {
                "image_sparse_u8": img_u8.reshape(3, -1).T[idx_p],
                "pose": np.asarray(sample["pose"], np.float32)[None],
                "intr": np.asarray(sample["intr"], np.float32)[None],
                "idx": idx_p,
                "z_near_pre": z_near[idx_p][None],
                "z_far_pre": z_far[idx_p][None],
            }
        return transform

    def _eval_compact_fn(self, raw_hw, P):
        """ONE jitted dispatch per eval frame: masked render from host-pre-
        gathered z bounds, scatter, PSNR/SSIM/LPIPS, and the PNG payload —
        sparse [P,3] uint8 object-ray colors when no raw-res resize is
        needed (the background is 0 by the reference's mask defaults,
        model/nerf_adapt_st_gan.py:655-667), else the full resized frame."""
        key = ("evalcompact", raw_hw, P)
        if not hasattr(self, "_render_jits"):
            self._render_jits = {}
        if key in self._render_jits:
            return self._render_jits[key]
        cfg = self.cfg
        need = raw_hw is not None and tuple(raw_hw) != (cfg.H, cfg.W)
        lpips_params, _ = self._ensure_lpips()
        chunk = int(cfg.nerf.rand_rays)
        from ..ops.image import resize_bilinear
        from ..nn.lpips import lpips_distance
        from .render import render_rays_masked_st_pre

        @jax.jit
        def fn(params, pose, intr, zn, zf, lt, ll, idx, img_sparse_u8):
            out = render_rays_masked_st_pre(
                params, cfg, pose, intr, idx, zn, zf, lt, ll,
                jax.random.PRNGKey(0), progress=jnp.asarray(1.0),
                compute_dtype=_compute_dtype(cfg), chunk=chunk)
            vals = out["rgb_static"][0]                        # [P,3]
            # idx is exactly the object-mask pixel set (padded with in-set
            # duplicates), so scattering into zeros reproduces image*mask
            # and the masked render bitwise — no full-frame GT/mask upload
            rgb = jnp.zeros((cfg.H * cfg.W, 3)).at[idx].set(vals) \
                .reshape(cfg.H, cfg.W, 3)
            img = jnp.zeros((cfg.H * cfg.W, 3)).at[idx].set(
                img_sparse_u8.astype(jnp.float32) / 255.0) \
                .reshape(cfg.H, cfg.W, 3)
            if need:
                rgb = resize_bilinear(rgb, tuple(raw_hw))
                img = resize_bilinear(img, tuple(raw_hw))
            p = mse_to_psnr(jnp.mean((rgb - img) ** 2))
            rgb_t = rgb.transpose(2, 0, 1)[None]
            img_t = img.transpose(2, 0, 1)[None]
            s = ssim(rgb_t, img_t)
            lp = jnp.mean(lpips_distance(lpips_params, rgb_t * 2 - 1,
                                         img_t * 2 - 1))
            if need:
                png = (jnp.clip(rgb, 0.0, 1.0) * 255.0
                       ).astype(jnp.uint8)[..., ::-1]
            else:
                png = (jnp.clip(vals, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            return p, s, lp, png

        self._render_jits[key] = fn
        return fn

    def _eval_compact_dispatch(self, frame, lt, ll, raw_hw):
        """Dispatch the compact per-frame jit on an uploaded compact
        payload; returns the unpulled device result tuple."""
        fn = self._eval_compact_fn(raw_hw, frame["idx"].shape[0])
        return fn(self.state["params"]["nerf"], frame["pose"],
                  frame["intr"], frame["z_near_pre"], frame["z_far_pre"],
                  jnp.asarray(lt), jnp.asarray(ll), frame["idx"],
                  frame["image_sparse_u8"])

    def warm_eval(self, i=0):
        """Compile the per-frame eval pipeline for eval frame i off the
        clock (bench tools time steady-state; the remote compile otherwise
        lands inside the first measured frame — the r4 envelope's 71 s
        wall at N=100 carried a ~45 s in-loop metrics compile)."""
        cfg = self.cfg
        sample = self.eval_data[i]
        raw_hw = getattr(self.eval_data, "raw_hw", None)
        lt = np.zeros((1, int(cfg.nerf.N_latent_trans)), np.float32)
        ll = np.asarray(self.state["latents"]["light"][0:1])
        transform = self._eval_compact_transform()
        payload = transform(sample) if transform is not None else None
        if payload is not None and "image_sparse_u8" in payload:
            frame = jax.device_put(payload)
            jax.block_until_ready(
                self._eval_compact_dispatch(frame, lt, ll, raw_hw))
            return
        frame = self.eval_frame(i)
        out = self._render_frame_st(frame, lt, ll,
                                    obj_host=sample["obj_mask"])
        jax.block_until_ready(out["rgb_static"])
        if cfg.data.scene != "scene_vis":
            mfn = self._eval_metrics_fn(raw_hw)
            jax.block_until_ready(mfn(out["rgb_static"], frame["image"],
                                      frame["obj_mask"]))

    def _eval_frame_vis(self, frame, out, raw_hw, test_path, writer):
        """Paper-visual export (reference :349-371): 256-px center crop,
        render composited on WHITE inside the object mask, plus
        unmasked-GT and plasma-depth dumps.  Host-side (export fidelity
        over throughput); PNG encodes still ride the writer thread."""
        cfg = self.cfg
        rgb = np.asarray(out["rgb_static"]).reshape(cfg.H, cfg.W, 3)
        mask = np.asarray(frame["obj_mask"]).reshape(cfg.H, cfg.W, 1)
        image = np.asarray(frame["image"])[0].transpose(1, 2, 0) * mask
        gt = np.asarray(frame["image"])[0].transpose(1, 2, 0)
        d = (np.asarray(out["depth"]).reshape(cfg.H, cfg.W, 1)
             / cfg.nerf.depth.scale)
        if raw_hw is not None and tuple(raw_hw) != (cfg.H, cfg.W):
            rgb = cv2.resize(rgb, (raw_hw[1], raw_hw[0]),
                             interpolation=cv2.INTER_LINEAR)
            image = cv2.resize(image, (raw_hw[1], raw_hw[0]),
                               interpolation=cv2.INTER_LINEAR)
            gt = cv2.resize(gt, (raw_hw[1], raw_hw[0]),
                            interpolation=cv2.INTER_LINEAR)
            mask = cv2.resize(mask, (raw_hw[1], raw_hw[0]),
                              interpolation=cv2.INTER_NEAREST)[..., None]
            d = cv2.resize(d, (raw_hw[1], raw_hw[0]),
                           interpolation=cv2.INTER_LINEAR)[..., None]
        crop = int(cfg.render.get("vis_crop") or 256)
        rgb, image, gt, m, d = [vis.center_crop(a, crop)
                                for a in (rgb, image, gt, mask, d)]
        rgb = rgb * m + (1.0 - m)
        p = float(mse_to_psnr(jnp.mean((jnp.asarray(rgb) -
                                        jnp.asarray(image)) ** 2)))
        rgb_t = jnp.asarray(rgb.transpose(2, 0, 1))[None]
        img_t = jnp.asarray(image.transpose(2, 0, 1))[None]
        s = float(ssim(rgb_t, img_t))
        lp = self.lpips(rgb_t, img_t)
        fi = int(np.asarray(frame["frame_index"])[0])
        writer.submit(cv2.imwrite, os.path.join(test_path, f"{fi:06d}.png"),
                      (np.clip(rgb, 0, 1) * 255)[..., ::-1].astype(np.uint8))
        writer.submit(cv2.imwrite,
                      os.path.join(test_path, f"syn_{fi:06d}.png"),
                      (np.clip(gt, 0, 1) * 255)[..., ::-1].astype(np.uint8))
        dv = vis.preprocess_vis_image(
            d.transpose(2, 0, 1)[None], from_range=(0.3, 0.5),
            cmap="plasma")[0].transpose(1, 2, 0)
        writer.submit(cv2.imwrite,
                      os.path.join(test_path, f"depth_vis_{fi:06d}.png"),
                      (dv * 255)[..., ::-1].astype(np.uint8))
        return {"psnr": p, "ssim": s, self.lpips_key: lp}

    def evaluate_full(self):
        """Novel-view synthesis over the test split + BOP-format export
        (reference :319-383).

        Pipelined streaming sweep (r5, closing the 13× end-to-end gap):
          * frame i+1 loads from disk and device_puts on a prefetch thread
            while frame i renders (Engine.eval_frames — the overlap the
            reference gets from DataLoader workers, data/base.py:33-41);
          * latent-protocol selection runs on host numpy from a once-pulled
            latent table (zero per-frame device round trips);
          * metrics + the PNG payload compute ON DEVICE in one jit
            (_eval_metrics_fn); results materialize one frame behind the
            dispatch so the pull overlaps the next frame's render;
          * PNG encodes run on a writer thread (utils.pipeline.AsyncWriter).
        """
        from collections import deque
        from ..utils.pipeline import AsyncWriter
        cfg = self.cfg
        ckpt_num = "last"
        test_path = cfg.render.get("save_path") or os.path.join(
            cfg.output_path, f"test_view_{ckpt_num}")
        os.makedirs(test_path, exist_ok=True)
        # render.eval_seed varies the anchor protocol's random pick
        # (reference :487-502 draws from the global torch RNG; repeated
        # evals there see different picks — this knob lets harnesses
        # average that pick noise instead of freezing one draw)
        rng = np.random.default_rng(int(cfg.render.get("eval_seed", 0) or 0))
        raw_hw = getattr(self.eval_data, "raw_hw", None)
        light_mode = cfg.render.get("light", "anchor")
        vis_mode = cfg.data.scene == "scene_vis"
        tab = self._host_latents_table()
        zero_lt = np.zeros((1, int(cfg.nerf.N_latent_trans)), np.float32)
        rows = [None] * len(self.eval_data)
        pending = deque()
        need = raw_hw is not None and tuple(raw_hw) != (cfg.H, cfg.W)
        transform = None if vis_mode else self._eval_compact_transform()

        def _write_sparse_png(path, idx_p, vals):
            # reconstruct the full BGR frame from the sparse object-ray
            # payload (background 0 = the reference's mask default)
            full = np.zeros((cfg.H * cfg.W, 3), np.uint8)
            full[idx_p] = vals
            cv2.imwrite(path, np.ascontiguousarray(
                full.reshape(cfg.H, cfg.W, 3)[..., ::-1]))

        def _flush_one(writer):
            i, fi, idx_p, res = pending.popleft()
            p, s, lp, png = jax.device_get(res)
            rows[i] = {"psnr": float(p), "ssim": float(s),
                       self.lpips_key: float(lp)}
            path = os.path.join(test_path, f"{fi:06d}.png")
            if idx_p is not None:
                writer.submit(_write_sparse_png, path, idx_p, png)
            else:
                writer.submit(cv2.imwrite, path, np.ascontiguousarray(png))

        with AsyncWriter() as writer:
            for i, frame, sample in self.eval_frames(transform=transform):
                pose_gt = np.asarray(sample["pose"])
                if light_mode == "mean":
                    # mean train latent: robust when per-image lighting
                    # varies (pose-proximity anchor selection picks an
                    # arbitrary lighting); reference is "anchor" (:487-502)
                    ll = tab["light"].mean(axis=0, keepdims=True)
                    lt = tab["trans"].mean(axis=0, keepdims=True)
                elif light_mode.startswith("topk_"):
                    lt, ll = self._topk_latents(pose_gt, tab=tab,
                                                mode=light_mode[5:])
                else:
                    li = self._select_light_latent(pose_gt, rng=rng)
                    ll = tab["light"][li:li + 1]
                    lt = tab["trans"][li:li + 1]
                if cfg.render.transient == "zero":
                    lt = zero_lt
                if "image_sparse_u8" in frame:
                    # compact route: ONE fused render+metrics+PNG dispatch.
                    # idx_p was computed on the prefetch worker thread
                    # (transform stashes the host copy — pulling
                    # frame["idx"] back would cost a tunnel round trip)
                    res = self._eval_compact_dispatch(frame, lt, ll, raw_hw)
                    idx_p = None if need else sample["_idx_host"]
                    pending.append((i, int(sample["frame_index"]),
                                    idx_p, res))
                    if len(pending) >= 2:
                        _flush_one(writer)
                    continue
                out = self._render_frame_st(frame, lt, ll,
                                            obj_host=sample["obj_mask"])
                if vis_mode:
                    rows[i] = self._eval_frame_vis(frame, out, raw_hw,
                                                   test_path, writer)
                    continue
                res = self._eval_metrics_fn(raw_hw)(
                    out["rgb_static"], frame["image"], frame["obj_mask"])
                pending.append((i, int(sample["frame_index"]), None, res))
                if len(pending) >= 2:
                    _flush_one(writer)
            while pending:
                _flush_one(writer)
        mean_psnr = float(np.mean([r["psnr"] for r in rows]))
        mean_ssim = float(np.mean([r["ssim"] for r in rows]))
        log.info(f"PSNR:  {mean_psnr:8.2f}")
        log.info(f"SSIM:  {mean_ssim:8.2f}")
        write_quant(cfg.output_path, rows)
        return dict(psnr=mean_psnr, ssim=mean_ssim)

    def log_scalars(self, it, loss, split="train"):
        super().log_scalars(it, loss, split=split)
        lo, hi = current_scale_bounds(
            it, self.cfg.get("patch", {}).get("min_scale", 0.25),
            self.cfg.get("patch", {}).get("max_scale", 1.0),
            self.cfg.get("patch", {}).get("scale_anneal", 0.0002))
        self.writer.scalars(it, {"patch_scale_min": lo,
                                 "patch_scale_max": hi}, split=split)
