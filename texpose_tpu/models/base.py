"""Engine base: the training/eval driver contract shared by all stages.

Capability parity with /root/reference/model/base.py:19-239 — every engine
exposes load_dataset / build_networks / setup_optimizer / restore_checkpoint
/ train / validate / evaluate_full, and the same periodic-frequency hooks
(freq.scalar / freq.val / freq.ckpt).

TPU-first design deltas (deliberate):
  * state is a pytree dict {step, params, opt_state, ...} threaded through a
    single jitted train_step (donated) — not mutable nn.Modules.
  * the whole training split is prefetched once and device_put as one pytree
    (the reference already trains from an all-in-memory batch:
    model/nerf_pretrain.py:91-92); there are no DataLoader workers.
  * `progress`/`iteration` enter the step as traced scalars so annealing
    never recompiles.
  * losses are NaN-checked on host every freq.scalar steps (non-blocking
    otherwise) instead of asserting on every iteration.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..data.lm import LineMODDataset
from ..utils.log import log
from ..utils.metrics import MetricsWriter, StepTimer
from ..utils import checkpoint as ckpt


def finalize_step(inner, scan_k):
    """Wrap a pure train step (state, batch) → (state, loss) for execution.

    scan_k > 1 runs K steps per dispatch via lax.scan — the Python loop and
    the host↔device round-trip are paid once per K steps instead of per
    step (the remote-TPU tunnel adds measurable per-dispatch latency).
    Returns the LAST step's losses.
    """
    if scan_k <= 1:
        return jax.jit(inner, donate_argnums=0)

    def multi(state, batch):
        def body(st, _):
            st2, loss = inner(st, batch)
            return st2, loss
        state, losses = jax.lax.scan(body, state, None, length=scan_k)
        return state, jax.tree_util.tree_map(lambda x: x[-1], losses)

    return jax.jit(multi, donate_argnums=0)


class Engine:
    """Base engine; subclasses implement build_networks/_make_train_step and
    the loss/eval specifics."""

    def __init__(self, cfg):
        self.cfg = cfg
        os.makedirs(cfg.output_path, exist_ok=True)
        self.writer = MetricsWriter(cfg.output_path, use_tb=cfg.get("tb", False))
        self.timer = StepTimer()
        self.state = None
        self.step_fn = None
        self.start_step = 0
        # surface cfg.kernels.vmem_limit_mb to the Mosaic kernels (recorded
        # in the options.yaml snapshot; see kernels/_params.py)
        vmem_mb = (cfg.get("kernels") or {}).get("vmem_limit_mb")
        if vmem_mb:
            try:
                from ..kernels._params import set_vmem_limit_mb
                set_vmem_limit_mb(vmem_mb)
            except ImportError:  # no pallas backend → knob is moot
                pass
        # opt-in data parallelism over the device mesh (cfg.mesh.dp);
        # the reference is single-device by assertion (options.py:112-113)
        self.mesh = None
        mesh_cfg = cfg.get("mesh") or {}
        if mesh_cfg.get("dp") and len(jax.devices()) > 1:
            from ..parallel import make_mesh
            self.mesh = make_mesh(mesh_cfg.get("n_devices"))
            log.info(f"data-parallel over mesh {self.mesh}")

    # ------------------------------------------------------------------ data

    def _split_subset(self, split):
        """Reference subset semantics: train truncates by data.train_sub,
        every eval split by data.val_sub — even when the eval split is
        "test" (reference model/base.py:38 passes subset=opt.data.val_sub
        unconditionally)."""
        d = self.cfg.data
        return d.get("train_sub") if split == "train" else d.get("val_sub")

    def make_dataset(self, split):
        return LineMODDataset(self.cfg, split=split,
                              subset=self._split_subset(split),
                              multi_obj=self.cfg.data.get("multi_obj", False),
                              splits_root=self.cfg.data.get("splits_root",
                                                            "splits"))

    def load_dataset(self, eval_split="val", prefetch_train=True):
        """prefetch_train=False skips the train-split device prefetch —
        evaluation only needs the train split's length (latent tables) and
        camera poses (light-latent anchors)."""
        cfg = self.cfg
        if cfg.data.get("val_on_test"):
            eval_split = "test"        # reference model/base.py:36-37
        log.info(f"loading dataset {cfg.data.dataset}/{cfg.data.object} "
                 f"scene={cfg.data.scene}...")
        self.train_data = self.make_dataset("train")
        self.train_batch = jax.device_put(self.train_data.prefetch_all()) \
            if prefetch_train else None
        self.eval_data = self.make_dataset(eval_split)
        # eval STREAMS: frames load from disk and device_put one at a time
        # (reference evaluates via a batch-1 DataLoader, data/base.py:33-41).
        # Whole-split device prefetch would OOM at the reference eval
        # envelope — the 1869-frame Duck syn2real test split at 480×640
        # (README.md:49-64) is ~7.4 MB/frame (image 3.7 + z bounds 2.5 +
        # mask 1.2) ≈ 13.8 GB on a 16 GB v5e before params.  Streaming
        # keeps ≤2 frames device-resident (the cached one + the previous
        # briefly, until the cache slot is replaced).
        self._eval_cache = (None, None)
        log.info(f"train={len(self.train_data)} frames prefetched to "
                 f"device; {eval_split}={len(self.eval_data)} frames "
                 f"streamed per-frame at eval")

    def eval_frame(self, i):
        """Eval frame i as a [1, ...] device pytree.

        Size-1 cache: repeated renders of the same frame (validate /
        visualize / views-per-sec benchmarking) reuse the device copy
        instead of re-transferring ~7 MB through the TPU tunnel; a
        sequential evaluate_full sweep replaces the slot per frame,
        keeping device memory O(1 frame) for any split length.
        """
        if self._eval_cache[0] != i:
            sample = self.eval_data[i]
            frame = jax.device_put(
                {k: np.asarray(v)[None] for k, v in sample.items()})
            self._eval_cache = (i, frame)
        return self._eval_cache[1]

    def eval_frames(self, indices=None, depth=2, transform=None):
        """Iterate (i, frame, host_sample) over eval frames with a
        background prefetch thread: frame i+1 loads from disk and
        device_puts while frame i renders (the overlap the reference gets
        from DataLoader workers, /root/reference/data/base.py:33-41).

        The size-1 eval_frame cache is kept coherent: as each frame is
        yielded it becomes the cached slot, so interleaved eval_frame(i)
        calls reuse the prefetched device copy.  Device memory stays
        O(depth frames).

        transform: optional host hook producing a COMPACT device payload
        (see utils.pipeline.EvalPrefetcher).  Transformed payloads have an
        engine-specific layout, so they never enter the eval_frame cache —
        a later eval_frame(i) reloads the standard f32 frame.
        """
        from ..utils.pipeline import EvalPrefetcher
        with EvalPrefetcher(self.eval_data, indices=indices, depth=depth,
                            transform=transform) as pf:
            for i, frame, sample in pf:
                if transform is None:
                    self._eval_cache = (i, frame)
                yield i, frame, sample

    # ------------------------------------------------------- persist/restore

    def save_checkpoint(self, it):
        state = dict(self.state)
        state["step"] = np.int32(it)
        fname = ckpt.save_checkpoint(self.cfg.output_path, state, it=it,
                                     keep_numbered=True)
        log.info(f"saved checkpoint {fname} @ step {it}")

    def restore_checkpoint(self):
        """Resume from <output_path>/model.ckpt if present."""
        fname = os.path.join(self.cfg.output_path, "model.ckpt")
        if not (self.cfg.get("resume") and os.path.exists(fname)):
            return False
        template = dict(self.state)
        template["step"] = np.int32(0)
        restored = ckpt.restore_checkpoint(fname, template)
        self.start_step = int(restored.pop("step"))
        self.state = restored
        log.info(f"resumed from {fname} @ step {self.start_step}")
        return True

    def load_initial_weights(self):
        """cfg.init_weights=<path>: overlay a flat-npz weight file onto the
        freshly built state (missing leaves — e.g. optimizer slots — keep
        their fresh values).  This is the load path for checkpoints
        converted from the reference's torch format
        (tools/import_reference_ckpt.py); resume/partial restores run
        after and take precedence."""
        fname = self.cfg.get("init_weights")
        if not fname:
            return False
        flat = ckpt.load_checkpoint_flat(fname)
        self.state, n, skipped = ckpt.merge_flat_into_tree(self.state, flat)
        if n == 0:
            raise KeyError(f"init_weights {fname}: no leaf matched the "
                           f"engine state (wrong model/config?)")
        log.info(f"initialized {n} leaves from {fname}")
        for s in skipped:
            log.warn(f"init_weights skipped (shape mismatch) {s}")
        return True

    def restore_pretrained_checkpoint(self):
        """Load ONLY the geometry trunk (mlp_feat) from the group-level
        pretrain checkpoint (reference util.py:202-222, --resume_pretrain)."""
        cfg = self.cfg
        fname = cfg.get("pretrain_ckpt") or os.path.join(
            str(cfg.output_root), str(cfg.group), "pretrain_model.ckpt")
        params, n = ckpt.restore_subtree(fname, self.state["params"],
                                         "mlp_feat")
        self.state["params"] = params
        log.info(f"restored geometry trunk ({n} leaves) from {fname}")

    def restore_field_checkpoint(self):
        """Load only the nerf-field subtree (reference util.py:225-242,
        --resume_real)."""
        cfg = self.cfg
        fname = cfg.get("field_ckpt") or os.path.join(
            str(cfg.output_root), str(cfg.group), "pretrain_model.ckpt")
        params, n = ckpt.restore_subtree(fname, self.state["params"], "nerf")
        self.state["params"] = params
        log.info(f"restored nerf field ({n} leaves) from {fname}")

    # ------------------------------------------------------------- training

    def max_iter(self):
        return int(self.cfg.max_iter)

    def rays_per_step(self):
        return int(self.cfg.nerf.rand_rays)

    def scan_k(self):
        """Steps fused per dispatch (cfg.scan_steps; see finalize_step),
        clamped by gcd so every freq.* hook and max_iter stay reachable."""
        import math
        K = max(int(self.cfg.get("scan_steps") or 1), 1)
        for f in ("scalar", "val", "ckpt", "vis"):
            v = self.cfg.freq.get(f)
            if v:
                K = math.gcd(K, int(v))
        try:
            K = math.gcd(K, self.max_iter())
        except Exception:
            pass
        return max(K, 1)

    def train(self):
        cfg = self.cfg
        max_iter = self.max_iter()
        log.title(f"TRAINING START ({type(self).__name__}, "
                  f"{max_iter} steps)")
        K = self.scan_k()
        if K > 1:
            log.info(f"scan-fused training: {K} steps per dispatch")
        if self.start_step == 0:
            self.validate(0)
        if cfg.get("profile"):
            # first-class tracing (the reference only has an EMA wall-clock
            # timer, util.py:133-140; SURVEY.md §5 mandates jax.profiler)
            prof_dir = os.path.join(cfg.output_path, "profile")
            jax.profiler.start_trace(prof_dir)
            log.info(f"jax.profiler trace → {prof_dir}")
        t_start = time.time()
        for it in range(self.start_step, max_iter, K):
            self.state, loss = self.step_fn(self.state, self.train_batch)
            self.timer.tick()
            done = it + K
            if done % cfg.freq.scalar == 0 or it == self.start_step:
                self.log_scalars(done, loss)
            if cfg.freq.get("vis") and done % cfg.freq.vis == 0:
                self.visualize(done)
            if done % cfg.freq.val == 0:
                self.validate(done)
            if done % cfg.freq.ckpt == 0:
                self.save_checkpoint(done)
        if cfg.get("profile"):
            jax.profiler.stop_trace()
        self.save_checkpoint(max_iter)
        wall = time.time() - t_start
        log.title(f"TRAINING DONE in {wall:.1f}s "
                  f"({(max_iter - self.start_step) / max(wall, 1e-9):.2f} it/s)")

    def log_scalars(self, it, loss, split="train"):
        host = {k: float(np.asarray(v)) for k, v in loss.items()}
        bad = [k for k, v in host.items() if not np.isfinite(v)]
        if bad:
            raise FloatingPointError(
                f"non-finite loss at step {it}: {bad} ({host})")
        K = self.scan_k()
        host["it_per_sec"] = K / self.timer.it_time if self.timer.it_time else 0.0
        host["rays_per_sec"] = self.timer.rays_per_sec(
            self.rays_per_step() * K)
        self.writer.scalars(it, host, split=split)
        items = " ".join(f"{k}={v:.4g}" for k, v in host.items())
        log.info(f"[{split} {it}] {items}")

    # --------------------------------------------------------------- metrics

    def lpips(self, rgb, image):
        """LPIPS(alex) on [B,3,H,W] images in [0,1] (reference evaluates
        lpips on 2x-1 scaled tensors, model/nerf_adapt_st_gan.py:363).

        Uses ported weights when cfg.lpips_weights points at an npz;
        otherwise deterministic random features (calibration pending —
        flagged once via log).
        """
        self._ensure_lpips()
        return float(np.asarray(
            self._lpips_fn(rgb * 2 - 1, image * 2 - 1)).mean())

    def _ensure_lpips(self):
        """Lazy LPIPS param load; returns (params, metric_key).  Shared by
        the host lpips() path and the fully on-device eval metrics jit."""
        if not hasattr(self, "_lpips_params"):
            from ..nn.lpips import init_lpips, load_lpips_npz, lpips_distance
            path = self.cfg.get("lpips_weights")
            if path and os.path.exists(str(path)):
                self._lpips_params = load_lpips_npz(str(path))
                self.lpips_key = "lpips"
                log.info(f"loaded LPIPS weights from {path}")
            else:
                self._lpips_params = init_lpips(jax.random.PRNGKey(0))
                self.lpips_key = "lpips_uncal"
                log.warn("no lpips_weights provided — LPIPS uses random "
                         "(fixed) AlexNet features; quant.txt will name "
                         "the column lpips_uncal")
            self._lpips_fn = jax.jit(
                lambda x, y: lpips_distance(self._lpips_params, x, y))
        return self._lpips_params, self.lpips_key

    # ------------------------------------------------------------ interface

    def visualize(self, it, split="train"):
        """Periodic visual QA hook (reference model/*.visualize TB panels);
        engines override. Default: no-op."""

    def build_networks(self, key=None):
        raise NotImplementedError

    def setup_optimizer(self):
        raise NotImplementedError

    def validate(self, it):
        raise NotImplementedError

    def evaluate_full(self):
        raise NotImplementedError

    def generate_videos_synthesis(self, *args, **kwargs):
        """Novel-view orbit videos; implemented by the pretrain engines
        (the reference GAN model raises NotImplementedError too,
        model/nerf_adapt_st_gan.py:406-407)."""
        raise NotImplementedError(
            f"{type(self).__name__} does not implement novel-view video "
            f"synthesis")
