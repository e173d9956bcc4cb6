"""Metrics + observability.

Capability parity: PSNR as −10·log10(MSE) (reference
model/nerf_adapt_st_gan.py:361), TB scalar logging (model/base.py:179-187),
quant.txt dump (model/nerf_adapt_st_gan.py:373-383).

TPU-first additions the reference lacks (SURVEY.md §5): first-class
rays/sec and steps/sec counters, and an always-on JSONL metrics stream
(metrics.jsonl) that works headless; TensorBoard is optional and gated.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax.numpy as jnp


def psnr(pred, target, mask=None):
    """−10·log10(MSE). With mask, MSE over masked elements only; the mask
    broadcasts against pred (e.g. [H,W,1] against [H,W,3]), and the
    denominator counts the BROADCAST elements so a channel-less mask does
    not inflate the MSE by the channel count."""
    if mask is not None:
        m = jnp.broadcast_to(mask, jnp.broadcast_shapes(jnp.shape(mask),
                                                        jnp.shape(pred)))
        mse = ((pred - target) ** 2 * m).sum() / (m.sum() + 1e-10)
    else:
        mse = ((pred - target) ** 2).mean()
    return -10.0 * jnp.log10(mse + 1e-10)


def mse_to_psnr(mse):
    return -10.0 * jnp.log10(mse + 1e-10)


class MetricsWriter:
    """JSONL metrics stream + optional TensorBoard scalars."""

    def __init__(self, output_path, use_tb=False):
        os.makedirs(output_path, exist_ok=True)
        self.fname = os.path.join(output_path, "metrics.jsonl")
        self._f = open(self.fname, "a")
        self.tb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir=output_path, flush_secs=10)
            except Exception:
                self.tb = None

    def scalars(self, step, scalars, split="train"):
        rec = {"step": int(step), "split": split, "time": time.time()}
        for k, v in scalars.items():
            v = float(np.asarray(v))
            rec[k] = v
            if self.tb is not None:
                self.tb.add_scalar(f"{split}/{k}", v, step)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def image(self, step, name, img, split="train"):
        """img [C,H,W] float in [0,1]; TB only (JSONL stays scalar)."""
        if self.tb is not None:
            self.tb.add_image(f"{split}/{name}", np.asarray(img), step)

    def close(self):
        self._f.close()
        if self.tb is not None:
            self.tb.close()


class StepTimer:
    """EMA per-step timing + rays/sec (reference util.py:133-140, upgraded
    with throughput)."""

    def __init__(self, ema=0.9):
        self.ema = ema
        self.it_time = None
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.it_time = dt if self.it_time is None else \
                self.ema * self.it_time + (1 - self.ema) * dt
        self._last = now
        return self.it_time

    def rays_per_sec(self, rays_per_step):
        if not self.it_time:
            return 0.0
        return rays_per_step / self.it_time


def write_quant(output_path, rows):
    """rows: list of dicts with psnr/ssim/lpips → quant.txt, one line per
    frame (reference model/nerf_adapt_st_gan.py:379-383).

    The header names the columns from the row keys, so an uncalibrated
    perceptual metric (key 'lpips_uncal', emitted when no lpips_weights are
    loaded) is self-describing rather than masquerading as real LPIPS.
    """
    fname = os.path.join(output_path, "quant.txt")
    keys = list(rows[0].keys()) if rows else ["psnr", "ssim", "lpips"]
    with open(fname, "w") as f:
        f.write("# frame " + " ".join(keys) + "\n")
        for i, r in enumerate(rows):
            f.write(f"{i} " + " ".join(str(r[k]) for k in keys) + "\n")
    return fname
