"""Optimizer/schedule construction shared by the engines and the parity
oracles (tests/test_optim_parity.py).

Reference semantics being reproduced (torch → optax):
  * texture generator: Adam(lr) + ExponentialLR stepped once per EPOCH
    (/root/reference/model/nerf_adapt_st_gan.py:62-87,215).  When the yaml
    provides sched.gamma the reference OVERWRITES it with 0.1^(1/6000) —
    equal to every shipped yaml's value — so honoring the given gamma is
    trajectory-identical for all shipped configs.
  * texture discriminator: RMSprop(alpha=0.99, eps=1e-8), constant lr
    (:84-87).  torch applies eps OUTSIDE the sqrt; optax's historical
    default is inside (eps_in_sqrt) — we must pass eps_in_sqrt=False.
  * pretrain: Adam + ExponentialLR stepped per ITERATION with the yaml's
    literal gamma (/root/reference/model/nerf_pretrain.py:66-72,94; the
    lr_end derivation at :70 is commented out).
  * env pretrain: gamma empty → (lr_end/lr)^(1/max_iter) per iteration
    (/root/reference/model/nerf_pretrain_env.py:52-57,79).

torch Adam and optax.adam share the same update (eps outside the
bias-corrected sqrt), so only the schedule mapping differs per engine.
"""

from __future__ import annotations

import optax


def generator_schedule(cfg, max_iter, steps_per_epoch):
    """Texture-stage G learning-rate schedule (per-epoch staircase)."""
    lr, lr_end = cfg.optim.lr, cfg.optim.get("lr_end")
    gamma = (cfg.optim.get("sched") or {}).get("gamma")
    if gamma:
        return optax.exponential_decay(
            lr, transition_steps=steps_per_epoch, decay_rate=float(gamma),
            staircase=True)
    if lr_end:
        n_epochs = max(max_iter // steps_per_epoch, 1)
        return optax.exponential_decay(
            lr, transition_steps=steps_per_epoch,
            decay_rate=(lr_end / lr) ** (1.0 / n_epochs), staircase=True)
    return lr


def disc_schedule(cfg, max_iter, steps_per_epoch):
    """Texture-stage D schedule: constant in the reference; optim_disc.lr_end
    optionally mirrors G's staircase (keeps the D/G lr ratio fixed)."""
    dlr, dlr_end = cfg.optim_disc.lr, cfg.optim_disc.get("lr_end")
    if dlr_end:
        n_epochs = max(max_iter // steps_per_epoch, 1)
        return optax.exponential_decay(
            dlr, transition_steps=steps_per_epoch,
            decay_rate=(dlr_end / dlr) ** (1.0 / n_epochs), staircase=True)
    return dlr


def latent_schedule(cfg, max_iter, steps_per_epoch):
    """Latent-table lr schedule: same per-epoch staircase shape as G but
    starting from optim.lr_latent (and ending at optim.lr_latent_end when
    given, else decaying by the same ratio as the heads).  Long-horizon
    drift mitigation: the per-image latents otherwise ride the head
    schedule from 1e-3, and slow latent drift is the measured driver of
    the 20k-step eval-PSNR decline (CLAUDE.md r2 root-cause)."""
    lr0 = cfg.optim.lr_latent
    lr, lr_end = cfg.optim.lr, cfg.optim.get("lr_end")
    lr_latent_end = cfg.optim.get("lr_latent_end") or (
        lr0 * (lr_end / lr) if lr_end else None)
    gamma = (cfg.optim.get("sched") or {}).get("gamma")
    if gamma:
        return optax.exponential_decay(
            lr0, transition_steps=steps_per_epoch, decay_rate=float(gamma),
            staircase=True)
    if lr_latent_end:
        n_epochs = max(max_iter // steps_per_epoch, 1)
        return optax.exponential_decay(
            lr0, transition_steps=steps_per_epoch,
            decay_rate=(lr_latent_end / lr0) ** (1.0 / n_epochs),
            staircase=True)
    return lr0


def make_generator_optimizer(cfg, max_iter, steps_per_epoch):
    # RESTORE COMPATIBILITY: setting optim.lr_latent switches the optimizer
    # from plain adam to optax.multi_transform, which CHANGES the opt-state
    # pytree structure — a --resume across a toggle of this knob cannot
    # restore the saved Adam moments (restore_checkpoint raises on the
    # structure mismatch).  Keep the knob constant across a run's resumes.
    head_opt = optax.adam(generator_schedule(cfg, max_iter, steps_per_epoch))
    if not cfg.optim.get("lr_latent"):
        return head_opt
    lat_opt = optax.adam(latent_schedule(cfg, max_iter, steps_per_epoch))
    # gen_params is {"heads": ..., "latents": ...} — prefix-tree labels
    return optax.multi_transform(
        {"heads": head_opt, "latents": lat_opt},
        param_labels={"heads": "heads", "latents": "latents"})


def make_disc_optimizer(cfg, max_iter, steps_per_epoch):
    # eps_in_sqrt=False matches torch RMSprop's g / (sqrt(avg) + eps)
    return optax.rmsprop(disc_schedule(cfg, max_iter, steps_per_epoch),
                         decay=0.99, eps=1e-8, eps_in_sqrt=False)


def pretrain_schedule(cfg, max_iter):
    """Pretrain/env lr schedule (per-iteration exponential)."""
    lr = cfg.optim.lr
    lr_end = cfg.optim.get("lr_end")
    gamma = (cfg.optim.get("sched") or {}).get("gamma")
    if gamma:
        return optax.exponential_decay(
            lr, transition_steps=1, decay_rate=float(gamma), staircase=True)
    if lr_end:
        return optax.exponential_decay(
            lr, transition_steps=max_iter, decay_rate=lr_end / lr)
    return lr


def make_pretrain_optimizer(cfg, max_iter):
    return optax.adam(pretrain_schedule(cfg, max_iter))
