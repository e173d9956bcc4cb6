"""Torch-oracle parity for the optimizer/schedule layer (the one previously
un-oracled layer — VERDICT r2 item 3).

Feeds IDENTICAL parameter/gradient sequences to the reference's torch
optimizer stacks (/root/reference/model/nerf_adapt_st_gan.py:62-87,215;
model/nerf_pretrain.py:66-72,94; model/nerf_pretrain_env.py:52-57,79) and to
the optax constructions in texpose_tpu/models/optim.py (the exact functions
the engines call), asserting the parameter trajectories coincide over 100
steps including epoch boundaries (pinning the per-epoch staircase).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
import optax

from texpose_tpu.utils.config import Config
from texpose_tpu.models.optim import (
    make_generator_optimizer, make_disc_optimizer, make_pretrain_optimizer,
    generator_schedule, pretrain_schedule)


SHAPES = [(7, 5), (5,), (3, 3)]
N_STEPS = 100


def _grads(seed=0, n=N_STEPS, scale=1.0):
    rng = np.random.RandomState(seed)
    return [[rng.randn(*s).astype(np.float32) * rng.uniform(0.2, 3.0)
             * scale for s in SHAPES] for _ in range(n)]


def _init_params(seed=42):
    rng = np.random.RandomState(seed)
    return [rng.randn(*s).astype(np.float32) for s in SHAPES]


def _run_optax(opt, grads):
    params = [jnp.asarray(p) for p in _init_params()]
    state = opt.init(params)
    traj = []
    for g in grads:
        updates, state = opt.update([jnp.asarray(x) for x in g], state,
                                    params)
        params = optax.apply_updates(params, updates)
        traj.append([np.asarray(p) for p in params])
    return traj


def _run_torch(make_optim, grads, sched_gamma=None, sched_every=None):
    params = [torch.nn.Parameter(torch.from_numpy(p))
              for p in _init_params()]
    optim = make_optim(params)
    sched = (torch.optim.lr_scheduler.ExponentialLR(optim, sched_gamma)
             if sched_gamma is not None else None)
    traj = []
    for i, g in enumerate(grads):
        for p, gi in zip(params, g):
            p.grad = torch.from_numpy(gi)
        optim.step()
        if sched is not None and (i + 1) % sched_every == 0:
            sched.step()
        traj.append([p.detach().numpy().copy() for p in params])
    return traj


def _assert_match(tj, tt, rtol=2e-4, atol=2e-6):
    worst = 0.0
    for step, (a_list, b_list) in enumerate(zip(tj, tt)):
        for a, b in zip(a_list, b_list):
            err = np.max(np.abs(a - b) / (np.abs(b) + 1e-3))
            worst = max(worst, float(err))
            np.testing.assert_allclose(
                a, b, rtol=rtol, atol=atol,
                err_msg=f"trajectory diverged at step {step}")
    return worst


def test_generator_adam_epoch_staircase_parity():
    """G stack: Adam + per-EPOCH ExponentialLR with the yaml's gamma
    (reference nerf_adapt_st_gan.py:62-82,215)."""
    steps_per_epoch = 7           # N_STEPS=100 crosses 14 epoch boundaries
    gamma = 0.1 ** (1.0 / 10)     # aggressive so a mis-stepped epoch shows
    cfg = Config({"optim": {"lr": 1e-3, "lr_end": 1e-4, "algo": "Adam",
                            "sched": {"type": "ExponentialLR",
                                      "gamma": gamma}}})
    grads = _grads(seed=0)
    opt = make_generator_optimizer(cfg, N_STEPS, steps_per_epoch)
    tj = _run_optax(opt, grads)
    tt = _run_torch(lambda ps: torch.optim.Adam(ps, lr=1e-3), grads,
                    sched_gamma=gamma, sched_every=steps_per_epoch)
    _assert_match(tj, tt)


def test_generator_gamma_absent_matches_reference_derivation():
    """gamma empty → reference derives (lr_end/lr)^(1/max_epoch)
    (nerf_adapt_st_gan.py:77); schedule values must form the same per-epoch
    staircase."""
    steps_per_epoch, n_epochs = 5, 20
    max_iter = steps_per_epoch * n_epochs
    cfg = Config({"optim": {"lr": 1e-3, "lr_end": 1e-4,
                            "sched": {"type": "ExponentialLR",
                                      "gamma": None}}})
    sched = generator_schedule(cfg, max_iter, steps_per_epoch)
    ref_gamma = (1e-4 / 1e-3) ** (1.0 / n_epochs)
    lr = 1e-3
    for step in range(max_iter):
        got = float(sched(step))
        np.testing.assert_allclose(got, lr, rtol=1e-6,
                                   err_msg=f"step {step}")
        if (step + 1) % steps_per_epoch == 0:
            lr *= ref_gamma


def test_disc_rmsprop_parity():
    """D stack: torch RMSprop(alpha=0.99, eps=1e-8) puts eps OUTSIDE the
    sqrt; optax's default (eps_in_sqrt=True) diverges visibly — this test
    pins the eps_in_sqrt=False mapping in make_disc_optimizer."""
    cfg = Config({"optim_disc": {"lr": 1e-4, "algo": "RMSprop"}})
    # grads at the sqrt(eps)=1e-4 scale, where the eps placement changes
    # the denominator by ~40% — late-training D gradients live here
    grads = _grads(seed=1, scale=1e-4)
    opt = make_disc_optimizer(cfg, N_STEPS, 5)
    tj = _run_optax(opt, grads)
    tt = _run_torch(
        lambda ps: torch.optim.RMSprop(ps, lr=1e-4, alpha=0.99, eps=1e-8),
        grads)
    _assert_match(tj, tt)

    # counter-oracle: the optax default (eps inside sqrt) must NOT match —
    # proves the test has teeth
    bad = optax.rmsprop(1e-4, decay=0.99, eps=1e-8, eps_in_sqrt=True)
    tb = _run_optax(bad, grads)
    with pytest.raises(AssertionError):
        _assert_match(tb, tt)


def test_pretrain_adam_per_iteration_gamma_parity():
    """Pretrain stack: Adam + per-ITERATION ExponentialLR with the yaml's
    literal gamma (reference nerf_pretrain.py:66-72,94 — the lr_end
    derivation is commented out there)."""
    gamma = 0.97
    cfg = Config({"optim": {"lr": 5e-4, "lr_end": 1e-4,
                            "sched": {"type": "ExponentialLR",
                                      "gamma": gamma}}})
    grads = _grads(seed=2)
    opt = make_pretrain_optimizer(cfg, N_STEPS)
    tj = _run_optax(opt, grads)
    tt = _run_torch(lambda ps: torch.optim.Adam(ps, lr=5e-4), grads,
                    sched_gamma=gamma, sched_every=1)
    _assert_match(tj, tt)


def test_env_adam_lr_end_derivation_parity():
    """Env stack: gamma empty → (lr_end/lr)^(1/max_iter) per iteration
    (reference nerf_pretrain_env.py:52-57,79)."""
    max_iter = N_STEPS
    cfg = Config({"optim": {"lr": 1e-3, "lr_end": 1e-4,
                            "sched": {"type": "ExponentialLR",
                                      "gamma": None}}})
    grads = _grads(seed=3)
    opt = make_pretrain_optimizer(cfg, max_iter)
    tj = _run_optax(opt, grads)
    ref_gamma = (1e-4 / 1e-3) ** (1.0 / max_iter)
    tt = _run_torch(lambda ps: torch.optim.Adam(ps, lr=1e-3), grads,
                    sched_gamma=ref_gamma, sched_every=1)
    _assert_match(tj, tt)


def test_shipped_yaml_schedules_match_reference_values():
    """The shipped configs' schedule curves hit the reference's lr values:
    gan gamma 0.9996163094458892 = 0.1^(1/6000) per epoch; pretrain gamma
    0.999992 per iteration (lr does NOT reach lr_end: ≈0.67x at 50k)."""
    import os
    from texpose_tpu.utils.config import load_yaml
    here = os.path.join(os.path.dirname(__file__), "..", "configs")
    gan = load_yaml(os.path.join(here, "nerf_lm_adapt_gan.yaml"))
    np.testing.assert_allclose(gan.optim.sched.gamma, 0.1 ** (1 / 6000),
                               rtol=1e-9)
    spe = 23                       # e.g. 185 train frames, batch 8
    sched = generator_schedule(gan, 6000 * spe, spe)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    # rtol: optax evaluates the schedule in f32
    np.testing.assert_allclose(float(sched(6000 * spe - 1)),
                               1e-4 / gan.optim.sched.gamma, rtol=5e-4)

    pre = load_yaml(os.path.join(here, "nerf_lm_pretrain.yaml"))
    assert pre.optim.sched.gamma == 0.999992
    psched = pretrain_schedule(pre, 50000)
    # rtol: gamma^50000 amplifies the f32 rounding of gamma by n
    np.testing.assert_allclose(float(psched(50000)),
                               5e-4 * 0.999992 ** 50000, rtol=5e-3)
    assert float(psched(50000)) > 3e-4          # NOT decayed to lr_end

    env = load_yaml(os.path.join(here, "nerf_lm_env.yaml"))
    assert env.optim.lr == 1e-3                 # reference env lr, not 5e-4
    assert not env.optim.sched.get("gamma")
    esched = pretrain_schedule(env, 50000)
    np.testing.assert_allclose(float(esched(50000)), 1e-4, rtol=1e-5)
