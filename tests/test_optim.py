"""Optimizer/lr-scheduler factory (train/optim.py) vs torch oracles.

The reference's config system reflection-instantiates torch.optim
optimizers and lr schedulers (parse_config.py:84-112); the factory must
reproduce torch's update rules exactly, so every optimizer test drives the
SAME gradient stream through torch.optim and through the optax transform
and compares parameter trajectories. Scheduler tests compare per-step lr
values against torch.optim.lr_scheduler stepping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from bde2vid_tpu.train.optim import build_optimizer, build_schedule

STEPS = 7


def _grads(shape=(5, 3), n=STEPS, seed=0):
    r = np.random.RandomState(seed)
    return [r.randn(*shape).astype(np.float32) for _ in range(n)]


def _run_optax(tx, p0, grads):
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    outs = []
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        outs.append(np.asarray(params["w"]))
    return outs


def _run_torch(opt_ctor, p0, grads, clip=None, sched_ctor=None):
    p = torch.nn.Parameter(torch.tensor(p0))
    opt = opt_ctor([p])
    sched = sched_ctor(opt) if sched_ctor else None
    outs = []
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        if clip is not None:
            torch.nn.utils.clip_grad_norm_([p], clip)
        opt.step()
        if sched is not None:
            sched.step()
        outs.append(p.detach().numpy().copy())
    return outs


def _compare(cfg, opt_ctor, clip=None, sched_cfg=None, sched_ctor=None,
             tol=1e-6):
    p0 = np.random.RandomState(99).randn(5, 3).astype(np.float32)
    grads = _grads()
    tx, desc = build_optimizer(cfg, sched_cfg)
    ours = _run_optax(tx, p0, grads)
    want = _run_torch(opt_ctor, p0, grads, clip=clip, sched_ctor=sched_ctor)
    for i, (a, b) in enumerate(zip(ours, want)):
        np.testing.assert_allclose(a, b, atol=tol, rtol=0,
                                   err_msg=f"step {i} ({desc})")


def test_adam_matches_torch():
    _compare(
        {"type": "Adam", "args": {"lr": 1e-2, "betas": [0.8, 0.95],
                                  "eps": 1e-7}},
        lambda ps: torch.optim.Adam(ps, lr=1e-2, betas=(0.8, 0.95), eps=1e-7),
    )


def test_adam_l2_weight_decay_matches_torch():
    # torch Adam couples wd*p into the GRADIENT before the moments —
    # distinct from AdamW; both must match their torch twin
    _compare(
        {"type": "Adam", "args": {"lr": 3e-3, "weight_decay": 0.05}},
        lambda ps: torch.optim.Adam(ps, lr=3e-3, weight_decay=0.05),
    )


def test_adamw_matches_torch():
    _compare(
        {"type": "AdamW", "args": {"lr": 2e-3, "weight_decay": 0.1}},
        lambda ps: torch.optim.AdamW(ps, lr=2e-3, weight_decay=0.1),
    )


def test_adamw_default_and_explicit_zero_decay():
    # absent weight_decay -> torch's AdamW default 1e-2; explicit 0 -> 0
    _compare(
        {"type": "AdamW", "args": {"lr": 2e-3}},
        lambda ps: torch.optim.AdamW(ps, lr=2e-3),
    )
    _compare(
        {"type": "AdamW", "args": {"lr": 2e-3, "weight_decay": 0.0}},
        lambda ps: torch.optim.AdamW(ps, lr=2e-3, weight_decay=0.0),
    )


def test_sgd_momentum_nesterov_matches_torch():
    _compare(
        {"type": "SGD", "args": {"lr": 1e-2, "momentum": 0.9,
                                 "nesterov": True, "weight_decay": 1e-4}},
        lambda ps: torch.optim.SGD(ps, lr=1e-2, momentum=0.9, nesterov=True,
                                   weight_decay=1e-4),
    )


def test_sgd_plain_matches_torch():
    _compare({"type": "SGD", "args": {"lr": 0.05}},
             lambda ps: torch.optim.SGD(ps, lr=0.05))


def test_rmsprop_matches_torch():
    _compare(
        {"type": "RMSprop", "args": {"lr": 1e-3, "alpha": 0.95}},
        lambda ps: torch.optim.RMSprop(ps, lr=1e-3, alpha=0.95),
        tol=2e-6,
    )


def test_rmsprop_momentum_centered_matches_torch():
    _compare(
        {"type": "RMSprop", "args": {"lr": 1e-3, "momentum": 0.8,
                                     "centered": True}},
        lambda ps: torch.optim.RMSprop(ps, lr=1e-3, momentum=0.8,
                                       centered=True),
        tol=2e-6,
    )


def test_grad_clip_matches_torch():
    # grads scaled to guarantee clipping actually engages some steps
    _compare(
        {"type": "SGD", "args": {"lr": 0.1, "grad_clip": 2.0}},
        lambda ps: torch.optim.SGD(ps, lr=0.1),
        clip=2.0,
    )


def test_flat_config_is_adam():
    # backward compatibility: the framework's earlier schema was
    # "optimizer": {"lr": ...} with hard-coded Adam
    _compare({"lr": 5e-3}, lambda ps: torch.optim.Adam(ps, lr=5e-3))


# ------------------------------- schedules -----------------------------------


def _torch_lrs(sched_ctor, base_lr, n=12):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = sched_ctor(opt)
    lrs = []
    for _ in range(n):
        lrs.append(opt.param_groups[0]["lr"])  # lr used by THIS step
        opt.step()
        sched.step()
    return np.asarray(lrs)


@pytest.mark.parametrize(
    "cfg,ctor",
    [
        ({"type": "StepLR", "args": {"step_size": 3, "gamma": 0.5}},
         lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=3, gamma=0.5)),
        ({"type": "MultiStepLR", "args": {"milestones": [2, 5, 9],
                                          "gamma": 0.1}},
         lambda o: torch.optim.lr_scheduler.MultiStepLR(
             o, milestones=[2, 5, 9], gamma=0.1)),
        ({"type": "ExponentialLR", "args": {"gamma": 0.9}},
         lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.9)),
        ({"type": "CosineAnnealingLR", "args": {"T_max": 5,
                                                "eta_min": 1e-5}},
         lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
             o, T_max=5, eta_min=1e-5)),
        ({"type": "LinearLR", "args": {"start_factor": 0.25,
                                       "end_factor": 1.0, "total_iters": 4}},
         lambda o: torch.optim.lr_scheduler.LinearLR(
             o, start_factor=0.25, end_factor=1.0, total_iters=4)),
    ],
    ids=["step", "multistep", "exponential", "cosine", "linear"],
)
def test_schedule_matches_torch(cfg, ctor):
    base = 0.1
    sched, _ = build_schedule(cfg, base)
    ours = np.asarray([float(sched(jnp.asarray(i))) for i in range(12)])
    want = _torch_lrs(ctor, base)
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-9)


def test_schedule_threads_into_update_scale():
    # the schedule must drive the actual update magnitude via the count
    # INSIDE opt_state (the resume-safety property)
    tx, _ = build_optimizer(
        {"type": "SGD", "args": {"lr": 1.0}},
        {"type": "StepLR", "args": {"step_size": 2, "gamma": 0.1}},
    )
    params = {"w": jnp.ones(())}
    state = tx.init(params)
    mags = []
    for _ in range(4):
        updates, state = tx.update({"w": jnp.ones(())}, state, params)
        mags.append(abs(float(updates["w"])))
    np.testing.assert_allclose(mags, [1.0, 1.0, 0.1, 0.1], rtol=1e-6)


# -------------------------------- errors -------------------------------------


def test_unknown_optimizer_and_args_raise():
    with pytest.raises(ValueError, match="unknown optimizer type"):
        build_optimizer({"type": "LBFGS"})
    with pytest.raises(ValueError, match="unknown Adam args"):
        build_optimizer({"type": "Adam", "args": {"lr": 1e-3, "bogus": 1}})
    with pytest.raises(ValueError, match="unknown lr_scheduler type"):
        build_optimizer({}, {"type": "OneCycleLR", "args": {}})
    with pytest.raises(ValueError, match="duplicated"):
        build_optimizer({"type": "Adam", "lr": 1e-3, "args": {"lr": 1e-4}})
