"""Optimizer / lr-scheduler factory for the training CLI.

The reference ships no training loop, but its config system documents the
intended training surface: ``parse_config.py:84-112`` reflection-instantiates
arbitrary ``torch.optim`` optimizers and ``torch.optim.lr_scheduler``
schedulers from json sections of the pytorch-template shape::

    "optimizer":    {"type": "Adam",   "args": {"lr": 1e-4, "weight_decay": 0}},
    "lr_scheduler": {"type": "StepLR", "args": {"step_size": 50, "gamma": 0.1}}

This module honors that surface with optax, torch-faithfully:

- ``Adam``  -> L2-coupled weight decay (torch adds ``wd*p`` to the gradient
  BEFORE the moment updates), betas/eps honored;
- ``AdamW`` -> decoupled decay (optax.adamw semantics == torch.optim.AdamW);
- ``SGD``   -> torch's momentum buffer (``buf = m*buf + g``; nesterov uses
  ``g + m*buf``) — optax.sgd matches exactly;
- ``RMSprop`` -> torch defaults (alpha/eps/momentum/centered);
- schedulers ``StepLR`` / ``MultiStepLR`` / ``ExponentialLR`` /
  ``CosineAnnealingLR`` / ``LinearLR`` as closed-form optax schedules.

One deliberate divergence, documented: torch schedulers step per EPOCH by
convention; this framework has no epoch notion (infinite window sampler), so
the schedule index is the OPTIMIZER STEP. Configs express boundaries in
steps.

Two resume-critical design rules:

1. The schedule is passed to the optimizer as a callable
   (``optax.scale_by_learning_rate(schedule)``), so the schedule position is
   the step count ALREADY INSIDE ``opt_state`` — a restored train-state
   checkpoint (train/trainer.py:restore_train_state_orbax) resumes
   mid-schedule bit-exactly with no extra bookkeeping
   (tests/test_train_state.py::test_exact_resume_mid_schedule).
2. ``grad_clip`` (global-norm clipping, the torch
   ``clip_grad_norm_`` analog) chains BEFORE the optimizer, so clipping sees
   raw gradients like the conventional torch loop.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _canon(cfg: Optional[Dict[str, Any]], default_type: str) -> Tuple[str, Dict]:
    """Accept both the reference pytorch-template shape
    ``{"type": Name, "args": {...}}`` and the framework's earlier flat shape
    ``{"lr": ...}`` (backward compatible: a bare ``{"lr": 1e-4}`` is Adam)."""
    cfg = dict(cfg or {})
    name = str(cfg.pop("type", default_type))
    args = dict(cfg.pop("args", {}))
    # flat keys outside "args" merge in (flat shape / convenience overrides);
    # a key in both is a config error worth failing loudly on
    overlap = set(args) & set(cfg)
    if overlap:
        raise ValueError(f"config keys duplicated inside and outside 'args': "
                         f"{sorted(overlap)}")
    args.update(cfg)
    return name, args


def build_schedule(
    scheduler_cfg: Optional[Dict[str, Any]], base_lr: float
) -> Tuple[Any, str]:
    """``lr_scheduler`` config -> (optax schedule fn | float, description).

    Without a scheduler section the schedule is constant ``base_lr``.
    Names/args mirror ``torch.optim.lr_scheduler`` (the reference's
    reflection target); the index is the optimizer step (see module doc).
    """
    import jax.numpy as jnp

    if not scheduler_cfg:
        # a plain float (not a constant callable): scale_by_learning_rate
        # then yields a STATELESS transform, so the opt_state tree is
        # identical to optax.adam(lr) — pre-existing .state checkpoints
        # saved against the hard-coded-Adam CLI keep restoring.
        return base_lr, f"constant(lr={base_lr:g})"
    name, a = _canon(scheduler_cfg, "StepLR")
    key = name.lower()

    if key == "steplr":
        step_size = int(a.pop("step_size"))
        gamma = float(a.pop("gamma", 0.1))

        def sched(count):
            return base_lr * gamma ** (count // step_size)

        desc = f"StepLR(step_size={step_size}, gamma={gamma:g})"
    elif key == "multisteplr":
        milestones = np.asarray(sorted(int(m) for m in a.pop("milestones")))
        gamma = float(a.pop("gamma", 0.1))

        def sched(count):
            n = jnp.sum(jnp.asarray(milestones) <= count)
            return base_lr * gamma ** n

        desc = f"MultiStepLR(milestones={milestones.tolist()}, gamma={gamma:g})"
    elif key == "exponentiallr":
        gamma = float(a.pop("gamma"))

        def sched(count):
            return base_lr * gamma ** count

        desc = f"ExponentialLR(gamma={gamma:g})"
    elif key == "cosineannealinglr":
        t_max = int(a.pop("T_max"))
        eta_min = float(a.pop("eta_min", 0.0))

        def sched(count):
            return eta_min + (base_lr - eta_min) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * (count % (2 * t_max)) / t_max)
            )

        desc = f"CosineAnnealingLR(T_max={t_max}, eta_min={eta_min:g})"
    elif key == "linearlr":
        start = float(a.pop("start_factor", 1.0 / 3.0))
        end = float(a.pop("end_factor", 1.0))
        total = int(a.pop("total_iters", 5))

        def sched(count):
            frac = jnp.clip(count / total, 0.0, 1.0)
            return base_lr * (start + (end - start) * frac)

        desc = (f"LinearLR(start_factor={start:g}, end_factor={end:g}, "
                f"total_iters={total})")
    else:
        raise ValueError(
            f"unknown lr_scheduler type {name!r} (supported: StepLR, "
            "MultiStepLR, ExponentialLR, CosineAnnealingLR, LinearLR)"
        )
    if a:
        raise ValueError(f"unknown {name} args: {sorted(a)}")
    return sched, desc


def build_optimizer(
    optimizer_cfg: Optional[Dict[str, Any]] = None,
    scheduler_cfg: Optional[Dict[str, Any]] = None,
):
    """Build the training gradient transform from json config sections.

    Returns ``(tx, description)``. ``tx`` is a single optax transform whose
    state carries the schedule position (resume-safe); ``description`` is a
    one-line human summary for the training log.

    ``optimizer`` keys (torch names, case-insensitive): ``type`` (Adam |
    AdamW | SGD | RMSprop), ``lr``, ``weight_decay``, ``betas``/``eps``
    (Adam/AdamW), ``momentum``/``nesterov``/``dampening`` (SGD),
    ``alpha``/``momentum``/``centered`` (RMSprop), plus the framework
    extension ``grad_clip`` (clip gradients to this global norm before the
    update — torch loops do this manually with ``clip_grad_norm_``).
    """
    import optax

    name, a = _canon(optimizer_cfg, "Adam")
    key = name.lower()
    lr = float(a.pop("lr", 1e-4))
    grad_clip = a.pop("grad_clip", None)
    # torch defaults differ by optimizer: AdamW decays at 1e-2 unless told
    # otherwise, everything else defaults to no decay — an explicit 0 must
    # win over the AdamW default, so "absent" is distinguished from 0 here
    wd_raw = a.pop("weight_decay", None)
    wd = float(wd_raw) if wd_raw is not None else (
        1e-2 if key == "adamw" else 0.0)
    sched, sched_desc = build_schedule(scheduler_cfg, lr)

    parts = []
    if key == "adam":
        b1, b2 = a.pop("betas", (0.9, 0.999))
        eps = float(a.pop("eps", 1e-8))
        if wd:
            # torch Adam couples decay INTO the gradient before the moments
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_adam(b1=float(b1), b2=float(b2), eps=eps))
        parts.append(optax.scale_by_learning_rate(sched))
        desc = f"Adam(lr={lr:g}, betas=({b1}, {b2}), weight_decay={wd:g})"
    elif key == "adamw":
        b1, b2 = a.pop("betas", (0.9, 0.999))
        eps = float(a.pop("eps", 1e-8))
        parts.append(optax.scale_by_adam(b1=float(b1), b2=float(b2), eps=eps))
        # decoupled: decay joins AFTER the moment rescale (torch AdamW /
        # Loshchilov-Hutter), then both scale by the lr schedule together
        parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_learning_rate(sched))
        desc = f"AdamW(lr={lr:g}, betas=({b1}, {b2}), weight_decay={wd:g})"
    elif key == "sgd":
        momentum = float(a.pop("momentum", 0.0))
        nesterov = bool(a.pop("nesterov", False))
        dampening = float(a.pop("dampening", 0.0))
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        if momentum:
            parts.append(
                optax.trace(decay=momentum, nesterov=nesterov,
                            accumulator_dtype=None)
            )
            if dampening:
                raise ValueError("SGD dampening is not supported")
        parts.append(optax.scale_by_learning_rate(sched))
        desc = (f"SGD(lr={lr:g}, momentum={momentum:g}, nesterov={nesterov}, "
                f"weight_decay={wd:g})")
    elif key == "rmsprop":
        alpha = float(a.pop("alpha", 0.99))
        eps = float(a.pop("eps", 1e-8))
        momentum = float(a.pop("momentum", 0.0))
        centered = bool(a.pop("centered", False))
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        # torch adds eps OUTSIDE the sqrt (update = g / (sqrt(nu) + eps));
        # optax's historical default is inside — eps_in_sqrt=False matches
        make = optax.scale_by_stddev if centered else optax.scale_by_rms
        parts.append(
            make(decay=alpha, eps=eps, initial_scale=0.0, eps_in_sqrt=False)
        )
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=False))
        parts.append(optax.scale_by_learning_rate(sched))
        desc = f"RMSprop(lr={lr:g}, alpha={alpha:g}, momentum={momentum:g})"
    else:
        raise ValueError(
            f"unknown optimizer type {name!r} (supported: Adam, AdamW, SGD, "
            "RMSprop)"
        )
    if a:
        raise ValueError(f"unknown {name} args: {sorted(a)}")

    if grad_clip is not None:
        parts.insert(0, optax.clip_by_global_norm(float(grad_clip)))
        desc += f" + clip_by_global_norm({float(grad_clip):g})"
    tx = parts[0] if len(parts) == 1 else optax.chain(*parts)
    return tx, f"{desc} | {sched_desc}"
