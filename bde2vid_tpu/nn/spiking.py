"""Spiking neuron primitives as pure state-update functions.

Reference: model/EVSNN/neurons/spiking_neuron.py. The reference wraps
spikingjelly MemoryModules (hidden ``self.v`` state, optional CuPy kernels);
here every neuron is a pure ``(v, x, ...) -> (out, v')`` update — a scan
carry — with the ATan surrogate gradient as a ``jax.custom_vjp``.

Semantics preserved:
- firing nodes (LIF/IF/PLIF, :476-556): charge -> heaviside fire (ATan
  surrogate grad) -> soft reset (v_reset=None: v -= spike*threshold) or hard
  reset (v = (1-spike)*v + spike*v_reset)
- membrane nodes (MpLIF/MpIF/Mp_AdaLIF, :123-234, 349-393): infinite
  threshold, never fire; output IS the membrane. Mp_AdaLIF's leak is
  ``sigmoid(w)`` with w predicted per-sample (:384-393).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.custom_vjp
def atan_spike(x: Array, alpha: float = 2.0) -> Array:
    """Heaviside forward, ATan surrogate backward (spikingjelly surrogate.ATan):
    d/dx = alpha / (2 * (1 + (pi/2 * alpha * x)^2))."""
    return (x >= 0).astype(x.dtype)


def _atan_fwd(x, alpha):
    return atan_spike(x, alpha), (x, alpha)


def _atan_bwd(res, g):
    x, alpha = res
    grad = alpha / 2.0 / (1.0 + (math.pi / 2.0 * alpha * x) ** 2)
    return (g * grad, None)


atan_spike.defvjp(_atan_fwd, _atan_bwd)


def _reset(v: Array, spike: Array, v_threshold: float, v_reset: Optional[float]):
    if v_reset is None:  # soft reset
        return v - spike * v_threshold
    return (1.0 - spike) * v + spike * v_reset


def lif_step(
    v: Array,
    x: Array,
    tau: float = 2.0,
    v_threshold: float = 1.0,
    v_reset: Optional[float] = None,
    alpha: float = 2.0,
) -> Tuple[Array, Array]:
    """LIF firing neuron: charge v += (x - (v - v_reset?))/tau, fire, reset.

    Returns (spike, new_v)."""
    if v_reset is None or v_reset == 0.0:
        v = v + (x - v) / tau
    else:
        v = v + (x - (v - v_reset)) / tau
    spike = atan_spike(v - v_threshold, alpha)
    return spike, _reset(v, spike, v_threshold, v_reset)


def if_step(
    v: Array,
    x: Array,
    v_threshold: float = 1.0,
    v_reset: Optional[float] = None,
    alpha: float = 2.0,
) -> Tuple[Array, Array]:
    """Integrate-and-fire: v += x, fire, reset."""
    v = v + x
    spike = atan_spike(v - v_threshold, alpha)
    return spike, _reset(v, spike, v_threshold, v_reset)


def plif_step(
    v: Array,
    x: Array,
    w: Array,
    v_threshold: float = 1.0,
    v_reset: Optional[float] = None,
    alpha: float = 2.0,
) -> Tuple[Array, Array]:
    """Parametric LIF: learnable leak sigmoid(w) (reference :533-556).
    w is a learned scalar parameter; init w = -log(init_tau - 1)."""
    leak = jax.nn.sigmoid(w)
    if v_reset is None or v_reset == 0.0:
        v = v + (x - v) * leak
    else:
        v = v + (x - (v - v_reset)) * leak
    spike = atan_spike(v - v_threshold, alpha)
    return spike, _reset(v, spike, v_threshold, v_reset)


def mp_lif_step(v: Array, x: Array, tau: float = 2.0) -> Array:
    """Non-firing LIF membrane integrator (MpLIFNode, infinite threshold):
    v' = v + (x - v)/tau; output == v'. v_reset=None path (:349-369)."""
    return v + (x - v) / tau


def mp_if_step(v: Array, x: Array) -> Array:
    """Non-firing IF membrane: v' = v + x (:419-426)."""
    return v + x


def mp_ada_lif_step(v: Array, x: Array, w: Array) -> Array:
    """Adaptive-leak membrane: v' = v + (x - v) * sigmoid(w), w predicted
    per sample by a pooled MLP (Mp_AdaLIFNode, :371-393)."""
    return v + (x - v) * jax.nn.sigmoid(w)
