"""Timing utilities with atexit summary (reference utils_func/timers.py).

``CudaTimer`` becomes a device timer that calls ``block_until_ready`` on a
sentinel array — the JAX equivalent of CUDA-event timing (XLA is async; wall
time without a sync measures dispatch, not compute).
"""

from __future__ import annotations

import atexit
import time
from collections import defaultdict
from typing import Dict, List

import jax

_timers: Dict[str, List[float]] = defaultdict(list)
_enabled = True


def set_enabled(flag: bool):
    global _enabled
    _enabled = flag


class Timer:
    """Wall-clock context timer accumulating per-name statistics."""

    def __init__(self, name: str = "timer"):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.interval = time.perf_counter() - self.t0
        if _enabled:
            _timers[self.name].append(self.interval)


class CudaTimer(Timer):
    """Device-synchronized timer (reference CudaTimer, timers.py:15-38):
    hand the output array(s) to ``sync(out)`` (or assign ``self.result``)
    inside the block so __exit__ measures device compute, not async
    dispatch."""

    def __init__(self, name: str = "device_timer"):
        super().__init__(name)
        self.result = None

    def sync(self, result):
        """Record the device output(s) to block on at exit; returns them."""
        self.result = result
        return result

    def __exit__(self, *exc):
        if self.result is not None:
            jax.block_until_ready(self.result)
        super().__exit__(*exc)


def timer_summary() -> str:
    lines = []
    for name, vals in sorted(_timers.items()):
        n = len(vals)
        total = sum(vals)
        lines.append(
            f"{name}: n={n} total={total*1e3:.1f}ms mean={total/n*1e3:.3f}ms "
            f"min={min(vals)*1e3:.3f}ms max={max(vals)*1e3:.3f}ms"
        )
    return "\n".join(lines)


@atexit.register
def _print_summary():  # pragma: no cover
    if _timers and _enabled:
        print("== timer summary ==")
        print(timer_summary())


class DeviceTrace:
    """Context manager around jax.profiler.trace: writes a TensorBoard-
    compatible device trace (the jax analog of the reference's CUDA-event
    timing infra, utils_func/timers.py)."""

    def __init__(self, log_dir: str = "/tmp/bde2vid_trace"):
        self.log_dir = log_dir

    def __enter__(self):
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        if _enabled:
            print(f"device trace written to {self.log_dir}")
