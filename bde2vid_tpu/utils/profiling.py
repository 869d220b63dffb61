"""Model cost reporting: params, per-frame FLOPs, HBM traffic.

Uses XLA's own compiled-cost analysis — the analog of the reference's
param-count logging (e2vid/base_model.py:28-35) plus what it never had:
compiler-verified FLOP counts.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def model_cost_summary(spec, height: int = 184, width: int = 240, t: int = 2) -> Dict:
    """Compile the forward and report XLA cost analysis per frame.

    The input is padded to a multiple of 2^num_encoders like the eval
    driver's CropParameters — unpadded sizes make the decoder skip-sums
    shape-mismatch for families like E2VIDRecurrent (4 encoders at the
    default 184 would go 184->...->23->12->24 vs the 23-row skip)."""
    from bde2vid_tpu.utils.padding import optimal_crop_size

    ne = int(getattr(spec, "num_encoders", 0) or 0)
    if ne > 0:
        height = optimal_crop_size(height, ne)
        width = optimal_crop_size(width, ne)
    if spec.is_sequence_model:
        args = (jnp.zeros((t, 1, height, width, spec.num_bins)),)
        fn = lambda v: spec.module.apply(spec.params, v)[0]["image"]
        frames = t
    else:
        state = spec.module.initial_state(1, height, width)
        args = (jnp.zeros((1, height, width, spec.num_bins)), state)
        fn = lambda v, s: spec.module.apply(spec.params, v, s)[0]["image"]
        frames = 1
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))
    return {
        "name": spec.name,
        "params": spec.num_params,
        "gflops_per_frame": flops / frames / 1e9,
        "hbm_gb_per_frame": bytes_ / frames / 1e9,
    }
