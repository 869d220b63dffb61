"""Flagship runtime breakdown by ablation (feeds docs/DESIGN.md's profile).

Measures frames/sec of the bench configuration (bf16, T=16, 184x240) for:

- full            : the benched model (Pallas attention, sequential parity scan)
- no_attention    : depths zeroed -> encoders + decoders + scans only
- xla_attention   : fused Pallas kernel off (XLA attention, same semantics)
- parallel_attn   : non-parity batched attention (_AttnParallel)

The difference full - no_attention is the attention share of runtime;
no_attention lumps the recurrent encoder scans with the T-batched
decoder (the decoder is a handful of (T*N)-batched convs — per the
scan_unroll experiment in docs/DESIGN.md, the conv work itself, not
scan overhead, dominates that remainder).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_flagship.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# runnable as `python tools/profile_flagship.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, BINS, T = 184, 240, 5, 16


def measure(cfg_overrides, label, batch=1):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _FLAGSHIP_CFG
    from bde2vid_tpu.models import build_model

    cfg = {"generator": dict(_FLAGSHIP_CFG["generator"])}
    cfg["generator"].update(cfg_overrides)
    model = build_model("BDE2VID", cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    voxels = jnp.asarray(
        rng.normal(size=(T, batch, H, W, BINS)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), voxels[:2, :1])
    run = jax.jit(lambda v: model.apply(params, v)[0]["image"])
    # readback barrier: block_until_ready returns early while the axon
    # plugin's deferred first-execution compile is pending (see bench.py)
    float(jnp.sum(run(voxels)))
    iters = 3
    best = float("inf")
    for _ in range(2):  # best-of-2 (see bench.py)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(voxels)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0))
    fps = T * batch * iters / best
    print(json.dumps({"variant": label, "batch": batch, "fps": round(fps, 2),
                      "ms_per_frame": round(1000.0 / fps, 3)}), flush=True)
    return fps


def main():
    from bde2vid_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if "--batch" in sys.argv:
        main_batch()
        return
    full = measure({"use_pallas_attention": True}, "full")
    noattn = measure(
        {"use_pallas_attention": True, "depths": [0] * 3}, "no_attention"
    )
    # glue_only: full attention path with the Pallas kernel replaced by a
    # DCE-proof passthrough (BDE2VID_ATTN_IDENTITY in fused_swin_block) —
    # glue_only - no_attention = the XLA glue around the kernel (buffer
    # gather, center pad/partition/reverse, dilated blend), kernel excluded.
    os.environ["BDE2VID_ATTN_IDENTITY"] = "1"
    glue = measure({"use_pallas_attention": True}, "glue_only")
    del os.environ["BDE2VID_ATTN_IDENTITY"]
    measure({}, "xla_attention")
    measure({"parallel_attention": True}, "parallel_attn")
    attn_ms = 1000.0 / full - 1000.0 / noattn
    glue_ms = 1000.0 / glue - 1000.0 / noattn
    print(
        json.dumps(
            {
                "glue_ms_per_frame": round(glue_ms, 3),
                "kernel_ms_per_frame": round(attn_ms - glue_ms, 3),
            }
        )
    )
    print(
        json.dumps(
            {
                "attention_ms_per_frame": round(attn_ms, 3),
                "attention_share": round(attn_ms / (1000.0 / full), 3),
            }
        )
    )


def main_batch():
    """Where does batch>1 aggregate throughput go? (BENCHMARKS.md batch
    table: 194 f/s at N=1 vs 174 at N=2 in round 2.) Ablates the same
    variants per batch size so the regressing component is identifiable:
    attention-off isolates the conv/scan path, xla_attention isolates the
    Pallas kernel's batched window grid."""
    for batch in (1, 2, 4):
        measure({"use_pallas_attention": True}, "full", batch=batch)
        measure({"use_pallas_attention": True, "depths": [0] * 3},
                "no_attention", batch=batch)
        measure({}, "xla_attention", batch=batch)


if __name__ == "__main__":
    main()
