"""Benchmark: frames/sec/chip on the FLAGSHIP model (BDE2VID).

Measures the device path at the reference's native protocol (240x180
sensor padded to /8, 5-bin voxels): the full bidirectional BDE2VID
generator (basechannels 32, 3 levels, attention depths [4,0,6], 16 heads,
7x7 windows) over a T-step sequence, one jitted program. Baseline = an
E2VID-class recurrent CNN of the same backbone scale in PyTorch on CPU
(the only hardware the reference runs on here); BASELINE.md's target is
>= 10x that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


H, W, BINS, T = 184, 240, 5, 16  # 180x240 padded to /8 (compile ~2min; scan makes T-throughput stable)
CFG = {
    "num_bins": BINS,
    "num_encoders": 3,
    "base_num_channels": 32,
    "num_residual_blocks": 2,
    "recurrent_block_type": "convlstm",
}


def bench_tpu() -> float:
    import jax
    import jax.numpy as jnp

    from bde2vid_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _FLAGSHIP_CFG
    from bde2vid_tpu.models import build_model

    # throughput config: bf16 compute + the fused Pallas window-attention
    # kernel (numerics within bf16 noise of the f32 parity path, which the
    # eval driver uses by default)
    cfg = {"generator": dict(_FLAGSHIP_CFG["generator"])}
    cfg["generator"]["use_pallas_attention"] = True
    model = build_model("BDE2VID", cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    voxels = jnp.asarray(rng.normal(size=(T, 1, H, W, BINS)).astype(np.float32))
    # params are T-independent: init on a 2-step sequence (much cheaper trace)
    params = model.init(jax.random.PRNGKey(0), voxels[:2])

    run = jax.jit(lambda v: model.apply(params, v)[0]["image"])
    imgs = run(voxels)
    jax.block_until_ready(imgs)  # compile + warm-up

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        imgs = run(voxels)
    jax.block_until_ready(imgs)
    dt = (time.perf_counter() - t0) / iters
    return T / dt


def bench_torch_cpu() -> float:
    """Same-architecture PyTorch model on CPU (few steps, extrapolated)."""
    import torch

    class ConvLSTM(torch.nn.Module):
        def __init__(self, c):
            super().__init__()
            self.g = torch.nn.Conv2d(2 * c, 4 * c, 3, padding=1)

        def forward(self, x, hc):
            h, c = hc
            i, f, o, g = self.g(torch.cat([x, h], 1)).chunk(4, 1)
            c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
            h = torch.sigmoid(o) * torch.tanh(c)
            return h, (h, c)

    class Net(torch.nn.Module):
        def __init__(self, base=32, enc=3, nres=2):
            super().__init__()
            self.head = torch.nn.Conv2d(BINS, base, 5, padding=2)
            chans = [base * 2**i for i in range(enc + 1)]
            self.enc = torch.nn.ModuleList(
                torch.nn.Conv2d(chans[i], chans[i + 1], 5, 2, 2) for i in range(enc)
            )
            self.lstm = torch.nn.ModuleList(ConvLSTM(chans[i + 1]) for i in range(enc))
            self.res = torch.nn.ModuleList(
                torch.nn.Conv2d(chans[-1], chans[-1], 3, padding=1) for _ in range(2 * nres)
            )
            self.dec = torch.nn.ModuleList(
                torch.nn.Conv2d(chans[enc - i], chans[enc - i] // 2, 5, padding=2)
                for i in range(enc)
            )
            self.pred = torch.nn.Conv2d(base, 1, 1)

        def forward(self, x, states):
            x = torch.relu(self.head(x))
            head = x
            blocks, new_states = [], []
            for conv, cell, st in zip(self.enc, self.lstm, states):
                x = torch.relu(conv(x))
                x, st = cell(x, st)
                blocks.append(x)
                new_states.append(st)
            for r in self.res:
                x = torch.relu(r(x))
            for i, d in enumerate(self.dec):
                x = torch.nn.functional.interpolate(x + blocks[-1 - i], scale_factor=2)
                x = torch.relu(d(x))
            return torch.sigmoid(self.pred(x + head)), new_states

    net = Net().eval()
    x = torch.randn(1, BINS, H, W)
    states = []
    h, w = H, W
    for i in range(3):
        h, w = h // 2, w // 2
        c = 32 * 2 ** (i + 1)
        z = torch.zeros(1, c, h, w)
        states.append((z, z.clone()))
    steps = 6
    with torch.no_grad():
        net(x, states)  # warm-up
        t0 = time.perf_counter()
        for _ in range(steps):
            _, states = net(x, states)
        dt = time.perf_counter() - t0
    return steps / dt


def main():
    try:
        fps = bench_tpu()
    except Exception:
        # transient remote-compile failures happen on the tunneled TPU;
        # one retry before failing loudly
        fps = bench_tpu()
    try:
        cpu_fps = bench_torch_cpu()
    except Exception:
        cpu_fps = float("nan")
    vs = fps / cpu_fps if cpu_fps == cpu_fps else float("nan")
    print(
        json.dumps(
            {
                "metric": "bde2vid_frames_per_sec_240x180",
                "value": round(fps, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(vs, 2) if vs == vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
