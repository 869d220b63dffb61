"""Rasterization micro-benchmark harness.

Reference parity: event_utils.py:763-856 ships a ``__main__`` that times
every voxelization path on an event file — the repo's only performance
harness. This is the TPU version:

    python -m bde2vid_tpu.events.bench_voxel [--h5 FILE] [--iters N]

Times (device, block_until_ready): integer image, bilinear image, combined
voxel, pos/neg voxel, timestamp image, batched voxelization, native C++
packing + CPU voxelizer, and the h5 binary search (host).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _readback(out):
    """Warm-up barrier: a VALUE readback, not block_until_ready — the axon
    plugin defers its real compile to first execution and block returns
    early while it is pending (r3 finding; block is reliable only after
    one readback-synced execution)."""
    import jax
    import numpy as np

    leaf = out[0] if isinstance(out, tuple) else out
    np.asarray(jax.tree_util.tree_leaves(leaf)[0]).ravel()[:1]


def _timeit(fn, iters):
    import jax

    _readback(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _chained_timeit(op_of_p, pp, iters, chain=20):
    """Time a device op with ``chain`` DEPENDENT calls inside one jit.

    One dispatch per iteration would measure the remote-TPU tunnel's
    ~1-2 ms per-dispatch latency instead of the sub-ms kernel (see
    CLAUDE.md round-2 facts). The carry feeds back through a
    ``where(carry == carry, ...)`` guard — runtime-identity for non-NaN
    values but opaque to the compiler, so the calls cannot be CSE'd or
    reordered. Returns seconds per single op call."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(p):
        carry = jnp.zeros((), p.dtype)
        out = None
        for _ in range(chain):
            dep_p = jnp.where(carry == carry, p, jnp.zeros_like(p))
            out = op_of_p(dep_p)
            carry = jnp.sum(
                out[0] if isinstance(out, tuple) else out
            ).astype(p.dtype)
        return carry

    _readback(run(pp))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(pp)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * chain)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--h5", default=None, help="event h5 file (synthetic if absent)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--n_events", type=int, default=150_000)
    p.add_argument("--num_bins", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bde2vid_tpu.events.voxel import (
        events_to_image,
        events_to_image_bilinear,
        events_to_neg_pos_voxel,
        events_to_timestamp_image,
        events_to_voxel,
        pad_events,
    )

    if args.h5:
        from bde2vid_tpu.events import H5EventReader

        r = H5EventReader(args.h5)
        sl = r.events(0, min(args.n_events, r.num_events))
        xs, ys, ts, ps = sl.xs, sl.ys, sl.ts, sl.ps
        sensor = r.sensor_size
        t_search = _timeit(lambda: r.search_time(float(sl.ts[len(sl.ts) // 2])), args.iters)
        print(f"h5 binary search:        {t_search*1e3:9.3f} ms")
    else:
        rng = np.random.default_rng(0)
        sensor = (180, 240)
        n = args.n_events
        xs = rng.integers(0, sensor[1], n).astype(np.int32)
        ys = rng.integers(0, sensor[0], n).astype(np.int32)
        ts = np.sort(rng.uniform(0, 0.05, n)).astype(np.float32)
        ps = rng.choice(np.array([-1.0, 1.0], np.float32), n)

    n = len(xs)
    px, py, pt, pp, nv = pad_events(xs, ys, ts, ps)
    fx = jnp.asarray(px, jnp.float32)
    fy = jnp.asarray(py, jnp.float32)
    device = jax.devices()[0].platform
    print(f"{n} events, sensor {sensor}, device {device}, iters {args.iters}")

    # sub-ms kernels: chained-dependent calls in ONE jit (the polarity /
    # weight buffer is the dependency-threaded argument)
    ppj = jnp.asarray(pp)
    rows = [
        ("events_to_image", lambda p: events_to_image(px, py, p, nv, sensor_size=sensor)),
        ("events_to_image_bilinear",
         lambda p: events_to_image_bilinear(fx, fy, p, nv, sensor_size=sensor)),
        (f"events_to_voxel (B={args.num_bins})",
         lambda p: events_to_voxel(px, py, pt, p, nv, num_bins=args.num_bins,
                                   sensor_size=sensor)),
        ("events_to_neg_pos_voxel",
         lambda p: events_to_neg_pos_voxel(px, py, pt, p, nv,
                                           num_bins=args.num_bins, sensor_size=sensor)),
        ("events_to_timestamp_image",
         lambda p: events_to_timestamp_image(fx, fy, pt, p, nv, sensor_size=sensor)),
    ]
    for name, fn in rows:
        dt = _chained_timeit(fn, ppj, max(args.iters // 4, 1))
        print(f"{name:32s} {dt*1e3:9.3f} ms  ({n/dt/1e6:8.1f} Mev/s)")

    # batched voxelization (64 windows at once — the pipeline's shape).
    # device_put FIRST: feeding host numpy would re-ship ~270 MB through the
    # remote-TPU tunnel per iteration and time the transfer, not the kernel
    B = 64
    bx = jax.device_put(np.tile(px, (B, 1)))
    by = jax.device_put(np.tile(py, (B, 1)))
    bt = jax.device_put(np.tile(pt, (B, 1)))
    bp = jax.device_put(np.tile(pp, (B, 1)))
    bn = jax.device_put(np.full(B, nv, np.int32))
    vb = jax.jit(jax.vmap(
        lambda x, y, t, q, m: events_to_voxel(x, y, t, q, m,
                                              num_bins=args.num_bins,
                                              sensor_size=sensor)))
    dt = _timeit(lambda: vb(bx, by, bt, bp, bn), max(args.iters // 4, 1))
    print(f"{'vmapped voxel (64 windows)':32s} {dt*1e3:9.3f} ms  ({B*n/dt/1e6:8.1f} Mev/s)")

    # scan batch: lax.scan of the single-window scatter (the pipeline's
    # path) — keeps each (H*W, B) accumulator on-chip instead of one
    # batch-wide HBM accumulator (4x, see events_to_voxel_batch docstring)
    from bde2vid_tpu.events.voxel import events_to_voxel_batch

    fb = jax.jit(lambda x, y, t, q, m: events_to_voxel_batch(
        x, y, t, q, m, num_bins=args.num_bins, sensor_size=sensor))
    dt = _timeit(lambda: fb(bx, by, bt, bp, bn), max(args.iters // 4, 1))
    print(f"{'scan batch voxel (64 windows)':32s} {dt*1e3:9.3f} ms  ({B*n/dt/1e6:8.1f} Mev/s)")

    from bde2vid_tpu.native import native_available, pack_windows, voxelize_batch_native

    if native_available():
        windows = np.array([[0, n]], np.int64)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            packed = pack_windows(
                xs.astype(np.int16), ys.astype(np.int16),
                np.asarray(ts, np.float64), (ps > 0).astype(np.uint8),
                windows, len(px),
            )
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{'native pack_windows':32s} {dt*1e3:9.3f} ms  ({n/dt/1e6:8.1f} Mev/s)")
        t0 = time.perf_counter()
        for _ in range(max(args.iters // 4, 1)):
            voxelize_batch_native(*packed, args.num_bins, sensor)
        dt = (time.perf_counter() - t0) / max(args.iters // 4, 1)
        print(f"{'native CPU voxelize':32s} {dt*1e3:9.3f} ms  ({n/dt/1e6:8.1f} Mev/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
