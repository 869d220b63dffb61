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


def _timeit(fn, iters):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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

    rows = [
        ("events_to_image", lambda: events_to_image(px, py, pp, nv, sensor_size=sensor)),
        ("events_to_image_bilinear",
         lambda: events_to_image_bilinear(fx, fy, pp, nv, sensor_size=sensor)),
        (f"events_to_voxel (B={args.num_bins})",
         lambda: events_to_voxel(px, py, pt, pp, nv, num_bins=args.num_bins,
                                 sensor_size=sensor)),
        ("events_to_neg_pos_voxel",
         lambda: events_to_neg_pos_voxel(px, py, pt, pp, nv,
                                         num_bins=args.num_bins, sensor_size=sensor)),
        ("events_to_timestamp_image",
         lambda: events_to_timestamp_image(fx, fy, pt, pp, nv, sensor_size=sensor)),
    ]
    for name, fn in rows:
        dt = _timeit(fn, args.iters)
        print(f"{name:32s} {dt*1e3:9.3f} ms  ({n/dt/1e6:8.1f} Mev/s)")

    # batched voxelization (64 windows at once — the pipeline's shape)
    B = 64
    bx = np.tile(px, (B, 1)); by = np.tile(py, (B, 1))
    bt = np.tile(pt, (B, 1)); bp = np.tile(pp, (B, 1))
    bn = np.full(B, nv, np.int32)
    vb = jax.jit(jax.vmap(
        lambda x, y, t, q, m: events_to_voxel(x, y, t, q, m,
                                              num_bins=args.num_bins,
                                              sensor_size=sensor)))
    dt = _timeit(lambda: vb(bx, by, bt, bp, bn), max(args.iters // 4, 1))
    print(f"{'batched voxel (64 windows)':32s} {dt*1e3:9.3f} ms  ({B*n/dt/1e6:8.1f} Mev/s)")

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
