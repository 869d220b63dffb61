"""Event rasterization ops, designed TPU-first.

Capability parity with the reference rasterizers in
``events_contrast_maximization/utils/event_utils.py`` (events_to_image_torch
:330-376, events_to_voxel_torch :466-509, events_to_neg_pos_voxel_torch
:511-543, events_to_timestamp_image :251-320, get_hot_event_mask :100-116,
interpolate_to_image :176-184), but built for XLA rather than translated:

* **Static shapes.** Per-window event counts vary wildly; recompiling per count
  would kill TPU throughput. All ops take fixed-capacity event buffers plus an
  ``n_events`` scalar (or an explicit validity mask); :func:`pad_events`
  produces such buffers host-side with power-of-two bucketing.
* **One fused scatter.** The reference loops B times over the event list and
  issues one ``index_put_`` per temporal bin. Here the B bilinear bin weights
  are computed as a single ``(N, B)`` array and scattered in ONE
  ``scatter-add`` into an ``(H*W, B)`` accumulator — one pass over the events,
  B-wide vector adds per event row.
* **Masking instead of clipping.** Out-of-range / padded events get weight 0
  and index 0; there is no data-dependent control flow, so everything jits.

All functions are pure and jittable; shapes are static given the buffer
capacity, ``num_bins`` and ``sensor_size``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Host-side buffering
# ---------------------------------------------------------------------------


def _bucket_capacity(n: int, min_capacity: int = 1024) -> int:
    """Next power-of-two capacity >= n (>= min_capacity) to bound recompiles."""
    cap = max(int(min_capacity), 1)
    while cap < n:
        cap *= 2
    return cap


def pad_events(
    xs: np.ndarray,
    ys: np.ndarray,
    ts: np.ndarray,
    ps: np.ndarray,
    capacity: int | None = None,
    min_capacity: int = 1024,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Pad an event window to a static capacity (host-side helper).

    Returns ``(xs, ys, ts, ps, n_events)`` where arrays have length
    ``capacity`` (power-of-two bucketed if not given). Padding events sit at
    coordinate (0, 0) with polarity 0 and timestamp ``ts[-1]`` (so padded
    entries never perturb dt) and are additionally masked out on device.
    """
    n = len(xs)
    cap = capacity if capacity is not None else _bucket_capacity(n, min_capacity)
    if n > cap:
        raise ValueError(f"{n} events exceed capacity {cap}")
    t_fill = float(ts[-1]) if n > 0 else 0.0

    def _pad(a, fill, dtype):
        out = np.full((cap,), fill, dtype=dtype)
        out[:n] = a
        return out

    # float coordinates (bilinear path) keep their dtype; ints normalize to i32
    coord_dtype = (
        np.float32 if np.issubdtype(np.asarray(xs).dtype, np.floating) else np.int32
    )
    return (
        _pad(xs, 0, coord_dtype),
        _pad(ys, 0, coord_dtype),
        _pad(ts, t_fill, np.float32),
        _pad(ps, 0.0, np.float32),
        n,
    )


def _valid_mask(capacity: int, n_events: Array | int) -> Array:
    idx = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    return (idx < n_events).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Images
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("sensor_size",))
def events_to_image(
    xs: Array,
    ys: Array,
    ps: Array,
    n_events: Array | int,
    *,
    sensor_size: Tuple[int, int] = (180, 240),
) -> Array:
    """Integer-coordinate scatter-add of event polarities into an image.

    Matches the reference integer path (event_utils.py:371-375:
    ``img.index_put_((ys, xs), ps, accumulate=True)``) including duplicate
    coordinate accumulation. Out-of-range events are dropped.
    """
    h, w = sensor_size
    valid = _valid_mask(xs.shape[0], n_events)
    xs = xs.astype(jnp.int32)
    ys = ys.astype(jnp.int32)
    inb = ((xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)).astype(jnp.float32)
    weights = ps.astype(jnp.float32) * valid * inb
    flat = jnp.clip(ys, 0, h - 1) * w + jnp.clip(xs, 0, w - 1)
    img = jnp.zeros((h * w,), jnp.float32).at[flat].add(weights, mode="drop")
    return img.reshape(h, w)


@functools.partial(
    jax.jit, static_argnames=("sensor_size", "padding", "clip_weights")
)
def events_to_image_bilinear(
    xs: Array,
    ys: Array,
    ps: Array,
    n_events: Array | int,
    *,
    sensor_size: Tuple[int, int] = (180, 240),
    padding: bool = True,
    clip_weights: bool = True,
) -> Array:
    """Bilinear (4-corner) scatter of float-coordinate events into an image.

    Matches ``interpolate_to_image`` (event_utils.py:176-184): each event
    splits its weight over the 4 surrounding integer pixels by the fractional
    offsets. With ``padding`` the image gets a +1 guard row/col (reference
    event_utils.py:348) which is kept in the output, as the reference does.
    ``clip_weights=False`` reproduces the timestamp-image quirk: out-of-range
    events keep their weight and deposit it at the origin corner (their
    coordinates are zeroed, their fractions kept — reference
    events_to_timestamp_image scatters un-masked weights).
    """
    h, w = sensor_size
    if padding:
        h, w = h + 1, w + 1
    pxi, pyi, dx, dy, valid, inb = _bilinear_coords(xs, ys, n_events, h, w)
    gate = valid * inb if clip_weights else valid
    wgt = ps.astype(jnp.float32) * gate
    corners = jnp.stack(
        [
            wgt * (1.0 - dx) * (1.0 - dy),
            wgt * dx * (1.0 - dy),
            wgt * (1.0 - dx) * dy,
            wgt * dx * dy,
        ],
        axis=1,
    )[:, None, :]  # (N, 1, 4)
    return _corner_scatter(pxi, pyi, corners, h, w)[:, :, 0]


def _bilinear_coords(xs: Array, ys: Array, n_events, h: int, w: int):
    """Shared bilinear-scatter front end: floor/fractional coordinates plus
    the two masks SEPARATELY — ``valid`` (inside the padded event count) and
    ``inb`` (the reference clip at img_size-1, event_utils.py:223-237).
    Out-of-range events get their *coordinates* zeroed (``pxs*mask``, like
    the reference) while the fractional offsets keep the original
    coordinate's fraction; whether their WEIGHT is also zeroed is the
    caller's choice — the reference gates it for image/derivative scatters
    (``masked_ps``) but NOT for the timestamp image, whose out-of-range
    events deposit at the origin corner (see events_to_timestamp_image)."""
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    valid = _valid_mask(xs.shape[0], n_events)
    inb = ((xs < w - 1) & (ys < h - 1) & (xs >= 0) & (ys >= 0)).astype(jnp.float32)
    px = jnp.floor(xs)
    py = jnp.floor(ys)
    pxi = (px * inb).astype(jnp.int32)
    pyi = (py * inb).astype(jnp.int32)
    return pxi, pyi, xs - px, ys - py, valid, inb


def _corner_scatter(pxi: Array, pyi: Array, corners: Array, h: int, w: int) -> Array:
    """(N, K, 4) per-corner column blocks -> (h, w, K) accumulated planes.

    ONE width-4K row scatter at the base corner, then shift-and-add the
    four corner planes — 4N scalar scatter updates (measured 29 Mev/s
    on-chip) become N row updates like the voxel path (~70 Mev/s) plus
    three cheap shifted adds. base+1 / base+w offsets are in-bounds by the
    _bilinear_coords clip (xs < w-1, ys < h-1), matching a flat scatter.
    Single source of truth for events_to_image_bilinear (K=1) and
    events_to_image_drv (K=1+n_params)."""
    n, k, _ = corners.shape
    base = pyi * w + pxi
    acc = (
        jnp.zeros((h * w, k * 4), jnp.float32)
        .at[base]
        .add(corners.reshape(n, k * 4), mode="drop")
    )
    p = acc.reshape(h, w, k, 4)
    return (
        p[:, :, :, 0]
        + jnp.pad(p[:, :, :, 1], ((0, 0), (1, 0), (0, 0)))[:, :w]  # (x+1, y)
        + jnp.pad(p[:, :, :, 2], ((1, 0), (0, 0), (0, 0)))[:h, :]  # (x, y+1)
        + jnp.pad(p[:, :, :, 3], ((1, 0), (1, 0), (0, 0)))[:h, :w]  # (x+1, y+1)
    )


@functools.partial(jax.jit, static_argnames=("sensor_size", "padding"))
def events_to_image_drv(
    xs: Array,
    ys: Array,
    ps: Array,
    jx: Array,
    jy: Array,
    n_events: Array | int,
    *,
    sensor_size: Tuple[int, int] = (180, 240),
    padding: bool = True,
) -> Tuple[Array, Array]:
    """Bilinear IWE plus its ANALYTIC derivative image wrt warp parameters.

    Reference ``events_to_image_drv`` / ``interpolate_to_derivative_img``
    (event_utils.py:186-249): each warp parameter i gets a derivative plane
    accumulating, per corner, ``w1*d(corner)/dx + w2*d(corner)/dy`` where
    ``w1 = jx[i]*ps`` and ``w2 = jy[i]*ps``; ``jx``/``jy`` are the (P, N)
    jacobians of the warped coordinates wrt each parameter. The main image
    matches :func:`events_to_image_bilinear` exactly.

    Autodiff through the IWE replaces this for optimization (see cmax.py);
    this path exists for parity (the reference exposes derivative images as
    outputs) and as a cross-check of autodiff gradients. Out-of-range events
    must be pre-masked to coordinate 0 (the cmax chain's bounds mask does
    this); unlike torch, negative coordinates never wrap here.
    """
    h, w = sensor_size
    if padding:
        h, w = h + 1, w + 1
    pxi, pyi, dx, dy, valid, inb = _bilinear_coords(xs, ys, n_events, h, w)
    wgt = ps.astype(jnp.float32) * (valid * inb)  # reference masked_ps
    w1 = jx.astype(jnp.float32) * wgt  # (P, N)
    w2 = jy.astype(jnp.float32) * wgt
    img_corners = jnp.stack(
        [
            wgt * (1.0 - dx) * (1.0 - dy),
            wgt * dx * (1.0 - dy),
            wgt * (1.0 - dx) * dy,
            wgt * dx * dy,
        ],
        axis=1,
    )[:, None, :]  # (N, 1, 4)
    d_corners = jnp.stack(
        [
            w1 * (-(1.0 - dy)) + w2 * (-(1.0 - dx)),
            w1 * (1.0 - dy) + w2 * (-dx),
            w1 * (-dy) + w2 * (1.0 - dx),
            w1 * dy + w2 * dx,
        ],
        axis=-1,
    )  # (P, N, 4)
    cols = jnp.concatenate([img_corners, jnp.moveaxis(d_corners, 0, 1)], axis=1)
    out = _corner_scatter(pxi, pyi, cols, h, w)  # (h, w, P+1)
    return out[:, :, 0], jnp.moveaxis(out[:, :, 1:], -1, 0)


# ---------------------------------------------------------------------------
# Voxel grids
# ---------------------------------------------------------------------------


def _temporal_bilinear_weights(ts: Array, ps: Array, valid: Array, num_bins: int):
    """(N, B) per-event per-bin weights: ps * max(0, 1 - |t_norm - b|).

    t_norm = (ts - ts_first_valid) / dt * (B - 1), dt over the valid window
    (reference event_utils.py:489-495). dt == 0 (e.g. single event) yields
    t_norm = 0, i.e. everything lands in bin 0 — same limit the dataset layer
    enforces by zeroing degenerate windows.
    """
    n = jnp.maximum(
        jnp.sum(valid).astype(jnp.int32), 1
    )  # number of valid events, >= 1
    t0 = ts[0]
    t_last = ts[n - 1]
    dt = t_last - t0
    safe_dt = jnp.where(dt == 0, 1.0, dt)
    t_norm = (ts - t0) / safe_dt * (num_bins - 1)
    t_norm = jnp.where(dt == 0, jnp.zeros_like(t_norm), t_norm)
    bins = jnp.arange(num_bins, dtype=jnp.float32)[None, :]  # (1, B)
    bw = jnp.maximum(0.0, 1.0 - jnp.abs(t_norm[:, None] - bins))  # (N, B)
    return bw * (ps * valid)[:, None]


@functools.partial(jax.jit, static_argnames=("num_bins", "sensor_size"))
def events_to_voxel(
    xs: Array,
    ys: Array,
    ts: Array,
    ps: Array,
    n_events: Array | int,
    *,
    num_bins: int = 5,
    sensor_size: Tuple[int, int] = (180, 240),
) -> Array:
    """Events -> (B, H, W) voxel grid with temporal-bilinear binning.

    Behavioral spec from events_to_voxel_torch (event_utils.py:466-509), with
    ``clip_out_of_range=False`` semantics: the reference would error on
    out-of-range coordinates; we drop them (the data layer guarantees
    in-range coordinates, so this is only reachable for corrupted input).

    TPU-first formulation: one (N, B) weight matrix + ONE scatter-add into an
    (H*W, B) accumulator instead of B passes over the event list.
    """
    h, w = sensor_size
    valid = _valid_mask(xs.shape[0], n_events)
    weights = _temporal_bilinear_weights(
        ts.astype(jnp.float32), ps.astype(jnp.float32), valid, num_bins
    )  # (N, B)
    xs = xs.astype(jnp.int32)
    ys = ys.astype(jnp.int32)
    inb = ((xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)).astype(jnp.float32)
    weights = weights * inb[:, None]
    flat = (jnp.clip(ys, 0, h - 1) * w + jnp.clip(xs, 0, w - 1))[:, None]  # (N,1)
    acc = jnp.zeros((h * w, num_bins), jnp.float32).at[flat[:, 0]].add(
        weights, mode="drop"
    )
    return jnp.transpose(acc, (1, 0)).reshape(num_bins, h, w)


@functools.partial(jax.jit, static_argnames=("num_bins", "sensor_size"))
def events_to_voxel_batch(
    xs: Array,  # (C, cap)
    ys: Array,
    ts: Array,
    ps: Array,
    n_events: Array,  # (C,)
    *,
    num_bins: int = 5,
    sensor_size: Tuple[int, int] = (180, 240),
) -> Array:
    """Batched voxelization: (C, cap) buffers -> (C, B, H, W), as a
    ``lax.scan`` of the single-window scatter.

    Measured on one chip (64 x 16k-event windows, 180x240): scan-batch
    62 Mev/s vs 16 Mev/s for both ``jax.vmap(events_to_voxel)`` AND a
    hand-fused single flat scatter into a (C*H*W, B) accumulator. The
    batch-wide accumulator (~55 MB at C=64) lives in HBM and every scatter
    update pays HBM latency; the scan keeps each window's (H*W, B)
    accumulator (~0.9 MB) on-chip, matching single-window throughput.
    """

    def body(carry, args):
        x, y, t, p, n = args
        return carry, events_to_voxel(
            x, y, t, p, n, num_bins=num_bins, sensor_size=sensor_size
        )

    _, out = jax.lax.scan(body, (), (xs, ys, ts, ps, n_events))
    return out


@functools.partial(jax.jit, static_argnames=("num_bins", "sensor_size"))
def events_to_neg_pos_voxel_batch(
    xs: Array,
    ys: Array,
    ts: Array,
    ps: Array,
    n_events: Array,
    *,
    num_bins: int = 5,
    sensor_size: Tuple[int, int] = (180, 240),
) -> Tuple[Array, Array]:
    """Batched polarity-separated voxelization as a ``lax.scan`` of the
    single-window op (see events_to_voxel_batch for the measured rationale:
    small on-chip accumulators beat one batch-wide HBM accumulator 4x)."""

    def body(carry, args):
        x, y, t, p, n = args
        return carry, events_to_neg_pos_voxel(
            x, y, t, p, n, num_bins=num_bins, sensor_size=sensor_size
        )

    _, (vp, vn) = jax.lax.scan(body, (), (xs, ys, ts, ps, n_events))
    return vp, vn


@functools.partial(jax.jit, static_argnames=("num_bins", "sensor_size"))
def events_to_neg_pos_voxel(
    xs: Array,
    ys: Array,
    ts: Array,
    ps: Array,
    n_events: Array | int,
    *,
    num_bins: int = 5,
    sensor_size: Tuple[int, int] = (180, 240),
) -> Tuple[Array, Array]:
    """Polarity-separated voxel grids (reference event_utils.py:511-543).

    Positive events (ps > 0) weight 1 into the pos grid; non-positive weight 1
    into the neg grid. Both share the same temporal normalization.
    """
    pos = jnp.where(ps > 0, 1.0, 0.0)
    neg = jnp.where(ps <= 0, 1.0, 0.0)
    vp = events_to_voxel(
        xs, ys, ts, pos, n_events, num_bins=num_bins, sensor_size=sensor_size
    )
    vn = events_to_voxel(
        xs, ys, ts, neg, n_events, num_bins=num_bins, sensor_size=sensor_size
    )
    return vp, vn


# ---------------------------------------------------------------------------
# Timestamp images (Zhu'19)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("sensor_size", "padding"))
def events_to_timestamp_image(
    xs: Array,
    ys: Array,
    ts: Array,
    ps: Array,
    n_events: Array | int,
    *,
    sensor_size: Tuple[int, int] = (180, 240),
    padding: bool = True,
) -> Tuple[Array, Array]:
    """Average-timestamp images per polarity (reference event_utils.py:251-320).

    Timestamps are shifted to start at 0 and normalized by the last timestamp
    (+1e-6, matching the reference's normalization quirk), then bilinearly
    scattered per polarity. Returns the *sum* images (the reference returns
    the un-divided sums; see its commented-out count division at :319).
    Out-of-range events keep their normalized-ts weight and land at the
    origin corner (``clip_weights=False``): the reference scatters
    ``normalized_ts * polarity_mask`` WITHOUT the clip mask (:305-313),
    unlike its image/derivative scatters which use ``masked_ps``.
    """
    ts = ts.astype(jnp.float32)
    valid = _valid_mask(xs.shape[0], n_events)
    n = jnp.maximum(jnp.sum(valid).astype(jnp.int32), 1)
    t_norm = (ts - ts[0]) / (ts[n - 1] + 1e-6)
    pos_mask = jnp.where(ps > 0, 1.0, 0.0)
    neg_mask = jnp.where(ps <= 0, 1.0, 0.0)
    img_pos = events_to_image_bilinear(
        xs, ys, t_norm * pos_mask, n_events, sensor_size=sensor_size,
        padding=padding, clip_weights=False,
    )
    img_neg = events_to_image_bilinear(
        xs, ys, t_norm * neg_mask, n_events, sensor_size=sensor_size,
        padding=padding, clip_weights=False,
    )
    return img_pos, img_neg


# Legacy alias (reference event_utils.py:321-328 keeps the Zhu19 name and
# forwards to events_to_timestamp_image).
events_to_zhu_timestamp_image = events_to_timestamp_image


# ---------------------------------------------------------------------------
# Hot pixels
# ---------------------------------------------------------------------------


def hot_event_mask(
    xs: np.ndarray,
    ys: np.ndarray,
    ps: np.ndarray,
    sensor_size: Tuple[int, int] = (180, 240),
    num_hot: int = 100,
) -> np.ndarray:
    """Mask (1 = keep) zeroing the `num_hot` highest-count pixels.

    Host-side (NumPy): this runs once per sequence at load time and
    replicates the reference's iterative argmax-and-zero loop EXACTLY
    (get_hot_event_mask, event_utils.py:100-116) — including its row-major
    tie-breaking and its degenerate behavior when fewer than ``num_hot``
    pixels have a positive signed sum (argmax then re-picks the first
    already-zeroed index, so fewer than num_hot distinct pixels end up
    masked). num_hot argmaxes over an H*W array are negligible on the host;
    a vectorized top-k would silently mask a different pixel set in the
    degenerate cases.
    """
    h, w = sensor_size
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    if len(xs) and (
        xs.min() < 0 or ys.min() < 0 or xs.max() >= w or ys.max() >= h
    ):
        # the reference raises here too (events_to_image's
        # np.ravel_multi_index, event_utils.py:165-171); a silent flat-index
        # wraparound would corrupt the count image and mask wrong pixels
        raise ValueError(
            f"events outside the {h}x{w} sensor: x in "
            f"[{xs.min()}, {xs.max()}], y in [{ys.min()}, {ys.max()}]"
        )
    img = np.zeros((h * w,), np.float64)
    flat = ys.astype(np.int64) * w + xs.astype(np.int64)
    np.add.at(img, flat, ps.astype(np.float64))
    mask = np.ones((h * w,), np.float32)
    for _ in range(num_hot):
        idx = int(np.argmax(img))  # flat argmax == unravel_index order
        mask[idx] = 0.0
        img[idx] = 0.0
    return mask.reshape(h, w)


# ---------------------------------------------------------------------------
# Flow warping
# ---------------------------------------------------------------------------


def warp_events_by_flow(
    xs: Array,
    ys: Array,
    ts: Array,
    flow: Array,
    t0: Array | float | None = None,
    n_events: Array | int | None = None,
) -> Tuple[Array, Array]:
    """Warp event positions along a per-pixel flow field
    (reference warp_events_flow_torch, event_utils.py:576-618):
    the flow is bilinearly sampled at each event's (x, y) — align_corners
    grid like the reference — and positions advance by flow * (t - t0).

    flow: (H, W, 2) [fx, fy]; t0 defaults to the last valid timestamp.
    Returns (warped_xs, warped_ys) as float arrays.
    """
    from bde2vid_tpu.nn.sampling import grid_sample_bilinear

    h, w = flow.shape[0], flow.shape[1]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    if t0 is None:
        n = (
            jnp.maximum(jnp.sum(_valid_mask(ts.shape[0], n_events)), 1).astype(jnp.int32)
            if n_events is not None
            else ts.shape[0]
        )
        t0 = ts[n - 1]
    gx = xs / (w - 1) * 2.0 - 1.0
    gy = ys / (h - 1) * 2.0 - 1.0
    grid = jnp.stack([gx, gy], axis=-1)[None, None]  # (1, 1, N, 2)
    flow_at = grid_sample_bilinear(flow[None], grid, align_corners=True)[0, 0]  # (N, 2)
    dt = ts.astype(jnp.float32) - t0
    return xs + flow_at[:, 0] * dt, ys + flow_at[:, 1] * dt


def voxel_grids_fixed_n(
    xs, ys, ts, ps, num_bins: int, n: int,
    sensor_size: Tuple[int, int] = (180, 240),
):
    """List of voxel grids over consecutive fixed-count event windows
    (reference voxel_grids_fixed_n_torch, event_utils.py:377-410).
    Host-level convenience over the device voxelizer. Window boundaries
    replicate the reference's ``range(0, len(xs)-n, n)`` EXACTLY — the
    trailing partial window is dropped, and so is a final FULL window
    starting at len-n (a reference quirk of the exclusive stop)."""
    out = []
    for i0 in range(0, len(xs) - n, n):
        i1 = i0 + n
        px, py, pt, pp, nv = pad_events(
            np.asarray(xs[i0:i1]), np.asarray(ys[i0:i1]),
            np.asarray(ts[i0:i1]) - np.asarray(ts[i0]), np.asarray(ps[i0:i1]),
            capacity=_bucket_capacity(n),
        )
        out.append(
            events_to_voxel(px, py, pt, pp, nv, num_bins=num_bins,
                            sensor_size=sensor_size)
        )
    return out


def voxel_grids_fixed_t(
    xs, ys, ts, ps, num_bins: int, t: float,
    sensor_size: Tuple[int, int] = (180, 240),
):
    """List of voxel grids over consecutive fixed-duration windows
    (reference voxel_grids_fixed_t_torch, event_utils.py:412-460). Window
    starts replicate the reference's ``np.arange(ts[0], ts[-1]-t, t)``
    EXACTLY — the trailing partial window is dropped. One deliberate
    deviation: an empty window is skipped here where the reference's
    timesync assert would abort the whole conversion."""
    ts_np = np.asarray(ts)
    out = []
    for t_start in np.arange(float(ts_np[0]), float(ts_np[-1]) - t, t):
        i0 = int(np.searchsorted(ts_np, t_start))
        i1 = int(np.searchsorted(ts_np, t_start + t))
        if i1 > i0:
            px, py, pt, pp, nv = pad_events(
                np.asarray(xs[i0:i1]), np.asarray(ys[i0:i1]),
                ts_np[i0:i1] - ts_np[i0], np.asarray(ps[i0:i1]),
            )
            out.append(
                events_to_voxel(px, py, pt, pp, nv, num_bins=num_bins,
                                sensor_size=sensor_size)
            )
    return out


def events_to_voxel_timesync(
    xs, ys, ts, ps, num_bins: int, t0: float, t1: float,
    sensor_size: Tuple[int, int] = (180, 240),
) -> Array:
    """Voxelize only the events in [t0, t1) (reference
    events_to_voxel_timesync_torch, event_utils.py:431-464: host searchsorted
    to slice, then the standard voxelizer). ``t0 < t1`` and at least one
    event in range are required, like the reference's asserts."""
    ts_np = np.asarray(ts)
    if not t1 > t0:
        raise ValueError("t1 must be > t0")
    i0 = int(np.searchsorted(ts_np, t0))
    i1 = int(np.searchsorted(ts_np, t1))
    if not i0 < i1:
        raise ValueError("no events in [t0, t1)")
    px, py, pt, pp, nv = pad_events(
        np.asarray(xs[i0:i1]), np.asarray(ys[i0:i1]),
        ts_np[i0:i1] - ts_np[i0], np.asarray(ps[i0:i1]),
    )
    return events_to_voxel(px, py, pt, pp, nv, num_bins=num_bins,
                           sensor_size=sensor_size)


@functools.partial(jax.jit, static_argnames=("num_bins", "sensor_size"))
def events_to_voxel_accumulate(
    xs: Array, ys: Array, ts: Array, ps: Array, n_events,
    *, num_bins: int = 5, sensor_size: Tuple[int, int] = (180, 240),
) -> Array:
    """``temporal_bilinear=False`` voxel mode: each event lands wholly in
    its time bin (hard binning) instead of splitting across the two nearest
    bins. The reference's branch (event_utils.py:499-505) is bitrotted
    (undefined ``t``, every bin spans the full window); this implements the
    documented intent: bin i gets the events in
    [t0 + i*dt/B, t0 + (i+1)*dt/B)."""
    h, w = sensor_size
    valid = _valid_mask(xs.shape[0], n_events)
    ts = ts.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid).astype(jnp.int32), 1)
    t0 = ts[0]
    dt = ts[n - 1] - t0
    safe_dt = jnp.where(dt == 0, 1.0, dt)
    binf = jnp.clip(
        jnp.floor((ts - t0) / safe_dt * num_bins), 0, num_bins - 1
    ).astype(jnp.int32)
    bins = jnp.arange(num_bins, dtype=jnp.int32)[None, :]
    weights = (binf[:, None] == bins).astype(jnp.float32) * (
        ps.astype(jnp.float32) * valid
    )[:, None]
    xs = xs.astype(jnp.int32)
    ys = ys.astype(jnp.int32)
    inb = ((xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)).astype(jnp.float32)
    weights = weights * inb[:, None]
    flat = jnp.clip(ys, 0, h - 1) * w + jnp.clip(xs, 0, w - 1)
    acc = jnp.zeros((h * w, num_bins), jnp.float32).at[flat].add(
        weights, mode="drop"
    )
    return jnp.transpose(acc, (1, 0)).reshape(num_bins, h, w)


def unpack_batched_events(events: np.ndarray, batch_indices) -> np.ndarray:
    """(N, 4) contiguous batched events + end indices -> (B, 1, M, 4) padded
    per-item arrays, M = longest item (reference unpack_batched_events,
    event_utils.py:545-574 — that implementation is bitrotted: it reads
    ``event_batch_indices``/``start_dx`` which don't exist; this is the
    documented intent)."""
    events = np.asarray(events).reshape(-1, events.shape[-1])
    ends = list(batch_indices)
    starts = [0] + ends[:-1]
    maxlen = max(e - s for s, e in zip(starts, ends)) if ends else 0
    out = np.zeros((len(ends), 1, maxlen, events.shape[-1]), events.dtype)
    for b, (s, e) in enumerate(zip(starts, ends)):
        out[b, 0, : e - s] = events[s:e]
    return out
