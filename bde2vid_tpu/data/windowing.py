"""Event windowing policies (reference h5_dataset.py:303-366).

Each policy returns an (L, 2) int64 array of [idx0, idx1) event-index windows.

- between_frames: window i ends at the first event at/after frame i's
  timestamp and starts where window i-1 ended (reference
  compute_frame_indices :447-455 uses the stored per-frame event_idx).
- k_events: fixed-count windows with optional sliding overlap (:335-346).
- t_seconds: fixed-duration windows with optional sliding overlap (:320-333).
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def between_frames_windows(frame_event_indices: np.ndarray) -> np.ndarray:
    """Windows from per-frame event indices. L == num_frames (item i pairs
    the events before frame i with frame i; the driver consumes items
    0..num_frames-2, matching the reference length num_frames-1)."""
    ends = np.asarray(frame_event_indices, np.int64)
    starts = np.concatenate([[0], ends[:-1]])
    return np.stack([starts, ends], axis=1)


def k_events_windows(num_events: int, k: int, sliding_window_w: int = 0) -> np.ndarray:
    step = k - sliding_window_w
    if step <= 0:
        raise ValueError("sliding_window_w must be < k")
    length = max(int(num_events / step), 0)
    i = np.arange(length, dtype=np.int64)
    starts = step * i
    return np.stack([starts, np.minimum(starts + k, num_events)], axis=1)


def t_seconds_windows(
    find_ts_index: Callable[[float], int],
    t0: float,
    duration: float,
    t: float,
    sliding_window_t: float = 0.0,
) -> np.ndarray:
    step = t - sliding_window_t
    if step <= 0:
        raise ValueError("sliding_window_t must be < t")
    length = max(int(duration / step), 0)
    windows = []
    start_idx = 0
    for i in range(length):
        start_time = step * i + t0
        end_idx = find_ts_index(start_time + t)
        windows.append([start_idx, end_idx])
        start_idx = end_idx
    return np.asarray(windows, np.int64).reshape(-1, 2)
