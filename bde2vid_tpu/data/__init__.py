"""Host-side data pipeline: windowing, sequence assembly, prefetch.

Reference: data_loader/h5_dataset.py. The reference voxelizes per item on the
host inside DataLoader workers; here the host only slices + pads raw event
windows to a static per-sequence capacity and the voxel grids are built ON
DEVICE (bde2vid_tpu.events.voxel), jitted once per sequence shape — the
rasterization rides the TPU and overlaps with model compute via prefetch.
"""

from bde2vid_tpu.data.windowing import (
    between_frames_windows,
    k_events_windows,
    t_seconds_windows,
)
from bde2vid_tpu.data.pipeline import EventSequence, SequenceItem, load_sequence
from bde2vid_tpu.data.prefetch import prefetch_to_device

__all__ = [
    "between_frames_windows",
    "k_events_windows",
    "t_seconds_windows",
    "EventSequence",
    "SequenceItem",
    "load_sequence",
    "prefetch_to_device",
]
