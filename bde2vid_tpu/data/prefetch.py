"""Background prefetch of host batches to device.

The TPU replacement for torch DataLoader workers (reference
h5_dataset.py:21,42: num_workers=2, pin_memory): a thread pipelines host-side
assembly + H2D transfer ahead of device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


def prefetch_to_device(
    iterable: Iterable,
    size: int = 2,
    device: Optional[jax.Device] = None,
) -> Iterator:
    """Yield items from ``iterable`` with ``size`` items staged ahead.

    Array leaves are moved to ``device`` (default: first local device) as
    soon as they are produced, so H2D DMA overlaps the consumer's compute.
    """
    device = device or jax.local_devices()[0]
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    err = []

    def put(item):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, device) if hasattr(x, "shape") else x, item
        )

    def producer():
        try:
            for item in iterable:
                q.put(put(item))
        except Exception as e:  # pragma: no cover - surfaced on consumer side
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
