"""Persistent XLA compilation cache.

The flagship BDE2VID compiles in ~2 minutes per (chunk, resolution) shape;
the eval sweep re-runs the same shapes across checkpoints and processes.
A persistent cache turns every repeat into a disk hit.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable the persistent compilation cache (idempotent)."""
    import jax

    path = path or os.environ.get(
        "BDE2VID_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "bde2vid_tpu", "xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
