"""Native (C++) host runtime: event window packing + CPU voxelization.

Compiled on first use with the system toolchain (g++ -O3 -shared) and loaded
via ctypes; everything has a NumPy fallback so the framework works without a
compiler. See evpack.cc for the kernel semantics.
"""

from bde2vid_tpu.native.loader import (
    get_lib,
    native_available,
    pack_windows,
    voxelize_batch_native,
)

__all__ = ["get_lib", "native_available", "pack_windows", "voxelize_batch_native"]
