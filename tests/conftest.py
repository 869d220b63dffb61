"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware isn't available in CI; the standard JAX answer is
``xla_force_host_platform_device_count`` which gives N independent CPU
devices so sharding/collective code paths execute for real.
Must run before jax is imported anywhere.
"""

import os

# The image pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and that wins over a
# plain env override here, so force the platform through jax.config instead.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_sessionstart(session):
    # tests/test_reference_oracle.py (the source-of-truth parity suite)
    # skips wholesale without the mirror — make that impossible to miss
    if not os.path.isdir("/root/reference"):
        import warnings

        warnings.warn(
            "reference mirror /root/reference is ABSENT: the entire "
            "reference-oracle parity suite will skip (set "
            "BDE2VID_REQUIRE_REFERENCE=1 to fail instead)",
            stacklevel=1,
        )


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_events(rng, n=5000, sensor_size=(180, 240), t1=0.05):
    """Synthetic event stream with sorted timestamps."""
    h, w = sensor_size
    xs = rng.integers(0, w, size=n).astype(np.int32)
    ys = rng.integers(0, h, size=n).astype(np.int32)
    ts = np.sort(rng.uniform(0.0, t1, size=n)).astype(np.float32)
    ps = rng.choice(np.array([-1.0, 1.0], np.float32), size=n)
    return xs, ys, ts, ps
