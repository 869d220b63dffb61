"""Utils tests: pad/crop roundtrip, norms vs torch-semantics oracles."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from bde2vid_tpu.utils import (
    CropParameters,
    legacy_norm,
    optimal_crop_size,
    quick_norm,
    robust_norm,
)


def test_optimal_crop_size():
    assert optimal_crop_size(180, 4) == 192
    assert optimal_crop_size(240, 4) == 240
    assert optimal_crop_size(240, 3) == 240
    assert optimal_crop_size(346, 4) == 352
    assert optimal_crop_size(256, 4) == 256


@pytest.mark.parametrize("h,w,enc", [(180, 240, 4), (260, 346, 4), (181, 239, 3)])
def test_pad_crop_roundtrip(rng, h, w, enc):
    cp = CropParameters(w, h, enc)
    x = rng.normal(size=(1, h, w, 5)).astype(np.float32)
    padded = cp.pad(jnp.asarray(x))
    assert padded.shape[1] % 2**enc == 0 and padded.shape[2] % 2**enc == 0
    back = cp.crop(padded)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_legacy_norm_matches_torch_semantics(rng):
    x = rng.normal(size=(5, 16, 24)).astype(np.float32)
    x[x < 0.5] = 0.0  # plenty of zeros
    got = np.asarray(legacy_norm(jnp.asarray(x)))

    t = torch.from_numpy(x)
    nonzero = t != 0
    num = nonzero.sum()
    mean = t.sum() / num
    std = torch.sqrt((t**2).sum() / num - mean**2)
    want = (nonzero.float() * (t - mean) / std).numpy()
    np.testing.assert_allclose(got, want, atol=5e-5)
    # zeros preserved
    assert (got[x == 0] == 0).all()


def test_legacy_norm_degenerate():
    z = jnp.zeros((2, 4, 4))
    np.testing.assert_array_equal(np.asarray(legacy_norm(z)), np.zeros((2, 4, 4)))


def test_robust_norm_matches_torch_kthvalue(rng):
    x = rng.normal(size=(3, 10, 12)).astype(np.float32)
    got = np.asarray(robust_norm(jnp.asarray(x), 0, 95))

    t = torch.from_numpy(x)
    k_hi = 1 + round(0.95 * (t.numel() - 1))
    k_lo = 1
    t_max = t.view(-1).kthvalue(k_hi).values.item()
    t_min = t.view(-1).kthvalue(k_lo).values.item()
    clamped = torch.clamp(t, min=t_min, max=t_max)
    want = ((clamped - clamped.min()) / (clamped.max() + 1e-6)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quick_norm_range(rng):
    x = rng.normal(size=(8, 8)).astype(np.float32)
    y = np.asarray(quick_norm(jnp.asarray(x)))
    assert y.min() >= 0.0 and y.max() <= 1.0


def test_crop_size_3d_roundtrip():
    import numpy as np
    import jax.numpy as jnp

    from bde2vid_tpu.utils.padding import CropSize3D

    c = CropSize3D(width=44, height=36, time=5, patch_size={"t": 4, "h": 8, "w": 8})
    assert (c.time_crop_size, c.height_crop_size, c.width_crop_size) == (8, 40, 48)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 36, 44, 3)).astype(np.float32))
    padded = c.pad(x)
    assert padded.shape == (1, 8, 40, 48, 3)
    np.testing.assert_array_equal(np.asarray(c.crop(padded)), np.asarray(x))


def test_legacy_norm_unbiased_matches_snn_runner_chain(rng):
    """The SNN runner (rec_snn_forward.py:34) normalizes with torch's
    default ``tensor.std()`` over the nonzero subset — the UNBIASED (n-1)
    estimator, different from the dataset LegacyNorm's population std."""
    x = rng.normal(size=(5, 16, 24)).astype(np.float32)
    x[np.abs(x) < 0.5] = 0.0
    got = np.asarray(legacy_norm(jnp.asarray(x), unbiased=True))

    t = torch.from_numpy(x.copy())
    sel = t[t != 0]
    mean, stddev = sel.mean(), sel.std()  # torch default: unbiased
    want = t.clone()
    want[t != 0] = (sel - mean) / stddev
    np.testing.assert_allclose(got, want.numpy(), atol=5e-5)
    # and it differs from the population (dataset) norm
    pop = np.asarray(legacy_norm(jnp.asarray(x)))
    assert np.abs(got - pop)[x != 0].max() > 1e-4


def test_optimal_crop_size_safety_margin():
    """The margin adds whole multiples of 2^factor (the eitr/EVSNN reference
    twins, model_util.py:130-136; the eval-path twin silently ignores it)."""
    from bde2vid_tpu.utils.padding import optimal_crop_size

    assert optimal_crop_size(180, 3) == 184
    assert optimal_crop_size(180, 3, safety_margin=1) == 192
    assert optimal_crop_size(184, 3) == 184
