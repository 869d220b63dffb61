"""Model-family smoke + protocol tests for the E2VID zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bde2vid_tpu.models import (
    MODEL_REGISTRY,
    build_model,
    run_sequence,
)
from bde2vid_tpu.models.api import run_sequence_chunked

H, W, B = 32, 48, 5
CFG = {"num_bins": B, "num_encoders": 2, "base_num_channels": 8, "num_residual_blocks": 1}


def _init(model, rng_seed=0):
    voxel = jnp.zeros((1, H, W, B))
    state = model.initial_state(1, H, W)
    params = model.init(jax.random.PRNGKey(rng_seed), voxel, state)
    return params, state


@pytest.mark.parametrize("name", ["E2VID", "E2VIDRecurrent", "FireNet", "FireNetOrg", "FlowNet"])
def test_model_step_shapes(name, rng):
    model = build_model(name, CFG)
    params, state = _init(model)
    voxel = jnp.asarray(rng.normal(size=(1, H, W, B)).astype(np.float32))
    out, new_state = model.apply(params, voxel, state)
    assert out["image"].shape == (1, H, W, 1)
    assert np.isfinite(np.asarray(out["image"])).all()
    if name in ("E2VID", "E2VIDRecurrent"):  # sigmoid output
        img = np.asarray(out["image"])
        assert img.min() >= 0.0 and img.max() <= 1.0
    if name == "FlowNet":
        assert out["flow"].shape == (1, H, W, 2)


def test_recurrent_state_carries_information(rng):
    """Same voxel twice: output differs because state evolved."""
    model = build_model("E2VIDRecurrent", CFG)
    params, state = _init(model)
    voxel = jnp.asarray(rng.normal(size=(1, H, W, B)).astype(np.float32))
    out1, state1 = model.apply(params, voxel, state)
    out2, state2 = model.apply(params, voxel, state1)
    assert not np.allclose(np.asarray(out1["image"]), np.asarray(out2["image"]))
    # reset: fresh initial state reproduces step-1 output exactly
    out1b, _ = model.apply(params, voxel, model.initial_state(1, H, W))
    np.testing.assert_allclose(np.asarray(out1["image"]), np.asarray(out1b["image"]))


def test_run_sequence_matches_python_loop(rng):
    model = build_model("FireNet", CFG)
    params, state = _init(model)
    T = 4
    voxels = jnp.asarray(rng.normal(size=(T, 1, H, W, B)).astype(np.float32))
    imgs_scan, final = run_sequence(model, params, voxels, state)
    # manual loop
    st = state
    outs = []
    for t in range(T):
        o, st = model.apply(params, voxels[t], st)
        outs.append(o["image"])
    imgs_loop = jnp.stack(outs)
    np.testing.assert_allclose(
        np.asarray(imgs_scan), np.asarray(imgs_loop), atol=1e-5, rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        final,
        st,
    )


def test_run_sequence_chunked_resets_state(rng):
    """Chunk boundary == state reset (reference subseq_L semantics)."""
    model = build_model("E2VIDRecurrent", CFG)
    params, state = _init(model)
    T = 6
    voxels = jnp.asarray(rng.normal(size=(T, 1, H, W, B)).astype(np.float32))
    full = run_sequence_chunked(model, params, voxels, state, chunk=3)
    a, _ = run_sequence(model, params, voxels[:3], state)
    b, _ = run_sequence(model, params, voxels[3:], state)
    np.testing.assert_allclose(np.asarray(full), np.asarray(jnp.concatenate([a, b])), atol=1e-6)


def test_sequence_is_jittable(rng):
    model = build_model("E2VIDRecurrent", CFG)
    params, state = _init(model)
    voxels = jnp.asarray(rng.normal(size=(3, 1, H, W, B)).astype(np.float32))
    fn = jax.jit(lambda p, v, s: run_sequence(model, p, v, s)[0])
    imgs = fn(params, voxels, state)
    assert imgs.shape == (3, 1, H, W, 1)


def test_registry_contents():
    for name in ("E2VID", "E2VIDRecurrent", "FireNet", "FireNetOrg", "FlowNet"):
        assert name in MODEL_REGISTRY


def test_concat_skip_and_no_upsample_conv(rng):
    """Checkpoint-config variants: skip_type='concat' and transposed-conv
    decoders must build and run."""
    cfg = dict(CFG, skip_type="concat", use_upsample_conv=False)
    model = build_model("E2VIDRecurrent", cfg)
    state = model.initial_state(1, H, W)
    voxel = jnp.asarray(rng.normal(size=(1, H, W, B)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), voxel, state)
    out, _ = model.apply(params, voxel, state)
    assert out["image"].shape == (1, H, W, 1)
    assert np.isfinite(np.asarray(out["image"])).all()


@pytest.mark.parametrize("name", ["E2VIDRecurrent", "FireNet", "SPADEE2VID", "EITR", "EVSNN"])
def test_bf16_drift_within_tolerance(name, rng):
    """The eval CLI's --bf16 switch applies to EVERY family: each must stay
    within bf16 noise of its f32 outputs on shared params over a short
    recurrent sequence (thresholded/spiking dynamics could in principle
    diverge hard — pin that they don't at these scales)."""
    cfg = {"num_bins": B} if name not in ("E2VIDRecurrent", "FireNet") else CFG
    m32 = build_model(name, dict(cfg))
    m16 = build_model(name, dict(cfg), dtype=jnp.bfloat16)
    h = w = 32  # /8-compatible (EITR's CropSize needs multiples of 8)
    voxels = jnp.asarray(rng.normal(size=(4, 1, h, w, B)).astype(np.float32))
    state = m32.initial_state(1, h, w)
    params = m32.init(jax.random.PRNGKey(0), voxels[0], state)
    a, _ = run_sequence(m32, params, voxels, state)
    b, _ = run_sequence(m16, params, voxels, m16.initial_state(1, h, w))
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    assert np.isfinite(b).all(), name
    # sigmoid-scale outputs; spiking families get a looser bound (binary
    # spike flips move membrane sums by whole quanta)
    tol = 0.25 if "SNN" in name else 0.08
    assert np.abs(a - b).max() < tol, (name, np.abs(a - b).max())
