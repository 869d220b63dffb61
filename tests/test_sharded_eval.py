"""Multi-device eval tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bde2vid_tpu.models import build_model
from bde2vid_tpu.models.api import ModelSpec, run_sequence, run_sequence_chunked
from bde2vid_tpu.parallel.mesh import make_mesh, shard_batch
from bde2vid_tpu.parallel.sharded_eval import eval_chunks_sharded

CFG = {"num_bins": 5, "num_encoders": 2, "base_num_channels": 8, "num_residual_blocks": 1}


def _spec(name="E2VIDRecurrent"):
    model = build_model(name, CFG)
    v = jnp.zeros((1, 32, 32, 5))
    params = model.init(jax.random.PRNGKey(0), v, model.initial_state(1, 32, 32))
    # FireNet has no strided encoders: the real checkpoint loader sets
    # num_encoders=0 (no Croper padding) — match production config
    n_enc = 0 if name == "FireNet" else 2
    return ModelSpec(name=name, module=model, params=params, num_bins=5,
                     num_encoders=n_enc)


def test_devices_available():
    assert jax.device_count() >= 8


def test_sharded_chunk_eval_matches_sequential(rng):
    spec = _spec()
    T, H, W = 16, 32, 32
    voxels = jnp.asarray(rng.normal(size=(T, 1, H, W, 5)).astype(np.float32))
    got = np.asarray(eval_chunks_sharded(spec, voxels, chunk=2))
    state0 = spec.module.initial_state(1, H, W)
    want = np.asarray(
        run_sequence_chunked(spec.module, spec.params, voxels, state0, chunk=2)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_eval_ragged_tail(rng):
    """T not divisible by chunk*n_dev: padding must be inert."""
    spec = _spec("FireNet")
    T = 11
    voxels = jnp.asarray(rng.normal(size=(T, 1, 32, 32, 5)).astype(np.float32))
    got = np.asarray(eval_chunks_sharded(spec, voxels, chunk=2))
    assert got.shape[0] == T
    state0 = spec.module.initial_state(1, 32, 32)
    want = np.asarray(
        run_sequence_chunked(spec.module, spec.params, voxels, state0, chunk=2)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_sequence_model(rng):
    cfg = {"generator": {"num_bins": 5, "basechannels": 4, "num_encoders": 2,
                         "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                         "depths": [1, 1], "num_heads": 2, "window_size": [4, 4]}}
    model = build_model("BDE2VID", cfg)
    T, H, W = 8, 16, 16
    voxels = jnp.asarray(rng.normal(size=(T, 1, H, W, 5)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), voxels[:2])
    spec = ModelSpec("BDE2VID", model, params, 5, 2, is_sequence_model=True)
    got = np.asarray(eval_chunks_sharded(spec, voxels, chunk=2))
    want = np.concatenate(
        [np.asarray(model.apply(params, voxels[s : s + 2])[0]["image"]) for s in range(0, T, 2)]
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_shard_batch_places_data():
    mesh = make_mesh(4, 2)
    x = jnp.zeros((8, 16, 16, 5))
    sharded = shard_batch(mesh, x)
    # sharded over 'data' (4), replicated over 'spatial' (2) -> all 8 devices
    assert len(sharded.sharding.device_set) == 8
    assert sharded.sharding.spec[0] == "data"


def test_spatial_sharding_matches_unsharded(rng):
    """Sharding the sensor-height axis over the 'spatial' mesh axis must be
    numerically inert — XLA inserts the conv halo exchanges."""
    from bde2vid_tpu.parallel.mesh import make_mesh, spatial_sharding

    spec = _spec()
    T, H, W = 4, 64, 32
    voxels = jnp.asarray(rng.normal(size=(T, 1, H, W, 5)).astype(np.float32))
    state0 = spec.module.initial_state(1, H, W)
    want, _ = run_sequence(spec.module, spec.params, voxels, state0)

    mesh = make_mesh(1, 4)  # pure 4-way spatial split of H=64 (batch is 1)
    sh = spatial_sharding(mesh, 5, batch_axis=1, h_axis=2)
    voxels_sharded = jax.device_put(voxels, sh)

    @jax.jit
    def run(v):
        imgs, _ = run_sequence(spec.module, spec.params, v, state0)
        return imgs

    with mesh:
        got = run(voxels_sharded)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_spatial_sharded_flagship_attention_forward_matches(rng):
    """BDE2VID's WINDOW ATTENTION under spatial sharding must be numerically
    inert — the window-partition reshapes over H are exactly where sharding
    can go wrong, so this runs attention ON (depths [2,2]: a normal AND a
    dilated block at both levels) at 7x7 windows with >=2x2 windows per
    level (H=W=56 -> 28x28 and 14x14 feature maps), sharded 2-way over H."""
    from bde2vid_tpu.parallel.mesh import make_mesh, spatial_sharding, replicate

    cfg = {"generator": {"num_bins": 5, "basechannels": 8, "num_encoders": 2,
                         "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                         "depths": [2, 2], "num_heads": 4, "window_size": [7, 7],
                         "drop_path_rate": 0.0}}
    model = build_model("BDE2VID", cfg)
    T, N, H, W = 5, 1, 56, 56
    voxels = jnp.asarray(rng.normal(size=(T, N, H, W, 5)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), voxels[:2])
    want = np.asarray(model.apply(params, voxels)[0]["image"])

    mesh = make_mesh(1, 2)
    sh = spatial_sharding(mesh, 5, batch_axis=1, h_axis=2)
    voxels_sharded = jax.device_put(voxels, sh)
    # the input must REALLY be split over both spatial devices (half the
    # rows each) — otherwise the parity assert below compares unsharded
    # against unsharded and proves nothing
    shards = voxels_sharded.addressable_shards
    assert len({s.device for s in shards}) == 2
    assert {s.data.shape[2] for s in shards} == {H // 2}
    fwd = jax.jit(lambda p, v: model.apply(p, v)[0]["image"])
    with mesh:
        got = fwd(jax.device_put(params, replicate(mesh)), voxels_sharded)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_evaluate_sequence_shard_data_matches(tmp_path, rng):
    """The driver's --shard_data path must produce identical metrics to the
    sequential path on the 8-device mesh — for a SEQUENCE model, where
    chunk independence is the reference's own semantic. (For step models
    the sequential default THREADS state across chunks while sharding
    necessarily resets it — a documented divergence, so they are not
    comparable; eval_chunks_sharded's exactness against the chunk-reset
    baseline is proven separately above.)"""
    import dataclasses

    from bde2vid_tpu.data import load_sequence
    from bde2vid_tpu.eval import EvalConfig, evaluate_sequence
    from bde2vid_tpu.events import H5EventWriter
    from tests.conftest import make_events

    sensor = (36, 44)
    xs, ys, ts, ps = make_events(rng, n=12000, sensor_size=sensor, t1=1.0)
    path = str(tmp_path / "a.h5")
    with H5EventWriter(path, sensor_size=sensor) as w:
        w.append_events(xs, ys, ts, ps > 0)
        for i in range(9):
            w.add_image(rng.uniform(0, 255, sensor).astype(np.uint8), (i + 0.5) / 9)

    cfg_m = {"generator": {"num_bins": 5, "basechannels": 4, "num_encoders": 2,
                           "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                           "depths": [1, 1], "num_heads": 2, "window_size": [4, 4]}}
    model = build_model("BDE2VID", cfg_m)
    v = jnp.zeros((2, 1, 16, 16, 5))
    params = model.init(jax.random.PRNGKey(0), v)
    spec = ModelSpec("BDE2VID", model, params, 5, 2, is_sequence_model=True)
    cfg = EvalConfig(metrics=("mse", "ssim"), subseq_L=2, max_length=None)
    res_seq, det_seq = evaluate_sequence(spec, load_sequence(path, num_bins=5), cfg)
    cfg_sh = dataclasses.replace(cfg, shard_data=True)
    res_sh, det_sh = evaluate_sequence(spec, load_sequence(path, num_bins=5), cfg_sh)
    for k in res_seq:
        assert res_sh[k] == pytest.approx(res_seq[k], rel=1e-4, abs=1e-6), k
    np.testing.assert_allclose(det_sh["mse"], det_seq["mse"], atol=1e-6)


def test_sharded_sequence_model_ragged_tail(rng):
    """Bidirectional sequence models must NOT see zero-padded tail frames:
    a ragged T runs its tail as a separate unsharded forward (the backward
    sweep + temporal attention would absorb synthetic zeros otherwise)."""
    cfg = {"generator": {"num_bins": 5, "basechannels": 4, "num_encoders": 2,
                         "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                         "depths": [1, 1], "num_heads": 2, "window_size": [4, 4]}}
    model = build_model("BDE2VID", cfg)
    T, H, W = 7, 16, 16  # T % chunk != 0
    voxels = jnp.asarray(rng.normal(size=(T, 1, H, W, 5)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), voxels[:2])
    spec = ModelSpec("BDE2VID", model, params, 5, 2, is_sequence_model=True)
    got = np.asarray(eval_chunks_sharded(spec, voxels, chunk=2))
    want = np.concatenate(
        [np.asarray(model.apply(params, voxels[s : s + 2])[0]["image"])
         for s in range(0, T, 2)]
    )
    assert got.shape[0] == T
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_fn_cache_reuses_trace(rng):
    """Two param sets of the same architecture must share one jitted
    sharded forward (params are a jit argument, not a closure)."""
    from bde2vid_tpu.parallel import sharded_eval as se

    se._SHARDED_FN_CACHE.clear()
    T, H, W = 8, 32, 32
    voxels = jnp.asarray(rng.normal(size=(T, 1, H, W, 5)).astype(np.float32))
    spec_a = _spec()
    got_a = np.asarray(eval_chunks_sharded(spec_a, voxels, chunk=2))
    assert len(se._SHARDED_FN_CACHE) == 1

    model = spec_a.module
    params_b = model.init(jax.random.PRNGKey(99), voxels[0],
                          model.initial_state(1, H, W))
    spec_b = ModelSpec("E2VIDRecurrent", model, params_b, 5, 2)
    got_b = np.asarray(eval_chunks_sharded(spec_b, voxels, chunk=2))
    assert len(se._SHARDED_FN_CACHE) == 1  # same trace reused
    assert not np.allclose(got_a, got_b)  # and the new params actually ran


def test_sharded_eval_with_pallas_attention(rng):
    """eval_chunks_sharded must compose with the fused Pallas attention:
    shard_map runs the kernel per-device on local chunk shapes (a Mosaic
    custom call inside a globally-sharded jit would depend on SPMD
    custom-call partitioning instead). Sharded == sequential exactly."""
    import jax
    import jax.numpy as jnp

    from bde2vid_tpu.models import build_model
    from bde2vid_tpu.models.api import ModelSpec
    from bde2vid_tpu.parallel.sharded_eval import eval_chunks_sharded

    cfg = {"generator": {"num_bins": 5, "basechannels": 8, "num_encoders": 2,
                         "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                         "depths": [2, 2], "num_heads": 4, "window_size": [7, 7],
                         "use_pallas_attention": True}}
    model = build_model("BDE2VID", cfg)
    x = jnp.asarray(rng.normal(size=(8, 1, 28, 28, 5)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x[:2])
    spec = ModelSpec(name="BDE2VID", module=model, params=params, num_bins=5,
                     num_encoders=2, is_sequence_model=True)
    got = np.asarray(eval_chunks_sharded(spec, x, 2))
    want = np.concatenate(
        [np.asarray(model.apply(params, x[s:s + 2])[0]["image"])
         for s in range(0, 8, 2)], axis=0)
    np.testing.assert_allclose(got, want, atol=1e-6)
