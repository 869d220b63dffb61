"""Exact-resume train-state checkpoints (train/trainer.py).

The params-only formats (msgpack / plain orbax) reinitialize the Adam
moments on resume, so a resumed run diverges from the uninterrupted one.
The full train-state checkpoint (params + opt_state + step + PRNG key)
must NOT: these tests pin save -> restore -> continue == run-straight,
on one device and through the data-parallel shard_map step on the mesh
(the multi-chip resume path — leaves save sharded, restore replicated
onto the mesh without a host round trip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bde2vid_tpu.models import build_model
from bde2vid_tpu.parallel.mesh import data_sharding, make_mesh
from bde2vid_tpu.parallel.sharded_train import make_dp_train_step
from bde2vid_tpu.train import (
    SequenceLossComputer,
    is_train_state,
    make_train_step,
    restore_train_state_orbax,
    save_train_state_orbax,
)

T, N, H, W, B = 2, 4, 16, 16, 5
CFG = {"num_bins": B, "num_encoders": 1, "base_num_channels": 4,
       "num_residual_blocks": 1}


def _build():
    model = build_model("E2VIDRecurrent", CFG)
    voxel = jnp.zeros((N, H, W, B))
    params = model.init(jax.random.PRNGKey(0), voxel,
                        model.initial_state(N, H, W))
    return model, params


def _data(i):
    r = np.random.RandomState(100 + i)
    vox = r.randn(T, N, H, W, B).astype(np.float32)
    gt = r.rand(T, N, H, W, 1).astype(np.float32)
    return jnp.asarray(vox), jnp.asarray(gt)


def _drive(step_fn, params, opt_state, key, lo, hi, put=lambda x: x):
    for i in range(lo, hi):
        key, k1 = jax.random.split(key)
        vox, gt = _data(i)
        params, opt_state, _ = step_fn(params, opt_state, k1,
                                       put(vox), put(gt), None)
    return params, opt_state, key


def test_exact_resume_matches_uninterrupted(tmp_path):
    """3 steps + save + restore + 3 steps == 6 straight steps, bit-exact
    (same device, same op schedule: Adam moments and the PRNG key survive
    the round trip)."""
    model, params = _build()
    tx = optax.adam(1e-3)
    comp = SequenceLossComputer([{"type": "L1Loss"}])
    step = make_train_step(model, tx, comp, is_sequence_model=False,
                           donate=False)
    key0 = jax.random.PRNGKey(7)

    pa, sa, _ = _drive(step, params, tx.init(params), key0, 0, 6)

    pb, sb, kb = _drive(step, params, tx.init(params), key0, 0, 3)
    path = str(tmp_path / "mid.state")
    save_train_state_orbax(path, pb, sb, 3, kb, "E2VIDRecurrent", CFG)
    assert is_train_state(path)
    assert not is_train_state(str(tmp_path / "nope.state"))

    spec, sr, start, kr = restore_train_state_orbax(path, tx)
    assert start == 3
    np.testing.assert_array_equal(np.asarray(kr), np.asarray(kb))
    pr, _, _ = _drive(step, spec.params, sr, kr, start, 6)

    flat_a = jax.tree_util.tree_leaves_with_path(pa)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(pr))
    assert len(flat_a) == len(flat_r)
    for kpath, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_r[kpath]),
            err_msg=jax.tree_util.keystr(kpath))


def test_exact_resume_distributed_on_mesh(tmp_path):
    """The same invariant through the DP shard_map step: the train state
    saves from on-mesh (replicated) leaves with no host gather, restores
    committed onto the mesh (NamedSharding targets), and the resumed DP
    run matches the uninterrupted DP run exactly."""
    mesh = make_mesh(2, 1)
    model, params = _build()
    tx = optax.adam(1e-3)
    comp = SequenceLossComputer([{"type": "L1Loss"}])
    step = make_dp_train_step(model, tx, comp, mesh,
                              is_sequence_model=False, donate=False)
    vsh = data_sharding(mesh, 5, batch_axis=1)
    put = lambda x: jax.device_put(x, vsh)
    key0 = jax.random.PRNGKey(11)

    pa, _, _ = _drive(step, params, tx.init(params), key0, 0, 4, put)

    pb, sb, kb = _drive(step, params, tx.init(params), key0, 0, 2, put)
    path = str(tmp_path / "mesh.state")
    save_train_state_orbax(path, pb, sb, 2, kb, "E2VIDRecurrent", CFG)

    spec, sr, start, kr = restore_train_state_orbax(path, tx, mesh=mesh)
    # leaves landed on the mesh, committed + replicated
    leaf = jax.tree_util.tree_leaves(spec.params)[0]
    assert leaf.sharding.mesh.shape == mesh.shape
    assert leaf.sharding.is_fully_replicated
    pr, _, _ = _drive(step, spec.params, sr, kr, start, 4, put)

    for a, r in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))


def test_train_cli_save_state_and_exact_resume(tmp_path, rng):
    """CLI surface: --save_state writes epoch_N.state next to the msgpack,
    and --resume <.state> continues from the recorded step (the resumed
    run trains steps 2..4 only and writes epoch_4 checkpoints)."""
    import json as _json

    from bde2vid_tpu.events import H5EventWriter
    from bde2vid_tpu.train.__main__ import main
    from tests.conftest import make_events

    sensor = (16, 16)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    xs, ys, ts, ps = make_events(rng, n=8000, sensor_size=sensor, t1=1.0)
    with H5EventWriter(str(data_dir / "s.h5"), sensor_size=sensor) as w:
        w.append_events(xs, ys, ts, ps > 0)
        for i in range(8):
            w.add_image(rng.integers(0, 255, sensor).astype(np.uint8),
                        (i + 0.5) / 8)

    cfg = {
        "name": "t",
        "model": {"type": "E2VIDRecurrent",
                  "args": {"num_bins": 5, "num_encoders": 1,
                           "base_num_channels": 4,
                           "num_residual_blocks": 1}},
        "losses": [{"type": "L1Loss"}],
        "optimizer": {"lr": 1e-3},
        "data": {"sequence_length": 2, "num_bins": 5},
        "train": {"ckpt_every": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(_json.dumps(cfg))
    out_dir = tmp_path / "out"
    rc = main(["--config", str(cfg_path), "--data_dir", str(data_dir),
               "--out_dir", str(out_dir), "--steps", "2", "--save_state"])
    assert rc == 0
    state_dir = out_dir / "epoch_2.state"
    assert state_dir.exists() and is_train_state(str(state_dir))

    out2 = tmp_path / "out2"
    rc = main(["--config", str(cfg_path), "--data_dir", str(data_dir),
               "--out_dir", str(out2), "--steps", "4", "--save_state",
               "--resume", str(state_dir)])
    assert rc == 0
    # resumed run starts at step 2: it writes epoch_4 only, not epoch_2
    assert (out2 / "epoch_4.msgpack").exists()
    assert not (out2 / "epoch_2.msgpack").exists()
    spec, _, step, _ = restore_train_state_orbax(
        str(out2 / "epoch_4.state"), optax.adam(1e-3))
    assert step == 4 and spec.name == "E2VIDRecurrent"


def test_exact_resume_mid_schedule(tmp_path):
    """VERDICT r4 #1: a SCHEDULED optimizer (factory-built, StepLR decaying
    mid-run + grad clipping) must resume bit-exactly mid-schedule — the
    schedule position lives in opt_state's step count, so restore +
    continue == run straight through the decay boundary."""
    from bde2vid_tpu.train import build_optimizer

    model, params = _build()
    tx, desc = build_optimizer(
        {"type": "Adam", "args": {"lr": 1e-3, "grad_clip": 1.0}},
        {"type": "StepLR", "args": {"step_size": 4, "gamma": 0.1}},
    )
    assert "StepLR" in desc
    comp = SequenceLossComputer([{"type": "L1Loss"}])
    step = make_train_step(model, tx, comp, is_sequence_model=False,
                           donate=False)
    key0 = jax.random.PRNGKey(3)

    pa, _, _ = _drive(step, params, tx.init(params), key0, 0, 6)

    # save at step 3 — BEFORE the step-4 lr decay, so the resumed run must
    # replay the boundary from restored opt_state alone
    pb, sb, kb = _drive(step, params, tx.init(params), key0, 0, 3)
    path = str(tmp_path / "sched.state")
    save_train_state_orbax(path, pb, sb, 3, kb, "E2VIDRecurrent", CFG)
    spec, sr, start, kr = restore_train_state_orbax(path, tx)
    pr, _, _ = _drive(step, spec.params, sr, kr, start, 6)

    for a, r in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))


def test_train_cli_resume_matches_uninterrupted(tmp_path, rng):
    """The CLI-level invariant behind the library-level bit-exactness: a
    run resumed from epoch_2.state must produce the SAME epoch_4 params as
    the uninterrupted run — which requires the DATA stream to resume too
    (per-step window seeding; the r4 advisor found the resumed run
    re-trained on the init batch and replayed data from step 0)."""
    import json as _json

    from flax import serialization

    from bde2vid_tpu.events import H5EventWriter
    from bde2vid_tpu.train.__main__ import main
    from tests.conftest import make_events

    sensor = (16, 16)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    xs, ys, ts, ps = make_events(rng, n=8000, sensor_size=sensor, t1=1.0)
    with H5EventWriter(str(data_dir / "s.h5"), sensor_size=sensor) as w:
        w.append_events(xs, ys, ts, ps > 0)
        for i in range(8):
            w.add_image(rng.integers(0, 255, sensor).astype(np.uint8),
                        (i + 0.5) / 8)

    cfg = {
        "name": "t",
        "model": {"type": "E2VIDRecurrent",
                  "args": {"num_bins": 5, "num_encoders": 1,
                           "base_num_channels": 4,
                           "num_residual_blocks": 1}},
        "losses": [{"type": "L1Loss"}],
        "optimizer": {"type": "Adam", "args": {"lr": 1e-3}},
        "lr_scheduler": {"type": "StepLR",
                         "args": {"step_size": 3, "gamma": 0.1}},
        "data": {"sequence_length": 2, "num_bins": 5},
        "train": {"ckpt_every": 2},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(_json.dumps(cfg))

    straight = tmp_path / "straight"
    assert main(["--config", str(cfg_path), "--data_dir", str(data_dir),
                 "--out_dir", str(straight), "--steps", "4"]) == 0

    part = tmp_path / "part"
    assert main(["--config", str(cfg_path), "--data_dir", str(data_dir),
                 "--out_dir", str(part), "--steps", "2",
                 "--save_state"]) == 0
    resumed = tmp_path / "resumed"
    assert main(["--config", str(cfg_path), "--data_dir", str(data_dir),
                 "--out_dir", str(resumed), "--steps", "4",
                 "--resume", str(part / "epoch_2.state")]) == 0

    a = (straight / "epoch_4.msgpack").read_bytes()
    b = (resumed / "epoch_4.msgpack").read_bytes()
    pa = serialization.msgpack_restore(a)
    pb = serialization.msgpack_restore(b)
    flat_a = jax.tree_util.tree_leaves_with_path(pa)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(pb))
    assert len(flat_a) == len(flat_b)
    for kpath, leaf in flat_a:
        np.testing.assert_array_equal(
            leaf, flat_b[kpath], err_msg=jax.tree_util.keystr(kpath))
