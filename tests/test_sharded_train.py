"""Multi-device TRAINING proofs on the 8-device virtual CPU mesh.

The reference has no distributed backend (SURVEY §2.5/§5.8); these tests
prove the build's own multi-chip plan for the training path:

- DP train step == single-device train step on the concatenated batch,
- spatially-sharded (H-axis) train step fwd+bwd+update == unsharded,
- orbax save/restore round-trips mesh-sharded params.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from bde2vid_tpu.models import build_model
from bde2vid_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicate,
    spatial_sharding,
)
from bde2vid_tpu.train.trainer import (
    SequenceLossComputer,
    load_checkpoint_orbax,
    make_train_step,
    save_checkpoint_orbax,
)

CFG = {
    "num_bins": 5,
    "num_encoders": 2,
    "base_num_channels": 8,
    "num_residual_blocks": 1,
}


def _model_and_params(h=32, w=32, n=1):
    model = build_model("E2VIDRecurrent", CFG)
    v = jnp.zeros((n, h, w, 5))
    params = model.init(jax.random.PRNGKey(0), v, model.initial_state(n, h, w))
    return model, params


def _batch(rng, t, n, h, w):
    voxels = jnp.asarray(rng.normal(size=(t, n, h, w, 5)).astype(np.float32))
    frames = jnp.asarray(
        rng.uniform(size=(t, n, h, w, 1)).astype(np.float32)
    )
    return voxels, frames


def _step_fn(model):
    tx = optax.adam(1e-3)
    comp = SequenceLossComputer([{"type": "L1Loss"}])
    # donate=False: these tests run the SAME params through the step twice
    # (sharded vs unsharded) — donation would invalidate the first call's
    # input buffers
    step = make_train_step(model, tx, comp, is_sequence_model=False, donate=False)
    return tx, step


def _tree_allclose(a, b, atol=1e-5):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=atol, rtol=1e-5
        )


def test_dp_train_step_matches_single_device(rng):
    """Batch sharded over the 'data' axis must produce the same updated
    params/opt state as the unsharded step on the full concatenated batch
    (XLA inserts the gradient psum; math identical up to reduction order)."""
    T, N, H, W = 3, 8, 32, 32
    model, params = _model_and_params(H, W, N)
    tx, step = _step_fn(model)
    voxels, frames = _batch(rng, T, N, H, W)
    key = jax.random.PRNGKey(7)

    opt0 = tx.init(params)
    want_p, want_o, want_loss = step(params, opt0, key, voxels, frames, None)

    mesh = make_mesh(8, 1)
    dsh = data_sharding(mesh, 5, batch_axis=1)
    rep = replicate(mesh)
    params_s = jax.device_put(params, rep)
    opt_s = jax.device_put(tx.init(params), rep)
    with mesh:
        got_p, got_o, got_loss = step(
            params_s,
            opt_s,
            key,
            jax.device_put(voxels, dsh),
            jax.device_put(frames, dsh),
            None,
        )
    np.testing.assert_allclose(
        float(got_loss["loss"]), float(want_loss["loss"]), atol=1e-6
    )
    _tree_allclose(got_p, want_p)
    _tree_allclose(got_o, want_o)


def test_spatial_sharded_train_step_matches_unsharded(rng):
    """Sharding the sensor-height axis through fwd+bwd+update must be
    numerically inert (conv halos + their transposes become collective
    permutes inserted by XLA)."""
    T, N, H, W = 3, 2, 64, 32
    model, params = _model_and_params(H, W, N)
    tx, step = _step_fn(model)
    voxels, frames = _batch(rng, T, N, H, W)
    key = jax.random.PRNGKey(11)

    opt0 = tx.init(params)
    want_p, _, want_loss = step(params, opt0, key, voxels, frames, None)

    mesh = make_mesh(2, 4)
    ssh = spatial_sharding(mesh, 5, batch_axis=1, h_axis=2)
    rep = replicate(mesh)
    with mesh:
        got_p, _, got_loss = step(
            jax.device_put(params, rep),
            jax.device_put(tx.init(params), rep),
            key,
            jax.device_put(voxels, ssh),
            jax.device_put(frames, ssh),
            None,
        )
    np.testing.assert_allclose(
        float(got_loss["loss"]), float(want_loss["loss"]), atol=1e-6
    )
    _tree_allclose(got_p, want_p)


def test_spatial_sharded_flagship_attention_train_matches_unsharded(rng):
    """The FLAGSHIP's window attention through fwd+BWD+update under
    data+spatial sharding: gradients flowing back through the window
    partition/merge and temporal-buffer gathers must match the unsharded
    step. depths [2,2] include a dilated-window block at both levels;
    H=W=56 gives >=2x2 7x7 windows at both attention resolutions."""
    import jax.flatten_util

    cfg = {"generator": {"num_bins": 5, "basechannels": 8, "num_encoders": 2,
                         "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                         "depths": [2, 2], "num_heads": 4, "window_size": [7, 7],
                         "drop_path_rate": 0.0}}
    model = build_model("BDE2VID", cfg, train=True)
    T, N, H, W = 3, 2, 56, 56
    voxels, frames = _batch(rng, T, N, H, W)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        voxels[:2],
    )
    # SGD, not Adam: the proof target is the GRADIENTS; Adam's 1/sqrt(v)
    # amplifies benign 1e-8 reduction-order grad noise into ~lr-sized param
    # diffs near g~0, which would test the optimizer's conditioning, not
    # the sharding. (Caught a real bug on the way in: the T*N batch fold
    # with N inner made XLA SPMD double conv kernel grads on a combined
    # data+spatial mesh — see models/bde2vid.py _fold_tn.)
    tx = optax.sgd(1e-2)
    comp = SequenceLossComputer([{"type": "L1Loss"}])
    step = make_train_step(model, tx, comp, is_sequence_model=True, donate=False)
    key = jax.random.PRNGKey(3)

    def loss_fn(p, vox, tgt):
        out, _ = model.apply(p, vox, rngs={"droppath": key})
        return jnp.mean(jnp.abs(out["image"] - tgt))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    want_l, want_g = grad_fn(params, voxels, frames)
    want_p, _, want_loss = step(params, tx.init(params), key, voxels, frames, None)

    mesh = make_mesh(2, 4)
    ssh = spatial_sharding(mesh, 5, batch_axis=1, h_axis=2)
    rep = replicate(mesh)
    with mesh:
        got_l, got_g = grad_fn(
            jax.device_put(params, rep),
            jax.device_put(voxels, ssh),
            jax.device_put(frames, ssh),
        )
        got_p, _, got_loss = step(
            jax.device_put(params, rep),
            jax.device_put(tx.init(params), rep),
            key,
            jax.device_put(voxels, ssh),
            jax.device_put(frames, ssh),
            None,
        )
    np.testing.assert_allclose(float(got_l), float(want_l), atol=1e-6)
    np.testing.assert_allclose(
        float(got_loss["loss"]), float(want_loss["loss"]), atol=1e-6
    )
    # gradients through attention + encoders must match hard
    _tree_allclose(got_g, want_g, atol=1e-6)
    # the update must be non-degenerate (params actually moved)...
    flat_before = jax.flatten_util.ravel_pytree(params)[0]
    flat_after = jax.flatten_util.ravel_pytree(want_p)[0]
    assert float(jnp.abs(flat_after - flat_before).max()) > 1e-6
    # ...and the full sharded SGD step == unsharded
    _tree_allclose(got_p, want_p)


def test_orbax_roundtrip_sharded_params(rng, tmp_path):
    """Params living sharded on the mesh must save/restore losslessly and
    still drive the same forward after re-placement."""
    H = W = 32
    model, params = _model_and_params(H, W)
    mesh = make_mesh(4, 2)
    params_sharded = jax.device_put(params, replicate(mesh))

    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint_orbax(path, params_sharded, "E2VIDRecurrent", CFG)
    spec = load_checkpoint_orbax(path)

    _tree_allclose(spec.params, params, atol=0)

    voxels = jnp.asarray(rng.normal(size=(1, H, W, 5)).astype(np.float32))
    state0 = model.initial_state(1, H, W)
    want, _ = model.apply(params, voxels, state0)

    restored = jax.device_put(spec.params, replicate(mesh))
    with mesh:
        got, _ = jax.jit(model.apply)(restored, voxels, state0)
    np.testing.assert_allclose(
        np.asarray(got["image"]), np.asarray(want["image"]), atol=1e-6
    )


def test_dp_sharded_train_with_pallas_attention_matches_unsharded(rng):
    """Sharded TRAINING through the fused Pallas attention kernel (r3 gap:
    only sharded *eval* composed with the kernel). The DP step runs via
    shard_map — the Mosaic custom call and its custom-vjp backward see only
    device-local shapes — and must reproduce the unsharded step exactly:
    pmean-of-shard-gradients == full-batch gradients at 1e-6, and the full
    SGD update matches. depths [2,2] exercise a normal AND a dilated-window
    block at both levels."""
    from jax.sharding import PartitionSpec as P

    from bde2vid_tpu.parallel.sharded_train import (
        _REP_KW,
        make_dp_train_step,
        shard_map,
    )
    from bde2vid_tpu.train.trainer import make_loss_fn

    cfg = {"generator": {"num_bins": 5, "basechannels": 8, "num_encoders": 2,
                         "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                         "depths": [2, 2], "num_heads": 4, "window_size": [7, 7],
                         "drop_path_rate": 0.0,
                         "use_pallas_attention": True}}
    model = build_model("BDE2VID", cfg, train=True)
    T, N, H, W = 3, 8, 28, 28
    voxels, frames = _batch(rng, T, N, H, W)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
        voxels[:2],
    )
    key = jax.random.PRNGKey(3)
    comp = SequenceLossComputer([{"type": "L1Loss"}])
    tx = optax.sgd(1e-2)

    # ---- gradient parity through value_and_grad ----------------------------
    loss_fn = make_loss_fn(model, comp, is_sequence_model=True)

    def bare_loss(p, vox, tgt):
        total, _ = loss_fn(p, vox, tgt, None, {"droppath": key})
        return total

    want_l, want_g = jax.jit(jax.value_and_grad(bare_loss))(params, voxels, frames)

    mesh = make_mesh(8, 1)

    def local_grad(p, vox, tgt):
        l, g = jax.value_and_grad(bare_loss)(p, vox, tgt)
        return jax.lax.pmean(l, "data"), jax.lax.pmean(g, "data")

    # check_vma off, like the production step: the scan carries start as
    # replicated zeros and become data-varying — a benign mismatch the
    # VMA checker rejects
    sharded_grad = jax.jit(
        shard_map(
            local_grad,
            mesh=mesh,
            in_specs=(P(), P(None, "data"), P(None, "data")),
            out_specs=(P(), P()),
            **_REP_KW,
        )
    )
    with mesh:
        got_l, got_g = sharded_grad(
            jax.device_put(params, replicate(mesh)),
            jax.device_put(voxels, data_sharding(mesh, 5, batch_axis=1)),
            jax.device_put(frames, data_sharding(mesh, 5, batch_axis=1)),
        )
    np.testing.assert_allclose(float(got_l), float(want_l), atol=1e-6)
    _tree_allclose(got_g, want_g, atol=1e-6)

    # ---- full train step parity (params after one SGD update) --------------
    ref_step = make_train_step(model, tx, comp, is_sequence_model=True,
                               donate=False)
    want_p, _, want_loss = ref_step(params, tx.init(params), key,
                                    voxels, frames, None)
    dp_step = make_dp_train_step(model, tx, comp, mesh,
                                 is_sequence_model=True, donate=False)
    got_p, _, got_loss = dp_step(params, tx.init(params), key,
                                 voxels, frames, None)
    np.testing.assert_allclose(
        float(got_loss["loss"]), float(want_loss["loss"]), atol=1e-6
    )
    _tree_allclose(got_p, want_p, atol=1e-6)
