"""Fused window-attention kernel: interpret-mode parity vs the XLA path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bde2vid_tpu.ops.window_attn_pallas import fused_window_attention


@pytest.mark.parametrize("b_,m,n,heads,c", [(12, 49, 147, 16, 64), (4, 16, 48, 4, 32)])
def test_fused_attention_matches_reference(rng, b_, m, n, heads, c):
    f = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    q, k, v = f((b_, m, c)), f((b_, n, c)), f((b_, n, c))
    bias = f((heads, m, n))
    hd = c // heads

    def ref(q, k, v):
        def heads_(t):
            return t.reshape(b_, -1, heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads_(q) * hd**-0.5, heads_(k), heads_(v)
        a = jax.nn.softmax(jnp.einsum("bhmd,bhnd->bhmn", qh, kh) + bias[None], axis=-1)
        o = jnp.einsum("bhmn,bhnd->bhmd", a, vh)
        return o.transpose(0, 2, 1, 3).reshape(b_, m, c)

    want = np.asarray(ref(q, k, v))
    got = np.asarray(fused_window_attention(q, k, v, bias, heads, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_block_matches_flax_path(rng):
    """Fully fused kernel (LN+proj+attn+proj) == flax path on shared params,
    and the param trees are layout-identical (checkpoint compatible)."""
    import jax

    from bde2vid_tpu.nn.window_attention import SwinTransformerBlock3D

    D, B, H, W, C = 3, 1, 16, 16, 32
    x = jnp.asarray(rng.normal(size=(D, B, H, W, C)).astype(np.float32))
    ref_blk = SwinTransformerBlock3D(C, 4, window_size=(D, 8, 8), use_pallas=False)
    pl_blk = SwinTransformerBlock3D(C, 4, window_size=(D, 8, 8), use_pallas=True)
    params = ref_blk.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        pl_blk.init(jax.random.PRNGKey(0), x)
    )
    a = np.asarray(ref_blk.apply(params, x))
    b = np.asarray(pl_blk.apply(params, x))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_qkv_bias_false_tree_matches_across_paths(rng):
    """qkv_bias=False must produce the SAME param tree on the fused-Pallas
    and XLA paths (Dense(use_bias=False): kernel only, no q/kv bias leaves),
    and identical outputs on shared params."""
    from bde2vid_tpu.nn.window_attention import WindowAttention3D

    D, B_, WH, WW, C = 3, 4, 7, 7, 32
    x = jnp.asarray(rng.normal(size=(D, B_, WH, WW, C)).astype(np.float32))
    mk = lambda pallas: WindowAttention3D(
        C, (D, WH, WW), 4, qkv_bias=False, use_pallas=pallas
    )
    p_flax = mk(False).init(jax.random.PRNGKey(0), x)
    p_pall = mk(True).init(jax.random.PRNGKey(0), x)
    paths = lambda t: {
        "/".join(map(str, p)) for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]
    }
    assert paths(p_flax) == paths(p_pall)
    assert not any("q/bias" in s or "kv/bias" in s for s in paths(p_flax))
    out_flax = mk(False).apply(p_flax, x)
    out_pall = mk(True).apply(p_flax, x)
    np.testing.assert_allclose(
        np.asarray(out_pall), np.asarray(out_flax), atol=2e-5, rtol=1e-4
    )


def test_window_smaller_than_configured_bias_rows(rng):
    """get_window_size shrink: a 5x5 feature map under a (1,7,7) window must
    attend with a correctly-built relative bias (actual token grid indexed
    against the configured table — the reference garbles this case, so the
    contract here is correctness, not parity)."""
    from bde2vid_tpu.nn.window_attention import (
        SwinTransformerBlock3D,
        relative_position_index,
    )

    # index math: equal dims reduce to the configured-window index
    np.testing.assert_array_equal(
        relative_position_index(3, 7, 7), relative_position_index(3, 7, 7, 7, 7)
    )
    idx = relative_position_index(1, 7, 7, 5, 5)
    assert idx.shape == (25, 25)
    # relative offset (0,0) (the diagonal) maps to the table center
    center = (7 - 1) * (2 * 7 - 1) + (7 - 1)
    assert (np.diag(idx) == center).all()
    # indices stay inside the configured table
    assert idx.min() >= 0 and idx.max() < (2 * 1 - 1) * (2 * 7 - 1) * (2 * 7 - 1)

    D, B, H, W, C = 3, 2, 5, 5, 16
    x = jnp.asarray(rng.normal(size=(D, B, H, W, C)).astype(np.float32))
    blk = SwinTransformerBlock3D(C, 4, window_size=(3, 7, 7))
    params = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(params, x)
    assert out.shape == (B, H, W, C)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_swin_block_whole_block_parity(rng):
    """Whole-block fused mode (attention + residual + LN2 + MLP in one
    kernel, center as a separate operand): a depth-3 DFrameAttention stack
    (regular + dilated blocks, padded non-multiple sizes, so the dilated
    uncovered-pixel blend is exercised) matches the legacy path on shared
    params, with an identical param tree."""
    from bde2vid_tpu.nn.window_attention import DFrameAttention

    D, B, H, W, C = 5, 2, 13, 18, 32
    x = jnp.asarray(rng.normal(size=(D, B, H, W, C)).astype(np.float32))
    kw = dict(dim=C, depth=3, num_heads=8, window_size=(D, 7, 7),
              drop_path=(0.0, 0.1, 0.2), deterministic=True)
    m_ref = DFrameAttention(use_pallas=False, **kw)
    m_fus = DFrameAttention(use_pallas=True, **kw)
    p = m_ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        m_fus.init(jax.random.PRNGKey(0), x)
    )
    y_ref = np.asarray(m_ref.apply(p, x))
    y_fus = np.asarray(m_fus.apply(p, x))
    np.testing.assert_allclose(y_fus, y_ref, atol=2e-5, rtol=1e-4)


def test_dilated_uncovered_pixels_identity_block(rng):
    """Dilated windows do not tile the grid; the reference's fold writes
    zeros at unsampled pixels so a block reduces there to
    center + MLP(LN2(center)). The fused path must reproduce that."""
    from bde2vid_tpu.nn.window_attention import (
        SwinTransformerBlock3D,
        _dilated_covered_mask,
    )

    D, B, H, W, C = 3, 1, 14, 14, 16
    mask, full = _dilated_covered_mask(14, 14, 7, 7)
    assert not full  # this shape must actually have uncovered pixels
    x = jnp.asarray(rng.normal(size=(D, B, H, W, C)).astype(np.float32))
    blk_ref = SwinTransformerBlock3D(C, 4, window_size=(D, 7, 7),
                                     dilate_win=True, q_ind=1,
                                     use_pallas=False, deterministic=True)
    blk_fus = SwinTransformerBlock3D(C, 4, window_size=(D, 7, 7),
                                     dilate_win=True, q_ind=1,
                                     use_pallas=True, deterministic=True)
    p = blk_ref.init(jax.random.PRNGKey(0), x)
    y_ref = np.asarray(blk_ref.apply(p, x))
    y_fus = np.asarray(blk_fus.apply(p, x, center=x[1]))
    np.testing.assert_allclose(y_fus, y_ref, atol=2e-5, rtol=1e-4)


def test_fused_block_droppath_matches_legacy(rng):
    """TRAINING-mode stochastic depth through the fused kernel (r5: the
    drop-path multipliers are kernel operands) must match the legacy
    unfused body — same params, same droppath rng stream (both draw two
    per-sample masks per block, attention residual first) — in outputs AND
    gradients. H, W chosen so the dilated block has uncovered pixels (their
    MLP branch carries the m2 mask too)."""
    from bde2vid_tpu.nn.window_attention import DFrameAttention

    D, B, H, W, C = 3, 2, 13, 14, 16
    x = jnp.asarray(rng.normal(size=(D, B, H, W, C)).astype(np.float32))
    kw = dict(dim=C, depth=3, num_heads=4, window_size=(D, 7, 7),
              drop_path=(0.5, 0.5, 0.5), deterministic=False)
    m_leg = DFrameAttention(use_pallas=False, **kw)
    m_fus = DFrameAttention(use_pallas=True, **kw)
    p = m_leg.init(
        {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(9)},
        x,
    )

    # several rng draws so both mask outcomes (0 and 1/keep) are exercised
    for seed in range(4):
        rngs = {"droppath": jax.random.PRNGKey(seed)}
        y_leg = np.asarray(m_leg.apply(p, x, rngs=rngs))
        y_fus = np.asarray(m_fus.apply(p, x, rngs=rngs))
        np.testing.assert_allclose(y_fus, y_leg, atol=3e-5, rtol=1e-4)

    def loss(mod):
        def f(pp, xx):
            return jnp.sum(
                mod.apply(pp, xx, rngs={"droppath": jax.random.PRNGKey(3)})
                ** 2
            )
        return f

    gp_leg, gx_leg = jax.grad(loss(m_leg), argnums=(0, 1))(p, x)
    gp_fus, gx_fus = jax.grad(loss(m_fus), argnums=(0, 1))(p, x)
    np.testing.assert_allclose(
        np.asarray(gx_fus), np.asarray(gx_leg), atol=5e-4, rtol=5e-3
    )
    flat_l = jax.tree_util.tree_leaves_with_path(gp_leg)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gp_fus))
    for path, gl in flat_l:
        gf = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gl), atol=5e-4, rtol=5e-3,
            err_msg=str(path),
        )


def test_kernel_erf_gelu_matches_exact(rng):
    """Mosaic has no erf lowering; the kernel's A&S-7.1.26 GELU must match
    jax.nn.gelu(approximate=False) to ~f32 accuracy."""
    from bde2vid_tpu.ops.window_attn_pallas import _kernel_activation

    x = jnp.asarray(np.linspace(-6, 6, 20001, dtype=np.float32))
    got = np.asarray(_kernel_activation("gelu")(x))
    want = np.asarray(jax.nn.gelu(x, approximate=False))
    assert np.abs(got - want).max() < 1e-6


def test_fused_path_gradients_match_xla_path(rng):
    """The fused kernels carry a custom_vjp (backward = vjp of the pure-JAX
    twin — Pallas has no autodiff rule, and before r4 training through the
    kernel only 'worked' because interpret mode happened to be traceable).
    Model-level check: d(loss)/d(params) through the Pallas attention path
    must match the XLA attention path (forwards are already proven equal),
    on a config with a normal AND a dilated block."""
    from bde2vid_tpu.models import build_model

    cfg = {"generator": {"num_bins": 5, "basechannels": 8, "num_encoders": 2,
                         "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                         "depths": [2, 0], "num_heads": 4, "window_size": [7, 7],
                         "drop_path_rate": 0.0}}
    T, N, H, W = 3, 1, 28, 28
    x = jnp.asarray(rng.normal(size=(T, N, H, W, 5)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(size=(T, N, H, W, 1)).astype(np.float32))

    def grads_for(pallas: bool):
        c = {"generator": dict(cfg["generator"], use_pallas_attention=pallas)}
        model = build_model("BDE2VID", c, train=True)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
            x[:2],
        )

        def loss(p):
            out, _ = model.apply(p, x, rngs={"droppath": jax.random.PRNGKey(2)})
            return jnp.mean(jnp.abs(out["image"] - tgt))

        l, g = jax.jit(jax.value_and_grad(loss))(params)
        return float(l), g

    l_ref, g_ref = grads_for(False)
    l_fus, g_fus = grads_for(True)
    np.testing.assert_allclose(l_fus, l_ref, atol=2e-5, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_fus),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3)


def test_bwd_kernel_matches_twin_vjp_attention(rng):
    """Op-level: the hand-derived Pallas backward kernel (r4,
    _attn_core_bwd_call — flash-style, recomputes probs in VMEM) must
    reproduce jax.vjp of the pure-JAX twin for every input cotangent:
    dq/dk/dv AND the grid-accumulated dbias."""
    from bde2vid_tpu.ops.window_attn_pallas import (
        _attn_core_bwd_call,
        _ref_window_attention,
    )

    b_, m, n, heads, c = 12, 49, 147, 4, 32
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    q, k, v = f(b_, m, c), f(b_, n, c), f(b_, n, c)
    bias, g = f(heads, m, n), f(b_, m, c)

    _, vjp = jax.vjp(
        lambda qq, kk, vv, bb: _ref_window_attention(qq, kk, vv, bb, heads),
        q, k, v, bias,
    )
    want = vjp(g)
    got = _attn_core_bwd_call(heads, True, True, q, k, v, bias, g)
    for a, b, name in zip(got, want, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_hybrid_block_backwards_match_twin_vjp(rng):
    """The fused block entry points' custom_vjp backwards (r4 hybrids: XLA
    pre/post vjps around the Pallas core kernels) must match jax.vjp of
    their pure-JAX twins across ALL cotangents (x, ctr, every param)."""
    import functools

    from bde2vid_tpu.ops.window_attn_pallas import (
        _ref_swin_block,
        _ref_window_block,
        fused_swin_block,
        fused_window_block,
    )

    d, b_, m, c, heads = 3, 8, 49, 32, 4
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    x = f(d, b_, m, c)
    ln_q, ln_kv = (f(c) + 1.0, f(c)), (f(c) + 1.0, f(c))
    w_q, w_k, w_v, w_p = ((f(c, c) * c**-0.5, f(c)) for _ in range(4))
    bias = f(heads, m, d * m)

    # --- fused_window_block ---
    params = (ln_q, ln_kv, w_q, w_k, w_v, w_p, bias)
    g = f(b_, m, c)
    _, vjp = jax.vjp(
        lambda xx, pp: _ref_window_block(xx, pp, heads, d // 2), x, params
    )
    want = vjp(g)
    fused = lambda xx, pp: fused_window_block(
        xx, *pp[:-1], pp[-1], heads, d // 2, interpret=True
    )
    _, vjp_fused = jax.vjp(fused, x, params)
    got = vjp_fused(g)
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)

    # --- fused_swin_block (adds ctr routing, LN2 + MLP tail) ---
    ln2 = (f(c) + 1.0, f(c))
    fc1, fc2 = (f(c, 2 * c) * c**-0.5, f(2 * c)), (f(2 * c, c) * c**-0.5, f(c))
    sparams = (ln_q, ln_kv, w_q, w_k, w_v, w_p, ln2, fc1, fc2, bias)
    ctr = f(b_, m, c)
    _, vjp_s = jax.vjp(
        lambda xx, cc, pp: _ref_swin_block(xx, cc, pp, heads, d // 2, "gelu"),
        x, ctr, sparams,
    )
    want_s = vjp_s(g)
    fused_s = lambda xx, cc, pp: fused_swin_block(
        xx, cc, *pp[:-1], pp[-1], heads, d // 2, activation="gelu", interpret=True
    )
    _, vjp_fs = jax.vjp(fused_s, x, ctr, sparams)
    got_s = vjp_fs(g)
    for a, b in zip(
        jax.tree_util.tree_leaves(got_s), jax.tree_util.tree_leaves(want_s)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_f32_fast_mode_plumbs_and_matches_on_cpu(rng):
    """The f32 FAST mode (exact=False: kernel dots at default precision
    instead of HIGHEST — the f32 TRAINING throughput knob) must thread
    through the whole stack: kernel entry points, custom_vjp backwards,
    the flax blocks (f32_exact) and the model config (pallas_f32_exact).
    Interpret mode runs f32 dots either way, so fast == exact bit-for-bit
    on CPU; the precision difference itself only exists on the MXU and is
    covered by the on-chip bench parity keys."""
    from bde2vid_tpu.models import build_model
    from bde2vid_tpu.ops.window_attn_pallas import (
        _ref_swin_block,
        fused_swin_block,
    )

    d, b_, m, c, heads = 3, 8, 49, 32, 4
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.5)
    x, ctr, g = f(d, b_, m, c), f(b_, m, c), f(b_, m, c)
    ln_q, ln_kv, ln2 = ((f(c) + 1.0, f(c)) for _ in range(3))
    w_q, w_k, w_v, w_p = ((f(c, c) * c**-0.5, f(c)) for _ in range(4))
    fc1, fc2 = (f(c, 2 * c) * c**-0.5, f(2 * c)), (f(2 * c, c) * c**-0.5, f(c))
    params = (ln_q, ln_kv, w_q, w_k, w_v, w_p, ln2, fc1, fc2, bias := f(heads, m, d * m))

    # op level: fwd + every cotangent through the fast-mode custom_vjp
    run = lambda exact: jax.vjp(
        lambda xx, cc, pp: fused_swin_block(
            xx, cc, *pp[:-1], pp[-1], heads, d // 2,
            activation="gelu", interpret=True, exact=exact,
        ),
        x, ctr, params,
    )
    out_fast, vjp_fast = run(False)
    out_exact, vjp_exact = run(True)
    np.testing.assert_array_equal(np.asarray(out_fast), np.asarray(out_exact))
    want = _ref_swin_block(x, ctr, params, heads, d // 2, "gelu", exact=False)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(want), atol=2e-5, rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(vjp_fast(g)),
        jax.tree_util.tree_leaves(vjp_exact(g)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # model level: the config key reaches the kernels (trace succeeds and
    # gradients flow on a tiny normless config)
    cfg = {"generator": {
        "num_bins": 5, "basechannels": 8, "num_encoders": 1, "depths": (2,),
        "num_heads": 2, "buffer_index": (-1, 0, 1), "window_size": (7, 7),
        "use_pallas_attention": True, "pallas_f32_exact": False,
    }}
    model = build_model("BDE2VID", cfg, train=True)
    voxels = f(3, 1, 28, 28, 5)
    rngs = {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)}
    params_m = model.init(rngs, voxels)

    def loss(p):
        out, _ = model.apply(p, voxels, rngs={"droppath": rngs["droppath"]})
        return jnp.mean(out["image"] ** 2)

    l, grads = jax.value_and_grad(loss)(params_m)
    assert np.isfinite(float(l))
    gn = sum(float(jnp.sum(jnp.abs(a))) for a in jax.tree_util.tree_leaves(grads))
    assert gn > 0.0


def test_fused_attention_prime_window_count(rng):
    """b_ not divisible by any windows-per-program ladder entry (odd window
    grids happen at common sensor sizes, e.g. 7x9=63 windows at level 1 of
    a 184x240 input) must fall back to wb=1 in BOTH the forward and
    backward kernels and stay exact."""
    from bde2vid_tpu.ops.window_attn_pallas import (
        _attn_core_bwd_call,
        _head_masks_and_wb,
        _ref_window_attention,
    )

    b_, m, n, heads, c = 7, 49, 147, 4, 32
    bias0 = jnp.zeros((heads, m, n), jnp.float32)
    assert _head_masks_and_wb(b_, m, c, heads, bias0)[2] == 1

    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    q, k, v, bias, g = f(b_, m, c), f(b_, n, c), f(b_, n, c), f(heads, m, n), f(b_, m, c)

    want = _ref_window_attention(q, k, v, bias, heads)
    got = fused_window_attention(q, k, v, bias, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    _, vjp = jax.vjp(
        lambda qq, kk, vv, bb: _ref_window_attention(qq, kk, vv, bb, heads),
        q, k, v, bias,
    )
    want_g = vjp(g)
    got_g = _attn_core_bwd_call(heads, True, True, q, k, v, bias, g)
    for a, b, name in zip(got_g, want_g, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4, err_msg=name
        )


def test_bwd_kernel_bf16_matches_twin_vjp(rng):
    """bf16 training (the benched throughput mode) differentiates through
    the same backward kernel with bf16 operands; it must match the twin's
    jax.vjp in bf16 — same dots, same cast points — to bf16 tolerance."""
    from bde2vid_tpu.ops.window_attn_pallas import (
        _attn_core_bwd_call,
        _ref_window_attention,
    )

    b_, m, n, heads, c = 8, 49, 147, 4, 32
    f = lambda *s: jnp.asarray(
        rng.normal(size=s).astype(np.float32)
    ).astype(jnp.bfloat16)
    q, k, v, bias16, g = f(b_, m, c), f(b_, n, c), f(b_, n, c), f(heads, m, n), f(b_, m, c)
    bias = bias16.astype(jnp.float32)  # the bias table param stays f32

    _, vjp = jax.vjp(
        lambda qq, kk, vv, bb: _ref_window_attention(qq, kk, vv, bb, heads),
        q, k, v, bias,
    )
    want = vjp(g)
    got = _attn_core_bwd_call(heads, True, True, q, k, v, bias, g)
    for a, b, name in zip(got, want, ("dq", "dk", "dv", "dbias")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 2e-2, (
            name, float(np.abs(a - b).max()), float(scale)
        )
