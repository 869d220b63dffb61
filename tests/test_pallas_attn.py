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
