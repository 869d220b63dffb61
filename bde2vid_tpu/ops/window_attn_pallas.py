"""Fused cross-frame window attention (Pallas TPU kernel).

The BDE2VID window attention (nn/window_attention.py) is the throughput
bottleneck of the flagship: per window, q has M = Wh*Ww tokens, kv has
N = D*Wh*Ww tokens, and the XLA path materializes the (B*, heads, M, N)
score tensor in HBM (~135 MB per block at 240x180), making bias+softmax+AV
bandwidth-bound (~2.7 ms/block measured vs ~0.1 ms of useful traffic).

This kernel keeps each window's scores entirely in VMEM (flash-attention
style, but the whole window fits so no online-softmax tiling is needed):

- one grid program per window;
- head_dim is tiny (e.g. 4 for 16 heads on 64 channels) which is hostile to
  the MXU, so scores are computed with a HEAD-MASK trick: for head h,
  ``scores_h = (q * mask_h) @ k^T`` — a full-K=C matmul whose contraction
  only sees head h's channels. 16 full-width matmuls trade 4x redundant
  FLOPs (free: we are far from compute bound) for MXU-shaped operands;
- AV uses the complementary trick: ``out += attn_h @ (v * mask_h)`` — the
  head masks partition the output columns, so the sum assembles the
  multi-head output directly in (M, C) layout. No lane-dimension reshapes
  anywhere (Mosaic-friendly).

HBM traffic drops to reading q/k/v once and writing (M, C) per window.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _dot_precision(dtype, exact: bool = True):
    """Dot precision by operand dtype: f32 operands request the exact
    multi-pass MXU product (Mosaic honors precision=HIGHEST; measured
    7.6e-6 vs 0.17 max-err on a 256x256 N(0,1) matmul on chip) — nearly
    free in the bandwidth-bound forward, and it makes the f32 fused path
    the numerically EXACT side of the fused-vs-XLA parity comparison.
    ``exact=False`` (the f32 FAST mode, for f32 *training* where the
    5-dot backward is compute-bound) keeps the default single-pass MXU
    product for f32 too — XLA-default-grade numerics at bf16-grade dot
    cost. bf16 operands run the native single MXU pass either way
    (precision is moot).
    """
    return jax.lax.Precision.HIGHEST if (dtype == jnp.float32 and exact) else None



def _attn_core(q, k, v, masks_rows, bias_rows, scale, num_heads, m, exact=True):
    """One window's masked stacked-head attention — the shared inner body
    of all three kernels. q: (M, C), k/v: (N, C), masks_rows: (H*M, C),
    bias_rows: (H*M, N). Returns the (M, C) f32 multi-head output.

    Heads stack in the ROW dimension so the whole window is TWO big MXU
    matmuls instead of 2*H tiny (K=head_dim) ones: ``Qm = mask_h ⊙ q`` per
    head-block of rows, so scores row-block h only sees head h's channels;
    AV uses the complementary column masking and the per-head blocks sum
    back into (M, C) layout. Inputs keep their dtype (bf16 operands run
    the MXU at full rate); accumulation is f32 via preferred_element_type;
    no lane-dimension reshapes anywhere (Mosaic constraint)."""
    in_dtype = q.dtype
    q_rep = jnp.concatenate([q] * num_heads, axis=0)  # (H*M, C)
    qm = masks_rows.astype(in_dtype) * q_rep
    scores = jax.lax.dot_general(
        qm, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact)
    )  # (H*M, N)
    scores = scores * scale + bias_rows
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(in_dtype)
    outs = jax.lax.dot_general(
        attn, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact)
    )  # (H*M, C)
    outs = outs * masks_rows
    out = outs[0:m]
    for h in range(1, num_heads):
        out = out + outs[h * m : (h + 1) * m]
    return out


def _kernel(
    q_ref, k_ref, v_ref, bias_ref, masks_ref, out_ref,
    *, num_heads, scale, wb, m, exact,
):
    # masks_ref: (H*M, C) row-stacked head masks (precomputed host-side — no
    # tile-unaligned reshapes inside the kernel); bias_ref: (H*M, N)
    masks_rows = masks_ref[:]
    bias_rows = bias_ref[:].astype(jnp.float32)
    for w in range(wb):  # windows per program (amortizes the bias DMA)
        out = _attn_core(
            q_ref[w], k_ref[w], v_ref[w], masks_rows, bias_rows,
            scale, num_heads, m, exact,
        )
        out_ref[w] = out.astype(out_ref.dtype)


def _head_masks_and_wb(b_: int, m: int, c: int, num_heads: int, bias: Array):
    """Shared blocking setup for both fused kernels.

    Returns (masks_rows (H*M, C), bias_rows (H*M, N), wb): the per-head
    channel masks for the stacked-head matmul trick, the bias reshaped to
    stacked rows, and the windows-per-program count — the largest divisor
    of B_ from the tuned ladder, amortizing the bias/mask DMA without
    blowing VMEM (per window: ~2*N*C*4B f32 operands + one (M, N) f32
    score plane)."""
    head_dim = c // num_heads
    masks = np.zeros((num_heads, c), np.float32)
    for h in range(num_heads):
        masks[h, h * head_dim : (h + 1) * head_dim] = 1.0
    masks_rows = jnp.asarray(np.repeat(masks, m, axis=0))  # (H*M, C)
    bias_rows = bias.reshape(num_heads * m, -1)  # (H*M, N)
    wb = 1
    for cand in (12, 8, 6, 4, 2):
        if b_ % cand == 0:
            wb = cand
            break
    return masks_rows, bias_rows, wb


def _ref_window_attention(q, k, v, bias, num_heads, exact=True):
    """Pure-JAX twin of fused_window_attention — the SAME math (_attn_core,
    same casts), vmapped over windows. Kept as the numerical oracle for the
    hand-written Pallas backward (tests/bench compare against its jax.vjp)
    and for platforms without the kernel."""
    b_, m, c = q.shape
    scale = (c // num_heads) ** -0.5
    masks_rows, bias_rows, _ = _head_masks_and_wb(b_, m, c, num_heads, bias)
    out = jax.vmap(
        lambda qq, kk, vv: _attn_core(
            qq, kk, vv, masks_rows, bias_rows, scale, num_heads, m, exact
        )
    )(q, k, v)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _window_attention_call(num_heads, interpret, exact, q, k, v, bias):
    b_, m, c = q.shape
    n = k.shape[1]
    head_dim = c // num_heads
    scale = head_dim**-0.5

    masks_rows, bias_rows, wb = _head_masks_and_wb(b_, m, c, num_heads, bias)

    grid = (b_ // wb,)
    return pl.pallas_call(
        functools.partial(
            _kernel, num_heads=num_heads, scale=scale, wb=wb, m=m, exact=exact
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wb, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_heads * m, n), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((num_heads * m, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_, m, c), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the default 16 MB scoped-vmem cap rejects the f32 flagship
            # program (multi-pass HIGHEST dots need ~17 MB of stack at
            # wb=12); physical VMEM is 128 MB — raise the cap, do not
            # shrink wb (smaller wb re-pays the bias/mask DMA per call)
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_ * num_heads * (m * n * c * 2),
            bytes_accessed=b_ * (m * c + 2 * n * c + m * c) * q.dtype.itemsize,
            transcendentals=b_ * num_heads * m * n,
        ),
    )(q, k, v, bias_rows, masks_rows)


def _window_attention_fwd(num_heads, interpret, exact, q, k, v, bias):
    out = _window_attention_call(num_heads, interpret, exact, q, k, v, bias)
    return out, (q, k, v, bias)


def _window_attention_bwd(num_heads, interpret, exact, res, g):
    q, k, v, bias = res
    return _attn_core_bwd_call(num_heads, interpret, exact, q, k, v, bias, g)


_window_attention_call.defvjp(_window_attention_fwd, _window_attention_bwd)


# ---------------------------------------------------------------------------
# Pallas BACKWARD kernel for the attention core
# ---------------------------------------------------------------------------
#
# The first-generation backward (vjp of the pure-JAX twin) re-materialized
# the (B_, H*M, N) score/probability tensors in HBM several times per block
# call (~271 MB each at the flagship level-0 shape) — it made training's
# backward HBM-bound on exactly the traffic the forward kernel eliminates.
# This kernel computes the attention core's vjp per window entirely in VMEM
# (flash-attention backward structure; the window fits, so no tiling):
# recompute p = softmax(qk*scale + bias), then
#   dv = p^T (g ⊙ mask),  dp = (g ⊙ mask) v^T,
#   ds = p ⊙ (dp - Σ dp⊙p)           (softmax vjp; the max-subtraction
#                                      term is exactly zero in real math),
#   dq = (ds·scale) k ⊙ mask,  dk = (ds·scale)^T (q ⊙ mask),
#   dbias = Σ_windows ds              (grid-accumulated output block).
# The head-mask row-stacking is the same trick as the forward. Block-level
# backwards (_window_block_bwd/_swin_block_bwd) become hybrids: jax.vjp of
# the cheap (B*M, C)-sized pre/post stages in XLA around this kernel plus
# one forward-kernel recompute of the attention output.


def _attn_core_bwd_body(
    q, k, v, g, masks_rows, bias_rows, scale, num_heads, m, exact=True
):
    """vjp of _attn_core for ONE window. q/g: (M, C), k/v: (N, C). Returns
    (dq (M,C) f32, dk (N,C) f32, dv (N,C) f32, ds (H*M, N) f32 — the
    per-window dbias contribution). Mirrors the forward's cast points:
    dots run on in_dtype operands with f32 accumulation (HIGHEST for f32
    unless the fast mode opts out, see _dot_precision)."""
    in_dtype = q.dtype
    prec = _dot_precision(in_dtype, exact)
    # --- forward recompute (identical to _attn_core up to the probs) ---
    q_rep = jnp.concatenate([q] * num_heads, axis=0)  # (H*M, C)
    qm = masks_rows.astype(in_dtype) * q_rep
    scores = jax.lax.dot_general(
        qm, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    scores = scores * scale + bias_rows
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    p32 = e / jnp.sum(e, axis=-1, keepdims=True)  # (H*M, N) f32
    p = p32.astype(in_dtype)
    # --- backward ---
    g_rep = jnp.concatenate([g] * num_heads, axis=0).astype(jnp.float32)
    do = (g_rep * masks_rows).astype(in_dtype)  # cotangent of the AV dot
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (N, C)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (H*M, N)
    ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))  # f32
    dsc = (ds * scale).astype(in_dtype)
    dqm = jax.lax.dot_general(
        dsc, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (H*M, C)
    dk = jax.lax.dot_general(
        dsc, qm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (N, C)
    dqm = dqm * masks_rows
    dq = dqm[0:m]
    for h in range(1, num_heads):
        dq = dq + dqm[h * m : (h + 1) * m]
    return dq, dk, dv, ds


def _bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, bias_ref, masks_ref,
    dq_ref, dk_ref, dv_ref, dbias_ref,
    *, num_heads, scale, wb, m, exact,
):
    masks_rows = masks_ref[:]
    bias_rows = bias_ref[:].astype(jnp.float32)
    acc = None
    for w in range(wb):
        dq, dk, dv, ds = _attn_core_bwd_body(
            q_ref[w], k_ref[w], v_ref[w], g_ref[w],
            masks_rows, bias_rows, scale, num_heads, m, exact,
        )
        dq_ref[w] = dq.astype(dq_ref.dtype)
        dk_ref[w] = dk.astype(dk_ref.dtype)
        dv_ref[w] = dv.astype(dv_ref.dtype)
        acc = ds if acc is None else acc + ds
    # dbias block is revisited by every grid program (index map -> (0, 0));
    # the TPU grid is sequential, so init-then-accumulate is race-free
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[:] = acc

    @pl.when(pl.program_id(0) != 0)
    def _accum():
        dbias_ref[:] = dbias_ref[:] + acc


def _attn_core_bwd_call(num_heads, interpret, exact, q, k, v, bias, g):
    """(q, k, v, bias, g=dout) -> (dq, dk, dv, dbias) via the Pallas
    backward kernel. Shapes as fused_window_attention; dbias matches the
    (H, M, N) bias table."""
    b_, m, c = q.shape
    n = k.shape[1]
    scale = (c // num_heads) ** -0.5
    masks_rows, bias_rows, _ = _head_masks_and_wb(b_, m, c, num_heads, bias)
    # smaller windows-per-program ladder than the forward: the backward
    # keeps ~4 live (H*M, N) f32 planes per window
    wb = next((cand for cand in (6, 4, 3, 2) if b_ % cand == 0), 1)
    win = lambda s: pl.BlockSpec(
        (wb,) + s, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    shared = lambda r, cc: pl.BlockSpec(
        (r, cc), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv, dbias_rows = pl.pallas_call(
        functools.partial(
            _bwd_kernel, num_heads=num_heads, scale=scale, wb=wb, m=m, exact=exact
        ),
        grid=(b_ // wb,),
        in_specs=[
            win((m, c)), win((n, c)), win((n, c)), win((m, c)),
            shared(num_heads * m, n), shared(num_heads * m, c),
        ],
        out_specs=[
            win((m, c)), win((n, c)), win((n, c)),
            shared(num_heads * m, n),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_, m, c), q.dtype),
            jax.ShapeDtypeStruct((b_, n, c), k.dtype),
            jax.ShapeDtypeStruct((b_, n, c), v.dtype),
            jax.ShapeDtypeStruct((num_heads * m, n), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_ * num_heads * (m * n * c * 5),
            bytes_accessed=b_ * (3 * m * c + 4 * n * c) * q.dtype.itemsize,
            transcendentals=b_ * num_heads * m * n,
        ),
    )(q, k, v, g, bias_rows, masks_rows)
    return dq, dk, dv, dbias_rows.reshape(num_heads, m, n).astype(bias.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "exact"))
def fused_window_attention(
    q: Array,  # (B_, M, C) post-norm, pre-projection-scale q tokens
    k: Array,  # (B_, N, C)
    v: Array,  # (B_, N, C)
    bias: Array,  # (num_heads, M, N) float32 relative position bias
    num_heads: int,
    interpret: bool = False,
    exact: bool = True,
) -> Array:
    """Softmax((q*scale) @ k^T + bias) @ v with multi-head channel split,
    fused per window. Returns (B_, M, C) in q's dtype. Differentiable: the
    backward is the Pallas attention-core backward kernel (custom_vjp,
    _attn_core_bwd_call). ``exact=False`` trades the f32 HIGHEST dots for
    single-pass MXU speed (see _dot_precision)."""
    return _window_attention_call(num_heads, interpret, exact, q, k, v, bias)


# ---------------------------------------------------------------------------
# Fully fused block: LayerNorms + projections + attention in one kernel
# ---------------------------------------------------------------------------


def _ln(x, g, b, eps=1e-5):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) ** 2, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * g + b


def _fused_block_kernel(
    x_ref,  # (D, wb, M, C) window stacks
    gq_ref, bqln_ref, gkv_ref, bkvln_ref,  # (1, C) LN affines
    wq_ref, bq_ref, wkv_ref, bkv_ref,  # projections (k|v fused: (C, 2C))
    wp_ref, bp_ref,
    bias_ref,  # (H*M, N)
    masks_ref,  # (H*M, C)
    out_ref,  # (wb, M, C)
    *maybe_acc_ref,  # optional (wb, M, C): pre-projection attention output,
    # saved as a residual by the training fwd so the backward skips one
    # forward-kernel recompute
    num_heads, scale, wb, m, q_ind, exact,
):
    acc_ref = maybe_acc_ref[0] if maybe_acc_ref else None
    d = x_ref.shape[0]
    masks_rows = masks_ref[:]
    bias_rows = bias_ref[:].astype(jnp.float32)
    in_dtype = x_ref.dtype
    c = x_ref.shape[-1]

    # LN + q/k/v projections batched over ALL wb windows (and the k|v pair
    # fused into one (C, 2C) matmul): one tall (D*wb*M, C) x (C, 2C) MXU
    # matmul replaces 3*wb skinny ones — measured 9% faster per block call
    # at the C=256 level, identical numerics. Concatenate rows instead of
    # reshaping: M is not sublane-tile aligned (Mosaic constraint).
    toks = jnp.concatenate(
        [x_ref[i, w] for i in range(d) for w in range(wb)], axis=0
    ).astype(jnp.float32)  # (D*wb*M, C)
    kvt = _ln(toks, gkv_ref[0], bkvln_ref[0])
    kv_all = (
        jax.lax.dot_general(
            kvt.astype(in_dtype), wkv_ref[:].astype(in_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact),
        )
        + bkv_ref[0]
    ).astype(in_dtype)  # (D*wb*M, 2C): k rows | v rows

    qt = jnp.concatenate([x_ref[q_ind, w] for w in range(wb)], axis=0)
    qt = _ln(qt.astype(jnp.float32), gq_ref[0], bqln_ref[0])
    q_all = (
        jax.lax.dot_general(
            qt.astype(in_dtype), wq_ref[:].astype(in_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact),
        )
        + bq_ref[0]
    ).astype(in_dtype)  # (wb*M, C)

    for w in range(wb):
        k = jnp.concatenate(
            [kv_all[(i * wb + w) * m : (i * wb + w + 1) * m, :c] for i in range(d)],
            axis=0,
        )  # (N, C)
        v = jnp.concatenate(
            [kv_all[(i * wb + w) * m : (i * wb + w + 1) * m, c:] for i in range(d)],
            axis=0,
        )
        q = q_all[w * m : (w + 1) * m]
        acc = _attn_core(q, k, v, masks_rows, bias_rows, scale, num_heads, m, exact)
        if acc_ref is not None:
            acc_ref[w] = acc.astype(acc_ref.dtype)
        out = (
            jax.lax.dot_general(
                acc.astype(in_dtype), wp_ref[:].astype(in_dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact),
            )
            + bp_ref[0]
        )
        out_ref[w] = out.astype(out_ref.dtype)


def _rowdot(a, w, b, in_dtype, exact=True):
    """dot(a.astype(in_dtype), w.astype(in_dtype)) + b with f32 accumulation
    over the LAST axis of a — the kernels' projection idiom, reference form."""
    nd = a.ndim
    y = jax.lax.dot_general(
        a.astype(in_dtype),
        w.astype(in_dtype),
        (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact),
    )
    return y + b


def _ref_window_block(x, params, num_heads, q_ind, exact=True):
    """Pure-JAX twin of fused_window_block (same math/casts, batched over
    frames and windows) — the numerical oracle for kernel/backward tests."""
    ln_q, ln_kv, w_q, w_k, w_v, w_proj, bias = params
    d, b_, m, c = x.shape
    in_dtype = x.dtype
    scale = (c // num_heads) ** -0.5
    masks_rows, bias_rows, _ = _head_masks_and_wb(b_, m, c, num_heads, bias)
    w_kv = jnp.concatenate([w_k[0], w_v[0]], axis=1)
    b_kv = jnp.concatenate([w_k[1], w_v[1]])

    kvt = _ln(x.astype(jnp.float32), ln_kv[0], ln_kv[1])
    kv_all = _rowdot(kvt, w_kv, b_kv, in_dtype, exact).astype(in_dtype)  # (D,B_,M,2C)
    qt = _ln(x[q_ind].astype(jnp.float32), ln_q[0], ln_q[1])
    q_all = _rowdot(qt, w_q[0], w_q[1], in_dtype, exact).astype(in_dtype)  # (B_,M,C)
    k = kv_all[..., :c].transpose(1, 0, 2, 3).reshape(b_, d * m, c)
    v = kv_all[..., c:].transpose(1, 0, 2, 3).reshape(b_, d * m, c)
    acc = jax.vmap(
        lambda qq, kk, vv: _attn_core(
            qq, kk, vv, masks_rows, bias_rows, scale, num_heads, m, exact
        )
    )(q_all, k, v)
    out = _rowdot(acc, w_proj[0], w_proj[1], in_dtype, exact)
    return out.astype(x.dtype)


def _window_block_pallas(
    num_heads, q_ind, interpret, exact, x, params, with_acc=False
):
    ln_q, ln_kv, w_q, w_k, w_v, w_proj, bias = params
    d, b_, m, c = x.shape
    n = d * m
    head_dim = c // num_heads
    scale = head_dim**-0.5

    masks_rows, bias_rows, wb = _head_masks_and_wb(b_, m, c, num_heads, bias)

    row = lambda a: a.reshape(1, -1)
    # fuse the k and v projections into one (C, 2C) weight so the kernel
    # computes both with a single tall matmul (identical numerics)
    w_kv = jnp.concatenate([w_k[0], w_v[0]], axis=1)
    b_kv = jnp.concatenate([w_k[1], w_v[1]])
    args = [
        x,
        row(ln_q[0]), row(ln_q[1]), row(ln_kv[0]), row(ln_kv[1]),
        w_q[0], row(w_q[1]), w_kv, row(b_kv),
        w_proj[0], row(w_proj[1]),
        bias_rows, masks_rows,
    ]
    vec = lambda cc=c: pl.BlockSpec((1, cc), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = lambda r, cc: pl.BlockSpec((r, cc), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((wb, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b_, m, c), x.dtype)
    return pl.pallas_call(
        functools.partial(
            _fused_block_kernel,
            num_heads=num_heads, scale=scale, wb=wb, m=m, q_ind=q_ind,
            exact=exact,
        ),
        grid=(b_ // wb,),
        in_specs=[
            pl.BlockSpec((d, wb, m, c), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            vec(), vec(), vec(), vec(),
            mat(c, c), vec(), mat(c, 2 * c), vec(2 * c),
            mat(c, c), vec(),
            mat(num_heads * m, n), mat(num_heads * m, c),
        ],
        # the training fwd additionally writes the pre-projection attention
        # output (acc) as a residual: one tiny (wb, M, C) extra store per
        # program saves the backward a whole forward-kernel recompute
        out_specs=[out_block, out_block] if with_acc else out_block,
        out_shape=[out_shape, out_shape] if with_acc else out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the default 16 MB scoped-vmem cap rejects the f32 flagship
            # program (multi-pass HIGHEST dots need ~17 MB of stack at
            # wb=12); physical VMEM is 128 MB — raise the cap, do not
            # shrink wb (smaller wb re-pays the bias/mask DMA per call)
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _window_block_call(num_heads, q_ind, interpret, exact, x, params):
    return _window_block_pallas(num_heads, q_ind, interpret, exact, x, params)


def _window_block_fwd(num_heads, q_ind, interpret, exact, x, params):
    out, acc = _window_block_pallas(
        num_heads, q_ind, interpret, exact, x, params, with_acc=True
    )
    return out, (x, params, acc)


def _window_block_bwd(num_heads, q_ind, interpret, exact, res, g):
    """Hybrid backward: jax.vjp of the cheap (B*M, C)-sized pre/post stages
    (LNs + projections — XLA handles these fine) around the Pallas
    attention-core backward kernel. The pre-projection attention output
    (acc, for the out-projection weight grad) was saved by the fwd kernel,
    so no forward recompute happens here. Same math and cast points as the
    twin's vjp; none of the (B_, H*M, N) tensors ever touch HBM."""
    x, params, acc = res
    ln_q, ln_kv, w_q, w_k, w_v, w_proj, bias = params
    in_dtype = x.dtype
    d, b_, m, c = x.shape

    def pre(x_, ln_q_, ln_kv_, w_q_, w_k_, w_v_):
        w_kv = jnp.concatenate([w_k_[0], w_v_[0]], axis=1)
        b_kv = jnp.concatenate([w_k_[1], w_v_[1]])
        kvt = _ln(x_.astype(jnp.float32), ln_kv_[0], ln_kv_[1])
        kv_all = _rowdot(kvt, w_kv, b_kv, in_dtype, exact).astype(in_dtype)
        qt = _ln(x_[q_ind].astype(jnp.float32), ln_q_[0], ln_q_[1])
        q_all = _rowdot(qt, w_q_[0], w_q_[1], in_dtype, exact).astype(in_dtype)
        k = kv_all[..., :c].transpose(1, 0, 2, 3).reshape(b_, d * m, c)
        v = kv_all[..., c:].transpose(1, 0, 2, 3).reshape(b_, d * m, c)
        return q_all, k, v

    (q_all, k, v), pre_vjp = jax.vjp(pre, x, ln_q, ln_kv, w_q, w_k, w_v)

    def post(acc_, w_proj_):
        return _rowdot(acc_, w_proj_[0], w_proj_[1], in_dtype, exact).astype(x.dtype)

    _, post_vjp = jax.vjp(post, acc, w_proj)
    dacc, dw_proj = post_vjp(g)
    dq_all, dk, dv, dbias = _attn_core_bwd_call(
        num_heads, interpret, exact, q_all, k, v, bias, dacc
    )
    dx, dln_q, dln_kv, dw_q, dw_k, dw_v = pre_vjp((dq_all, dk, dv))
    return dx, (dln_q, dln_kv, dw_q, dw_k, dw_v, dw_proj, dbias)


_window_block_call.defvjp(_window_block_fwd, _window_block_bwd)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "q_ind", "interpret", "exact")
)
def fused_window_block(
    x: Array,  # (D, B_, M, C) raw window token stacks
    ln_q: Tuple[Array, Array],
    ln_kv: Tuple[Array, Array],
    w_q: Tuple[Array, Array],  # (C, C), (C,)
    w_k: Tuple[Array, Array],
    w_v: Tuple[Array, Array],
    w_proj: Tuple[Array, Array],
    bias: Array,  # (H, M, N)
    num_heads: int,
    q_ind: int,
    interpret: bool = False,
    exact: bool = True,
) -> Array:
    """The whole WindowAttention3D body fused: norm_q/norm_kv -> q/k/v
    projections -> masked-stacked-head attention -> out projection. One
    HBM read of the window stack, one write of the output. Differentiable
    via custom_vjp (hybrid backward: XLA pre/post vjps around the Pallas
    attention-core backward kernel). ``exact=False`` trades the f32
    HIGHEST dots for single-pass MXU speed (see _dot_precision)."""
    params = (ln_q, ln_kv, w_q, w_k, w_v, w_proj, bias)
    return _window_block_call(num_heads, q_ind, interpret, exact, x, params)


# ---------------------------------------------------------------------------
# Whole Swin block fused: attention + residual + LN2 + MLP + residual,
# with the evolving center frame as a SEPARATE operand
# ---------------------------------------------------------------------------


def _erf_approx(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7, ~f32 level):
    Mosaic has no erf/erfc lowering, only exp."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = (
        ((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736)
        * t
        + 0.254829592
    ) * t
    return s * (1.0 - poly * jnp.exp(-a * a))


def _kernel_activation(name: str):
    """Activation usable inside a Mosaic kernel. GELU (the reference
    default) is exact-erf composed from the A&S approximation; everything
    else reuses the shared registry (relu/sigmoid/... all lower)."""
    if name in ("gelu", "default"):
        inv_sqrt2 = 0.7071067811865476
        return lambda x: 0.5 * x * (1.0 + _erf_approx(x * inv_sqrt2))
    from bde2vid_tpu.nn.layers import get_activation

    return get_activation(name)


def _fused_swin_kernel(
    x_ref,  # (D, wb, M, C) static buffer tokens — row q_ind is IGNORED
    ctr_ref,  # (wb, M, C) current center tokens (query + the q_ind kv row)
    gq_ref, bqln_ref, gkv_ref, bkvln_ref,  # (1, C) LN affines
    wq_ref, bq_ref, wkv_ref, bkv_ref,  # projections (k|v fused: (C, 2C))
    wp_ref, bp_ref,
    g2_ref, b2ln_ref,  # (1, C) LN2 affines
    w1_ref, b1_ref, w2_ref, b2m_ref,  # MLP fc1 (C, Hd), fc2 (Hd, C)
    bias_ref,  # (H*M, N)
    masks_ref,  # (H*M, C)
    *rest,  # [m1_ref (wb,1), m2_ref (wb,1) when masked] + out_ref (wb, M, C)
    # + [acc_ref (wb, M, C) when the training fwd saves the pre-projection
    # attention output as a residual, sparing the backward a forward-kernel
    # recompute]
    num_heads, scale, wb, m, q_ind, act, exact, masked=False,
):
    if masked:
        # stochastic-depth multipliers, one scalar per window (constant
        # across a sample's windows): y = ctr + m1*proj(attn),
        # out = y + m2*MLP(LN2(y)) — timm DropPath at the two residuals.
        # Full (B_, 1) arrays in SMEM, indexed by grid position.
        m1_ref, m2_ref, rest = rest[0], rest[1], rest[2:]
        w0 = pl.program_id(0) * wb
    out_ref = rest[0]
    acc_ref = rest[1] if len(rest) > 1 else None
    d = x_ref.shape[0]
    c = x_ref.shape[-1]
    in_dtype = x_ref.dtype
    masks_rows = masks_ref[:]
    bias_rows = bias_ref[:].astype(jnp.float32)

    # kv tokens: buffer frames, with the q_ind frame replaced by the LIVE
    # center operand (the reference mutates the buffer in place per block;
    # keeping the static frames in their own operand lets XLA hoist their
    # pad+partition out of the depth loop entirely)
    toks = jnp.concatenate(
        [
            (ctr_ref[w] if i == q_ind else x_ref[i, w])
            for i in range(d)
            for w in range(wb)
        ],
        axis=0,
    ).astype(jnp.float32)  # (D*wb*M, C)
    kvt = _ln(toks, gkv_ref[0], bkvln_ref[0])
    kv_all = (
        jax.lax.dot_general(
            kvt.astype(in_dtype), wkv_ref[:].astype(in_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact),
        )
        + bkv_ref[0]
    ).astype(in_dtype)  # (D*wb*M, 2C)

    ctr_all = jnp.concatenate([ctr_ref[w] for w in range(wb)], axis=0)  # (wb*M, C)
    qt = _ln(ctr_all.astype(jnp.float32), gq_ref[0], bqln_ref[0])
    q_all = (
        jax.lax.dot_general(
            qt.astype(in_dtype), wq_ref[:].astype(in_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact),
        )
        + bq_ref[0]
    ).astype(in_dtype)

    projs = []
    for w in range(wb):
        k = jnp.concatenate(
            [kv_all[(i * wb + w) * m : (i * wb + w + 1) * m, :c] for i in range(d)],
            axis=0,
        )
        v = jnp.concatenate(
            [kv_all[(i * wb + w) * m : (i * wb + w + 1) * m, c:] for i in range(d)],
            axis=0,
        )
        q = q_all[w * m : (w + 1) * m]
        acc = _attn_core(q, k, v, masks_rows, bias_rows, scale, num_heads, m, exact)
        if acc_ref is not None:
            acc_ref[w] = acc.astype(acc_ref.dtype)
        p = (
            jax.lax.dot_general(
                acc.astype(in_dtype), wp_ref[:].astype(in_dtype),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact),
            )
            + bp_ref[0]
        )
        if masked:
            p = p * m1_ref[w0 + w, 0]
        projs.append(p)

    # residual + LN2 + MLP + residual, batched over all wb windows' center
    # tokens (per-token ops — position within the window is irrelevant)
    y = ctr_all.astype(jnp.float32) + jnp.concatenate(projs, axis=0)
    z = _ln(y, g2_ref[0], b2ln_ref[0])
    h1 = (
        jax.lax.dot_general(
            z.astype(in_dtype), w1_ref[:].astype(in_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact),
        )
        + b1_ref[0]
    )
    h1 = _kernel_activation(act)(h1)
    z2 = (
        jax.lax.dot_general(
            h1.astype(in_dtype), w2_ref[:].astype(in_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_dot_precision(in_dtype, exact),
        )
        + b2m_ref[0]
    )
    if masked:
        for w in range(wb):
            sl = slice(w * m, (w + 1) * m)
            out_ref[w] = (y[sl] + z2[sl] * m2_ref[w0 + w, 0]).astype(
                out_ref.dtype
            )
    else:
        o = y + z2
        for w in range(wb):
            out_ref[w] = o[w * m : (w + 1) * m].astype(out_ref.dtype)


def _ref_swin_block(
    x, ctr, params, num_heads, q_ind, activation, exact=True, masks=None
):
    """Pure-JAX twin of fused_swin_block (same math/casts, incl. the A&S
    erf-approx GELU) — the numerical oracle for kernel/backward tests."""
    ln_q, ln_kv, w_q, w_k, w_v, w_proj, ln2, fc1, fc2, bias = params
    m1, m2 = (
        (masks[0][:, None, None], masks[1][:, None, None])
        if masks is not None
        else (1.0, 1.0)
    )
    d, b_, m, c = x.shape
    in_dtype = x.dtype
    scale = (c // num_heads) ** -0.5
    masks_rows, bias_rows, _ = _head_masks_and_wb(b_, m, c, num_heads, bias)
    w_kv = jnp.concatenate([w_k[0], w_v[0]], axis=1)
    b_kv = jnp.concatenate([w_k[1], w_v[1]])

    xs = x.at[q_ind].set(ctr)  # kv sees the LIVE center frame
    kvt = _ln(xs.astype(jnp.float32), ln_kv[0], ln_kv[1])
    kv_all = _rowdot(kvt, w_kv, b_kv, in_dtype, exact).astype(in_dtype)
    ctr_f32 = ctr.astype(jnp.float32)
    qt = _ln(ctr_f32, ln_q[0], ln_q[1])
    q_all = _rowdot(qt, w_q[0], w_q[1], in_dtype, exact).astype(in_dtype)
    k = kv_all[..., :c].transpose(1, 0, 2, 3).reshape(b_, d * m, c)
    v = kv_all[..., c:].transpose(1, 0, 2, 3).reshape(b_, d * m, c)
    acc = jax.vmap(
        lambda qq, kk, vv: _attn_core(
            qq, kk, vv, masks_rows, bias_rows, scale, num_heads, m, exact
        )
    )(q_all, k, v)
    y = ctr_f32 + m1 * _rowdot(acc, w_proj[0], w_proj[1], in_dtype, exact)
    z = _ln(y, ln2[0], ln2[1])
    h1 = _kernel_activation(activation)(_rowdot(z, fc1[0], fc1[1], in_dtype, exact))
    o = y + m2 * _rowdot(h1, fc2[0], fc2[1], in_dtype, exact)
    return o.astype(ctr.dtype)


def _swin_block_pallas(
    num_heads, q_ind, activation, interpret, exact, x, ctr, params,
    with_acc=False, masks=None,
):
    ln_q, ln_kv, w_q, w_k, w_v, w_proj, ln2, mlp_fc1, mlp_fc2, bias = params
    d, b_, m, c = x.shape
    n = d * m
    head_dim = c // num_heads
    scale = head_dim**-0.5
    hd = mlp_fc1[0].shape[1]

    masks_rows, bias_rows, wb = _head_masks_and_wb(b_, m, c, num_heads, bias)

    row = lambda a: a.reshape(1, -1)
    w_kv = jnp.concatenate([w_k[0], w_v[0]], axis=1)
    b_kv = jnp.concatenate([w_k[1], w_v[1]])
    args = [
        x, ctr,
        row(ln_q[0]), row(ln_q[1]), row(ln_kv[0]), row(ln_kv[1]),
        w_q[0], row(w_q[1]), w_kv, row(b_kv),
        w_proj[0], row(w_proj[1]),
        row(ln2[0]), row(ln2[1]),
        mlp_fc1[0], row(mlp_fc1[1]), mlp_fc2[0], row(mlp_fc2[1]),
        bias_rows, masks_rows,
    ]
    vec = lambda cc=c: pl.BlockSpec((1, cc), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = lambda r, cc: pl.BlockSpec((r, cc), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((d, wb, m, c), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((wb, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        vec(), vec(), vec(), vec(),
        mat(c, c), vec(), mat(c, 2 * c), vec(2 * c),
        mat(c, c), vec(),
        vec(), vec(),
        mat(c, hd), vec(hd), mat(hd, c), vec(),
        mat(num_heads * m, n), mat(num_heads * m, c),
    ]
    if masks is not None:
        # per-window stochastic-depth multipliers (see _fused_swin_kernel).
        # Scalars live in SMEM as the FULL (B_, 1) array — a (wb, 1) VMEM
        # block violates Mosaic's (8, 128) tile rule — and the kernel
        # indexes by program_id
        args += [masks[0].reshape(b_, 1), masks[1].reshape(b_, 1)]
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    return pl.pallas_call(
        functools.partial(
            _fused_swin_kernel,
            num_heads=num_heads, scale=scale, wb=wb, m=m, q_ind=q_ind,
            act=activation, exact=exact, masked=masks is not None,
        ),
        grid=(b_ // wb,),
        in_specs=in_specs,
        # the training fwd additionally writes the pre-projection attention
        # output (acc) as a residual — saves the backward a forward-kernel
        # recompute (see _window_block_pallas)
        out_specs=(
            [
                pl.BlockSpec((wb, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wb, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ]
            if with_acc
            else pl.BlockSpec((wb, m, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ),
        out_shape=(
            [
                jax.ShapeDtypeStruct((b_, m, c), ctr.dtype),
                jax.ShapeDtypeStruct((b_, m, c), ctr.dtype),
            ]
            if with_acc
            else jax.ShapeDtypeStruct((b_, m, c), ctr.dtype)
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the default 16 MB scoped-vmem cap rejects the f32 flagship
            # program (multi-pass HIGHEST dots need ~17 MB of stack at
            # wb=12); physical VMEM is 128 MB — raise the cap, do not
            # shrink wb (smaller wb re-pays the bias/mask DMA per call)
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _swin_block_call(
    num_heads, q_ind, activation, interpret, exact, x, ctr, params
):
    return _swin_block_pallas(
        num_heads, q_ind, activation, interpret, exact, x, ctr, params
    )


def _swin_block_fwd(num_heads, q_ind, activation, interpret, exact, x, ctr, params):
    out, acc = _swin_block_pallas(
        num_heads, q_ind, activation, interpret, exact, x, ctr, params,
        with_acc=True,
    )
    return out, (x, ctr, params, acc)


def _swin_block_bwd(num_heads, q_ind, activation, interpret, exact, res, g):
    """Hybrid backward (see _window_block_bwd): XLA vjp for the pre stage
    (live-center substitution + LNs + projections) and the post stage
    (residual + LN2 + MLP), the Pallas backward kernel for the attention
    core (acc was saved by the fwd kernel — no forward recompute). The
    q_ind row of x stays dead by contract: the at[].set vjp zeroes it and
    routes its cotangent to ctr."""
    x, ctr, params, acc = res
    ln_q, ln_kv, w_q, w_k, w_v, w_proj, ln2, fc1, fc2, bias = params
    in_dtype = x.dtype
    d, b_, m, c = x.shape

    def pre(x_, ctr_, ln_q_, ln_kv_, w_q_, w_k_, w_v_):
        w_kv = jnp.concatenate([w_k_[0], w_v_[0]], axis=1)
        b_kv = jnp.concatenate([w_k_[1], w_v_[1]])
        xs = x_.at[q_ind].set(ctr_)  # kv sees the LIVE center frame
        kvt = _ln(xs.astype(jnp.float32), ln_kv_[0], ln_kv_[1])
        kv_all = _rowdot(kvt, w_kv, b_kv, in_dtype, exact).astype(in_dtype)
        qt = _ln(ctr_.astype(jnp.float32), ln_q_[0], ln_q_[1])
        q_all = _rowdot(qt, w_q_[0], w_q_[1], in_dtype, exact).astype(in_dtype)
        k = kv_all[..., :c].transpose(1, 0, 2, 3).reshape(b_, d * m, c)
        v = kv_all[..., c:].transpose(1, 0, 2, 3).reshape(b_, d * m, c)
        return q_all, k, v

    (q_all, k, v), pre_vjp = jax.vjp(pre, x, ctr, ln_q, ln_kv, w_q, w_k, w_v)

    def post(acc_, ctr_, w_proj_, ln2_, fc1_, fc2_):
        y = ctr_.astype(jnp.float32) + _rowdot(
            acc_, w_proj_[0], w_proj_[1], in_dtype, exact
        )
        z = _ln(y, ln2_[0], ln2_[1])
        h1 = _kernel_activation(activation)(
            _rowdot(z, fc1_[0], fc1_[1], in_dtype, exact)
        )
        o = y + _rowdot(h1, fc2_[0], fc2_[1], in_dtype, exact)
        return o.astype(ctr.dtype)

    _, post_vjp = jax.vjp(post, acc, ctr, w_proj, ln2, fc1, fc2)
    dacc, dctr_post, dw_proj, dln2, dfc1, dfc2 = post_vjp(g)
    dq_all, dk, dv, dbias = _attn_core_bwd_call(
        num_heads, interpret, exact, q_all, k, v, bias, dacc
    )
    dx, dctr_pre, dln_q, dln_kv, dw_q, dw_k, dw_v = pre_vjp((dq_all, dk, dv))
    dctr = jax.tree_util.tree_map(jnp.add, dctr_pre, dctr_post)
    return dx, dctr, (
        dln_q, dln_kv, dw_q, dw_k, dw_v, dw_proj, dln2, dfc1, dfc2, dbias
    )


_swin_block_call.defvjp(_swin_block_fwd, _swin_block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _swin_block_call_masked(
    num_heads, q_ind, activation, interpret, exact, x, ctr, masks, params
):
    """fused swin block with stochastic-depth multipliers ``masks =
    (m1, m2)``, each (B_,) f32 (one scalar per window): the kernel computes
    ``y = ctr + m1*proj(attn)`` and ``out = y + m2*MLP(LN2(y))`` — the timm
    DropPath points of the unfused block (SwinTransformerBlock3D). Keeping
    a separate call (instead of always-on unit masks) leaves the inference
    program byte-identical to the unmasked path."""
    return _swin_block_pallas(
        num_heads, q_ind, activation, interpret, exact, x, ctr, params,
        masks=masks,
    )


def _swin_block_fwd_masked(
    num_heads, q_ind, activation, interpret, exact, x, ctr, masks, params
):
    out, acc = _swin_block_pallas(
        num_heads, q_ind, activation, interpret, exact, x, ctr, params,
        with_acc=True, masks=masks,
    )
    return out, (x, ctr, masks, params, acc)


def _swin_block_bwd_masked(
    num_heads, q_ind, activation, interpret, exact, res, g
):
    """Same hybrid backward as _swin_block_bwd; the masks only scale the
    two residual branches, which live in the XLA ``post`` stage — the
    Pallas attention-core backward kernel is untouched (acc is saved
    PRE-projection, before m1 applies)."""
    x, ctr, masks, params, acc = res
    m1, m2 = masks
    ln_q, ln_kv, w_q, w_k, w_v, w_proj, ln2, fc1, fc2, bias = params
    in_dtype = x.dtype
    d, b_, m, c = x.shape

    def pre(x_, ctr_, ln_q_, ln_kv_, w_q_, w_k_, w_v_):
        w_kv = jnp.concatenate([w_k_[0], w_v_[0]], axis=1)
        b_kv = jnp.concatenate([w_k_[1], w_v_[1]])
        xs = x_.at[q_ind].set(ctr_)
        kvt = _ln(xs.astype(jnp.float32), ln_kv_[0], ln_kv_[1])
        kv_all = _rowdot(kvt, w_kv, b_kv, in_dtype, exact).astype(in_dtype)
        qt = _ln(ctr_.astype(jnp.float32), ln_q_[0], ln_q_[1])
        q_all = _rowdot(qt, w_q_[0], w_q_[1], in_dtype, exact).astype(in_dtype)
        k = kv_all[..., :c].transpose(1, 0, 2, 3).reshape(b_, d * m, c)
        v = kv_all[..., c:].transpose(1, 0, 2, 3).reshape(b_, d * m, c)
        return q_all, k, v

    (q_all, k, v), pre_vjp = jax.vjp(pre, x, ctr, ln_q, ln_kv, w_q, w_k, w_v)

    def post(acc_, ctr_, m1_, m2_, w_proj_, ln2_, fc1_, fc2_):
        y = ctr_.astype(jnp.float32) + m1_[:, None, None] * _rowdot(
            acc_, w_proj_[0], w_proj_[1], in_dtype, exact
        )
        z = _ln(y, ln2_[0], ln2_[1])
        h1 = _kernel_activation(activation)(
            _rowdot(z, fc1_[0], fc1_[1], in_dtype, exact)
        )
        o = y + m2_[:, None, None] * _rowdot(h1, fc2_[0], fc2_[1], in_dtype, exact)
        return o.astype(ctr.dtype)

    _, post_vjp = jax.vjp(post, acc, ctr, m1, m2, w_proj, ln2, fc1, fc2)
    dacc, dctr_post, dm1, dm2, dw_proj, dln2, dfc1, dfc2 = post_vjp(g)
    dq_all, dk, dv, dbias = _attn_core_bwd_call(
        num_heads, interpret, exact, q_all, k, v, bias, dacc
    )
    dx, dctr_pre, dln_q, dln_kv, dw_q, dw_k, dw_v = pre_vjp((dq_all, dk, dv))
    dctr = jax.tree_util.tree_map(jnp.add, dctr_pre, dctr_post)
    return dx, dctr, (dm1, dm2), (
        dln_q, dln_kv, dw_q, dw_k, dw_v, dw_proj, dln2, dfc1, dfc2, dbias
    )


_swin_block_call_masked.defvjp(_swin_block_fwd_masked, _swin_block_bwd_masked)


def fused_swin_block(*args, **kwargs):
    """Unjitted dispatch shim for :func:`_fused_swin_block`.

    The BDE2VID_ATTN_IDENTITY check must live OUTSIDE the jitted body:
    the inner jit's trace cache is keyed on (shapes, statics) only, so a
    check inside the body would be frozen by whichever variant traced
    first in the process (tools/profile_flagship.py measures ``full``
    before ``glue_only`` and read kernel cost ~0 before this was
    understood). Out here the env var is consulted on EVERY call — i.e.
    at every outer model trace — and the ablation's passthrough keeps the
    surrounding XLA ops live (the 0*sum(x) term defeats DCE of the buffer
    gather + static pad/partition) so the variant measures the glue, not
    an empty graph."""
    if os.environ.get("BDE2VID_ATTN_IDENTITY"):
        x = args[0] if args else kwargs["x"]
        ctr = args[1] if len(args) > 1 else kwargs["ctr"]
        return ctr + (0.0 * jnp.sum(x, axis=0)).astype(ctr.dtype)
    return _fused_swin_block(*args, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "q_ind", "activation", "interpret", "exact"),
)
def _fused_swin_block(
    x: Array,  # (D, B_, M, C) static buffer tokens (row q_ind ignored)
    ctr: Array,  # (B_, M, C) current center tokens
    ln_q: Tuple[Array, Array],
    ln_kv: Tuple[Array, Array],
    w_q: Tuple[Array, Array],
    w_k: Tuple[Array, Array],
    w_v: Tuple[Array, Array],
    w_proj: Tuple[Array, Array],
    ln2: Tuple[Array, Array],
    mlp_fc1: Tuple[Array, Array],  # (C, Hd), (Hd,)
    mlp_fc2: Tuple[Array, Array],  # (Hd, C), (C,)
    bias: Array,  # (H, M, N)
    num_heads: int,
    q_ind: int,
    activation: str = "gelu",
    interpret: bool = False,
    exact: bool = True,
    masks: Optional[Tuple[Array, Array]] = None,  # stochastic-depth (B_,) x2
) -> Array:
    """The ENTIRE SwinTransformerBlock3D fused: window attention (LNs +
    projections + masked stacked-head attention + out-projection) plus the
    center-frame residual, LN2, MLP and the second residual — one HBM read
    of the window stacks, one write of the final (B_, M, C) block tokens.

    The evolving center frame is a separate operand so the static buffer
    frames' pad + window partition are loop-invariant across a
    DFrameAttention depth stack (XLA CSE hoists them), replacing the
    per-block ``x.at[q_ind].set(center)`` full-buffer copy. Differentiable
    via custom_vjp (hybrid backward: XLA pre/post vjps around the Pallas
    attention-core backward kernel). ``exact=False`` trades the f32
    HIGHEST dots for single-pass MXU speed (see _dot_precision).
    ``masks`` enables in-kernel stochastic depth (see
    _swin_block_call_masked), letting TRAINING blocks with drop_path > 0
    fuse instead of falling back to the per-block buffer-copy body."""
    params = (ln_q, ln_kv, w_q, w_k, w_v, w_proj, ln2, mlp_fc1, mlp_fc2, bias)
    if masks is not None:
        return _swin_block_call_masked(
            num_heads, q_ind, activation, interpret, exact, x, ctr, masks,
            params,
        )
    return _swin_block_call(
        num_heads, q_ind, activation, interpret, exact, x, ctr, params
    )
