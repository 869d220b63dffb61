"""Temporal-window cross-frame attention (BDE2VID's DFrameAttention).

Reference: model/BDE2VID/DTransformer.py — window_partition/reverse :40-86
(regular reshape windows and dilation-2 unfold windows on alternating
blocks), WindowAttention3D :95-207 (query = the center frame's window
tokens, keys/values = all D frames' tokens, 3D relative position bias table
sliced to the query-frame rows, optional grouped-conv KV token reduction),
SwinTransformerBlock3D :210-306, DFrameAttention :309-389 (stack of blocks,
each feeding its output back as the center frame).

Layout here is NDHWC stacks: ``x: (D, B, H, W, C)``; window partition
produces ``(D, B*nW, Wh, Ww, C)`` token grids. All index maps for the
dilated windows are precomputed static numpy arrays (shapes are static under
jit), so partition/reverse are pure gathers/scatters — no unfold/fold kernel
needed on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bde2vid_tpu.nn.layers import get_activation

Array = jax.Array


# ---------------------------------------------------------------------------
# window partition / reverse
# ---------------------------------------------------------------------------


def _inverse_injective(idx: np.ndarray, n_src: int) -> np.ndarray:
    """Inverse of an injective index map. ``idx[p] = s`` reads source row s
    (or the fill sentinel ``n_src``); returns ``inv`` of shape (n_src,) with
    ``inv[s] = p`` (or the sentinel ``idx.size`` where no p reads s)."""
    inv = np.full(n_src, idx.size, np.int32)
    valid = idx < n_src
    inv[idx[valid]] = np.flatnonzero(valid).astype(np.int32)
    return inv


@functools.lru_cache(maxsize=128)
def _inj_take_cached(idx_bytes: bytes, n_src: int, axis: int):
    """A static gather whose VJP is ALSO a gather.

    XLA transposes gather into scatter-add, and scatters serialize on TPU:
    when the r5 glue rewrite turned the window shuffles into forward
    gathers, their backward turned into scatters and the flagship train
    step regressed 153.9 -> 158.8 ms. For an INJECTIVE index map (each
    source row read at most once; values == ``n_src`` mean "fill 0") the
    adjoint of ``take`` is exactly ``take`` with the precomputed inverse
    map, so both directions stay row-gathers.
    """
    idx = np.frombuffer(idx_bytes, np.int32)
    inv = _inverse_injective(idx, n_src)
    idx_j = jnp.asarray(idx)
    inv_j = jnp.asarray(inv)

    @jax.custom_vjp
    def take(x):
        return jnp.take(x, idx_j, axis=axis, mode="fill", fill_value=0)

    def fwd(x):
        return take(x), None

    def bwd(_, g):
        return (jnp.take(g, inv_j, axis=axis, mode="fill", fill_value=0),)

    take.defvjp(fwd, bwd)
    return take


def _inj_take(x: Array, idx: np.ndarray, axis: int) -> Array:
    """``jnp.take(x, idx, axis, mode="fill", fill_value=0)`` for a STATIC
    injective ``idx`` (numpy), with a gather — not scatter — backward."""
    fn = _inj_take_cached(
        np.ascontiguousarray(idx, np.int32).tobytes(), x.shape[axis], axis
    )
    return fn(x)


def window_partition(x: Array, window: Tuple[int, int]) -> Array:
    """(D, B, H, W, C) -> (D, B*nW, Wh, Ww, C), row-major window order."""
    d, b, h, w, c = x.shape
    wh, ww = window
    x = x.reshape(d, b, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(d, -1, wh, ww, c)


def window_reverse(windows: Array, b: int, h: int, w: int) -> Array:
    """(B*nW, Wh, Ww, C) -> (B, H, W, C)."""
    _, wh, ww, c = windows.shape
    x = windows.reshape(b, h // wh, w // ww, wh, ww, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=64)
def _dilated_indices(h: int, w: int, wh: int, ww: int):
    """Static index maps replicating F.unfold(kernel=win, dilation=2,
    stride=win) on an input padded by (+ww right, +wh bottom)
    (DTransformer.py:55-60). Returns (row_idx, col_idx) of shape
    (nWh, Wh) / (nWw, Ww) into the padded grid, plus padded dims."""
    hp, wp = h + wh, w + ww
    n_wh = (hp - 2 * (wh - 1) - 1) // wh + 1
    n_ww = (wp - 2 * (ww - 1) - 1) // ww + 1
    rows = np.arange(n_wh)[:, None] * wh + 2 * np.arange(wh)[None, :]
    cols = np.arange(n_ww)[:, None] * ww + 2 * np.arange(ww)[None, :]
    return rows, cols, hp, wp, n_wh, n_ww


@functools.lru_cache(maxsize=64)
def _dilated_flat_index(h: int, w: int, wh: int, ww: int):
    """Flat gather map (nWh, nWw, Wh, Ww) -> padded position row*wp+col.
    Flattened, it enumerates window tokens in the partition's output order
    (windows row-major, tokens row-major within a window)."""
    rows, cols, hp, wp, n_wh, n_ww = _dilated_indices(h, w, wh, ww)
    flat = rows[:, None, :, None] * wp + cols[None, :, None, :]
    return flat.reshape(-1), hp, wp, n_wh, n_ww


@functools.lru_cache(maxsize=64)
def _dilated_reverse_map(h: int, w: int, wh: int, ww: int):
    """Static INVERSE-permutation map for the dilation-2 window reverse.

    Returns (inv, n_el, has_collisions): ``inv`` has shape (h, w);
    ``inv[p] = flat window-token index`` writing position p, or ``n_el``
    (one-past-the-end sentinel) where no dilated window samples p (torch
    F.fold leaves zeros there, DTransformer.py:80-85). Odd windows (the
    7x7 flagship) have collision-free taps, so the fold is a pure
    permutation and the reverse can be a GATHER (``jnp.take`` with fill)
    instead of a scatter-add — scatters serialize on TPU, row-gathers
    vectorize. Even windows collide (fold SUMS taps); callers must keep
    the scatter-add path there."""
    flat, hp, wp, n_wh, n_ww = _dilated_flat_index(h, w, wh, ww)
    n_el = flat.size
    if np.unique(flat).size != n_el:
        return None, n_el, True
    inv = np.full(hp * wp, n_el, np.int32)
    inv[flat] = np.arange(n_el, dtype=np.int32)
    return inv.reshape(hp, wp)[:h, :w], n_el, False


def window_partition_dilated(x: Array, window: Tuple[int, int]) -> Array:
    """(D, B, H, W, C) -> (D, B*nW, Wh, Ww, C) with dilation-2 sampling.

    One flat row-gather straight into window-token order (the index map
    bakes in the two strided gathers AND the (nWh, Wh, nWw, Ww) ->
    (nWh, nWw, Wh, Ww) transpose the torch unfold implies) — one HBM
    round trip instead of three."""
    d, b, h, w, c = x.shape
    wh, ww = window
    flat, hp, wp, n_wh, n_ww = _dilated_flat_index(h, w, wh, ww)
    _, _, collisions = _dilated_reverse_map(h, w, wh, ww)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, wh), (0, ww), (0, 0)))
    xf = x.reshape(d, b, hp * wp, c)
    if collisions:
        # even windows: two tokens can read the same padded position, so
        # the gather is not injective — keep XLA's scatter-add adjoint
        x = jnp.take(xf, jnp.asarray(flat), axis=2)
    else:
        x = _inj_take(xf, flat, axis=2)
    return x.reshape(d, -1, wh, ww, c)


def window_reverse_dilated(windows: Array, b: int, h: int, w: int) -> Array:
    """Inverse of window_partition_dilated (torch F.fold then crop :80-85).

    Odd windows: collision-free fold == inverse permutation -> one gather
    (``take`` with fill 0 for unsampled pixels). Even windows: adjacent
    dilated windows collide (i*wh+2j == (i+1)*wh+2j' when wh = 2(j-j'))
    and F.fold SUMS the taps, so the scatter-add stays (duplicate-index
    .set would be last-writer-wins, nondeterministic)."""
    _, wh, ww, c = windows.shape
    inv, n_el, collisions = _dilated_reverse_map(h, w, wh, ww)
    x = windows.reshape(b, n_el, c)
    if not collisions:
        out = _inj_take(x, inv.reshape(-1), axis=1)
        return out.reshape(b, h, w, c)
    flat, hp, wp, n_wh, n_ww = _dilated_flat_index(h, w, wh, ww)
    out = jnp.zeros((b, hp * wp, c), windows.dtype)
    out = out.at[:, jnp.asarray(flat)].add(x)
    return out.reshape(b, hp, wp, c)[:, :h, :w]


def get_window_size(x_size, window_size):
    """Shrink the window to the feature size where needed (reference :89-95)."""
    return tuple(min(a, b) for a, b in zip(x_size, window_size))


@functools.lru_cache(maxsize=64)
def _dilated_covered_mask(h: int, w: int, wh: int, ww: int) -> tuple:
    """(h, w) bool mask of positions sampled by ANY dilation-2 window.
    Dilated windows do NOT tile the grid (e.g. 7x7 windows on 7-strided
    starts with stride-2 taps miss ~38% of rows); the reference's fold
    writes zeros there, so those pixels pass a block as
    ``center + MLP(LN2(center))``. Returns (mask, fully_covered)."""
    rows, cols, hp, wp, n_wh, n_ww = _dilated_indices(h, w, wh, ww)
    rr = np.unique(rows.reshape(-1))
    cc = np.unique(cols.reshape(-1))
    mask = np.zeros((h, w), bool)
    mask[np.ix_(rr[rr < h], cc[cc < w])] = True
    return mask, bool(mask.all())


# ---------------------------------------------------------------------------
# relative position bias
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def relative_position_index(
    wd: int, wh: int, ww: int, h: Optional[int] = None, w: Optional[int] = None
) -> np.ndarray:
    """(Wd*h*w, Wd*h*w) index into the (2Wd-1)(2Wh-1)(2Ww-1) bias table
    (reference :137-155). ``(h, w)`` is the ACTUAL window when
    get_window_size shrank it below the configured ``(wh, ww)`` the table
    was sized for: relative offsets come from the actual token grid, table
    strides from the configured dims. (The reference has no valid behavior
    here — its fixed-size index slice reshapes into garbage for shrunk
    windows, DTransformer.py:195-199 — so the correct-by-construction
    indexing is used instead.) Defaults reduce to the configured window."""
    h = wh if h is None else h
    w = ww if w is None else w
    coords = np.stack(
        np.meshgrid(np.arange(wd), np.arange(h), np.arange(w), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


class _ParamHolder(nn.Module):
    """Creates named params matching a flax child module's tree without
    applying it — lets the fused Pallas path own the exact checkpoint
    layout (norm_q/scale, q/kernel, ...)."""

    specs: Tuple[Tuple[str, Tuple[int, ...], str], ...]  # (name, shape, init)

    @nn.compact
    def __call__(self):
        inits = {
            "ones": nn.initializers.ones,
            "zeros": nn.initializers.zeros,
            "lecun": nn.initializers.lecun_normal(),
        }
        return tuple(
            self.param(n, inits[i], shape, jnp.float32) for n, shape, i in self.specs
        )


class WindowAttention3D(nn.Module):
    """Cross-frame window attention: q from the center frame, kv from all D.

    Input: (D, B_, Wh, Ww, C) window stacks; output (B_, Wh, Ww, C).
    """

    dim: int
    window_size: Tuple[int, int, int]  # (Wd, Wh, Ww)
    num_heads: int
    q_ind: Optional[int] = None
    nwin_size: Optional[Tuple[int, int]] = None
    qkv_bias: bool = True
    use_pallas: bool = False  # fused VMEM attention kernel (TPU)
    # f32 kernel dots run precision=HIGHEST (the exact side of the
    # fused-vs-XLA parity comparison — docs/DESIGN.md). False = the f32
    # FAST training mode: single-pass MXU dots, XLA-default-grade numerics.
    # bf16 is unaffected either way.
    f32_exact: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        center: Optional[Array] = None,
        block_extras=None,
        masks: Optional[Tuple[Array, Array]] = None,
    ) -> Array:
        wd, wh0, ww0 = self.window_size
        d, b_, h, w, c = x.shape
        q_ind = wd // 2 if self.q_ind is None else self.q_ind
        head_dim = c // self.num_heads
        scale = head_dim**-0.5

        if center is not None:
            # whole-block fused mode (see SwinTransformerBlock3D): center
            # tokens are a separate operand, and block_extras carries the
            # block's norm2/mlp params so the kernel computes the FULL
            # block output
            return self._fused_block(x, center, block_extras, q_ind, masks)

        if self.use_pallas and self.nwin_size is None:
            return self._fused_pallas(x, q_ind)

        if self.nwin_size is not None:
            # grouped-conv KV token reduction (reference :129,172-176). NOTE:
            # the reference reshapes group-major conv output as (tokens, C),
            # mixing channel/token axes; replicated verbatim for parity.
            nt = self.nwin_size[0] * self.nwin_size[1]
            red = nn.Conv(
                nt * c,
                (h, w),
                padding="VALID",
                feature_group_count=c,
                dtype=self.dtype,
                name="reduction_conv",
            )(x.reshape(-1, h, w, c))
            kv_tok = red.reshape(d, b_, nt, c)
        else:
            kv_tok = x.reshape(d, b_, h * w, c)

        q_tok = x[q_ind].reshape(b_, h * w, c)
        kv_tok = kv_tok.transpose(1, 0, 2, 3).reshape(b_, -1, c)

        q_tok = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_q")(q_tok)
        kv_tok = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_kv")(kv_tok)

        m = q_tok.shape[1]
        n = kv_tok.shape[1]
        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(q_tok)
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")(kv_tok)
        k, v = jnp.split(kv, 2, axis=-1)

        # bias table uses the CONFIGURED window size; indices are built for
        # the ACTUAL (possibly shrunk) window grid, sliced to the q-frame
        # rows and the first N columns (reference :195-199)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wd - 1) * (2 * wh0 - 1) * (2 * ww0 - 1), self.num_heads),
            jnp.float32,
        )
        idx = relative_position_index(wd, wh0, ww0, h, w)
        qs = q_ind * h * w
        rows = idx[qs : qs + h * w, :n].reshape(-1)
        bias = table[jnp.asarray(rows)].reshape(m, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # (H, M, N) f32

        def heads(t):
            return t.reshape(b_, -1, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q) * scale, heads(k), heads(v)
        attn = jnp.einsum("bhmd,bhnd->bhmn", qh, kh)
        attn = attn + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhmn,bhnd->bhmd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b_, m, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return out.reshape(b_, h, w, c)

    def _fused_params(self, c: int, h: int, w: int, d: int, q_ind: int):
        """Declare the attention params (exact tree layout of the flax
        modules in __call__, so checkpoints load identically on both paths)
        and build the sliced relative-position bias. Shared by the two
        fused-kernel paths."""
        wd, wh0, ww0 = self.window_size
        m = h * w
        n = d * m
        ln_q = _ParamHolder(
            (("scale", (c,), "ones"), ("bias", (c,), "zeros")), name="norm_q"
        )()
        ln_kv = _ParamHolder(
            (("scale", (c,), "ones"), ("bias", (c,), "zeros")), name="norm_kv"
        )()
        if self.qkv_bias:
            wq, bq = _ParamHolder(
                (("kernel", (c, c), "lecun"), ("bias", (c,), "zeros")), name="q"
            )()
            wkv, bkv = _ParamHolder(
                (("kernel", (c, 2 * c), "lecun"), ("bias", (2 * c,), "zeros")),
                name="kv",
            )()
        else:
            # param tree must match the XLA path's Dense(use_bias=False):
            # kernel only; a zero bias is numerically bias-free in the kernel
            (wq,) = _ParamHolder((("kernel", (c, c), "lecun"),), name="q")()
            (wkv,) = _ParamHolder((("kernel", (c, 2 * c), "lecun"),), name="kv")()
            bq = jnp.zeros((c,), jnp.float32)
            bkv = jnp.zeros((2 * c,), jnp.float32)
        wp, bp = _ParamHolder(
            (("kernel", (c, c), "lecun"), ("bias", (c,), "zeros")), name="proj"
        )()
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * wd - 1) * (2 * wh0 - 1) * (2 * ww0 - 1), self.num_heads),
            jnp.float32,
        )
        idx = relative_position_index(wd, wh0, ww0, h, w)
        qs = q_ind * h * w
        rows = idx[qs : qs + h * w, :n].reshape(-1)
        bias = table[jnp.asarray(rows)].reshape(m, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # (H, M, N) f32
        return (
            ln_q,
            ln_kv,
            (wq, bq),
            (wkv[:, :c], bkv[:c]),
            (wkv[:, c:], bkv[c:]),
            (wp, bp),
            bias,
        )

    def _fused_pallas(self, x: Array, q_ind: int) -> Array:
        """Fully fused attention path: LN + projections + attention +
        out-proj in ONE Pallas kernel (ops.fused_window_block)."""
        from bde2vid_tpu.ops.window_attn_pallas import fused_window_block

        d, b_, h, w, c = x.shape
        m = h * w
        ln_q, ln_kv, q_p, k_p, v_p, p_p, bias = self._fused_params(
            c, h, w, d, q_ind
        )
        x_tok = x.reshape(d, b_, m, c).astype(self.dtype)
        interpret = jax.devices()[0].platform != "tpu"
        out = fused_window_block(
            x_tok, ln_q, ln_kv, q_p, k_p, v_p, p_p, bias,
            self.num_heads, q_ind, interpret=interpret, exact=self.f32_exact,
        )
        return out.reshape(b_, h, w, c)

    def _fused_block(
        self, x: Array, center: Array, block_extras, q_ind: int, masks=None
    ) -> Array:
        """Whole-block fused mode (ops.fused_swin_block): x is the STATIC
        buffer windows (D, B_, Wh, Ww, C) whose q_ind frame is ignored,
        ``center`` the live center tokens (B_, M, C); returns the FULL
        block output tokens (B_, M, C) — attention, residual, LN2, MLP.
        ``masks``: optional per-window stochastic-depth multipliers."""
        from bde2vid_tpu.ops.window_attn_pallas import fused_swin_block

        d, b_, h, w, c = x.shape
        m = h * w
        ln2, fc1, fc2, activation = block_extras
        ln_q, ln_kv, q_p, k_p, v_p, p_p, bias = self._fused_params(
            c, h, w, d, q_ind
        )
        x_tok = x.reshape(d, b_, m, c).astype(self.dtype)
        interpret = jax.devices()[0].platform != "tpu"
        return fused_swin_block(
            x_tok, center.astype(self.dtype),
            ln_q, ln_kv, q_p, k_p, v_p, p_p,
            ln2, fc1, fc2, bias,
            self.num_heads, q_ind,
            activation=activation, interpret=interpret,
            exact=self.f32_exact, masks=masks,
        )


class _MlpParams(nn.Module):
    """Param-only twin of Mlp (same tree: fc1/kernel, fc1/bias, fc2/...)
    for the whole-block fused kernel."""

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        fc1 = _ParamHolder(
            (("kernel", (self.in_dim, self.hidden), "lecun"),
             ("bias", (self.hidden,), "zeros")),
            name="fc1",
        )()
        fc2 = _ParamHolder(
            (("kernel", (self.hidden, self.in_dim), "lecun"),
             ("bias", (self.in_dim,), "zeros")),
            name="fc2",
        )()
        return fc1, fc2


class Mlp(nn.Module):
    """fc1 -> act -> fc2 (reference Mlp, DTransformer.py:19-37)."""

    hidden: int
    out: int
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = get_activation(self.activation)(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class SwinTransformerBlock3D(nn.Module):
    """attn(windowed) with center-frame residual, then MLP residual
    (reference :210-306; norm1 is commented out in the reference too)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (3, 8, 8)
    nwindow_size: Optional[Tuple[int, int]] = None
    dilate_win: bool = False
    mlp_ratio: float = 4.0
    q_ind: Optional[int] = None
    qkv_bias: bool = True  # reference block/stage default (:229, :335)
    activation: str = "gelu"
    drop_path: float = 0.0
    use_pallas: bool = False
    f32_exact: bool = True  # see WindowAttention3D.f32_exact
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: Array, center: Optional[Array] = None) -> Array:
        d, b, h, w, c = x.shape
        q_ind = self.window_size[0] // 2 if self.q_ind is None else self.q_ind
        win = get_window_size((h, w), self.window_size[-2:])

        if center is not None:
            # whole-block fused mode: the caller passes the evolving center
            # frame separately so the STATIC buffer frames' pad + partition
            # hoist out of the depth loop (XLA CSE) and the Pallas kernel
            # computes attention + residual + LN2 + MLP in one pass.
            # drop_path no longer blocks fusion: the kernel takes the two
            # stochastic-depth multipliers as operands (r5), so TRAINING
            # blocks fuse too instead of paying the per-block buffer-copy
            # legacy body
            can_fuse = self.use_pallas and self.nwindow_size is None
            if can_fuse and self.dilate_win and (
                win[0] % 2 == 0 or win[1] % 2 == 0
            ):
                # even dilated windows collide in window_reverse_dilated
                # (fold SUMS taps); summing full block outputs would
                # double-count the residual — use the legacy path
                can_fuse = False
            if can_fuse:
                return self._fused_full(x, center, q_ind, win)
            x = x.at[q_ind].set(center)  # legacy body needs the live buffer

        shortcut = x[q_ind]

        # pad H, W to window multiples (reference pads centered, :260-265)
        pad_h = (win[0] - h % win[0]) % win[0]
        pad_w = (win[1] - w % win[1]) % win[1]
        pt, pb = pad_h // 2, pad_h - pad_h // 2
        pl, pr = pad_w // 2, pad_w - pad_w // 2
        xp = jnp.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        if self.dilate_win:
            windows = window_partition_dilated(xp, win)
        else:
            windows = window_partition(xp, win)
        # attn is constructed with the CONFIGURED window size (the bias
        # table's shape depends on it, reference :137-141); the actual
        # (possibly shrunken) window only affects the token count.
        attn = WindowAttention3D(
            self.dim,
            self.window_size,
            self.num_heads,
            q_ind=q_ind,
            nwin_size=self.nwindow_size,
            qkv_bias=self.qkv_bias,
            use_pallas=self.use_pallas and self.nwindow_size is None,
            f32_exact=self.f32_exact,
            dtype=self.dtype,
            name="attn",
        )(windows)
        if self.dilate_win:
            y = window_reverse_dilated(attn, b, hp, wp)
        else:
            y = window_reverse(attn, b, hp, wp)
        if pad_h or pad_w:
            y = y[:, pt : hp - pb, pl : wp - pr]

        y = shortcut + self._drop_path(y)

        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(y)
        z = Mlp(
            int(c * self.mlp_ratio),
            c,
            activation=self.activation,
            dtype=self.dtype,
            name="mlp",
        )(z)
        return y + self._drop_path(z)

    def _drop_path(self, y: Array) -> Array:
        """Stochastic depth (timm DropPath); identity at inference."""
        if self.deterministic or self.drop_path == 0.0:
            return y
        keep = 1.0 - self.drop_path
        rng = self.make_rng("droppath")
        mask = jax.random.bernoulli(rng, keep, (y.shape[0],) + (1,) * (y.ndim - 1))
        return y * mask.astype(y.dtype) / keep

    def _fused_full(
        self, x: Array, center: Array, q_ind: int, win: Tuple[int, int]
    ) -> Array:
        """Whole block in one Pallas kernel. x: the buffer with a STALE
        q_ind row (never read); center: (B, H, W, C). Per-token ops
        (residual, LN2, MLP) commute with the window permutation, so the
        kernel's final tokens window-reverse directly to the new center."""
        d, b, h, w, c = x.shape
        pad_h = (win[0] - h % win[0]) % win[0]
        pad_w = (win[1] - w % win[1]) % win[1]
        pt, pb = pad_h // 2, pad_h - pad_h // 2
        pl, pr = pad_w // 2, pad_w - pad_w // 2
        pads = ((0, 0), (0, 0), (pt, pb), (pl, pr), (0, 0))
        xp = jnp.pad(x, pads)  # loop-invariant across blocks -> CSE-hoisted
        cp = jnp.pad(center[None], pads)
        hp, wp = h + pad_h, w + pad_w
        part = window_partition_dilated if self.dilate_win else window_partition
        xwin = part(xp, win)  # (D, B*nW, Wh, Ww, C)
        cwin = part(cp, win)[0]  # (B*nW, Wh, Ww, C)
        ctr_tok = cwin.reshape(-1, win[0] * win[1], c)

        masks = None
        m2v = None
        if not self.deterministic and self.drop_path > 0.0:
            # stochastic depth INSIDE the fused kernel: draw the two
            # per-sample masks exactly as _drop_path would (same rng
            # stream, same order: attention residual first, MLP second),
            # repeat per window (windows are B-outer in partition order)
            keep = 1.0 - self.drop_path
            n_w = xwin.shape[1] // b

            def draw():
                rng = self.make_rng("droppath")
                mk = jax.random.bernoulli(rng, keep, (b, 1, 1, 1))
                return mk.reshape(b).astype(jnp.float32) / keep

            m1v, m2v = draw(), draw()
            masks = (jnp.repeat(m1v, n_w), jnp.repeat(m2v, n_w))

        norm2 = _ParamHolder(
            (("scale", (c,), "ones"), ("bias", (c,), "zeros")), name="norm2"
        )()
        fc1, fc2 = _MlpParams(c, int(c * self.mlp_ratio), name="mlp")()

        out = WindowAttention3D(
            self.dim,
            self.window_size,
            self.num_heads,
            q_ind=q_ind,
            nwin_size=None,
            qkv_bias=self.qkv_bias,
            use_pallas=True,
            f32_exact=self.f32_exact,
            dtype=self.dtype,
            name="attn",
        )(
            xwin,
            center=ctr_tok,
            block_extras=(norm2, fc1, fc2, self.activation),
            masks=masks,
        )

        if self.dilate_win:
            # fold + uncovered-pixel MLP blend + pad-crop as ONE static
            # row-gather (scatters serialize on TPU; the three-op chain
            # scatter-add fold -> scatter-set blend -> slice was glue):
            # covered pixels index their window token, uncovered pixels
            # (~38% at the flagship shape — the reference's fold writes
            # zeros there so the block reduces to center + MLP(LN2(center)),
            # DTransformer.py:80-85) index into an appended identity-MLP
            # row block computed only on those pixels.
            inv, n_el, collisions = _dilated_reverse_map(
                hp, wp, win[0], win[1]
            )
            assert not collisions  # even dilated windows never fuse
            mask, full = _dilated_covered_mask(hp, wp, win[0], win[1])
            src = out.reshape(b, n_el, c)
            idx = inv.reshape(-1)
            if not full:
                flat_unc = np.flatnonzero(~mask.reshape(-1))
                (w1, b1), (w2, b2m) = fc1, fc2
                cf = _inj_take(
                    cp[0].reshape(b, hp * wp, c), flat_unc, axis=1
                ).astype(jnp.float32)  # (B, P, C)
                mu = jnp.mean(cf, axis=-1, keepdims=True)
                var = jnp.mean((cf - mu) ** 2, axis=-1, keepdims=True)
                z = (cf - mu) * jax.lax.rsqrt(var + 1e-5) * norm2[0] + norm2[1]
                hid = get_activation(self.activation)(
                    z.astype(self.dtype) @ w1.astype(self.dtype) + b1
                )
                mlp_out = hid.astype(self.dtype) @ w2.astype(self.dtype) + b2m
                if m2v is not None:
                    # uncovered pixels get no attention contribution (fold
                    # writes zeros -> m1 scales zero), but their MLP branch
                    # still carries the stochastic-depth mask
                    mlp_out = m2v[:, None, None] * mlp_out
                idv = cf + mlp_out
                idx = idx.copy()
                idx[flat_unc] = n_el + np.arange(
                    flat_unc.size, dtype=np.int32
                )
                src = jnp.concatenate([src, idv.astype(src.dtype)], axis=1)
            idx2d = idx.reshape(hp, wp)
            if pad_h or pad_w:
                idx2d = idx2d[pt : hp - pb, pl : wp - pr]
            y = _inj_take(src, idx2d.reshape(-1), axis=1)
            return y.reshape(b, h, w, c)
        y = out.reshape(-1, win[0], win[1], c)
        y = window_reverse(y, b, hp, wp)
        if pad_h or pad_w:
            y = y[:, pt : hp - pb, pl : wp - pr]
        return y


class DFrameAttention(nn.Module):
    """Stack of Swin blocks over a temporal buffer of D frames; each block's
    output becomes the new center frame (reference :309-389). Alternating
    blocks use dilation-2 windows (dilate_win = i % 2 == 1).

    Input: (D, B, H, W, C) -> output (B, H, W, C).
    """

    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int] = (1, 7, 7)
    nwindow_size: Optional[Tuple[int, int]] = None
    q_ind: Optional[int] = None
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    activation: str = "gelu"
    drop_path: Sequence[float] = ()
    use_pallas: bool = False
    f32_exact: bool = True  # see WindowAttention3D.f32_exact
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        q_ind = self.window_size[0] // 2 if self.q_ind is None else self.q_ind
        # whole-block fused mode: pass the evolving center separately so the
        # static frames' pad+partition hoist out of the loop and the buffer
        # copy (x.at[q_ind].set) disappears (blocks fall back internally
        # when they cannot fuse)
        fused = self.use_pallas and self.nwindow_size is None
        center = x[q_ind]
        for i in range(self.depth):
            if not fused:
                x = x.at[q_ind].set(center)
            block = SwinTransformerBlock3D(
                self.dim,
                self.num_heads,
                window_size=self.window_size,
                nwindow_size=self.nwindow_size,
                dilate_win=(i % 2 == 1),
                mlp_ratio=self.mlp_ratio,
                q_ind=q_ind,
                qkv_bias=self.qkv_bias,
                activation=self.activation,
                drop_path=self.drop_path[i] if i < len(self.drop_path) else 0.0,
                use_pallas=self.use_pallas,
                f32_exact=self.f32_exact,
                dtype=self.dtype,
                deterministic=self.deterministic,
                name=f"blocks{i}",
            )
            center = block(x, center=center) if fused else block(x)
        return center
