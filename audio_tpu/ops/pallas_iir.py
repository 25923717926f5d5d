"""Pallas TPU kernel for the all-pole IIR recurrence.

The speed-of-light version of :func:`audio_tpu.ops.iir.iir_blocked` — the
direct analogue of the reference's native lfilter core loop
(/root/reference/src/libtorchaudio/lfilter.cpp:32-47; iir_cuda.cu:10-35),
mapped to TPU: the (batch x channel) lanes tile the sublane axis, time runs
in 128-sample blocks along the sequential grid axis, and the block-to-block
carry state lives in a VMEM scratch that persists across grid steps — no HBM
round-trip for the recurrence state, and the block solve is two MXU matmuls:

    y_blk = x_blk @ A - y_prev_blk @ B

with A = toeplitz(h).T (the within-block impulse-response solve) and
B = (toeplitz(h) @ W).T folding the previous block's tail through the
recurrence (W[t, p] = a_{t + S - p} for the `order` taps, else 0).

Key structural fact exploited below: W is an (order x order) corner block
(rows t < order, columns p >= S - order), so B has only `order` nonzero
ROWS — the state fold ``y_prev @ B`` depends only on the last `order`
samples of the previous block.  Instead of a full (S x S) MXU matmul per
step, the kernel extracts those `order` lanes and applies the fold as
broadcast FMAs on the VPU (G = B[S-order:, :], a tiny (order x S) operator).
That leaves ONE full matmul per block (x @ A) instead of two/three, which
is ~2-3x on the MXU-bound biquad path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .iir import allpole_impulse_response

__all__ = ["iir_pallas"]

_S = 128       # time block (MXU tile)
_N_BLK = 1024  # lanes per grid step (fewer, bigger sequential steps)
_G_PAD = 8     # sublane padding for the (order, S) fold operators
# Within-block Toeplitz-solve matmul mode.  "bf16x3" splits each f32 operand
# into hi+lo bf16 and takes 3 MXU passes (xh@ah + xh@al + xl@ah — drops only
# the lo*lo term, ~f32-faithful); "highest" uses the 6-pass exact-f32 mode at
# 2x the MXU time.  Mosaic has no native 3-pass (Precision.HIGH) lowering.
_DOT_MODE = "highest"  # bf16x3 measured no faster here (VPU fold + DMA bound)


def _block_dot(x, a, dn):
    """f32 (N,S) @ (S,S) per _DOT_MODE."""
    if _DOT_MODE == "highest":
        return jax.lax.dot_general(
            x, a, dn, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    from ._precision import dot3_bf16, split_bf16

    xh, xl = split_bf16(x)
    ah, al = split_bf16(a)
    return dot3_bf16(xh, xl, ah, al, dn)


# Rank-`order` VPU fold wins over the (S, S) MXU matmul only while the
# unroll stays small; past this the unrolled masked reductions both compile
# slowly (CLAUDE.md: minutes for big unrolled kernels) and lose to one
# matmul.  Biquad cascades (order <= 4) stay on the fast fold path.
_FOLD_MAX_ORDER = 8


def _tail_fold(state, g_ref, order: int, col):
    """sum_m state[:, S-order+m] * G[m, :] — the rank-`order` state fold.

    ``state`` (N, S) is the previous block, ``g_ref`` (1, _G_PAD, S) holds the
    fold operator rows; only the first `order` are nonzero.  Runs on the VPU
    as `order` masked lane-extractions + broadcast FMAs (vs. a full (S, S)
    MXU matmul, of which these rows are the only nonzero part).
    """
    s = state.shape[1]
    fold = jnp.zeros_like(state)
    for m in range(order):
        coef = jnp.sum(jnp.where(col == s - order + m, state, 0.0), axis=1, keepdims=True)
        fold = fold + coef * g_ref[0, m, :][None, :]
    return fold


def _state_fold(state, g_ref, order: int, col):
    """Previous-block state fold: VPU rank-`order` fold for small orders,
    one full (S, S) MXU matmul for large ones (g_ref then holds the full
    fold operator, not just its nonzero rows)."""
    if order <= _FOLD_MAX_ORDER:
        return _tail_fold(state, g_ref, order, col)
    dn = (((1,), (0,)), ((), ()))
    return _block_dot(state, g_ref[0], dn)


def _fold_operator(full_op: jnp.ndarray, order: int, s: int):
    """(operator-to-ship, rows) for `_state_fold`: the `order` nonzero rows
    (padded to a sublane multiple) when the fold path applies, else the full
    (S, S) operator."""
    if order <= _FOLD_MAX_ORDER:
        rows = max(_G_PAD, -(-max(order, 1) // _G_PAD) * _G_PAD)
        trimmed = full_op[:, s - order:, :] if order else full_op[:, :0, :]
        return jnp.pad(trimmed, ((0, 0), (0, rows - order), (0, 0))), rows
    return full_op, s


def _make_iir_kernel(t_total: int, order: int):
    def kernel(x_ref, a_ref, g_ref, y_ref, state_ref):
        tb = pl.program_id(2)

        @pl.when(tb == 0)
        def _():
            state_ref[:] = jnp.zeros_like(state_ref)

        # zero any ragged tail of the last block so OOB garbage cannot leak
        # (pallas pads the final block when t is not a multiple of _S)
        x = x_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + tb * _S
        x = jnp.where(col < t_total, x, 0.0)
        dn = (((1,), (0,)), ((), ()))
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        y = _block_dot(x, a_ref[0], dn) - _state_fold(state_ref[:], g_ref, order, lane)
        y_ref[0] = y
        state_ref[:] = y

    return kernel


def _block_operators(a_tail: jnp.ndarray, s: int):
    """Per-channel (A, B) block operators, each (C, S, S)."""
    c, order = a_tail.shape
    h = allpole_impulse_response(a_tail, s)  # (C, S)
    i_idx = jnp.arange(s)[:, None]
    j_idx = jnp.arange(s)[None, :]
    d = i_idx - j_idx
    toe = jnp.where(d >= 0, h[:, jnp.clip(d, 0, s - 1)], 0.0)  # (C, S, S)
    # W[c, t, p] = a_{t + s - p} (1-indexed tap), nonzero only near the corner
    k = i_idx + (s - j_idx)  # t + (S - p): tap index, valid if 1 <= k <= order
    valid = (k >= 1) & (k <= order)
    w = jnp.where(valid, a_tail[:, jnp.clip(k - 1, 0, order - 1)], 0.0)  # (C, S, S)
    a_op = jnp.swapaxes(toe, -1, -2)  # A = toe.T
    b_op = jnp.swapaxes(jnp.einsum("cij,cjk->cik", toe, w, precision="highest"), -1, -2)
    return a_op, b_op


@functools.partial(jax.jit, static_argnames=("interpret",))
def _iir_pallas_cbt(x: jnp.ndarray, a_tail: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x: (C, B, T) float32, a_tail: (C, order) -> y: (C, B, T)."""
    c, b, t = x.shape
    order = a_tail.shape[1]
    s = _S
    nb = -(-b // _N_BLK)
    tb = -(-t // s)
    a_op, b_op = _block_operators(a_tail.astype(jnp.float32), s)
    # B has only `order` nonzero rows (p >= S - order); ship just those when
    # the VPU fold applies, the full operator for the matmul fold otherwise.
    g_op, g_rows = _fold_operator(b_op, order, s)

    y = pl.pallas_call(
        _make_iir_kernel(t, order),
        grid=(c, nb, tb),
        in_specs=[
            pl.BlockSpec((1, _N_BLK, s), lambda ci, ni, ti: (ci, ni, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), lambda ci, ni, ti: (ci, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_rows, s), lambda ci, ni, ti: (ci, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _N_BLK, s), lambda ci, ni, ti: (ci, ni, ti), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, b, t), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_N_BLK, s), jnp.float32)],
        interpret=interpret,
    )(x, a_op, g_op)
    return y


def iir_pallas(x: jnp.ndarray, a_tail: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """All-pole IIR via the Pallas TPU kernel.

    Same contract as :func:`audio_tpu.ops.iir.iir_blocked` with ``zi=None``:
    ``x`` is (B, C, T), ``a_tail`` is (C, order) holding [a1..aN], returns
    y with y[t] = x[t] - sum_k a_k y[t-k].  float32 only.
    """
    xc = jnp.swapaxes(x, 0, 1).astype(jnp.float32)  # (C, B, T)
    y = _iir_pallas_cbt(xc, a_tail, interpret=interpret)
    return jnp.swapaxes(y, 0, 1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused lfilter: FIR numerator + all-pole recurrence in one kernel pass
# ---------------------------------------------------------------------------


def _lfilter_kernel_factory(t_total: int, order_a: int, order_b: int):
    def kernel(x_ref, a_ref, ga_ref, gb_ref, y_ref, ystate_ref, xstate_ref):
        tb = pl.program_id(2)

        @pl.when(tb == 0)
        def _():
            ystate_ref[:] = jnp.zeros_like(ystate_ref)
            xstate_ref[:] = jnp.zeros_like(xstate_ref)

        x = x_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) + tb * _S
        x = jnp.where(col < t_total, x, 0.0)
        dn = (((1,), (0,)), ((), ()))
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        y = _block_dot(x, a_ref[0], dn)
        y = y - _state_fold(ystate_ref[:], ga_ref, order_a, lane)
        y = y + _state_fold(xstate_ref[:], gb_ref, order_b, lane)
        y_ref[0] = y
        ystate_ref[:] = y
        xstate_ref[:] = x

    return kernel


def _lfilter_block_operators(a_tail: jnp.ndarray, b_norm: jnp.ndarray, s: int):
    """(A', B', C') for y = x@A' - y_prev@B' + x_prev@C' per channel.

    A' = toe(b * h_a).T (combined impulse response), B' folds the previous
    block's outputs through the recurrence, C' the previous block's inputs
    through the numerator taps that cross the block boundary.
    """
    c, order = a_tail.shape
    p1 = b_norm.shape[1]  # order_b + 1
    h = allpole_impulse_response(a_tail, s)  # (C, S)
    i_idx = jnp.arange(s)[:, None]
    j_idx = jnp.arange(s)[None, :]
    d = i_idx - j_idx
    toe_h = jnp.where(d >= 0, h[:, jnp.clip(d, 0, s - 1)], 0.0)  # (C, S, S)
    # combined IR g[t] = sum_k b[k] h[t-k]
    k_idx = jnp.arange(p1)
    tk = jnp.arange(s)[:, None] - k_idx[None, :]  # (S, P+1)
    hg = jnp.where(tk >= 0, h[:, jnp.clip(tk, 0, s - 1)], 0.0)  # (C, S, P+1)
    g = jnp.einsum("csk,ck->cs", hg, b_norm, precision="highest")
    toe_g = jnp.where(d >= 0, g[:, jnp.clip(d, 0, s - 1)], 0.0)
    # recurrence fold (same as the all-pole kernel)
    ka = i_idx + (s - j_idx)
    wa = jnp.where((ka >= 1) & (ka <= order), a_tail[:, jnp.clip(ka - 1, 0, order - 1)], 0.0)
    # numerator cross taps: W_b[t, p] = b[t + s - p] for 1 <= t+s-p <= order_b
    kb = i_idx + (s - j_idx)
    wb = jnp.where((kb >= 1) & (kb <= p1 - 1), b_norm[:, jnp.clip(kb, 0, p1 - 1)], 0.0)
    a_op = jnp.swapaxes(toe_g, -1, -2)
    b_op = jnp.swapaxes(jnp.einsum("cij,cjk->cik", toe_h, wa, precision="highest"), -1, -2)
    c_op = jnp.swapaxes(jnp.einsum("cij,cjk->cik", toe_h, wb, precision="highest"), -1, -2)
    return a_op, b_op, c_op


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lfilter_pallas_cbt(x, a_tail, b_norm, interpret=False):
    c, b, t = x.shape
    order_a = a_tail.shape[1]
    order_b = b_norm.shape[1] - 1
    s = _S
    nb = -(-b // _N_BLK)
    tbk = -(-t // s)
    a_op, b_op, c_op = _lfilter_block_operators(
        a_tail.astype(jnp.float32), b_norm.astype(jnp.float32), s
    )
    # B/C have only order_a / order_b nonzero rows (corner-block W); ship
    # those for the VPU fold, or the full operators for the matmul fold.
    ga_op, ga_rows = _fold_operator(b_op, order_a, s)
    gb_op, gb_rows = _fold_operator(c_op, order_b, s)
    return pl.pallas_call(
        _lfilter_kernel_factory(t, order_a, order_b),
        grid=(c, nb, tbk),
        in_specs=[
            pl.BlockSpec((1, _N_BLK, s), lambda ci, ni, ti: (ci, ni, ti), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), lambda ci, ni, ti: (ci, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ga_rows, s), lambda ci, ni, ti: (ci, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gb_rows, s), lambda ci, ni, ti: (ci, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _N_BLK, s), lambda ci, ni, ti: (ci, ni, ti), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c, b, t), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_N_BLK, s), jnp.float32),
            pltpu.VMEM((_N_BLK, s), jnp.float32),
        ],
        interpret=interpret,
    )(x, a_op, ga_op, gb_op)


def lfilter_pallas(x: jnp.ndarray, a_norm: jnp.ndarray, b_norm: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused difference-equation filter: y = IIR_a(FIR_b(x)) in one kernel.

    x (B, C, T); a_norm/b_norm (C, order+1) with a_norm[:, 0] == 1.
    """
    xc = jnp.swapaxes(x, 0, 1).astype(jnp.float32)
    y = _lfilter_pallas_cbt(xc, a_norm[:, 1:], b_norm, interpret=interpret)
    return jnp.swapaxes(y, 0, 1).astype(x.dtype)
