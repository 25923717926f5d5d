"""All-pole (IIR) recurrence engines for TPU.

TPU-native replacement for the reference's native lfilter core loop
(/root/reference/src/libtorchaudio/lfilter.cpp:32-47 CPU parallel_for,
/root/reference/src/libtorchaudio/iir_cuda.cu:10-35 one-thread-per-lane CUDA):

    y[t] = x[t] - sum_{k=1..order} a[k] * y[t-k]

Two formulations:

* ``iir_scan`` — direct ``lax.scan`` over time, state = last ``order``
  outputs.  Exact reference semantics; O(T) tiny vector steps (latency bound).

* ``iir_blocked`` — the speed-of-light TPU formulation.  Time is split into
  blocks of S samples.  Within a block the recurrence is *linear* in the
  inputs and the incoming state, so the whole block is one lower-triangular
  Toeplitz matmul with the filter's impulse response (MXU work), after folding
  the incoming state into the first ``order`` inputs.  Only the block-to-block
  state carry is sequential: T/S scan steps instead of T.  This is the
  re-association of the same recurrence, exact up to float reordering.

Both are vmappable over leading axes and differentiable; ``iir_apply`` wraps
them with the custom VJP from the reference's DifferentiableIIR
(/root/reference/src/torchaudio/functional/filtering.py:983-1024): the
backward pass applies the same IIR to the time-reversed cotangent.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["iir_scan", "iir_blocked", "iir_apply", "allpole_impulse_response"]

# Default block length for the blocked formulation: one MXU tile of time.
_DEFAULT_BLOCK = 128
# Below this many samples the scan's lower constant factor wins.
_SCAN_CUTOFF = 256


def allpole_impulse_response(a_tail: jnp.ndarray, length: int) -> jnp.ndarray:
    """Impulse response h (C, length) of 1 / (1 + sum a_k z^-k); h[0] = 1.

    Computed in log depth via an associative scan over companion-matrix
    products (h[t] = (M^t)[0, 0]) — a sequential length-T scan of tiny steps
    costs ~T dispatches on TPU, which would dwarf the filter itself.
    """
    c, order = a_tail.shape
    # companion matrix M: row 0 = -a, subdiagonal = identity
    m = jnp.zeros((c, order, order), a_tail.dtype)
    m = m.at[:, 0, :].set(-a_tail)
    if order > 1:
        m = m.at[:, jnp.arange(1, order), jnp.arange(order - 1)].set(1.0)
    # inclusive scan of M, M^2, ..., M^(length-1) per channel
    ms = jnp.broadcast_to(m[:, None], (c, length - 1, order, order))
    powers = jax.lax.associative_scan(
        lambda x, y: jnp.einsum("...ij,...jk->...ik", y, x, precision="highest"), ms, axis=1
    )  # powers[:, t] = M^(t+1)  (full fp32: bf16 products corrupt the tail)
    h = powers[:, :, 0, 0]  # (C, length-1): h[t] = (M^t)[0, 0]
    return jnp.concatenate([jnp.ones((c, 1), a_tail.dtype), h], axis=1)


def iir_scan(x: jnp.ndarray, a_tail: jnp.ndarray, zi: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Direct scan IIR.  x: (B, C, T), a_tail: (C, order) = [a1..aN], y: (B, C, T).

    ``zi`` (B, C, order) holds [y[-1], ..., y[-order]] (zeros if None).
    """
    b, c, t = x.shape
    order = a_tail.shape[-1]
    state = jnp.zeros((b, c, order), x.dtype) if zi is None else zi

    def step(state, x_t):
        y_t = x_t - jnp.sum(a_tail * state, axis=-1)
        new_state = jnp.concatenate([y_t[..., None], state[..., :-1]], axis=-1)
        return new_state, y_t

    _, ys = jax.lax.scan(step, state, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(ys, 0, -1)


def _state_fold_matrix(a_tail: jnp.ndarray) -> jnp.ndarray:
    """M (C, order, order) with M[c, t, j] = a_c[t + j + 1] (0 beyond order).

    Folds initial conditions into the first ``order`` block inputs:
    v[t] = x[t] - sum_j M[t, j] * s0[j], where s0[j] = y[-j-1].
    """
    c, order = a_tail.shape
    t_idx = jnp.arange(order)[:, None]
    j_idx = jnp.arange(order)[None, :]
    k = t_idx + j_idx  # index into a_tail (a_{k+1})
    valid = k < order
    gathered = a_tail[:, jnp.clip(k, 0, order - 1)]  # (C, order, order)
    return jnp.where(valid[None], gathered, 0.0)


def iir_blocked(
    x: jnp.ndarray,
    a_tail: jnp.ndarray,
    zi: Optional[jnp.ndarray] = None,
    block_size: int = _DEFAULT_BLOCK,
) -> jnp.ndarray:
    """Blocked Toeplitz-matmul IIR.  Same contract as :func:`iir_scan`."""
    b, c, t = x.shape
    order = a_tail.shape[-1]
    s = block_size
    n_blocks = -(-t // s)
    t_pad = n_blocks * s

    h = allpole_impulse_response(a_tail, s)  # (C, S)
    # H[c, i, j] = h_c[i - j] for i >= j: lower-triangular Toeplitz.
    i_idx = jnp.arange(s)[:, None]
    j_idx = jnp.arange(s)[None, :]
    d = i_idx - j_idx
    toe = jnp.where(d >= 0, h[:, jnp.clip(d, 0, s - 1)], 0.0)  # (C, S, S)
    fold = _state_fold_matrix(a_tail)  # (C, order, order)

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t)))
    blocks = jnp.moveaxis(xp.reshape(b, c, n_blocks, s), 2, 0)  # (n_blocks, B, C, S)
    state0 = jnp.zeros((b, c, order), x.dtype) if zi is None else zi

    def step(state, x_blk):
        # Fold incoming state into the first `order` inputs of the block.
        corr = jnp.einsum("ctj,bcj->bct", fold, state, precision="highest")
        v = x_blk.at[..., :order].add(-corr)
        # Whole block in one MXU contraction with the Toeplitz operator.
        y_blk = jnp.einsum(
            "cij,bcj->bci", toe, v, preferred_element_type=x_blk.dtype, precision="highest"
        )
        new_state = jnp.flip(y_blk[..., s - order :], -1)
        return new_state, y_blk

    _, ys = jax.lax.scan(step, state0, blocks)
    y = jnp.moveaxis(ys, 0, 2).reshape(b, c, t_pad)
    return y[..., :t]


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
    except Exception:
        return False


def _iir_fwd_impl(x: jnp.ndarray, a_norm: jnp.ndarray, block_size: int) -> jnp.ndarray:
    a_tail = a_norm[:, 1:]
    if a_tail.shape[-1] == 0:
        return x
    if x.shape[-1] <= _SCAN_CUTOFF:
        return iir_scan(x, a_tail)
    if x.ndim == 3 and x.dtype == jnp.float32 and a_tail.shape[-1] <= 128 and _use_pallas():
        from .pallas_iir import iir_pallas

        return iir_pallas(x, a_tail)
    return iir_blocked(x, a_tail, block_size=block_size)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def iir_apply(x: jnp.ndarray, a_norm: jnp.ndarray, block_size: int = _DEFAULT_BLOCK) -> jnp.ndarray:
    """All-pole filter with normalized denominator a_norm (C, order+1), a_norm[:,0]=1.

    x: (B, C, T) -> y: (B, C, T).  Custom VJP per the diffAPF trick: the
    cotangent w.r.t. x is the same filter run on the time-reversed cotangent.
    """
    return _iir_fwd_impl(x, a_norm, block_size)


def _iir_apply_fwd(x, a_norm, block_size):
    y = _iir_fwd_impl(x, a_norm, block_size)
    return y, (a_norm, y)


def _iir_apply_bwd(block_size, res, dy):
    a_norm, y = res
    order_p1 = a_norm.shape[-1]
    # dx[t] = IIR(flip(dy))[T-1-t]  (filtering.py:1001-1005)
    dx = jnp.flip(_iir_fwd_impl(jnp.flip(dy, -1), a_norm, block_size), -1)
    # da[k] = -sum_{b,t} dx[b,c,t] * y[b,c,t-k], zero-padded past the start
    # (filtering.py:1006-1016).
    y_pad = jnp.pad(y, ((0, 0), (0, 0), (order_p1 - 1, 0)))
    t_len = y.shape[-1]
    idx = jnp.arange(t_len)[:, None] + jnp.arange(order_p1)[None, :]  # t + j
    windows = y_pad[..., idx]  # (B, C, T, order+1): y[t + j - order]
    da_rev = -jnp.einsum("bct,bctj->cj", dx, windows)
    da = jnp.flip(da_rev, -1)
    return dx, da


iir_apply.defvjp(_iir_apply_fwd, _iir_apply_bwd)


# ---------------------------------------------------------------------------
# Fused lfilter (FIR + IIR in one pallas pass) with analytic VJP
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def lfilter_fused(x: jnp.ndarray, a_norm: jnp.ndarray, b_norm: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """y = IIR_a(FIR_b(x)) in one pallas kernel (TPU path of lfilter).

    x (B, C, T) float32; a_norm/b_norm (C, order+1), a_norm[:, 0] == 1.
    Backward follows the reference's DifferentiableFIR/IIR math
    (filtering.py:941-1024) applied to the composition.
    """
    from .pallas_iir import lfilter_pallas

    return lfilter_pallas(x, a_norm, b_norm, interpret=interpret)


def _lfilter_fused_fwd(x, a_norm, b_norm, interpret):
    y = lfilter_fused(x, a_norm, b_norm, interpret)
    return y, (x, y, a_norm, b_norm)


def _lfilter_fused_bwd(interpret, res, dy):
    x, y, a_norm, b_norm = res
    t_len = x.shape[-1]
    p1 = b_norm.shape[-1]
    # dv = IIR_a^T dy (cotangent at the FIR output)
    dv = jnp.flip(_iir_fwd_impl(jnp.flip(dy, -1), a_norm, _DEFAULT_BLOCK), -1)
    # dx[t] = sum_k b[k] dv[t+k]  (FIR transpose = anticausal correlation)
    dx = jnp.zeros_like(x)
    for k in range(p1):
        seg = dv[..., k:]
        dx = dx.at[..., : t_len - k].add(b_norm[:, k][None, :, None] * seg)
    # db[k] = sum_{b,t} dv[t] x[t-k]
    db = jnp.stack(
        [jnp.sum(dv[..., k:] * x[..., : t_len - k], axis=(0, 2)) for k in range(p1)],
        axis=1,
    )
    # da per the all-pole backward (windows of y against dv)
    y_pad = jnp.pad(y, ((0, 0), (0, 0), (a_norm.shape[-1] - 1, 0)))
    idx = jnp.arange(t_len)[:, None] + jnp.arange(a_norm.shape[-1])[None, :]
    windows = y_pad[..., idx]
    da = jnp.flip(-jnp.einsum("bct,bctj->cj", dv, windows), -1)
    return dx, da, db


lfilter_fused.defvjp(_lfilter_fused_fwd, _lfilter_fused_bwd)
