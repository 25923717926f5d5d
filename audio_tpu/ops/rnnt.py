"""RNN-T (transducer) loss for TPU.

TPU-native equivalent of the reference's native transducer kernels
(/root/reference/src/libtorchaudio/rnnt/cpu/cpu_kernels.h,
gpu/gpu_transducer.h:34-311): forward-backward (alpha/beta) DP over the
(B, T, U) lattice with fused log-softmax denominator and analytic gradients.

Formulation: for each row t, the alpha recurrence over u,

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + label[t, u-1]),

is a first-order linear recurrence in the (log, +) semiring, solved with
``lax.associative_scan`` over u — so the DP is a scan over T rows with
O(log U) depth per row instead of the per-cell wavefront of the CUDA kernel.
Gradients are the standard analytic transducer gradients computed from
alpha+beta in the custom VJP (one fused pass, no (B,T,U,V) softmax residual
beyond the logits themselves).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["rnnt_alphas", "rnnt_betas", "rnnt_loss_from_logprobs", "rnnt_loss_core"]

_NEG_INF = -1e30

# DP rows are tiny ((B, U+1) / (B, s) elementwise + a log-depth scan), so the
# T-step lax.scan is dominated by per-iteration loop overhead on TPU;
# unrolling 16 rows per iteration amortizes it without changing the math
# (8 -> 16 measured ~0.3 ms off the B=32 full-lattice step — the scans were
# already near-amortized at 8).
_SCAN_UNROLL = 16


def _semiring_scan(base: jnp.ndarray, coeff: jnp.ndarray) -> jnp.ndarray:
    """Solve y[u] = logaddexp(base[u], y[u-1] + coeff[u]) along the last axis.

    (coeff[0] is unused: y[0] = base[0].)
    """

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 + a2, jnp.logaddexp(b2, b1 + a2)

    _, y = jax.lax.associative_scan(combine, (coeff, base), axis=-1)
    return y


def rnnt_alphas(
    blank_lp: jnp.ndarray, label_lp: jnp.ndarray, logit_lengths: jnp.ndarray, target_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Forward variables alpha (B, T, U+1).

    blank_lp: (B, T, U+1) log prob of blank at (t, u);
    label_lp: (B, T, U) log prob of emitting target u+1 at (t, u).
    """
    b, t_max, u1 = blank_lp.shape
    u_idx = jnp.arange(u1)
    label_pad = jnp.pad(label_lp, ((0, 0), (0, 0), (1, 0)), constant_values=_NEG_INF)  # (B,T,U+1): label[t,u-1]

    # alpha[0, u] = sum_{k<u} label[0, k]
    alpha0 = jnp.pad(jnp.cumsum(label_lp[:, 0, :], axis=-1), ((0, 0), (1, 0)))
    alpha0 = jnp.where(u_idx[None] <= target_lengths[:, None], alpha0, _NEG_INF)

    def step(alpha_prev, inp):
        blank_prev, label_cur, t = inp  # blank_lp[t-1], label_pad[t], scalar t
        base = alpha_prev + blank_prev  # horizontal move into (t, u)
        alpha_t = _semiring_scan(base, label_cur)
        alpha_t = jnp.where(u_idx[None] <= target_lengths[:, None], alpha_t, _NEG_INF)
        alpha_t = jnp.where((t < logit_lengths)[:, None], alpha_t, alpha_prev)
        return alpha_t, alpha_t

    ts = jnp.arange(1, t_max)
    _, rest = jax.lax.scan(
        step,
        alpha0,
        (jnp.moveaxis(blank_lp[:, :-1], 1, 0), jnp.moveaxis(label_pad[:, 1:], 1, 0), ts),
        unroll=_SCAN_UNROLL,
    )
    return jnp.concatenate([alpha0[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)


def rnnt_betas(
    blank_lp: jnp.ndarray, label_lp: jnp.ndarray, logit_lengths: jnp.ndarray, target_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Backward variables beta (B, T, U+1); beta[0,0] = log-likelihood."""
    b, t_max, u1 = blank_lp.shape
    u_idx = jnp.arange(u1)
    t_last = logit_lengths - 1

    # Work on reversed axes so the recurrence runs forward; freeze rows past
    # the valid region just like the alpha pass.
    # beta[t, u] = logaddexp(beta[t+1, u] + blank[t, u],
    #                        beta[t, u+1] + label[t, u])
    # beta[T-1, U] = blank[T-1, U]
    valid_u = u_idx[None] <= target_lengths[:, None]

    # initial row: t = t_last: beta[t_last, u] = blank(t_last, U) + sum_{k>=u} label[t_last, k]
    blank_last = jnp.take_along_axis(
        blank_lp, t_last[:, None, None].repeat(u1, axis=2), axis=1
    )[:, 0, :]  # (B, U+1)
    label_last = jnp.take_along_axis(
        label_lp, t_last[:, None, None].repeat(label_lp.shape[2], axis=2), axis=1
    )[:, 0, :]  # (B, U)
    final_blank = jnp.take_along_axis(blank_last, target_lengths[:, None], axis=1)  # (B, 1)
    # suffix sums of label_last over [u, U_i)
    label_masked = jnp.where(u_idx[None, : label_lp.shape[2]] < target_lengths[:, None], label_last, 0.0)
    suffix = jnp.flip(jnp.cumsum(jnp.flip(label_masked, -1), -1), -1)  # sum_{k>=u}
    suffix = jnp.pad(suffix, ((0, 0), (0, 1)))
    beta_last = final_blank + suffix
    beta_last = jnp.where(valid_u, beta_last, _NEG_INF)

    def step(beta_next, inp):
        blank_t, label_t, t = inp  # row t arrays, scalar t (descending)
        base = beta_next + blank_t
        # reverse scan over u: y[u] = logaddexp(base[u], y[u+1] + label[t, u])
        label_t_pad = jnp.pad(label_t, ((0, 0), (0, 1)), constant_values=_NEG_INF)
        y_r = _semiring_scan(jnp.flip(base, -1), jnp.flip(label_t_pad, -1))
        beta_t = jnp.flip(y_r, -1)
        beta_t = jnp.where(valid_u, beta_t, _NEG_INF)
        active = (t < t_last)[:, None]
        beta_t = jnp.where(active, beta_t, beta_next)
        return beta_t, beta_t

    ts = jnp.arange(t_max - 2, -1, -1)
    _, rest = jax.lax.scan(
        step,
        beta_last,
        (jnp.moveaxis(blank_lp[:, :-1][:, ::-1], 1, 0), jnp.moveaxis(label_lp[:, :-1][:, ::-1], 1, 0), ts),
        unroll=_SCAN_UNROLL,
    )
    betas = jnp.concatenate([jnp.moveaxis(rest, 0, 1)[:, ::-1], beta_last[:, None]], axis=1)
    # rows t > t_last hold frozen copies of the t_last row, matching alphas' freeze.
    return betas


def rnnt_loss_from_logprobs(
    blank_lp: jnp.ndarray,
    label_lp: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (costs (B,), alphas, betas).  cost = -log P(y|x)."""
    alphas = rnnt_alphas(blank_lp, label_lp, logit_lengths, target_lengths)
    betas = rnnt_betas(blank_lp, label_lp, logit_lengths, target_lengths)
    ll = betas[:, 0, 0]
    return -ll, alphas, betas


def _gather_lps_lazy(logits, targets, blank, fused_log_softmax):
    """Lazy log-softmax gather: (blank_lp, label_lp, lse) without a full
    (B,T,U+1,V) log_probs tensor.

    log p = x - lse, so only the gathered blank/label entries are normalized
    — XLA reads the lattice ONCE for the logsumexp reduction and once for
    the two slice gathers, instead of materializing a normalized copy.  The
    (B,T,U+1) f32 ``lse`` is returned so the custom-VJP backward can reuse
    it (saving the full-lattice reduction a recompute would cost); with
    ``fused_log_softmax=False`` the inputs are already log-probs, so lse is
    ``None`` and no residual is saved.  Math in f32 regardless of logits
    dtype — cast-compute, mirroring the reference's half-precision handling
    (fp16 in, fp32 compute, CAST/ACC dtypes in
    /root/reference/src/libtorchaudio/rnnt/cpu/cpu_kernels.h); the saved
    residual stays in the input dtype, so bf16 training keeps the (B,T,U,V)
    tensor half-sized in HBM while the log-semiring scans stay accurate.
    """
    u = targets.shape[1]
    acc = jnp.promote_types(logits.dtype, jnp.float32)
    from .pallas_rnnt_lps import lattice_row_stats, use_row_stats_kernel

    if fused_log_softmax and acc == jnp.float32 and use_row_stats_kernel():
        # ONE fused lattice pass for lse + blank + label on TPU — the XLA
        # formulation issues a multi-pass logsumexp plus two strided column
        # reads over the full (B,T,U+1,V) lattice (see pallas_rnnt_lps.py)
        tgt_rows = jnp.broadcast_to(
            jnp.pad(targets, ((0, 0), (0, 1)))[:, None, :],
            logits.shape[:-1]).astype(jnp.int32)  # (B,T,U+1); row U unused
        lse, blank_raw, label_full = lattice_row_stats(logits, tgt_rows, blank)
        return blank_raw - lse, (label_full - lse)[:, :, :u], lse
    x = logits.astype(acc)
    blank_raw = x[..., blank]
    label_idx = targets[:, None, :, None]  # (B,1,U,1)
    label_raw = jnp.take_along_axis(
        x[:, :, :u, :], jnp.broadcast_to(label_idx, x[:, :, :u, :1].shape), axis=-1
    )[..., 0]
    if not fused_log_softmax:
        return blank_raw, label_raw, None
    lse = jax.scipy.special.logsumexp(x, axis=-1)  # (B,T,U+1)
    return blank_raw - lse, label_raw - lse[:, :, :u], lse


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def rnnt_loss_core(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int,
    clamp: float,
    fused_log_softmax: bool = True,
) -> jnp.ndarray:
    """Per-sequence transducer costs (B,) with analytic gradients.

    logits: (B, T, U+1, V) joiner output; targets: (B, U).
    """
    blank_lp, label_lp, _ = _gather_lps_lazy(logits, targets, blank, fused_log_softmax)
    costs, _, _ = rnnt_loss_from_logprobs(blank_lp, label_lp, logit_lengths, target_lengths)
    return costs


def _rnnt_fwd(logits, targets, logit_lengths, target_lengths, blank, clamp, fused_log_softmax):
    blank_lp, label_lp, lse = _gather_lps_lazy(logits, targets, blank, fused_log_softmax)
    costs, alphas, betas = rnnt_loss_from_logprobs(blank_lp, label_lp, logit_lengths, target_lengths)
    # blank/label log-probs ride the residuals ((B,T,U+1)+(B,T,U) f32, ~V
    # times smaller than the lattice) so the backward never re-reads the
    # lattice's strided blank/label columns
    return costs, (logits, targets, logit_lengths, target_lengths, alphas, betas,
                   lse, blank_lp, label_lp)


def occupancy_grads(blank_lp, label_lp, alphas, betas, logit_lengths, target_lengths):
    """Analytic d(-ll)/d(blank_lp, label_lp): negative lattice occupancies.

    The per-cell gradients of the transducer loss wrt the blank/label
    log-probs (the standard alpha·beta posteriors, cpu_kernels.h
    ComputeGradients); shared by the full loss backward and the
    log-prob-level losses in :mod:`audio_tpu.ops.rnnt_pruned`.
    """
    b, t_max, u1 = blank_lp.shape
    u_max = u1 - 1
    ll = betas[:, 0, 0][:, None, None]
    t_idx = jnp.arange(t_max)[None, :, None]
    u_idx = jnp.arange(u1)[None, None, :]
    in_range = (t_idx < logit_lengths[:, None, None]) & (u_idx <= target_lengths[:, None, None])

    # d(-ll)/d blank_lp[t,u] = -exp(alpha[t,u] + blank[t,u] + beta[t+1,u] - ll)
    beta_tp1 = jnp.concatenate([betas[:, 1:], jnp.full_like(betas[:, :1], _NEG_INF)], axis=1)
    # blank move only exists for t+1 < T_i; at the final cell (T_i-1, U_i) it
    # terminates the lattice (beta = 0).
    is_final = (t_idx == (logit_lengths - 1)[:, None, None]) & (u_idx == target_lengths[:, None, None])
    blank_move_valid = t_idx < (logit_lengths - 1)[:, None, None]
    beta_after_blank = jnp.where(is_final, 0.0, jnp.where(blank_move_valid, beta_tp1, _NEG_INF))
    g_blank = -jnp.exp(alphas + blank_lp + beta_after_blank - ll)
    g_blank = jnp.where(in_range, g_blank, 0.0)

    # d(-ll)/d label_lp[t,u] = -exp(alpha[t,u] + label[t,u] + beta[t,u+1] - ll)
    beta_up1 = betas[:, :, 1:]  # (B, T, U)
    g_label = -jnp.exp(alphas[:, :, :u_max] + label_lp + beta_up1 - ll)
    label_in_range = (t_idx < logit_lengths[:, None, None]) & (
        jnp.arange(u_max)[None, None, :] < target_lengths[:, None, None]
    )
    g_label = jnp.where(label_in_range, g_label, 0.0)
    return g_blank, g_label


def _rnnt_bwd(blank, clamp, fused_log_softmax, res, g):
    logits, targets, logit_lengths, target_lengths, alphas, betas, lse, blank_lp, label_lp = res
    b, t_max, u1, v = logits.shape

    u = targets.shape[1]
    acc_dtype = jnp.promote_types(logits.dtype, jnp.float32)
    g_blank, g_label = occupancy_grads(blank_lp, label_lp, alphas, betas, logit_lengths, target_lengths)

    # Gradient wrt log_probs as ONE fused broadcast expression over the
    # (B,T,U+1,V) lattice: a blank-column indicator plus a one-hot spread of
    # the label gradients.  sum_v dL/dlp is just g_blank + g_label (the only
    # two nonzero entries per (t,u) row), so the log-softmax chain rule needs
    # NO full-lattice reduction — the whole backward touches the lattice in
    # a single elementwise pass (reads logits, writes grad), which is what
    # keeps the HBM-bound tail of the train step short.  Math runs in f32
    # regardless of logits dtype (cast-compute); cast back at the end.
    v_idx = jnp.arange(v)
    blank_part = jnp.where(v_idx[None, None, None, :] == blank, g_blank[..., None], 0.0)
    label_onehot = jax.nn.one_hot(targets, v, dtype=acc_dtype)  # (B, U, V)
    onehot_p = jnp.pad(label_onehot, ((0, 0), (0, 1), (0, 0)))  # (B, U+1, V)
    g_label_p = jnp.pad(g_label, ((0, 0), (0, 0), (0, 1)))  # (B, T, U+1)
    grad_lp = blank_part + g_label_p[..., None] * onehot_p[:, None, :, :]

    if fused_log_softmax:
        # chain through log_softmax: dL/dx = dL/dlp - softmax(x) * sum_v dL/dlp
        # with softmax(x) = exp(x - lse) from the saved lse
        sum_g = g_blank + g_label_p  # (B, T, U+1)
        softmax = jnp.exp(logits.astype(acc_dtype) - lse[..., None])
        grad_logits = grad_lp - softmax * sum_g[..., None]
    else:
        grad_logits = grad_lp

    if clamp > 0:
        grad_logits = jnp.clip(grad_logits, -clamp, clamp)

    grad_logits = grad_logits * g[:, None, None, None]
    return (grad_logits.astype(logits.dtype), None, None, None)


rnnt_loss_core.defvjp(_rnnt_fwd, _rnnt_bwd)
