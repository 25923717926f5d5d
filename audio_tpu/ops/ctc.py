"""CTC loss and greedy decoding for TPU.

The loss shares the trellis structure of the Viterbi aligner
(``audio_tpu.ops.viterbi``) but accumulates in the log semiring
(logaddexp instead of max), vectorized over the full (B, S) state front per
frame.  Gradients flow through the scan via autodiff (XLA rematerializes the
small per-step state), which matches torch.nn.CTCLoss gradients.

The reference has no own CTC loss (its recipes use torch.nn.CTCLoss); this
is the TPU-native equivalent needed by the wav2letter/wav2vec2 fine-tuning
recipes and the decoder stack.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["ctc_loss", "ctc_greedy_decode"]

_NEG_INF = -1e30


def _state_labels(targets: jnp.ndarray, blank: int, s: int) -> jnp.ndarray:
    i = jnp.arange(s)
    tok = targets[:, jnp.clip(i // 2, 0, targets.shape[1] - 1)]
    return jnp.where(i % 2 == 0, blank, tok)


def ctc_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    blank: int = 0,
    reduction: str = "mean",
    zero_infinity: bool = False,
) -> jnp.ndarray:
    """Connectionist Temporal Classification loss.

    Args:
        log_probs: (B, T, C) log-softmaxed emissions.
        targets: (B, L) labels (no blanks).
        input_lengths / target_lengths: (B,) valid lengths.
        reduction: "none" | "mean" | "sum".  "mean" divides each loss by its
            target length then averages (torch.nn.CTCLoss semantics).
    """
    b, t_max, _ = log_probs.shape
    l_max = targets.shape[1]
    s = 2 * l_max + 1
    if input_lengths is None:
        input_lengths = jnp.full((b,), t_max, jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full((b,), l_max, jnp.int32)
    input_lengths = input_lengths.astype(jnp.int32)
    target_lengths = target_lengths.astype(jnp.int32)

    labels = _state_labels(targets, blank, s)
    state_idx = jnp.arange(s)
    state_valid = state_idx[None, :] < (2 * target_lengths[:, None] + 1)
    tok = targets
    same_as_prev = jnp.concatenate([jnp.ones((b, 1), bool), tok[:, 1:] == tok[:, :-1]], axis=1)
    odd = state_idx % 2 == 1
    can_skip = odd[None, :] & (state_idx[None, :] >= 3) & ~same_as_prev[:, jnp.clip(state_idx // 2, 0, l_max - 1)]
    can_skip = can_skip & state_valid

    emit0 = jnp.take_along_axis(log_probs[:, 0, :], labels, axis=1)
    alpha0 = jnp.where(state_idx[None, :] < 2, emit0, _NEG_INF)
    alpha0 = jnp.where(state_valid, alpha0, _NEG_INF)

    def step(alpha, inp):
        emit_t, t = inp
        x0 = alpha
        x1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :-1]
        x2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF)[:, :-2]
        x2 = jnp.where(can_skip, x2, _NEG_INF)
        tot = jnp.logaddexp(jnp.logaddexp(x0, x1), x2)
        new_alpha = jnp.where(state_valid, tot + emit_t, _NEG_INF)
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    emits = jnp.moveaxis(
        jax.vmap(lambda lp: jnp.take_along_axis(lp, labels, axis=1), in_axes=1, out_axes=0)(log_probs[:, 1:, :]),
        0, 0,
    )
    alpha_final, _ = jax.lax.scan(step, alpha0, (emits, jnp.arange(1, t_max)))

    s_last = 2 * target_lengths
    a_blank = jnp.take_along_axis(alpha_final, s_last[:, None], axis=1)[:, 0]
    a_tok = jnp.take_along_axis(alpha_final, jnp.maximum(s_last - 1, 0)[:, None], axis=1)[:, 0]
    a_tok = jnp.where(target_lengths > 0, a_tok, _NEG_INF)
    ll = jnp.logaddexp(a_blank, a_tok)
    losses = -ll
    if zero_infinity:
        losses = jnp.where(jnp.isfinite(losses) & (losses < 1e29), losses, 0.0)
    if reduction == "mean":
        return jnp.mean(losses / jnp.maximum(target_lengths, 1))
    if reduction == "sum":
        return jnp.sum(losses)
    return losses


def ctc_greedy_decode(log_probs: jnp.ndarray, lengths: Optional[jnp.ndarray] = None, blank: int = 0):
    """Best-path decode: argmax per frame, collapse repeats, drop blanks.

    Returns (tokens (B, T) padded with -1, counts (B,)).
    """
    b, t_max, _ = log_probs.shape
    if lengths is None:
        lengths = jnp.full((b,), t_max, jnp.int32)
    best = jnp.argmax(log_probs, axis=-1)  # (B, T)
    prev = jnp.pad(best, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    valid = (best != blank) & (best != prev) & (jnp.arange(t_max)[None, :] < lengths[:, None])
    # compact: stable sort by (not valid), keeping order of valid entries
    order = jnp.argsort(~valid, axis=1, stable=True)
    tokens = jnp.take_along_axis(best, order, axis=1)
    counts = valid.sum(axis=1)
    tokens = jnp.where(jnp.arange(t_max)[None, :] < counts[:, None], tokens, -1)
    return tokens, counts
