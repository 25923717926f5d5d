"""RNN Transducer loss (functional wrapper).

Behavioral parity with the reference rnnt_loss
(/root/reference/src/torchaudio/functional/functional.py:1751-1798): same
argument contract (blank<0 reinterpreted from the end, clamp on gradients,
none/mean/sum reductions, fused_log_softmax switch).  The DP runs in
``audio_tpu.ops.rnnt`` with analytic gradients via custom VJP.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.rnnt import rnnt_loss_core
from ..ops.rnnt_pruned import (
    get_rnnt_prune_ranges,
    prune_target_encodings,
    rnnt_loss_pruned_core,
    rnnt_loss_simple_core,
)

__all__ = [
    "rnnt_loss",
    "rnnt_loss_simple",
    "rnnt_loss_pruned",
    "get_rnnt_prune_ranges",
    "prune_target_encodings",
]


def rnnt_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int = -1,
    clamp: float = -1,
    reduction: str = "mean",
    fused_log_softmax: bool = True,
) -> jnp.ndarray:
    """Compute the RNN Transducer loss.

    Args:
        logits: (B, max_T, max_U+1, V) joiner output.
        targets: (B, max_U) zero-padded targets.
        logit_lengths / target_lengths: (B,) valid lengths.
        blank: blank label (negative = from the end).
        clamp: clamp gradients to [-clamp, clamp] when > 0.
        reduction: "none" | "mean" | "sum".
    """
    if reduction not in ("none", "mean", "sum"):
        raise ValueError('reduction should be one of "none", "mean", or "sum"')
    if blank < 0:
        blank = logits.shape[-1] + blank
    costs = rnnt_loss_core(
        logits,
        targets.astype(jnp.int32),
        logit_lengths.astype(jnp.int32),
        target_lengths.astype(jnp.int32),
        blank,
        float(clamp),
        fused_log_softmax,
    )
    if reduction == "mean":
        return costs.mean()
    if reduction == "sum":
        return costs.sum()
    return costs


def _reduce(costs: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction not in ("none", "mean", "sum"):
        raise ValueError('reduction should be one of "none", "mean", or "sum"')
    if reduction == "mean":
        return costs.mean()
    if reduction == "sum":
        return costs.sum()
    return costs


def rnnt_loss_simple(
    am: jnp.ndarray,
    lm: jnp.ndarray,
    targets: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int = -1,
    reduction: str = "mean",
):
    """Trivial-joiner ("simple") transducer loss + pruning posteriors.

    TPU-native extension beyond the reference API (which only manages the
    full lattice, /root/reference/src/libtorchaudio/rnnt/workspace.h:20-110):
    the pruned-transducer construction of arXiv:2206.13236.  Scores the
    additive joiner ``am[t, v] + lm[u, v]`` over the full (T, U+1) lattice
    with no (B, T, U, V) tensor — the log-softmax denominator is one
    max-shifted exp-matmul over V.

    Args:
        am: (B, T, V) encoder-side logits (e.g. a linear head on the
            transcriber output).
        lm: (B, U+1, V) predictor-side logits.
        targets / logit_lengths / target_lengths: as :func:`rnnt_loss`.
        blank: blank label (negative = from the end).

    Returns:
        ``(loss, posteriors)`` — the reduced loss, and (B, T, U+1)
        stop-gradiented lattice occupancies for
        :func:`get_rnnt_prune_ranges`.
    """
    if blank < 0:
        blank = am.shape[-1] + blank
    costs, post = rnnt_loss_simple_core(
        am, lm, targets.astype(jnp.int32),
        logit_lengths.astype(jnp.int32), target_lengths.astype(jnp.int32), blank,
    )
    return _reduce(costs, reduction), post


def rnnt_loss_pruned(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ranges: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int = -1,
    clamp: float = -1,
    reduction: str = "mean",
    fused_log_softmax: bool = True,
) -> jnp.ndarray:
    """Exact transducer loss on a banded (pruned) joiner lattice.

    ``logits`` is the (B, T, s, V) *banded* joiner output — the joiner
    evaluated only at the ``s`` target positions per frame given by
    ``ranges`` (see :func:`get_rnnt_prune_ranges` /
    :func:`prune_target_encodings`) — so peak HBM for the lattice and its
    gradient scales with s instead of U+1.  This is what breaks the
    single-chip batch ceiling of the full-lattice loss
    (docs/performance.md): only the band is ever materialized.

    The DP is exact on the pruned lattice; with ``s >= U+1`` and
    ``ranges[b, t, j] = j`` it equals :func:`rnnt_loss` exactly.
    """
    if blank < 0:
        blank = logits.shape[-1] + blank
    costs = rnnt_loss_pruned_core(
        logits,
        targets.astype(jnp.int32),
        ranges.astype(jnp.int32),
        logit_lengths.astype(jnp.int32),
        target_lengths.astype(jnp.int32),
        blank,
        float(clamp),
        fused_log_softmax,
    )
    return _reduce(costs, reduction)
