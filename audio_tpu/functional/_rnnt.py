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

__all__ = ["rnnt_loss"]


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
