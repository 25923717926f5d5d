"""CTC forced alignment (functional wrapper).

Behavioral parity with /root/reference/src/torchaudio/functional/_alignment.py:
forced_align (:12-78, validation + default lengths + score gather) and
merge_tokens → TokenSpan (:81-128).  The DP itself runs in
``audio_tpu.ops.viterbi`` — batched (B>1 works, lifting the reference's
batch_size==1 restriction at cpu/compute.cpp:172-177) and jittable.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.viterbi import viterbi_align

__all__ = ["forced_align", "merge_tokens", "TokenSpan"]


def forced_align(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    blank: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Align a CTC label sequence to an emission.

    Args:
        log_probs: (B, T, C) log CTC emission probabilities.
        targets: (B, L) target sequence (must not contain ``blank``).
        input_lengths / target_lengths: optional (B,) valid lengths.
        blank: blank symbol index.

    Returns:
        (paths (B, T), scores (B, T)): per-frame aligned token ids and their
        log-prob scores.
    """
    # Validation mirrors the reference; only possible on concrete arrays.
    try:
        concrete = np.asarray(targets)
    except Exception:
        concrete = None
    if concrete is not None:
        # only validate tokens inside the valid region (padding may be 0)
        if target_lengths is not None:
            valid = np.arange(concrete.shape[1])[None, :] < np.asarray(target_lengths)[:, None]
        else:
            valid = np.ones_like(concrete, bool)
        if (concrete[valid] == blank).any():
            raise ValueError(f"targets Tensor shouldn't contain blank index. Found {targets}.")
        if concrete[valid].max() >= log_probs.shape[-1]:
            raise ValueError("targets values must be less than the CTC dimension")
    return viterbi_align(log_probs, targets, input_lengths, target_lengths, blank)


@dataclass
class TokenSpan:
    """Token with time stamps and score; returned by :func:`merge_tokens`."""

    token: int
    start: int
    end: int
    score: float

    def __len__(self) -> int:
        return self.end - self.start


def merge_tokens(tokens, scores, blank: int = 0) -> List[TokenSpan]:
    """Remove repeats and blanks from a CTC token sequence, yielding spans."""
    tokens = np.asarray(tokens)
    scores = np.asarray(scores)
    if tokens.ndim != 1 or scores.ndim != 1:
        raise ValueError("`tokens` and `scores` must be 1D Tensor.")
    if len(tokens) != len(scores):
        raise ValueError("`tokens` and `scores` must be the same length.")
    diff = np.diff(tokens, prepend=-1, append=-1)
    changes = np.nonzero(diff != 0)[0].tolist()
    spans = [
        TokenSpan(token=int(tokens[start]), start=start, end=end, score=float(scores[start:end].mean()))
        for start, end in zip(changes[:-1], changes[1:])
        if int(tokens[start]) != blank
    ]
    return spans
