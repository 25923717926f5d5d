"""SSL losses (TPU-native).

JAX counterparts of /root/reference/examples/self_supervised_learning/losses/
(_hubert_loss.py:8-50, _wav2vec2_loss.py:8-82). Fixed-shape formulations: the
reference indexes by boolean mask (`x[mask_indices]`, dynamic shape); here the
cross-entropies are computed everywhere and weighted by the mask so the whole
loss jits with static shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["hubert_loss", "wav2vec2_loss", "sample_negatives"]


def _masked_ce(logits: jnp.ndarray, target: Optional[jnp.ndarray],
               mask: jnp.ndarray, reduction: str) -> jnp.ndarray:
    """Cross entropy over positions where mask is set.

    logits (B, T, C), mask (B, T). With ``target`` (B, T) the CE targets those
    classes (audio_tpu's HuBERT logit generator emits cluster-class logits);
    without it the target is class 0 (the reference's positive-first layout,
    _hubert_loss.py:38).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    if target is None:
        nll = -logp[..., 0]
    else:
        nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    nll = nll * mask
    if reduction == "mean":
        return nll.sum() / jnp.maximum(mask.sum(), 1.0)
    return nll.sum()


def hubert_loss(
    logit_m: Optional[jnp.ndarray],
    logit_u: Optional[jnp.ndarray],
    feature_penalty: jnp.ndarray,
    label: Optional[jnp.ndarray] = None,
    mask_m: Optional[jnp.ndarray] = None,
    mask_u: Optional[jnp.ndarray] = None,
    masked_weight: float = 1.0,
    unmasked_weight: float = 0.0,
    feature_weight: float = 10.0,
    reduction: str = "sum",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HuBERT masked/unmasked CE + feature penalty (reference _hubert_loss.py:8).

    Logits are (B, T, C); pass ``label`` (B, T) cluster ids to target them
    (audio_tpu HuBERTPretrainModel convention) or leave None for the
    reference's positive-at-class-0 layout. mask_m/mask_u select the frames
    that participate. Returns (loss, num_frames).
    """
    num_frame = jnp.asarray(0.0)
    loss = jnp.asarray(0.0)
    if logit_m is not None:
        m = mask_m if mask_m is not None else jnp.ones(logit_m.shape[:-1], bool)
        loss = loss + masked_weight * _masked_ce(logit_m, label, m, reduction)
        num_frame = num_frame + m.sum()
    if logit_u is not None:
        u = mask_u if mask_u is not None else jnp.ones(logit_u.shape[:-1], bool)
        loss = loss + unmasked_weight * _masked_ce(logit_u, label, u, reduction)
        num_frame = num_frame + u.sum()
    # reference scales the penalty by the frame count under its "sum" CE
    # reduction (_hubert_loss.py:48); under "mean" the CE is per-frame, so the
    # penalty stays unscaled to keep the two terms commensurate
    penalty_scale = num_frame if reduction == "sum" else 1.0
    loss = loss + feature_penalty * feature_weight * penalty_scale
    return loss, num_frame


def sample_negatives(features: jnp.ndarray, num_negatives: int, key: jax.Array) -> jnp.ndarray:
    """Sample negatives from other time steps of the same utterance.

    features (B, T, D) -> (num_negatives, B, T, D). Mirrors the in-utterance
    negative sampling of the reference wav2vec2 data pipeline; a drawn index
    equal to the positive's is shifted by one (mod T) so a negative never
    silently equals the positive by construction.
    """
    b, t, d = features.shape
    idx = jax.random.randint(key, (num_negatives, b, t), 0, t - 1)
    pos = jnp.arange(t)[None, None, :]
    idx = jnp.where(idx >= pos, idx + 1, idx) % t
    return jnp.take_along_axis(features[None], idx[..., None], axis=2)


def wav2vec2_loss(
    x: jnp.ndarray,
    mask_indices: jnp.ndarray,
    positives: jnp.ndarray,
    negatives: jnp.ndarray,
    reduction: str = "sum",
    logit_temp: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wav2Vec2 contrastive (InfoNCE) loss (reference _wav2vec2_loss.py:50).

    x (B, T, D) masked-encoder outputs; positives (B, T, D) quantized targets;
    negatives (N, B, T, D). Only positions with mask_indices set contribute.
    Returns (loss, sample_size).
    """
    neg_is_pos = jnp.all(positives[None] == negatives, axis=-1)  # (N, B, T)
    targets = jnp.concatenate([positives[None], negatives], axis=0)  # (N+1, B, T, D)

    def cos(a, b):
        # rsqrt(x + eps) keeps the GRADIENT finite for all-zero vectors
        # (zero-padded frames): norm() has a NaN grad at 0, and masking the
        # loss afterwards does not stop NaN cotangents from propagating
        an = a * jax.lax.rsqrt(jnp.square(a).sum(-1, keepdims=True) + 1e-12)
        bn = b * jax.lax.rsqrt(jnp.square(b).sum(-1, keepdims=True) + 1e-12)
        return (an * bn).sum(-1)

    logits = cos(x[None].astype(jnp.float32), targets.astype(jnp.float32)) / logit_temp
    neg_inf = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
    logits = logits.at[1:].set(jnp.where(neg_is_pos, neg_inf, logits[1:]))
    logp = jax.nn.log_softmax(logits, axis=0)  # class axis = (N+1)
    nll = -logp[0] * mask_indices  # (B, T)
    sample_size = mask_indices.sum()
    if reduction == "mean":
        return nll.sum() / jnp.maximum(sample_size, 1.0), sample_size
    return nll.sum(), sample_size
