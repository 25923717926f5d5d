"""Batched device-resident CTC prefix beam search (cuctc equivalent).

TPU-native counterpart of the reference's CUDA prefix beam-search decoder
(/root/reference/src/libtorchaudio/cuctc/** and
_cuda_ctc_decoder.py:42-142): batched over sequences, per-frame top-k over
(beam × vocab) candidates, prefix merging with (p_blank, p_non_blank) score
pairs, and blank-skip frame pruning — expressed as one jittable ``lax.scan``
over frames (XLA top_k instead of the CUDA warp bitonic sort).
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CUCTCDecoder", "CUCTCHypothesis", "cuda_ctc_decoder", "batch_ctc_prefix_beam_search"]

_DEFAULT_BLANK_SKIP_THRESHOLD = 0.95
_NEG_INF = -1.0e30


class CUCTCHypothesis(NamedTuple):
    tokens: List[int]
    words: List[str]
    score: float


def batch_ctc_prefix_beam_search(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    beam_size: int,
    blank_id: int = 0,
    blank_skip_threshold: float = math.log(_DEFAULT_BLANK_SKIP_THRESHOLD),
    max_tokens: int = 256,
):
    """Prefix beam search over (B, T, V) log-probs.

    Returns (tokens (B, K, max_tokens) int32 -1-padded, counts (B, K),
    scores (B, K)), sorted best-first.
    """
    b, t_max, v = log_probs.shape

    k = beam_size
    tokens0 = jnp.full((b, k, max_tokens), -1, jnp.int32)
    counts0 = jnp.zeros((b, k), jnp.int32)
    # probability of each prefix ending in blank / non-blank
    pb0 = jnp.full((b, k), _NEG_INF).at[:, 0].set(0.0)
    pnb0 = jnp.full((b, k), _NEG_INF)

    def total(pb, pnb):
        return jnp.logaddexp(pb, pnb)

    def step(carry, inp):
        tokens, counts, pb, pnb = carry
        lp, t = inp  # lp: (B, V)
        active = (t < lengths)[:, None]  # (B, 1)
        skip = lp[:, blank_id] > blank_skip_threshold  # (B,) frame dominated by blank

        # --- candidate scores ------------------------------------------------
        # staying on the same prefix:
        #   new_pb  = total(pb, pnb) + lp[blank]
        #   new_pnb = pnb + lp[last]   (repeat of last token)
        last = jnp.take_along_axis(
            tokens, jnp.maximum(counts - 1, 0)[..., None], axis=2
        )[..., 0]  # (B, K)
        last_valid = counts > 0
        lp_last = jnp.take_along_axis(lp, jnp.maximum(last, 0), axis=1)
        lp_last = jnp.where(last_valid, lp_last, _NEG_INF)

        stay_pb = total(pb, pnb) + lp[:, blank_id][:, None]
        stay_pnb = pnb + lp_last

        # extending prefix i with token c (c != blank):
        #   if c == last: only from pb (blank separated repeat)
        #   else: from total(pb, pnb)
        ext_base = total(pb, pnb)[:, :, None] + lp[:, None, :]  # (B, K, V)
        rep_base = pb[:, :, None] + lp[:, None, :]
        is_last = jax.nn.one_hot(jnp.where(last_valid, last, v), v, dtype=bool)[:, :, :v]
        ext_scores = jnp.where(is_last, rep_base, ext_base)
        ext_scores = ext_scores.at[:, :, blank_id].set(_NEG_INF)
        # invalid (empty) beam slots can't extend
        slot_valid = total(pb, pnb) > _NEG_INF / 2
        ext_scores = jnp.where(slot_valid[:, :, None], ext_scores, _NEG_INF)

        # --- select top K extensions ----------------------------------------
        flat = ext_scores.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(flat, k)  # (B, K)
        src = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)

        new_tokens = jnp.take_along_axis(tokens, src[..., None], axis=1)
        new_counts = jnp.take_along_axis(counts, src, axis=1)
        pos = jnp.clip(new_counts, 0, max_tokens - 1)
        new_tokens = jax.vmap(lambda tk, p, c: tk.at[jnp.arange(k), p].set(c))(new_tokens, pos, tok)
        new_counts = new_counts + 1

        # merge extensions that produce an identical prefix with the stay-set:
        # equality check against every stay prefix (K x K)
        same_count = new_counts[:, :, None] == counts[:, None, :]
        tok_eq = jnp.all(
            (new_tokens[:, :, None, :] == tokens[:, None, :, :]) | (new_tokens[:, :, None, :] < 0), axis=-1
        )
        match = same_count & tok_eq & last_valid[:, None, :]  # (B, Kext, Kstay)
        # extension score merges into the matching stay slot's pnb
        contrib = jnp.where(jnp.swapaxes(match, 1, 2), top_scores[:, None, :], _NEG_INF)
        stay_pnb = jnp.logaddexp(stay_pnb, jax.nn.logsumexp(contrib, axis=2))
        ext_merged = match.any(axis=2)  # (B, Kext) merged into stay
        ext_pnb = jnp.where(ext_merged, _NEG_INF, top_scores)

        # --- pool stay + surviving extensions, keep top K by total ----------
        pool_pb = jnp.concatenate([stay_pb, jnp.full_like(ext_pnb, _NEG_INF)], axis=1)
        pool_pnb = jnp.concatenate([stay_pnb, ext_pnb], axis=1)
        pool_tokens = jnp.concatenate([tokens, new_tokens], axis=1)
        pool_counts = jnp.concatenate([counts, new_counts], axis=1)
        pool_total = total(pool_pb, pool_pnb)
        _, order = jax.lax.top_k(pool_total, k)
        sel = lambda x: jnp.take_along_axis(x, order, axis=1)
        sel3 = lambda x: jnp.take_along_axis(x, order[..., None], axis=1)

        upd = (sel3(pool_tokens), sel(pool_counts), sel(pool_pb), sel(pool_pnb))
        # frames that are skipped (blank-dominated) only update pb with the blank mass
        skip_upd = (tokens, counts, total(pb, pnb) + lp[:, blank_id][:, None], jnp.full_like(pnb, _NEG_INF))
        use_skip = (skip[:, None] & active) | ~active

        def pick(u, s, orig, extra_dims):
            cond = use_skip.reshape((b, 1) + (1,) * extra_dims)
            su = jnp.where(cond, s, u)
            return jnp.where(active.reshape((b, 1) + (1,) * extra_dims), su, orig)

        tokens = pick(upd[0], skip_upd[0], tokens, 1)
        counts = pick(upd[1], skip_upd[1], counts, 0)
        pb = pick(upd[2], skip_upd[2], pb, 0)
        pnb = pick(upd[3], skip_upd[3], pnb, 0)
        return (tokens, counts, pb, pnb), None

    (tokens, counts, pb, pnb), _ = jax.lax.scan(
        step, (tokens0, counts0, pb0, pnb0), (jnp.moveaxis(log_probs, 1, 0), jnp.arange(t_max))
    )
    scores = total(pb, pnb)
    order = jnp.argsort(-scores, axis=1)
    tokens = jnp.take_along_axis(tokens, order[..., None], axis=1)
    counts = jnp.take_along_axis(counts, order, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    return tokens, counts, scores


class CUCTCDecoder:
    """Batched prefix beam-search decoder; build with :func:`cuda_ctc_decoder`."""

    def __init__(self, vocab_list, blank_id: int = 0, beam_size: int = 10, nbest: int = 1,
                 blank_skip_threshold: float = _DEFAULT_BLANK_SKIP_THRESHOLD):
        self.vocab_list = vocab_list
        self.blank_id = blank_id
        self.beam_size = beam_size
        self.nbest = nbest
        self.blank_skip_threshold = math.log(blank_skip_threshold)

    def __call__(self, log_prob, encoder_out_lens):
        log_prob = jnp.asarray(log_prob)
        lengths = jnp.asarray(encoder_out_lens)
        tokens, counts, scores = batch_ctc_prefix_beam_search(
            log_prob, lengths, self.beam_size, self.blank_id, self.blank_skip_threshold
        )
        tokens = np.asarray(tokens)
        counts = np.asarray(counts)
        scores = np.asarray(scores)
        hypos = []
        for i in range(log_prob.shape[0]):
            hypos.append([
                CUCTCHypothesis(
                    tokens=[int(t) for t in tokens[i, j, : counts[i, j]]],
                    words=[self.vocab_list[int(t)] for t in tokens[i, j, : counts[i, j]]],
                    score=float(scores[i, j]),
                )
                for j in range(self.nbest)
            ])
        return hypos


def _get_vocab_list(vocab_file):
    vocab = []
    with open(vocab_file, "r", encoding="utf-8") as f:
        for line in f:
            vocab.append(line.strip().split()[0])
    return vocab


def cuda_ctc_decoder(
    tokens: Union[str, List[str]],
    nbest: int = 1,
    beam_size: int = 10,
    blank_skip_threshold: float = _DEFAULT_BLANK_SKIP_THRESHOLD,
) -> CUCTCDecoder:
    """Build a batched prefix beam-search decoder (cuda_ctc_decoder contract)."""
    if isinstance(tokens, str):
        tokens = _get_vocab_list(tokens)
    return CUCTCDecoder(vocab_list=tokens, beam_size=beam_size, nbest=nbest,
                        blank_skip_threshold=blank_skip_threshold)
