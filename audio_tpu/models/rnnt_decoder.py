"""Device-resident RNN-T beam search.

Semantics follow the reference time-synchronous search
(/root/reference/src/torchaudio/models/rnnt_decoder.py:75-339): per frame,
blank extensions merge into the "b" set (logaddexp on identical token
sequences, :140-165), non-blank top-k extensions survive only if they beat
the k-th best b score (:167-199), inner expansion repeats up to
``step_max_tokens``, and b is ranked by length-normalized score per frame.

TPU-native redesign: hypotheses live in fixed-shape arrays with a leading
stream axis S (tokens (S, K, Lmax), scores (S, K), predictor state stacked
on (S, K) axes) and the whole search is one jittable ``lax.scan`` over
frames with a ``while_loop`` inner expansion, natively batched over S — no
host sync per step (the reference syncs ``next_token_probs.cpu()`` every
expansion, rnnt_decoder.py:245) and no vmap (whose while_loop batching rule
would re-select every carry leaf per iteration and scatter arena writes).

Three deliberate deviations (tolerance-level, documented):
* the reference assumes blank == last vocab index when scoring
  (``next_token_probs[:, :-1]``); we keep that assumption;
* the b set uses a fixed capacity of ``beam_width * (step_max_tokens + 1)``
  slots during a frame — the exact maximum the reference's growing list can
  reach — so the frame-end length-normalized ranking sees the same pool;
* hypothesis identity for the logaddexp merge is (count, rolling uint32
  fingerprint) rather than full token-sequence equality: O(1) instead of
  O(Lmax) per candidate pair, with a ~2^-32 same-length collision chance
  (the reference compares Python tuples, rnnt_decoder.py:140-165).
"""

from __future__ import annotations

from functools import partial
from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RNNTBeamSearch", "Hypothesis"]

_NEG_INF = -1.0e30


class Hypothesis(NamedTuple):
    """Beam of hypotheses as arrays (K = beam width)."""

    tokens: jnp.ndarray  # (K, Lmax) int32, -1 padded (emitted tokens, no init blank)
    counts: jnp.ndarray  # (K,) int32 number of emitted tokens; -1 = empty slot
    scores: jnp.ndarray  # (K,) float raw log prob
    pred_out: jnp.ndarray  # (K, 1, D) predictor output for the last token
    pred_state: Any  # pytree with leading axis K
    sig: jnp.ndarray  # (K,) uint32 rolling token-sequence fingerprint
    sig2: jnp.ndarray  # (K,) uint32 second independent fingerprint (~2^-64 jointly)


class _BSet(NamedTuple):
    """Frame-local blank-merged set: 16-byte slots, no tokens/states.

    A b hypothesis is always (some a hypothesis) + blank, and the predictor
    state of a token sequence is a pure function of the sequence — so b only
    needs (count, score, fingerprints) for merging/ranking plus ``ptr``, an
    index into the per-frame arena of a-set snapshots, from which tokens and
    predictor state of the frame's winners are gathered ONCE at frame end.
    The r3 design pooled full predictor state (~12 KB/slot) across
    ``beam*(step_max_tokens+1)`` slots on every inner iteration; that state
    traffic, scaling with streams x capacity, was the S=512 knee
    (docs/performance.md).
    """

    counts: jnp.ndarray  # (C,) int32, -1 = empty
    scores: jnp.ndarray  # (C,) float raw log prob
    sig: jnp.ndarray  # (C,) uint32
    sig2: jnp.ndarray  # (C,) uint32
    ptr: jnp.ndarray  # (C,) int32 flat index (iteration * K + slot) into the arena


class _PendingA(NamedTuple):
    """A selected (not yet predicted) a set: ``_select_a``'s output.

    Identical to :class:`Hypothesis` minus ``pred_out``/``pred_state`` of the
    NEW tokens; instead it carries the selected extension tokens and the
    gathered parent predictor state, from which ``_finish_a`` computes them.
    Splitting selection from prediction lets the inner expansion loop defer
    each iteration's predictor step until the loop has decided to run another
    iteration — the final selection of every frame is dropped either way
    (blank merges only), so one full predictor pass per frame is saved.
    """

    tokens: jnp.ndarray  # (S, K, Lmax) int32 with the new token written
    counts: jnp.ndarray  # (S, K) int32, -1 = dead candidate
    scores: jnp.ndarray  # (S, K) float raw log prob
    token_idx: jnp.ndarray  # (S, K) int32 selected extension token
    base_state: Any  # parent predictor state, gathered to (S, K, ...)
    sig: jnp.ndarray  # (S, K) uint32
    sig2: jnp.ndarray  # (S, K) uint32


# multipliers of the two rolling fingerprints (FNV-1a prime / a second odd
# constant): sig' = sig*P + tok+1.  Two independent uint32 hashes push the
# same-length collision chance to ~2^-64 (uint64 is unavailable without
# enabling x64 globally).
# (numpy scalars, NOT jnp: a module-level jnp constant would initialize the
# XLA backend at import time and break jax.distributed.initialize ordering)
_SIG_PRIME = np.uint32(0x01000193)
_SIG2_PRIME = np.uint32(0x85EBCA6B)


def _take_beam(tree, idx):
    return jax.tree.map(lambda x: jnp.take(x, idx, axis=0), tree)


class RNNTBeamSearch:
    """Beam search decoder for an ``audio_tpu.models.RNNT`` model."""

    def __init__(
        self,
        model,
        params,
        blank: int,
        temperature: float = 1.0,
        step_max_tokens: int = 100,
        max_tokens: int = 256,
        expansion: str = "exact",
    ) -> None:
        """``expansion``: candidate selection over the (K, V-1) pool per
        inner step — "exact" (lax.top_k, default; reference semantics) or
        "approx" (lax.approx_max_k; exact fallback on CPU).

        "approx" is NOT the shipped serving configuration: measured on-chip
        against exact search on identical multi-tick emissions (76.7M
        Emformer-RNNT serving config, tools/verify_tpu_parity.py --only
        approx), its per-step candidate recall is 0.56 and final top-1
        agreement 0.0 — ApproxTopK's binned selection collapses on the
        search's block-contiguous candidate layout (each hypothesis
        contributes V-1 consecutive entries whose top values cluster
        inside one bin).  The knob remains for experimentation and carries
        this measured quality bound."""
        if expansion not in ("exact", "approx"):
            raise ValueError("expansion must be 'exact' or 'approx'")
        self.model = model
        self.params = params
        self.blank = blank
        self.temperature = temperature
        self.step_max_tokens = step_max_tokens
        self.max_tokens = max_tokens
        self.expansion = expansion
        # static_expansion: run exactly step_max_tokens+1 inner iterations as
        # an unrolled scan instead of a while_loop with early exit — result-
        # identical (an empty a-set contributes only no-op merges).  Measured
        # SLOWER on the v5e streaming bench (83 vs 114 streams at smt=4): the
        # while_loop's early exit wins because most frames converge in 2-3
        # iterations even at max-over-256-streams; kept as an option for
        # workloads that always exhaust the budget.
        self.static_expansion = False

    # --- model wrappers (all batched over a leading stream axis S) -------
    def _predict(self, tokens, state):
        """tokens (S, K, 1) -> (pred_out (S, K, 1, D), state (S, K, ...))."""
        s, k = tokens.shape[:2]
        if state is not None and self._can_fast_predict():
            return self._predict_fast(tokens, state)

        def flat(x):
            return x.reshape((s * k,) + x.shape[2:])

        out, _, new_state = self.model.apply(
            self.params, flat(tokens), jnp.ones((s * k,), jnp.int32),
            None if state is None else jax.tree.map(flat, state),
            deterministic=True, method=self.model.predict,
        )

        def unflat(x):
            return x.reshape((s, k) + x.shape[1:])

        return unflat(out), jax.tree.map(unflat, new_state)

    def _can_fast_predict(self) -> bool:
        """Opt-in (AUDIO_TPU_LSTM_KERNEL=1): measured a ~1% END-TO-END LOSS.

        The static part-isolation profile put the predictor at half the
        search tick, but moving its gate chain into a Pallas kernel landed
        at 40.88 vs 40.42 ms/tick (S=512, smt=4): the custom call fences
        XLA's cross-op overlap and pins operand layouts — the same lesson
        as the fused attention kernel at streaming shapes
        (docs/performance.md).  Kept as a knob because the kernel wins in
        isolation and larger predictor configs may tip the balance.
        """
        import os

        from audio_tpu.ops.pallas_lstm import use_lstm_kernel

        pred = getattr(self.model, "predictor", None)
        return (os.environ.get("AUDIO_TPU_LSTM_KERNEL", "0") == "1"
                and use_lstm_kernel() and pred is not None
                and getattr(pred, "lstm_layer_norm", False))

    def _predict_fast(self, tokens, state):
        """One-token predictor step with the LSTM gate chain in a Pallas
        kernel.

        The XLA formulation of the layer-norm LSTM step is ~8 HBM passes
        over (S*K, 4H) intermediates per layer (the two LayerNorm
        reductions fence the elementwise chain into separate fusions) and
        profiled at HALF the search tick; ``lstm_gate_step``
        (ops/pallas_lstm.py) runs recurrent-matmul + gate LN + gates +
        cell LN in one VMEM pass.  Semantics: ``_Predictor``/_CustomLSTM
        (models/rnnt.py), which replicate the reference
        (/root/reference/src/torchaudio/models/rnnt.py:11-136).
        """
        from audio_tpu.ops.pallas_lstm import _ln, lstm_gate_step

        s, k = tokens.shape[:2]
        n = s * k
        p = self.params["params"]["predictor"]
        pred = self.model.predictor
        # asarray: imported checkpoints hold numpy leaves, which cannot be
        # indexed by a traced token array
        x = jnp.asarray(p["embedding"]["embedding"])[tokens.reshape(n)]  # (N, E)
        x = _ln(x.astype(jnp.float32), p["input_layer_norm"]["scale"],
                p["input_layer_norm"]["bias"], 1e-5).astype(x.dtype)
        flat = lambda t: t.reshape((n,) + t.shape[2:])  # noqa: E731
        state_flat = jax.tree.map(flat, state)
        new_state = []
        for i in range(pred.num_lstm_layers):
            lp = p[f"lstm_layers_{i}"]
            gx = jnp.dot(x, lp["x2g"]["kernel"])  # hoisted input matmul
            h, c = state_flat[i]
            h, c = lstm_gate_step(
                gx, h, c, lp["p2g"]["kernel"],
                lp["g_norm"]["scale"], lp["g_norm"]["bias"],
                lp["c_norm"]["scale"], lp["c_norm"]["bias"],
                pred.lstm_layer_norm_epsilon)
            x = h
            new_state.append((h, c))
        out = jnp.dot(x, p["linear"]["kernel"]) + p["linear"]["bias"]
        out = _ln(out.astype(jnp.float32), p["output_layer_norm"]["scale"],
                  p["output_layer_norm"]["bias"], 1e-5).astype(x.dtype)
        unflat = lambda t: t.reshape((s, k) + t.shape[1:])  # noqa: E731
        return unflat(out)[:, :, None, :], jax.tree.map(unflat, new_state)

    def _join(self, enc_t, pred_out):
        """enc_t (S, D), pred_out (S, K, 1, D) -> raw join logits (S, K, V).

        Returned in the MODEL dtype (bf16 under bf16 serving params): the
        joiner matmul already ran on the MXU in that dtype, so an f32 cast
        here adds no information — it only doubles the (S, K, V) tensor's
        HBM footprint for every downstream pass.  All score MATH still
        happens in f32: ``_lse_blank`` reduces in f32 and the candidate
        build promotes (see ``_expand_a``).  The caller normalizes lazily
        with one fused logsumexp instead of materializing a full (S, K, V)
        log_softmax (log p = raw - lse; candidate ranking uses
        (score - lse) + raw, bit-identical math, ~2 fewer tensor passes).
        """
        s, k = pred_out.shape[:2]
        d = enc_t.shape[-1]
        src = jnp.broadcast_to(enc_t[:, None, None, :], (s, k, 1, d)).reshape(s * k, 1, d)
        joined, _, _ = self.model.apply(
            self.params, src, jnp.ones((s * k,), jnp.int32),
            pred_out.reshape(s * k, 1, d), jnp.ones((s * k,), jnp.int32),
            method=self.model.join,
        )
        return joined[:, 0, 0].reshape(s, k, -1)

    def _lse_blank(self, raw):
        """f32 (logsumexp, blank logit) of the temperature-scaled join.

        On TPU (temperature 1, f32/bf16) this is ONE fused Pallas pass over
        the (S, K, V) logits (ops/pallas_rnnt_lps.py) — issued as XLA ops,
        the logsumexp materializes an f32 copy of the logits and the blank
        read is a strided one-element-per-row column load (the same
        pathology measured on the training losses, docs/performance.md).
        """
        from audio_tpu.ops.pallas_rnnt_lps import (
            lattice_row_stats,
            use_row_stats_kernel,
        )

        v = raw.shape[-1]
        if (self.temperature == 1.0 and raw.dtype in (jnp.float32, jnp.bfloat16)
                and use_row_stats_kernel()):
            lse, blank_raw, _ = lattice_row_stats(
                raw, jnp.zeros(raw.shape[:-1], jnp.int32), v - 1)
            return lse, blank_raw
        rawf = raw.astype(jnp.float32) / self.temperature
        return jax.nn.logsumexp(rawf, axis=-1), rawf[..., -1]

    def _row_stats(self, raw, beam_width: int):
        """(lse, blank_raw, per-row top-k) of the join in ONE lattice read.

        On TPU the fused kernel additionally emits each (stream, hypothesis)
        row's ``beam_width`` best non-blank logits — the only entries the
        global candidate selection can ever pick (two-stage top-k is exact:
        at most ``beam_width`` global winners come from any one row) — so
        ``_select_a`` never materializes the (S, K*(V-1)) candidate pool nor
        runs XLA TopK over it (measured ~6 GB/s effective).  Elsewhere
        returns ``topk=None`` and the caller takes the pooled-top_k path.
        """
        from audio_tpu.ops.pallas_rnnt_lps import (
            row_stats_topk,
            use_row_stats_kernel,
        )

        v = raw.shape[-1]
        if (self.temperature == 1.0 and raw.dtype in (jnp.float32, jnp.bfloat16)
                and use_row_stats_kernel()):
            lse, blank_raw, vals, idx = row_stats_topk(raw, v - 1, beam_width)
            return lse, blank_raw, (vals, idx)
        lse, blank_raw = self._lse_blank(raw)
        return lse, blank_raw, None

    def _can_fuse_join(self) -> bool:
        from audio_tpu.ops.pallas_rnnt_lps import use_row_stats_kernel

        return (self.temperature == 1.0 and self.expansion != "approx"
                and use_row_stats_kernel()
                and getattr(self.model.joiner, "activation", None) == "relu")

    def _join_stats(self, enc_t, pred_out, beam_width: int):
        """(lse, blank_raw, (vals, idx)) of the join WITHOUT the logits.

        The (S, K, V) join logits exist only to be reduced to per-row
        statistics, so the TPU path computes the joiner output matmul on
        the MXU *inside* the stats kernel (``join_stats_topk``): per inner
        iteration the HBM traffic drops from write+read of the logits
        lattice to one read of the (S*K, D) activations, with the (D, V)
        weight VMEM-resident across row blocks.  The activation
        ``relu(src + tgt)`` is the reference joiner's
        (/root/reference/src/torchaudio/models/rnnt.py ``_Joiner``),
        computed here directly from the encoder frame and predictor output.
        """
        from audio_tpu.ops.pallas_rnnt_lps import join_stats_topk

        jp = self.params["params"]["joiner"]["linear"]
        act = jax.nn.relu(enc_t[:, None, :] + pred_out[:, :, 0, :])  # (S, K, D)
        lse, blank_raw, vals, idx = join_stats_topk(
            act, jp["kernel"], jp["bias"], jp["kernel"].shape[1] - 1,
            beam_width)
        return lse, blank_raw, (vals, idx)

    # --- beam primitives ------------------------------------------------
    def _init_beam(self, beam_width: int) -> Hypothesis:
        """Single-stream beam (K-leading; the search adds the S axis)."""
        tok = jnp.full((1, 1, 1), self.blank, jnp.int32)
        pred_out, state = self._predict(tok, None)
        pred_out, state = jax.tree.map(lambda x: x[0], (pred_out, state))
        k = beam_width

        def expand(x):
            return jnp.concatenate([x, jnp.zeros((k - 1,) + x.shape[1:], x.dtype)], axis=0)

        tokens = jnp.full((k, self.max_tokens), -1, jnp.int32)
        counts = jnp.full((k,), -1, jnp.int32).at[0].set(0)
        scores = jnp.full((k,), _NEG_INF).at[0].set(0.0)
        pred_out = expand(pred_out)
        state = jax.tree.map(expand, state)
        sig = jnp.zeros((k,), jnp.uint32)
        return Hypothesis(tokens, counts, scores, pred_out, state, sig, sig)

    def _merge_blank_into_b(self, b: _BSet, a: Hypothesis, blank_scores: jnp.ndarray,
                            iter_idx: jnp.ndarray) -> _BSet:
        """logaddexp-merge a's blank extensions into the slim b set (batched).

        Sequence identity is (count, two rolling uint32 fingerprints) instead
        of an elementwise (Ka, Kb, Lmax) token comparison — O(Ka*Kb) work per
        inner step rather than O(Ka*Kb*Lmax); a false merge needs a same-
        length double collision (~2^-64 per candidate pair).

        The b set is BLOCK-PARTITIONED by iteration: slots
        ``[iter_idx*Ka, (iter_idx+1)*Ka)`` belong to this iteration, so
        unmatched candidates are written there with one
        ``dynamic_update_slice`` and no compaction is ever needed — capacity
        ``beam*(step_max_tokens+1)`` holds every iteration's Ka candidates by
        construction.  (The previous design concatenated candidates onto the
        pool and re-sorted with ``lax.top_k(k=capacity)`` every inner
        iteration; that top_k alone was ~36% of the search tick — top_k cost
        scales with rows x k, and k was 50.)  New sequences enter with
        ``ptr = iter_idx * Ka + slot`` pointing at the a-set arena snapshot;
        merged entries keep their ptr (same token sequence ==> same
        predictor state, so either source is valid).  Slots are NOT kept
        sorted; consumers take an explicit top_k of what they need.
        """
        n_s, ka = a.counts.shape
        matches = (
            (a.counts[:, :, None] == b.counts[:, None, :])
            & (a.sig[:, :, None] == b.sig[:, None, :])
            & (a.sig2[:, :, None] == b.sig2[:, None, :])
            & (a.counts[:, :, None] >= 0) & (b.counts[:, None, :] >= 0)
        )  # (S, Ka, Kb)
        contrib = jnp.where(matches, blank_scores[:, :, None], _NEG_INF)
        merged_scores = jnp.logaddexp(b.scores, jax.nn.logsumexp(contrib, axis=1))

        unmatched = (~matches.any(axis=2)) & (a.counts >= 0) & (blank_scores > _NEG_INF / 2)
        blk_counts = jnp.where(unmatched, a.counts, -1)
        blk_scores = jnp.where(unmatched, blank_scores, _NEG_INF)
        blk_ptr = jnp.broadcast_to(
            iter_idx * ka + jnp.arange(ka, dtype=jnp.int32), (n_s, ka)
        )
        start = iter_idx * ka
        upd = lambda arr, blk: jax.lax.dynamic_update_slice(  # noqa: E731
            arr, blk.astype(arr.dtype), (jnp.int32(0), start))
        return _BSet(
            upd(b.counts, blk_counts),
            upd(merged_scores, blk_scores),
            upd(b.sig, a.sig),
            upd(b.sig2, a.sig2),
            upd(b.ptr, blk_ptr),
        )

    def _select_a(self, a: Hypothesis, raw, lse, b_kth_score, beam_width: int,
                  topk=None) -> "_PendingA":
        """Non-blank top-k extensions that beat the k-th best b score (batched).

        ``raw``/``lse``: unnormalized join logits and their logsumexp; the
        candidate score is score + log p = (score - lse) + raw, fused into
        the one tensor write that feeds top_k (blank assumed last, as the
        reference scores).

        Returns a ``_PendingA`` — the selected candidates WITHOUT their
        predictor step.  ``_finish_a`` runs the predictor; the search calls
        it at the TOP of the next inner iteration, so the exit iteration's
        selection (whose extensions the reference also drops,
        rnnt_decoder.py:226-265) never pays the LSTM stack.
        """
        n_s = a.counts.shape[0]
        base = jnp.where(a.counts >= 0, a.scores - lse, _NEG_INF)
        if topk is not None:
            # the fused kernel already reduced each row to its beam_width
            # best non-blank logits (f32): rank base + vals over the tiny
            # (S, K*beam_width) pool — exact, same lowest-index tie order
            vals, idx = topk
            cand = base[:, :, None] + vals  # (S, K, beam_width) f32
            flat_scores, pos = jax.lax.top_k(cand.reshape(n_s, -1), beam_width)
            hypo_idx = pos // vals.shape[2]  # (S, K)
            token_idx = jnp.take_along_axis(
                idx.reshape(n_s, -1), pos, axis=1)
        else:
            # raw arrives in the model dtype; candidate math promotes to f32
            # (the f32 division by temperature folds away at the default 1.0)
            nonblank = raw[:, :, :-1].astype(jnp.float32) / self.temperature
            cand = base[:, :, None] + nonblank
            # one flat top_k over the pooled (K*(V-1)) candidates per stream —
            # measured FASTER than the "exact two-stage" per-slot variant on
            # TPU as XLA ops (88 -> 40 streams/chip at S=256): lax.top_k's
            # cost scales with rows x k, so (S*K) rows each selecting k=10 do
            # ~K times the work.  (The TPU production path instead gets the
            # per-row top-k from the Pallas lattice read — see ``_row_stats``.)
            if self.expansion == "approx":
                flat_scores, flat_idx = jax.lax.approx_max_k(
                    cand.reshape(n_s, -1), beam_width, recall_target=0.95)
            else:
                flat_scores, flat_idx = jax.lax.top_k(cand.reshape(n_s, -1), beam_width)
            hypo_idx = flat_idx // nonblank.shape[2]  # (S, K)
            token_idx = flat_idx % nonblank.shape[2]
        keep = flat_scores > b_kth_score[:, None]

        def take_k(x):
            # size-1 trailing index dims (no broadcast_to): XLA then lowers a
            # SLICE gather (contiguous rows) instead of an elementwise gather
            idx = hypo_idx.reshape(hypo_idx.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, idx, axis=1)

        base_tokens = take_k(a.tokens)  # (S, K, Lmax)
        base_counts = jnp.take_along_axis(a.counts, hypo_idx, axis=1)
        pos = jnp.clip(base_counts, 0, self.max_tokens - 1)
        # masked write instead of a scatter: one elementwise pass over (S,K,L)
        l_idx = jnp.arange(self.max_tokens)
        new_tokens = jnp.where(
            l_idx[None, None, :] == pos[:, :, None],
            token_idx[:, :, None].astype(jnp.int32), base_tokens,
        )
        new_counts = jnp.where(keep, base_counts + 1, -1)
        new_scores = jnp.where(keep, flat_scores, _NEG_INF)
        tok_u32 = token_idx.astype(jnp.uint32) + jnp.uint32(1)
        new_sig = jnp.take_along_axis(a.sig, hypo_idx, axis=1) * _SIG_PRIME + tok_u32
        new_sig2 = jnp.take_along_axis(a.sig2, hypo_idx, axis=1) * _SIG2_PRIME + tok_u32

        base_state = jax.tree.map(take_k, a.pred_state)
        return _PendingA(new_tokens, new_counts, new_scores,
                         token_idx.astype(jnp.int32), base_state, new_sig, new_sig2)

    def _finish_a(self, pend: "_PendingA") -> Hypothesis:
        """Run the deferred predictor step on a selection's candidates."""
        pred_out, new_state = self._predict(pend.token_idx[:, :, None], pend.base_state)
        return Hypothesis(pend.tokens, pend.counts, pend.scores, pred_out,
                          new_state, pend.sig, pend.sig2)

    @staticmethod
    def _empty_bset(n_streams: int, capacity: int) -> _BSet:
        return _BSet(
            jnp.full((n_streams, capacity), -1, jnp.int32),
            jnp.full((n_streams, capacity), _NEG_INF),
            jnp.zeros((n_streams, capacity), jnp.uint32),
            jnp.zeros((n_streams, capacity), jnp.uint32),
            jnp.zeros((n_streams, capacity), jnp.int32),
        )

    def _search(
        self,
        enc_out: jnp.ndarray,
        init: Hypothesis,
        beam_width: int,
        n_valid: Optional[jnp.ndarray] = None,
    ) -> Hypothesis:
        """enc_out (S, T, D), init with leading S; returns the final beams.

        NATIVELY batched over streams — deliberately not ``vmap`` of a
        single-stream search: under vmap the ``while_loop`` batching rule
        makes the iteration counter per-lane (so arena writes lower to
        scatters) and re-selects EVERY carry leaf per iteration.  Here the
        counter is a scalar (arena writes are slice updates), the loop exits
        when every stream's a-set is empty (same trip count vmap would run),
        and per-stream early exit needs no masking at all: an empty a-set
        contributes only -inf candidates and no-op merges.

        ``n_valid`` (S,) freezes each stream's beam after that many frames —
        the static-shape analogue of truncating ``enc_out`` to its valid
        length when streams are padded to a common T.
        """
        n_s = enc_out.shape[0]
        b_capacity = beam_width * (self.step_max_tokens + 1)
        n_iters = self.step_max_tokens + 1

        # Arena of per-iteration a-set snapshots along axis 1, allocated ONCE
        # for the whole search and threaded through the frame scan: rows are
        # rewritten each frame and stale rows are never referenced (b-set
        # ptrs only index iterations written this frame), so no per-frame
        # zeroing.  The b set is slim (scores/counts/fingerprints/ptr only);
        # tokens and predictor state of the frame's winning K hypotheses are
        # gathered from here ONCE at frame end instead of pooling
        # ~12 KB/slot of LSTM state across b_capacity slots on every inner
        # iteration (the r3 design's dominant memory traffic).
        # arena axis order: stream-major (S, I, K, ...).  An iteration-MAJOR
        # layout (contiguous per-iteration write slabs, one frame-end
        # transpose) measured ~1% SLOWER end-to-end (40.91 vs 40.42 ms/tick,
        # S=512 smt=4) despite the static profile charging 10.6 ms to the
        # strided axis-1 writes — XLA already overlaps them in the early-
        # exit loop, and the transpose is pure added traffic.
        arena_tokens0 = jnp.zeros(
            init.tokens.shape[:1] + (n_iters,) + init.tokens.shape[1:], init.tokens.dtype)
        arena_out0 = jnp.zeros(
            init.pred_out.shape[:1] + (n_iters,) + init.pred_out.shape[1:], init.pred_out.dtype)
        arena_state0 = jax.tree.map(
            lambda x: jnp.zeros(x.shape[:1] + (n_iters,) + x.shape[1:], x.dtype),
            init.pred_state,
        )

        def _step(carry, enc_t: jnp.ndarray):
            b, arena_tokens, arena_out, arena_state = carry

            def iter_core(i, a: Hypothesis, bs, at, ao, ast):
                """One inner iteration on a FINISHED a set: arena snapshot,
                join, blank merge, candidate selection.  The selected
                candidates' predictor step is deferred to ``_finish_a`` at
                the top of the NEXT iteration — the exit iteration's
                selection is dropped either way (the reference also keeps
                only its blank merges, rnnt_decoder.py:226-265), so the
                deferral saves one full predictor pass per frame."""
                upd = lambda arr, x: jax.lax.dynamic_update_index_in_dim(arr, x, i, 1)  # noqa: E731
                at = upd(at, a.tokens)
                ao = upd(ao, a.pred_out)
                ast = jax.tree.map(upd, ast, a.pred_state)
                if self._can_fuse_join():
                    # joiner matmul + lse + blank + per-row top-k in ONE
                    # kernel — the (S, K, V) logits never touch HBM
                    raw = None
                    lse, blank_raw, topk = self._join_stats(
                        enc_t, a.pred_out, beam_width)
                else:
                    raw = self._join(enc_t, a.pred_out)  # (S, K, V) model dtype
                    if self.expansion == "approx":
                        lse, blank_raw, topk = *self._lse_blank(raw), None
                    else:
                        # one fused lattice read: lse + blank + per-row top-k
                        lse, blank_raw, topk = self._row_stats(raw, beam_width)
                blank_scores = jnp.where(
                    a.counts >= 0, a.scores + blank_raw - lse, _NEG_INF)
                bs = self._merge_blank_into_b(bs, a, blank_scores, i)
                # reference: candidates must beat the beam_width-th best RAW
                # b score; -inf while fewer than beam_width b hypos exist.
                # b slots are unsorted (block-partitioned by iteration), so
                # take an explicit k=beam_width top_k — much cheaper than the
                # old k=capacity compaction sort.
                n_alive_b = jnp.sum(bs.counts >= 0, axis=1)
                top_b, _ = jax.lax.top_k(bs.scores, beam_width)
                kth = jnp.where(n_alive_b >= beam_width, top_b[:, -1], _NEG_INF)
                pend = self._select_a(a, raw, lse, kth, beam_width, topk=topk)
                return pend, bs, at, ao, ast

            # iteration 0 peeled: a = b arrives with a valid pred_out/state
            # from the previous frame, so no predictor run is needed (and the
            # reference's loop always enters at least once — b is non-empty)
            pend, bs, at, ao, ast = iter_core(
                jnp.int32(0), b, self._empty_bset(n_s, b_capacity),
                arena_tokens, arena_out, arena_state)

            def inner_cond(carry):
                i, pend, bs, at, ao, ast = carry
                # reference loops while the a set is non-empty (with the
                # step_max_tokens safety bound); an empty a contributes only
                # no-op merges, so early exit is result-identical
                return (i <= self.step_max_tokens) & jnp.any(pend.counts >= 0)

            def inner(carry):
                i, pend, bs, at, ao, ast = carry
                a = self._finish_a(pend)  # deferred predictor step
                pend, bs, at, ao, ast = iter_core(i, a, bs, at, ao, ast)
                return i + 1, pend, bs, at, ao, ast

            carry0 = (jnp.int32(1), pend, bs, at, ao, ast)
            if self.static_expansion:
                def inner_scan(carry, _):
                    return inner(carry), None
                (_, pend, bs, at, ao, ast), _ = jax.lax.scan(
                    inner_scan, carry0, None, length=n_iters - 1)
            else:
                _, pend, bs, at, ao, ast = jax.lax.while_loop(inner_cond, inner, carry0)
            arenas = (at, ao, ast)
            # rank by length-normalized score: tokens include the init blank in
            # the reference, so len(tokens)+1 == emitted + 2
            norm = jnp.where(bs.counts >= 0, bs.scores / (bs.counts + 2.0), _NEG_INF)
            _, order = jax.lax.top_k(norm, beam_width)
            take = lambda x: jnp.take_along_axis(x, order, axis=1)  # noqa: E731
            ptr = take(bs.ptr)  # (S, K) flat (iteration * K + slot)

            def from_arena(arr):
                flat = arr.reshape(arr.shape[:1] + (-1,) + arr.shape[3:])
                idx = ptr.reshape(ptr.shape + (1,) * (flat.ndim - 2))
                return jnp.take_along_axis(flat, idx, axis=1)  # slice gather

            beam = Hypothesis(
                from_arena(at),
                take(bs.counts),
                take(bs.scores),
                from_arena(ao),
                jax.tree.map(from_arena, ast),
                take(bs.sig),
                take(bs.sig2),
            )
            return beam, arenas

        frames = jnp.moveaxis(enc_out, 1, 0)  # (T, S, D)
        carry0 = (init, arena_tokens0, arena_out0, arena_state0)
        if n_valid is None:
            def time_step(carry, enc_t):
                beam, arenas = _step(carry, enc_t)
                return (beam,) + arenas, None

            (final, *_), _ = jax.lax.scan(time_step, carry0, frames)
        else:
            def time_step(carry, xs):
                enc_t, t = xs
                beam, arenas = _step(carry, enc_t)
                keep = t < n_valid  # (S,)
                beam = jax.tree.map(
                    lambda new, old: jnp.where(
                        keep.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
                    ), beam, carry[0]
                )
                return (beam,) + arenas, None

            (final, *_), _ = jax.lax.scan(
                time_step, carry0, (frames, jnp.arange(frames.shape[0]))
            )
        return final

    # --- public API -----------------------------------------------------
    def forward(self, input: jnp.ndarray, length: jnp.ndarray, beam_width: int) -> Hypothesis:
        """Offline search. input (T, D) or (1, T, D); returns the final beam."""
        if input.ndim == 2:
            input = input[None]
        if jnp.ndim(length) == 0:
            length = length[None]
        enc_out, _ = self.model.apply(
            self.params, input, length, deterministic=True, method=self.model.transcribe
        )
        init = jax.tree.map(lambda x: x[None], self._init_beam(beam_width))
        final = self._search(enc_out[:1], init, beam_width)
        return jax.tree.map(lambda x: x[0], final)

    def infer(
        self,
        input: jnp.ndarray,
        length: jnp.ndarray,
        beam_width: int,
        state=None,
        hypothesis: Optional[Hypothesis] = None,
    ) -> Tuple[Hypothesis, Any]:
        """Streaming search step; carries transcriber state + beam."""
        if input.ndim == 2:
            input = input[None]
        if jnp.ndim(length) == 0:
            length = length[None]
        enc_out, _, state = self.model.apply(
            self.params, input, length, state, deterministic=True, method=self.model.transcribe_streaming
        )
        hypo = self._init_beam(beam_width) if hypothesis is None else hypothesis
        final = self._search(enc_out[:1], jax.tree.map(lambda x: x[None], hypo), beam_width)
        return jax.tree.map(lambda x: x[0], final), state

    # --- batched-stream API ---------------------------------------------
    def init_beams(self, beam_width: int, n_streams: int) -> Hypothesis:
        """An initial beam per stream: every leaf gains a leading S axis."""
        one = self._init_beam(beam_width)
        return jax.tree.map(lambda x: jnp.broadcast_to(x[None], (n_streams,) + x.shape).copy(), one)

    def forward_batch(self, input: jnp.ndarray, lengths: jnp.ndarray, beam_width: int) -> Hypothesis:
        """Offline search over a batch. input (S, T, D) padded to a common T;
        ``lengths`` gives each stream's valid frames and the beam freezes at
        each stream's encoder output length, so ragged batches decode exactly
        like per-stream ``forward`` on the unpadded inputs.

        The reference decoder is architecturally single-utterance — its
        ``forward`` asserts a batch of one and expands hypotheses in a
        Python list with a ``.cpu()`` sync per step
        (/root/reference/src/torchaudio/models/rnnt_decoder.py:226-265,330).
        Here the search itself is natively batched (see :meth:`_search`):
        every join becomes an (S, K, V) batched matmul on the MXU, and
        per-stream convergence needs no masking, so results are identical
        to S independent ``forward`` calls.
        """
        enc_out, enc_lens = self.model.apply(
            self.params, input, lengths, deterministic=True, method=self.model.transcribe
        )
        init = self.init_beams(beam_width, input.shape[0])
        return self._search(enc_out, init, beam_width, n_valid=enc_lens)

    def infer_batch(
        self,
        input: jnp.ndarray,
        lengths: jnp.ndarray,
        beam_width: int,
        state=None,
        hypotheses: Optional[Hypothesis] = None,
    ) -> Tuple[Hypothesis, Any]:
        """Streaming search step for S concurrent streams in ONE program.

        input (S, T, D); ``hypotheses``/returned beams carry a leading
        stream axis (see :meth:`init_beams`); ``state`` is the batched
        transcriber state (the streaming encoder is natively batched).
        Serving N live streams means calling this once per segment interval
        with all N segments stacked — the chip sees one big program instead
        of N serial beam searches.
        """
        enc_out, enc_lens, state = self.model.apply(
            self.params, input, lengths, state, deterministic=True,
            method=self.model.transcribe_streaming,
        )
        if hypotheses is None:
            hypotheses = self.init_beams(beam_width, input.shape[0])
        final = self._search(enc_out, hypotheses, beam_width, n_valid=enc_lens)
        return final, state

    @staticmethod
    def hypo_tokens(hypo: Hypothesis, i: int = 0) -> List[int]:
        """Extract the i-th hypothesis' emitted tokens as a python list."""
        n = int(hypo.counts[i])
        return [int(t) for t in np.asarray(hypo.tokens[i, : max(n, 0)])]


def rnnt_greedy_decode(
    model,
    params,
    sources: jnp.ndarray,
    source_lengths: jnp.ndarray,
    blank: int,
    max_tokens: int = 256,
    max_symbols_per_step: int = 10,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched greedy (argmax) transducer decoding, fully on-device.

    The reference has no batched decode path — ``RNNTBeamSearch._search``
    expands hypotheses in Python with a ``.cpu()`` sync per step
    (/root/reference/src/torchaudio/models/rnnt_decoder.py:226-265). Here the
    whole batch decodes in one jitted program: ``lax.scan`` over frames with
    a bounded ``fori_loop`` of ``max_symbols_per_step`` inner expansions per
    frame; rows that emit blank are masked out of the predictor update.

    Args:
        sources: (B, T, input_dim) features; source_lengths (B,).

    Returns:
        (tokens, counts): (B, max_tokens) int32 padded with -1, and (B,)
        number of emitted tokens per sequence.
    """
    enc_out, enc_lens = model.apply(
        params, sources, source_lengths, deterministic=True, method=model.transcribe
    )
    b = enc_out.shape[0]
    ones = jnp.ones((b,), jnp.int32)

    def predict(tokens, state):
        out, _, new_state = model.apply(
            params, tokens, ones, state, deterministic=True, method=model.predict
        )
        return out, new_state

    def join(enc_t, pred_out):
        joined, _, _ = model.apply(
            params, enc_t[:, None, :], ones, pred_out, ones, method=model.join
        )
        return jax.nn.log_softmax(joined[:, 0, 0] / temperature, axis=-1)

    pred_out0, state0 = predict(jnp.full((b, 1), blank, jnp.int32), None)
    tokens0 = jnp.full((b, max_tokens), -1, jnp.int32)
    counts0 = jnp.zeros((b,), jnp.int32)
    rows = jnp.arange(b)

    def frame_step(carry, inputs):
        enc_t, t = inputs
        pred_out, state, tokens, counts = carry
        active_frame = t < enc_lens

        def expand(i, inner):
            pred_out, state, tokens, counts, still = inner
            logp = join(enc_t, pred_out)
            tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            emit = still & (tok != blank) & (counts < max_tokens) & active_frame
            idx = jnp.clip(counts, 0, max_tokens - 1)
            cur = tokens[rows, idx]
            tokens = tokens.at[rows, idx].set(jnp.where(emit, tok, cur))
            counts = counts + emit.astype(jnp.int32)
            new_pred_out, new_state = predict(tok[:, None], state)

            def keep(new, old):
                mask = emit.reshape((b,) + (1,) * (new.ndim - 1))
                return jnp.where(mask, new, old)

            pred_out = keep(new_pred_out, pred_out)
            state = jax.tree.map(keep, new_state, state)
            return pred_out, state, tokens, counts, emit

        pred_out, state, tokens, counts, _ = jax.lax.fori_loop(
            0, max_symbols_per_step, expand,
            (pred_out, state, tokens, counts, jnp.ones((b,), bool)),
        )
        return (pred_out, state, tokens, counts), None

    t_idx = jnp.arange(enc_out.shape[1])
    (pred_out, state, tokens, counts), _ = jax.lax.scan(
        frame_step, (pred_out0, state0, tokens0, counts0),
        (jnp.swapaxes(enc_out, 0, 1), t_idx),
    )
    return tokens, counts
