"""CTC forced-alignment Viterbi DP for TPU.

TPU-native equivalent of the reference's native forced_align kernels
(/root/reference/src/libtorchaudio/forced_align/cpu/compute.cpp:18-139,
gpu/compute.cu:26-318).  Differences by design:

* **Batched**: the whole (B, S) state front updates in parallel each frame
  (the reference is batch=1, compute.cpp:172-177); variable input/target
  lengths are handled by freezing finished lanes.
* The reference's start/end band pruning is a scalar-CPU optimization only —
  states outside the band can never reach the final states (transitions
  advance ≤ 2 states/frame), so the unpruned parallel update backtracks to
  the identical path; ties break toward "stay" exactly like the reference's
  strict-inequality chain (compute.cpp:113-124).
* Backpointers are int8 in HBM, as in the reference (cpu alloc at :36).

Complexity O(T·S) work, O(T) depth via ``lax.scan`` over frames.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["viterbi_align"]

_NEG_INF = -1e30  # avoid actual inf so (-inf) - (-inf) never appears


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
    except Exception:
        return False


def _state_labels(targets: jnp.ndarray, blank: int, s: int) -> jnp.ndarray:
    """labels (B, S): blank at even states, targets[i//2] at odd states."""
    i = jnp.arange(s)
    tok = targets[:, jnp.clip(i // 2, 0, targets.shape[1] - 1)]
    return jnp.where(i % 2 == 0, blank, tok)


def viterbi_align(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    blank: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Viterbi forced alignment over the CTC trellis.

    Args:
        log_probs: (B, T, C) log emission probabilities.
        targets: (B, L) target token ids (no blanks).
        input_lengths: (B,) valid frames per sequence (default: T).
        target_lengths: (B,) valid tokens per sequence (default: L).
        blank: blank token id.

    Returns:
        paths: (B, T) aligned token id per frame (blank-padded past length).
        scores: (B, T) log prob of the aligned token per frame (0 past length).
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

    labels = _state_labels(targets, blank, s)  # (B, S)
    state_idx = jnp.arange(s)
    # valid states per sequence: i < 2*target_len + 1
    state_valid = state_idx[None, :] < (2 * target_lengths[:, None] + 1)

    # skip-transition allowed into odd state i (i>=3) when tokens differ
    tok = targets
    same_as_prev = jnp.concatenate(
        [jnp.ones((b, 1), bool), tok[:, 1:] == tok[:, :-1]], axis=1
    )  # (B, L): targets[i] == targets[i-1]
    odd = state_idx % 2 == 1
    can_skip = odd[None, :] & (state_idx[None, :] >= 3) & ~same_as_prev[:, jnp.clip(state_idx // 2, 0, l_max - 1)]
    can_skip = can_skip & state_valid

    # Pallas fast path: whole DP + backtrack in one kernel, VMEM-resident
    # (ops/pallas_viterbi.py).  Falls back to the lax.scan formulation on CPU.
    if _use_pallas():
        from .pallas_viterbi import viterbi_pallas_core

        # per-state emission scores via one-hot matmul — TPU gathers are
        # address-bound while this is trivial MXU work
        v = log_probs.shape[-1]
        onehot_labels = jax.nn.one_hot(labels, v, dtype=log_probs.dtype)  # (B, S, V)
        emits_all = jnp.einsum(
            "btv,bsv->bts", log_probs, onehot_labels, precision="highest"
        )
        s_last = 2 * target_lengths
        paths = viterbi_pallas_core(
            emits_all, can_skip, state_valid, input_lengths, labels, s_last, blank=blank
        )
        scores = jnp.einsum(
            "btv,btv->bt", log_probs, jax.nn.one_hot(paths, v, dtype=log_probs.dtype),
            precision="highest",
        )
        scores = jnp.where(jnp.arange(t_max)[None, :] < input_lengths[:, None], scores, 0.0)
        return paths, scores

    emit0 = jnp.take_along_axis(log_probs[:, 0, :], labels, axis=1)  # (B, S)
    alpha0 = jnp.where(state_idx[None, :] < 2, emit0, _NEG_INF)
    alpha0 = jnp.where(state_valid, alpha0, _NEG_INF)

    def step(alpha, emit_t_and_t):
        emit_t, t = emit_t_and_t
        x0 = alpha
        x1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :-1]
        x2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF)[:, :-2]
        x2 = jnp.where(can_skip, x2, _NEG_INF)
        cand = jnp.stack([x0, x1, x2], axis=0)  # (3, B, S)
        back = jnp.argmax(cand, axis=0).astype(jnp.int8)  # first max wins ties = "stay"
        best = jnp.max(cand, axis=0)
        new_alpha = jnp.where(state_valid, best + emit_t, _NEG_INF)
        active = (t < input_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        back = jnp.where(active, back, jnp.int8(0))
        return new_alpha, back

    emits = jax.vmap(lambda lp: jnp.take_along_axis(lp, labels, axis=1), in_axes=1, out_axes=0)(
        log_probs[:, 1:, :]
    )  # (T-1, B, S)
    ts = jnp.arange(1, t_max)
    alpha_final, backptrs = jax.lax.scan(step, alpha0, (emits, ts))
    backptrs = jnp.concatenate([jnp.zeros((1, b, s), jnp.int8), backptrs], axis=0)  # (T, B, S)

    # final state: argmax over {2*Li, 2*Li-1} at t = Ti-1
    s_last = 2 * target_lengths  # final blank state index
    a_last = jnp.take_along_axis(alpha_final, s_last[:, None], axis=1)[:, 0]
    a_tok = jnp.take_along_axis(alpha_final, jnp.maximum(s_last - 1, 0)[:, None], axis=1)[:, 0]
    ltr0 = jnp.where(a_last > a_tok, s_last, jnp.maximum(s_last - 1, 0))

    def back_step(ltr, bp_t_and_t):
        bp_t, t = bp_t_and_t  # bp_t: (B, S)
        lbl = jnp.take_along_axis(labels, ltr[:, None], axis=1)[:, 0]
        move = jnp.take_along_axis(bp_t, ltr[:, None], axis=1)[:, 0].astype(jnp.int32)
        active = t < input_lengths
        new_ltr = jnp.where(active, ltr - move, ltr)
        out = jnp.where(active, lbl, blank)
        return new_ltr, out

    ts_rev = jnp.arange(t_max - 1, -1, -1)
    _, paths_rev = jax.lax.scan(back_step, ltr0, (backptrs[::-1], ts_rev))
    paths = paths_rev[::-1].T  # (B, T)

    scores = jnp.take_along_axis(log_probs, paths[..., None], axis=2)[..., 0]
    scores = jnp.where(jnp.arange(t_max)[None, :] < input_lengths[:, None], scores, 0.0)
    return paths, scores
