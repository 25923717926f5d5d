"""Trie-constrained pointer-generator (TCPGen) contextual biasing.

Counterpart of the reference's
/root/reference/examples/asr/librispeech_conformer_rnnt_biasing/ recipe
(tree-constrained pointer generator, Sun et al. 2021): a prefix trie over the
biasing list constrains a pointer distribution that is interpolated with the
transducer's output distribution through a learned generation gate.

TPU-first design: the trie is a **dense (n_nodes, vocab) int32 transition
table** (no pointer chasing on device); per-position trie states for the
whole (B, U) target grid come from one `lax.scan`; the pointer distribution,
gate, and interpolation are batched matmuls/elementwise over the (B, T, U, V)
lattice — all jittable, no data-dependent shapes.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ROOT = 0


def build_trie(biasing_list: Sequence[Sequence[int]], vocab_size: int) -> np.ndarray:
    """Dense prefix trie over token sequences.

    Returns ``children`` of shape (n_nodes, vocab_size) int32, where
    ``children[node, tok]`` is the child node id or -1. Node 0 is the root.
    A completed word ends at a leaf; `trie_states` returns to the root when
    the next token has no continuation (word boundary / fall-off).
    """
    children: List[dict] = [dict()]
    for word in biasing_list:
        node = ROOT
        for tok in word:
            tok = int(tok)
            nxt = children[node].get(tok)
            if nxt is None:
                children.append(dict())
                nxt = len(children) - 1
                children[node][tok] = nxt
            node = nxt
    table = np.full((len(children), vocab_size), -1, np.int32)
    for n, edges in enumerate(children):
        for tok, child in edges.items():
            table[n, tok] = child
    return table


def trie_states(children: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Trie node occupied *before* emitting each label position.

    targets: (B, U) label ids (0-padded). Returns (B, U+1) int32 node ids for
    the U+1 predictor positions (SOS + each emitted label). Falling off the
    trie resets to ROOT; a transition that exists is followed.
    """

    def step(node, tok):
        nxt = children[node, tok]
        # off-trie -> try restarting the word at the root, else root
        restart = children[ROOT, tok]
        nxt = jnp.where(nxt >= 0, nxt, jnp.where(restart >= 0, restart, ROOT))
        return nxt, node

    def per_seq(seq):
        final, before = jax.lax.scan(step, jnp.asarray(ROOT, jnp.int32), seq)
        return jnp.concatenate([before, final[None]])[: seq.shape[0] + 1]

    return jax.vmap(per_seq)(targets.astype(jnp.int32))


class TCPGen(nn.Module):
    """Pointer-generator head over the RNN-T joint lattice.

    Combines the transducer distribution ``p_model`` with a trie-masked
    pointer distribution ``p_ptr`` via a per-(b,t,u) generation probability:

        p = (1 - g) * p_model + g * p_ptr

    computed in log space. ``g`` is forced to 0 where the trie offers no
    continuation, so utterances without active biasing are untouched.
    """

    vocab_size: int
    embed_dim: int = 64
    blank: int = 0

    @nn.compact
    def __call__(
        self,
        joint_act: jnp.ndarray,   # (B, T, U, D) pre-logit joiner activation
        model_logp: jnp.ndarray,  # (B, T, U, V) log-softmaxed transducer output
        valid_mask: jnp.ndarray,  # (B, U, V) bool: trie continuation per position
    ) -> jnp.ndarray:
        tok_emb = self.param(
            "tok_emb", nn.initializers.normal(0.02), (self.vocab_size, self.embed_dim)
        )
        query = nn.Dense(self.embed_dim, name="query_proj")(joint_act)
        scores = jnp.einsum("btud,vd->btuv", query, tok_emb) / np.sqrt(self.embed_dim)

        neg_inf = jnp.asarray(-1e30, scores.dtype)
        mask = valid_mask[:, None, :, :]  # broadcast over T
        ptr_logp = jax.nn.log_softmax(jnp.where(mask, scores, neg_inf), axis=-1)

        # pointer context = expected token embedding under p_ptr
        ptr_ctx = jnp.einsum("btuv,vd->btud", jnp.exp(ptr_logp), tok_emb)
        gate_in = jnp.concatenate([query, ptr_ctx], axis=-1)
        g = nn.sigmoid(nn.Dense(1, name="gate")(gate_in))[..., 0]  # (B, T, U)

        has_continuation = mask.any(axis=-1)  # (B, 1, U) -> broadcast
        g = jnp.where(has_continuation, g * 0.999 + 1e-6, 0.0)

        log_g = jnp.log(jnp.clip(g, 1e-8))[..., None]
        log_1mg = jnp.log1p(-jnp.clip(g, None, 1 - 1e-8))[..., None]
        combined = jnp.logaddexp(model_logp + log_1mg,
                                 jnp.where(mask, ptr_logp + log_g, neg_inf))
        # blank never comes from the pointer: keep the model's blank mass
        combined = combined.at[..., self.blank].set(model_logp[..., self.blank] + log_1mg[..., 0])
        # renormalize (blank adjustment breaks exact normalization)
        return jax.nn.log_softmax(combined, axis=-1)


def valid_next_tokens(children: jnp.ndarray, nodes: jnp.ndarray) -> jnp.ndarray:
    """(B, U+1) node ids -> (B, U+1, V) bool mask of trie continuations."""
    return children[nodes] >= 0


def sample_biasing_list(
    targets: np.ndarray,
    target_lengths: np.ndarray,
    rng: np.random.Generator,
    n_distractors: int,
    vocab_size: int,
    max_len: int = 4,
) -> List[List[int]]:
    """Training-time biasing list: random spans from the batch's references
    (the "true" entries, reference recipe's --biasing-list drop scheme) plus
    random distractor token sequences."""
    blist: List[List[int]] = []
    for b in range(targets.shape[0]):
        l = int(target_lengths[b])
        if l >= 2:
            start = int(rng.integers(0, max(1, l - 1)))
            end = min(l, start + int(rng.integers(1, max_len + 1)))
            span = [int(t) for t in targets[b, start:end] if t > 0]
            if span:
                blist.append(span)
    for _ in range(n_distractors):
        length = int(rng.integers(1, max_len + 1))
        blist.append([int(t) for t in rng.integers(1, vocab_size, length)])
    return blist
