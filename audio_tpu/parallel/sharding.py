"""Named sharding rules for the model zoo.

Regex path → PartitionSpec rules, applied to flax param pytrees.  For
wav2vec2/HuBERT encoders:

* attention q/k/v kernels shard the head (output) dim over ``tp``;
  out_proj shards the input dim (row-parallel) so the pair needs a single
  psum that XLA inserts at the residual add;
* feed-forward intermediate_dense shards hidden-out, output_dense shards
  hidden-in (Megatron layout);
* everything else (norms, convs, biases of row-parallel layers) replicated;
* batch/stream inputs shard over ``dp``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "wav2vec2_rules",
    "rnnt_rules",
    "shard_wav2vec2_params",
    "shard_rnnt_params",
    "lattice_spec",
    "batch_sharding",
    "replicate",
    "apply_rules",
]


def wav2vec2_rules() -> Sequence[Tuple[str, P]]:
    return (
        (r".*attention/(q_proj|k_proj|v_proj)/kernel", P(None, "tp")),
        (r".*attention/(q_proj|k_proj|v_proj)/bias", P("tp")),
        (r".*attention/out_proj/kernel", P("tp", None)),
        (r".*feed_forward/intermediate_dense/kernel", P(None, "tp")),
        (r".*feed_forward/intermediate_dense/bias", P("tp")),
        (r".*feed_forward/output_dense/kernel", P("tp", None)),
        (r".*", P()),  # replicate the rest
    )


def rnnt_rules() -> Sequence[Tuple[str, P]]:
    """Sharding rules for the Emformer RNN-T (models/rnnt.py).

    Transcriber Emformer layers get the Megatron layout (column-parallel
    q/kv + ffn-in, row-parallel out_proj + ffn-out → one psum per residual
    add).  ``emb_to_key_value`` fuses K|V along the output dim, so at tp=2
    the split is K-parallel/V-parallel rather than head-parallel — still a
    single-collective layout.  The joiner kernel (D, V) is column-parallel
    over the vocab, which shards the memory-critical (B, T, U, V) lattice
    (SURVEY §2.3) over tp; constrain the lattice itself with
    ``lattice_spec()`` inside the train step.  The predictor LSTM stays
    replicated: a tp-sharded hidden state would force per-timestep
    collectives inside the scan.
    """
    return (
        (r".*transcriber/transformer/.*attention/(emb_to_query|emb_to_key_value)/kernel", P(None, "tp")),
        (r".*transcriber/transformer/.*attention/(emb_to_query|emb_to_key_value)/bias", P("tp")),
        (r".*transcriber/transformer/.*attention/out_proj/kernel", P("tp", None)),
        (r".*transcriber/transformer/.*pos_ff_1/kernel", P(None, "tp")),
        (r".*transcriber/transformer/.*pos_ff_1/bias", P("tp")),
        (r".*transcriber/transformer/.*pos_ff_2/kernel", P("tp", None)),
        (r".*joiner/linear/kernel", P(None, "tp")),
        (r".*joiner/linear/bias", P("tp")),
        (r".*", P()),  # replicate the rest (norms, convs, predictor LSTM)
    )


def lattice_spec() -> P:
    """PartitionSpec for the RNN-T joiner lattice (B, T, U, V): batch over
    dp, vocab over tp.  Apply with ``jax.lax.with_sharding_constraint`` on
    the joiner output inside a mesh-aware train step so the (B,T,U,V)
    tensor — the workload's memory hot spot (reference joiner:
    /root/reference/src/torchaudio/models/rnnt.py:392-452) — never
    materializes unsharded."""
    return P("dp", None, None, "tp")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def apply_rules(params, mesh: Mesh, rules: Sequence[Tuple[str, P]]):
    """Return a pytree of NamedShardings matching ``params``' structure."""

    def assign(path, leaf):
        s = _path_str(path)
        for pattern, spec in rules:
            if re.fullmatch(pattern, s):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_wav2vec2_params(params, mesh: Mesh):
    """Shardings pytree for a Wav2Vec2Model param tree."""
    return apply_rules(params, mesh, wav2vec2_rules())


def shard_rnnt_params(params, mesh: Mesh):
    """Shardings pytree for an RNNT param tree."""
    return apply_rules(params, mesh, rnnt_rules())


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch/stream) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P(*(("dp",) + (None,) * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
