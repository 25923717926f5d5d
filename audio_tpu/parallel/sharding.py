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

__all__ = ["wav2vec2_rules", "shard_wav2vec2_params", "batch_sharding", "replicate", "apply_rules"]


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


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch/stream) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P(*(("dp",) + (None,) * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
