"""Sharded streaming beam search — BASELINE config 5's multi-chip decode.

The reference decode loop is architecturally single-utterance and host-bound
(/root/reference/src/torchaudio/models/rnnt_decoder.py:226-265: Python hypo
lists, a ``.cpu()`` sync per expansion).  Here the natively-batched search
(:class:`audio_tpu.models.rnnt_decoder.RNNTBeamSearch.infer_batch`) has a
leading stream axis on every tensor, so scaling beyond one chip is pure data
parallelism: place the stream axis of the inputs, the beam pytree, and the
encoder state on the ``dp`` mesh axis and jit the same tick — XLA partitions
the whole program with zero per-stream collectives (the one global reduction
is the inner ``while_loop``'s "any stream still expanding" predicate, a
scalar ``or`` across devices, semantically identical to the single-device
max trip count).

Helpers here only *place* arrays; the search code is unchanged — sharded
decode is the same program as single-chip decode.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_streams", "shard_encoder_state", "sharded_infer_batch"]


def _lead_spec(ndim: int) -> P:
    return P(*(("dp",) + (None,) * (ndim - 1)))


def shard_streams(mesh: Mesh, tree):
    """Place every leaf of a stream-major pytree (leading S axis) over dp.

    Works for the segment features/lengths and the beam
    :class:`~audio_tpu.models.rnnt_decoder.Hypothesis` pytree (tokens
    (S, K, L), scores (S, K), predictor state stacked on (S, K) axes …).
    """
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, _lead_spec(x.ndim))), tree
    )


def shard_encoder_state(mesh: Mesh, state):
    """Place the streaming-encoder state over dp.

    Emformer layer state is time-major — (mems (M, B, D), lc_key/lc_val
    (L, B, D), past_length (1, B)) with the batch/stream axis at position 1
    (audio_tpu/models/emformer.py ``init_state``) — so the dp axis goes on
    axis 1 of every leaf.
    """
    if state is None:
        return None

    def place(x):
        spec = [None] * x.ndim
        spec[1] = "dp"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(place, state)


def sharded_infer_batch(
    decoder,
    mesh: Mesh,
    input,
    lengths,
    beam_width: int,
    state=None,
    hypotheses=None,
) -> Tuple[Any, Any]:
    """One streaming decode tick for S streams sharded over the mesh's dp axis.

    Same contract as :meth:`RNNTBeamSearch.infer_batch`; ``input`` (S, T, D)
    with S divisible by the dp axis size.  Inputs/beam/state are placed on
    the mesh and the tick is jitted once; outputs keep their shardings so the
    beams/state can be fed back without host round trips.
    """
    input, lengths = shard_streams(mesh, (input, lengths))
    if hypotheses is None:
        hypotheses = decoder.init_beams(beam_width, input.shape[0])
    hypotheses = shard_streams(mesh, hypotheses)
    state = shard_encoder_state(mesh, state)

    tick = jax.jit(
        lambda f, le, h, s: decoder.infer_batch(f, le, beam_width, state=s, hypotheses=h)
    )
    return tick(input, lengths, hypotheses, state)
