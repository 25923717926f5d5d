"""Sharded streaming beam search ≡ unsharded (8-device CPU mesh).

BASELINE config 5 names "horizon-chunked beam search across multi-host
mesh"; the reference decode loop it out-scales is single-utterance and
host-synced (/root/reference/src/torchaudio/models/rnnt_decoder.py:226-265).
These tests prove the natively-batched search partitions over dp without
changing a single result: tokens, counts and scores of every stream match
the single-(virtual-)device run over multiple carried-state ticks — token
sequences and counts exactly, scores to float-reassociation tolerance (the
per-shard batch extent changes XLA's reduction vectorization, a few-ulp
effect on CPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_tpu.models.rnnt import emformer_rnnt_model
from audio_tpu.models.rnnt_decoder import RNNTBeamSearch
from audio_tpu.parallel import create_mesh, sharded_infer_batch, shard_streams


V = 40
S = 8  # one stream per virtual device
BEAM = 4
SEG = 10  # segment 8 + right-context 2


def _model():
    return emformer_rnnt_model(
        input_dim=16,
        encoding_dim=32,
        num_symbols=V,
        segment_length=8,
        right_context_length=2,
        time_reduction_input_dim=16,
        time_reduction_stride=2,
        transformer_num_heads=2,
        transformer_ffn_dim=64,
        transformer_num_layers=2,
        transformer_dropout=0.0,
        transformer_activation="gelu",
        transformer_left_context_length=8,
        transformer_max_memory_size=0,
        transformer_weight_init_scale_strategy="depthwise",
        transformer_tanh_on_mem=True,
        symbol_embedding_dim=16,
        num_lstm_layers=2,
        lstm_layer_norm=True,
        lstm_layer_norm_epsilon=1e-3,
        lstm_dropout=0.0,
    )


@pytest.fixture(scope="module")
def setup():
    model = _model()
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((S, SEG, 16)).astype(np.float32))
    lengths = jnp.full((S,), SEG, jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), feats[:1], lengths[:1], jnp.zeros((1, 1), jnp.int32),
        jnp.ones((1,), jnp.int32), deterministic=True,
    )
    # tilt toward blank so expansion behaves like a trained model
    jb = params["params"]["joiner"]["linear"]["bias"]
    params["params"]["joiner"]["linear"]["bias"] = jb.at[-1].add(2.0)
    dec = RNNTBeamSearch(model, params, blank=V - 1, step_max_tokens=4, max_tokens=64)
    return dec, rng


def _assert_beams_equal(got, ref):
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.counts), np.asarray(ref.counts))
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(ref.scores), rtol=1e-5, atol=1e-5)


class TestShardedDecode:
    def test_tick_matches_unsharded(self, setup):
        dec, rng = setup
        mesh = create_mesh(dp=8, tp=1)
        feats = jnp.asarray(rng.standard_normal((S, SEG, 16)).astype(np.float32))
        lengths = jnp.full((S,), SEG, jnp.int32)

        ref_h, ref_state = jax.jit(
            lambda f, le: dec.infer_batch(f, le, BEAM)
        )(feats, lengths)
        got_h, got_state = sharded_infer_batch(dec, mesh, feats, lengths, BEAM)

        _assert_beams_equal(got_h, ref_h)
        # encoder state identical too
        for a, b in zip(jax.tree.leaves(got_state), jax.tree.leaves(ref_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_carried_state_over_ticks(self, setup):
        """3 segment ticks with carried beam + encoder state, sharded vs not:
        the decode trajectory must be identical."""
        dec, rng = setup
        mesh = create_mesh(dp=8, tp=1)
        segs = [
            jnp.asarray(rng.standard_normal((S, SEG, 16)).astype(np.float32))
            for _ in range(3)
        ]
        lengths = jnp.full((S,), SEG, jnp.int32)

        ref_h = ref_state = None
        for f in segs:
            ref_h, ref_state = jax.jit(
                lambda f, h, s: dec.infer_batch(f, lengths, BEAM, state=s, hypotheses=h)
            )(f, ref_h, ref_state)

        got_h = got_state = None
        for f in segs:
            got_h, got_state = sharded_infer_batch(
                dec, mesh, f, lengths, BEAM, state=got_state, hypotheses=got_h
            )

        _assert_beams_equal(got_h, ref_h)

    def test_outputs_are_dp_sharded(self, setup):
        """The returned beam actually lives sharded on the mesh (no implicit
        gather to one device)."""
        dec, rng = setup
        mesh = create_mesh(dp=8, tp=1)
        feats = jnp.asarray(rng.standard_normal((S, SEG, 16)).astype(np.float32))
        lengths = jnp.full((S,), SEG, jnp.int32)
        got_h, got_state = sharded_infer_batch(dec, mesh, feats, lengths, BEAM)
        sh = got_h.scores.sharding
        assert len(sh.device_set) == 8, sh
        # leading (stream) axis split 8 ways
        shard_shapes = {s.data.shape for s in got_h.scores.addressable_shards}
        assert shard_shapes == {(1, BEAM)}, shard_shapes

    def test_ragged_lengths_match(self, setup):
        dec, rng = setup
        mesh = create_mesh(dp=8, tp=1)
        feats = jnp.asarray(rng.standard_normal((S, SEG, 16)).astype(np.float32))
        lengths = jnp.asarray([SEG, SEG, 6, SEG, 4, SEG, SEG, 5], jnp.int32)
        ref_h, _ = jax.jit(lambda f, le: dec.infer_batch(f, le, BEAM))(feats, lengths)
        got_h, _ = sharded_infer_batch(dec, mesh, feats, lengths, BEAM)
        _assert_beams_equal(got_h, ref_h)
