"""Multi-chip numeric equivalence on the 8-device virtual CPU mesh.

The reference has no distributed tests at all (SURVEY.md §4 "Multi-node:
there is none"); these assert the property the TPU build actually relies
on: sharded execution computes the SAME numbers as unsharded execution —
tp=2 ≡ tp=1 ≡ no mesh for logits AND grads, dp=8 grads ≡ single-device
grads, and the RNN-T joiner lattice sharded over (dp, vocab-tp) reproduces
the unsharded loss/grads.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_tpu.parallel import (
    batch_sharding,
    create_mesh,
    lattice_spec,
    shard_rnnt_params,
    shard_wav2vec2_params,
)

# collectives reorder f32 reductions; CPU mesh, so tolerances stay tight
ATOL, RTOL = 2e-5, 2e-5


def _tree_allclose(a, b, atol=ATOL, rtol=RTOL):
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(a), jax.tree_util.tree_leaves_with_path(b)
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=atol, rtol=rtol,
            err_msg="/".join(str(getattr(q, "key", q)) for q in pa),
        )


def _tiny_wav2vec2(aux_num_out=16):
    import audio_tpu.models as M

    return M.wav2vec2_model(
        extractor_mode="group_norm",
        extractor_conv_layer_config=[(32, 10, 5), (32, 3, 2), (32, 2, 2)],
        extractor_conv_bias=False,
        encoder_embed_dim=64,
        encoder_projection_dropout=0.0,
        encoder_pos_conv_kernel=15,
        encoder_pos_conv_groups=1,
        encoder_num_layers=2,
        encoder_num_heads=4,
        encoder_attention_dropout=0.0,
        encoder_ff_interm_features=128,
        encoder_ff_interm_dropout=0.0,
        encoder_dropout=0.0,
        encoder_layer_norm_first=False,
        encoder_layer_drop=0.0,
        aux_num_out=aux_num_out,
    )


def _wav2vec2_setup():
    model = _tiny_wav2vec2()
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((8, 2000)), jnp.float32) * 0.1
    lengths = jnp.full((8,), 2000, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), wav, lengths, deterministic=True)
    targets = jnp.asarray(rng.integers(1, 16, (8, 5)), jnp.int32)
    target_lengths = jnp.full((8,), 5, jnp.int32)

    def loss_fn(params, wav, lengths, targets, target_lengths):
        from audio_tpu.ops.ctc import ctc_loss

        logits, out_lengths = model.apply(params, wav, lengths, deterministic=True)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return ctc_loss(log_probs, targets, out_lengths, target_lengths, blank=0, reduction="mean")

    def fwd(params, wav, lengths):
        logits, out_lengths = model.apply(params, wav, lengths, deterministic=True)
        return logits

    return params, (wav, lengths, targets, target_lengths), loss_fn, fwd


@pytest.fixture(scope="module")
def w2v2():
    return _wav2vec2_setup()


class TestWav2Vec2TensorParallel:
    def test_tp_logits_match_unsharded(self, w2v2):
        params, (wav, lengths, *_), _, fwd = w2v2
        ref = jax.jit(fwd)(params, wav, lengths)
        for tp in (1, 2):
            mesh = create_mesh(dp=len(jax.devices()) // tp, tp=tp)
            p_sh = jax.device_put(params, shard_wav2vec2_params(params, mesh))
            wav_sh = jax.device_put(wav, batch_sharding(mesh, 2))
            len_sh = jax.device_put(lengths, batch_sharding(mesh, 1))
            got = jax.jit(fwd)(p_sh, wav_sh, len_sh)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=ATOL, rtol=RTOL)

    def test_tp_grads_match_unsharded(self, w2v2):
        params, args, loss_fn, _ = w2v2
        wav, lengths, targets, target_lengths = args
        ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(params, *args)
        mesh = create_mesh(dp=4, tp=2)
        p_sh = jax.device_put(params, shard_wav2vec2_params(params, mesh))
        args_sh = (
            jax.device_put(wav, batch_sharding(mesh, 2)),
            jax.device_put(lengths, batch_sharding(mesh, 1)),
            jax.device_put(targets, batch_sharding(mesh, 2)),
            jax.device_put(target_lengths, batch_sharding(mesh, 1)),
        )
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(p_sh, *args_sh)
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=ATOL, rtol=RTOL)
        _tree_allclose(grads, ref_grads)


class TestDataParallel:
    def test_dp8_grads_match_single_device(self, w2v2):
        params, args, loss_fn, _ = w2v2
        wav, lengths, targets, target_lengths = args
        ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(params, *args)
        mesh = create_mesh(dp=len(jax.devices()), tp=1)
        p_sh = jax.device_put(params, shard_wav2vec2_params(params, mesh))
        args_sh = (
            jax.device_put(wav, batch_sharding(mesh, 2)),
            jax.device_put(lengths, batch_sharding(mesh, 1)),
            jax.device_put(targets, batch_sharding(mesh, 2)),
            jax.device_put(target_lengths, batch_sharding(mesh, 1)),
        )
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(p_sh, *args_sh)
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=ATOL, rtol=RTOL)
        _tree_allclose(grads, ref_grads)


def _tiny_rnnt():
    from audio_tpu.models.rnnt import emformer_rnnt_model

    return emformer_rnnt_model(
        input_dim=16,
        encoding_dim=32,
        num_symbols=64,
        segment_length=8,
        right_context_length=2,
        time_reduction_input_dim=16,
        time_reduction_stride=2,
        transformer_num_heads=2,
        transformer_ffn_dim=64,
        transformer_num_layers=2,
        transformer_dropout=0.0,
        transformer_activation="relu",
        transformer_left_context_length=8,
        transformer_max_memory_size=0,
        transformer_weight_init_scale_strategy="depthwise",
        transformer_tanh_on_mem=True,
        symbol_embedding_dim=16,
        num_lstm_layers=1,
        lstm_layer_norm=True,
        lstm_layer_norm_epsilon=1e-3,
        lstm_dropout=0.0,
    )


class TestRNNTJoinerLattice:
    """The (B, T, U, V) joiner lattice sharded (dp, None, None, tp)
    reproduces the unsharded rnnt_loss + grads — the megacore sharding
    SURVEY §2.3 calls for (reference joiner memory hot spot:
    /root/reference/src/torchaudio/models/rnnt.py:392-452)."""

    @pytest.fixture(scope="class")
    def setup(self):
        from audio_tpu.functional import rnnt_loss

        model = _tiny_rnnt()
        rng = np.random.default_rng(1)
        b, t, u, rc = 8, 20, 6, 2
        # time padded by the right-context, lengths exclude it (the recipe
        # convention, librispeech/lightning.py:87)
        src = jnp.asarray(rng.standard_normal((b, t + rc, 16)), jnp.float32)
        src_len = jnp.full((b,), t, jnp.int32)
        tgt = jnp.asarray(rng.integers(1, 64, (b, u)), jnp.int32)
        tgt_len = jnp.full((b,), u, jnp.int32)
        # prepend blank like the recipe (lightning.py:144-147)
        tgt_in = jnp.pad(tgt, ((0, 0), (1, 0)))
        params = model.init(jax.random.PRNGKey(0), src, src_len, tgt_in, tgt_len)

        def loss_fn(params, src, src_len, tgt, tgt_len, tgt_in, constraint=None):
            logits, out_len, _, _ = model.apply(params, src, src_len, tgt_in, tgt_len)
            if constraint is not None:
                logits = jax.lax.with_sharding_constraint(logits, constraint)
            return rnnt_loss(logits, tgt, out_len, tgt_len, blank=0, reduction="mean")

        args = (src, src_len, tgt, tgt_len, tgt_in)
        return model, params, args, loss_fn

    def test_tp_lattice_loss_and_grads(self, setup):
        model, params, args, loss_fn = setup
        src, src_len, tgt, tgt_len, tgt_in = args
        ref_loss, ref_grads = jax.jit(
            jax.value_and_grad(loss_fn), static_argnames=("constraint",)
        )(params, *args)
        mesh = create_mesh(dp=4, tp=2)
        p_sh = jax.device_put(params, shard_rnnt_params(params, mesh))
        args_sh = (
            jax.device_put(src, batch_sharding(mesh, 3)),
            jax.device_put(src_len, batch_sharding(mesh, 1)),
            jax.device_put(tgt, batch_sharding(mesh, 2)),
            jax.device_put(tgt_len, batch_sharding(mesh, 1)),
            jax.device_put(tgt_in, batch_sharding(mesh, 2)),
        )
        constraint = NamedSharding(mesh, lattice_spec())
        loss, grads = jax.jit(
            jax.value_and_grad(loss_fn), static_argnames=("constraint",)
        )(p_sh, *args_sh, constraint=constraint)
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=ATOL, rtol=RTOL)
        _tree_allclose(grads, ref_grads, atol=5e-5, rtol=5e-5)

    def test_lattice_actually_sharded(self, setup):
        """The compiled joiner output really is laid out (dp, None, None, tp)."""
        model, params, args, _ = setup
        src, src_len, tgt, tgt_len, tgt_in = args
        mesh = create_mesh(dp=4, tp=2)
        p_sh = jax.device_put(params, shard_rnnt_params(params, mesh))

        @jax.jit
        def joint(params, src, src_len, tgt_in, tgt_len):
            logits, *_ = model.apply(params, src, src_len, tgt_in, tgt_len)
            return jax.lax.with_sharding_constraint(
                logits, NamedSharding(mesh, lattice_spec())
            )

        out = joint(
            p_sh,
            jax.device_put(src, batch_sharding(mesh, 3)),
            jax.device_put(src_len, batch_sharding(mesh, 1)),
            jax.device_put(tgt_in, batch_sharding(mesh, 2)),
            jax.device_put(tgt_len, batch_sharding(mesh, 1)),
        )
        assert out.sharding.is_equivalent_to(NamedSharding(mesh, lattice_spec()), out.ndim)
        # each device holds B/dp × V/tp of the lattice, not the whole thing
        db = out.addressable_shards[0].data.shape
        assert db[0] == out.shape[0] // 4 and db[3] == out.shape[3] // 2
