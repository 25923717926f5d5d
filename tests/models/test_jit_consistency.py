"""jit-consistency: model.apply under jax.jit == eager apply.

JAX analogue of the reference's TorchScript-consistency tier
(/root/reference/test/torchaudio_unittest/models/*/..._torchscript_*.py and
the `@torch.jit.export` deployment contract): every model must trace with
static shapes (no Python control flow on traced values) and the compiled
result must match eager execution.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import audio_tpu.models as M

_KEY = jax.random.PRNGKey(0)


def _assert_tree_close(a, b, atol=1e-5):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=atol)


def _check_jit(model, variables, *args, atol=1e-5, **kwargs):
    eager = model.apply(variables, *args, **kwargs)
    jitted = jax.jit(lambda v, *a: model.apply(v, *a, **kwargs))(variables, *args)
    _assert_tree_close(eager, jitted, atol=atol)


def test_conformer_jit():
    model = M.Conformer(
        input_dim=16, num_heads=2, ffn_dim=32, num_layers=2,
        depthwise_conv_kernel_size=7, dropout=0.0,
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 20, 16)).astype(np.float32))
    lengths = jnp.asarray([20, 12], jnp.int32)
    variables = model.init(_KEY, x, lengths, deterministic=True)
    _check_jit(model, variables, x, lengths, deterministic=True)


def test_emformer_jit():
    model = M.Emformer(
        input_dim=16, num_heads=2, ffn_dim=32, num_layers=2,
        segment_length=4, right_context_length=2, left_context_length=8,
        max_memory_size=2,
    )
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 18, 16)).astype(np.float32))
    lengths = jnp.asarray([18, 10], jnp.int32)
    variables = model.init(_KEY, x, lengths)
    _check_jit(model, variables, x, lengths)


def test_conv_tasnet_jit():
    model = M.ConvTasNet(
        num_sources=2, enc_kernel_size=16, enc_num_feats=16,
        msk_kernel_size=3, msk_num_feats=8, msk_num_hidden_feats=16,
        msk_num_layers=2, msk_num_stacks=2,
    )
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 1, 1600)).astype(np.float32))
    variables = model.init(_KEY, x)
    _check_jit(model, variables, x, atol=1e-4)


def test_rnnt_jit():
    model = M.emformer_rnnt_model(
        input_dim=16, encoding_dim=16, num_symbols=12, segment_length=4,
        right_context_length=2, time_reduction_input_dim=8,
        time_reduction_stride=2, transformer_num_heads=2,
        transformer_ffn_dim=32, transformer_num_layers=2,
        transformer_dropout=0.0, transformer_activation="relu",
        transformer_left_context_length=6, transformer_max_memory_size=0,
        transformer_weight_init_scale_strategy="depthwise",
        transformer_tanh_on_mem=True, symbol_embedding_dim=16,
        num_lstm_layers=1, lstm_layer_norm=True,
        lstm_layer_norm_epsilon=1e-5, lstm_dropout=0.0,
    )
    rng = np.random.default_rng(3)
    sources = jnp.asarray(rng.standard_normal((2, 16, 16)).astype(np.float32))
    source_lengths = jnp.asarray([16, 12], jnp.int32)
    targets = jnp.asarray(rng.integers(0, 12, (2, 5)).astype(np.int32))
    target_lengths = jnp.asarray([5, 3], jnp.int32)
    variables = model.init(_KEY, sources, source_lengths, targets, target_lengths)
    _check_jit(model, variables, sources, source_lengths, targets, target_lengths)


def test_wav2vec2_jit():
    model = M.wav2vec2.wav2vec2_model(
        extractor_mode="group_norm",
        extractor_conv_layer_config=[(8, 10, 5), (8, 3, 2)],
        extractor_conv_bias=False,
        encoder_embed_dim=16,
        encoder_projection_dropout=0.0,
        encoder_pos_conv_kernel=15,
        encoder_pos_conv_groups=1,
        encoder_num_layers=2,
        encoder_num_heads=2,
        encoder_attention_dropout=0.0,
        encoder_ff_interm_features=32,
        encoder_ff_interm_dropout=0.0,
        encoder_dropout=0.0,
        encoder_layer_norm_first=False,
        encoder_layer_drop=0.0,
        aux_num_out=11,
    )
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 800)).astype(np.float32))
    lengths = jnp.asarray([800, 600], jnp.int32)
    variables = model.init(_KEY, x, lengths)
    _check_jit(model, variables, x, lengths, atol=1e-4)


def test_squim_objective_jit():
    model = M.squim_objective_model(
        feat_dim=16, win_len=32, d_model=16, nhead=2, hidden_dim=16,
        num_blocks=1, chunk_size=8,
    )
    x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 1600)).astype(np.float32) * 0.1)
    variables = model.init(_KEY, x)
    _check_jit(model, variables, x, atol=1e-4)


def test_wavernn_jit():
    model = M.WaveRNN(
        upsample_scales=[2, 2], n_classes=64, hop_length=4,
        n_res_block=1, n_rnn=16, n_fc=16, kernel_size=3, n_freq=8,
        n_hidden=16, n_output=16,
    )
    rng = np.random.default_rng(6)
    wave = jnp.asarray(rng.standard_normal((1, 1, 68)).astype(np.float32))
    spec = jnp.asarray(rng.standard_normal((1, 1, 8, 19)).astype(np.float32))
    variables = model.init(_KEY, wave, spec)
    _check_jit(model, variables, wave, spec, atol=1e-4)
