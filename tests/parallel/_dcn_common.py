"""Shared model/batch/loss definitions for the two-process DCN test.

Imported both by the pytest process (single-process reference grads) and by
``dcn_worker.py`` (two jax.distributed processes), so both sides compute the
EXACT same function on the exact same data.
"""

import numpy as np

B, T, RC, U, V, D_IN = 8, 20, 2, 6, 64, 16


def tiny_rnnt():
    from audio_tpu.models.rnnt import emformer_rnnt_model

    return emformer_rnnt_model(
        input_dim=D_IN,
        encoding_dim=32,
        num_symbols=V,
        segment_length=8,
        right_context_length=RC,
        time_reduction_input_dim=D_IN,
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


def make_batch():
    rng = np.random.default_rng(7)
    src = rng.standard_normal((B, T + RC, D_IN)).astype(np.float32)
    src_len = np.full((B,), T, np.int32)
    tgt = rng.integers(1, V, (B, U)).astype(np.int32)
    tgt_len = np.full((B,), U, np.int32)
    tgt_in = np.pad(tgt, ((0, 0), (1, 0)))
    return src, src_len, tgt, tgt_len, tgt_in


def make_loss_fn(model):
    from audio_tpu.functional import rnnt_loss

    def loss_fn(params, src, src_len, tgt, tgt_len, tgt_in):
        logits, out_len, _, _ = model.apply(params, src, src_len, tgt_in, tgt_len)
        return rnnt_loss(logits, tgt, out_len, tgt_len, blank=0, reduction="mean")

    return loss_fn


def init_params(model):
    import jax
    import jax.numpy as jnp

    src, src_len, tgt, tgt_len, tgt_in = make_batch()
    return model.init(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(src_len),
        jnp.asarray(tgt_in), jnp.asarray(tgt_len),
    )


def grads_to_flat_dict(grads):
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[name] = np.asarray(leaf)
    return out
