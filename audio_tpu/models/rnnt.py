"""RNN-T model: Emformer transcriber + LSTM predictor + joiner (flax.linen).

Architecture parity with /root/reference/src/torchaudio/models/rnnt.py:
_TimeReduction (:11-53), _CustomLSTM with layer-norm gates (:55-136),
_EmformerEncoder (:152-295), _Predictor (:296-391), _Joiner (:392-452),
RNNT (:453-687), emformer_rnnt_model / emformer_rnnt_base (:688-817).

TPU-native: LSTM input matmuls are hoisted out of the ``lax.scan``; streaming
state (Emformer layer state + predictor (h, c)) is a pytree of fixed-shape
arrays that crosses jit boundaries.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .emformer import Emformer, import_emformer_state_dict

__all__ = ["RNNT", "emformer_rnnt_model", "emformer_rnnt_base", "import_rnnt_state_dict"]


def _time_reduction(input: jnp.ndarray, lengths: jnp.ndarray, stride: int):
    b, t, d = input.shape
    num_frames = t - (t % stride)
    input = input[:, :num_frames, :]
    lengths = lengths // stride
    return input.reshape(b, num_frames // stride, d * stride), lengths


class _CustomLSTM(nn.Module):
    hidden_dim: int
    layer_norm: bool = False
    layer_norm_epsilon: float = 1e-5

    @nn.compact
    def __call__(self, input: jnp.ndarray, state=None):
        """input (T, B, D) -> (output (T, B, H), (h, c))."""
        t, b, _ = input.shape
        h_dim = self.hidden_dim
        x2g = nn.Dense(4 * h_dim, use_bias=not self.layer_norm, name="x2g")
        p2g = nn.Dense(4 * h_dim, use_bias=False, name="p2g")
        if self.layer_norm:
            c_norm = nn.LayerNorm(epsilon=self.layer_norm_epsilon, name="c_norm")
            g_norm = nn.LayerNorm(epsilon=self.layer_norm_epsilon, name="g_norm")
        else:
            c_norm = g_norm = lambda x: x
        if state is None:
            h = jnp.zeros((b, h_dim), input.dtype)
            c = jnp.zeros((b, h_dim), input.dtype)
        else:
            h, c = state

        gated_input = x2g(input)  # hoisted input matmul (T, B, 4H)

        if self.is_initializing():
            # create p2g/norm params in the outer trace; creating them inside
            # the lax.scan body would leak tracers into the param tree
            c_norm(c)
            g_norm(gated_input[0] + p2g(h))

        def step(carry, g_t):
            h, c = carry
            gates = g_norm(g_t + p2g(h))
            i_g, f_g, c_g, o_g = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f_g) * c + jax.nn.sigmoid(i_g) * jnp.tanh(c_g)
            c = c_norm(c)
            h = jax.nn.sigmoid(o_g) * jnp.tanh(c)
            return (h, c), h

        # NB: unrolling this scan was measured SLOWER on v5e (B=64, U=64
        # grad: 8.6 ms plain vs 10.6/12.8 ms at unroll 4/16) — the unrolled
        # program bloats scheduling without removing the serial h-dependence,
        # so the plain while-loop form stays.
        (h, c), outputs = jax.lax.scan(step, (h, c), gated_input)
        return outputs, (h, c)


class _EmformerEncoder(nn.Module):
    input_dim: int
    output_dim: int
    segment_length: int
    right_context_length: int
    time_reduction_input_dim: int
    time_reduction_stride: int
    transformer_num_heads: int
    transformer_ffn_dim: int
    transformer_num_layers: int
    transformer_left_context_length: int
    transformer_dropout: float = 0.0
    transformer_activation: str = "relu"
    transformer_max_memory_size: int = 0
    transformer_weight_init_scale_strategy: str = "depthwise"
    transformer_tanh_on_mem: bool = False

    def setup(self):
        self.input_linear = nn.Dense(self.time_reduction_input_dim, use_bias=False, name="input_linear")
        transformer_input_dim = self.time_reduction_input_dim * self.time_reduction_stride
        self.transformer = Emformer(
            transformer_input_dim,
            self.transformer_num_heads,
            self.transformer_ffn_dim,
            self.transformer_num_layers,
            self.segment_length // self.time_reduction_stride,
            dropout=self.transformer_dropout,
            activation=self.transformer_activation,
            left_context_length=self.transformer_left_context_length,
            right_context_length=self.right_context_length // self.time_reduction_stride,
            max_memory_size=self.transformer_max_memory_size,
            weight_init_scale_strategy=self.transformer_weight_init_scale_strategy,
            tanh_on_mem=self.transformer_tanh_on_mem,
            name="transformer",
        )
        self.output_linear = nn.Dense(self.output_dim, name="output_linear")
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")

    def __call__(self, input, lengths, deterministic: bool = True):
        x = self.input_linear(input)
        x, lengths = _time_reduction(x, lengths, self.time_reduction_stride)
        x, lengths = self.transformer(x, lengths, deterministic=deterministic)
        return self.layer_norm(self.output_linear(x)), lengths

    def infer(self, input, lengths, states, deterministic: bool = True):
        x = self.input_linear(input)
        x, lengths = _time_reduction(x, lengths, self.time_reduction_stride)
        x, lengths, states = self.transformer.infer(x, lengths, states, deterministic=deterministic)
        return self.layer_norm(self.output_linear(x)), lengths, states


class _Predictor(nn.Module):
    num_symbols: int
    output_dim: int
    symbol_embedding_dim: int
    num_lstm_layers: int
    lstm_hidden_dim: int
    lstm_layer_norm: bool = False
    lstm_layer_norm_epsilon: float = 1e-5
    lstm_dropout: float = 0.0

    def setup(self):
        self.embedding = nn.Embed(self.num_symbols, self.symbol_embedding_dim, name="embedding")
        self.input_layer_norm = nn.LayerNorm(epsilon=1e-5, name="input_layer_norm")
        self.lstm_layers = [
            _CustomLSTM(
                self.lstm_hidden_dim,
                layer_norm=self.lstm_layer_norm,
                layer_norm_epsilon=self.lstm_layer_norm_epsilon,
                name=f"lstm_layers_{i}",
            )
            for i in range(self.num_lstm_layers)
        ]
        self.drop = nn.Dropout(self.lstm_dropout)
        self.linear = nn.Dense(self.output_dim, name="linear")
        self.output_layer_norm = nn.LayerNorm(epsilon=1e-5, name="output_layer_norm")

    def __call__(self, input, lengths, state=None, deterministic: bool = True):
        """input (B, U) int tokens → (output (B, U, D), lengths, state)."""
        x = self.embedding(jnp.swapaxes(input, 0, 1))  # (U, B, E)
        x = self.input_layer_norm(x)
        state_out = []
        for i, lstm in enumerate(self.lstm_layers):
            x, s = lstm(x, None if state is None else state[i])
            x = self.drop(x, deterministic=deterministic)
            state_out.append(s)
        x = self.output_layer_norm(self.linear(x))
        return jnp.swapaxes(x, 0, 1), lengths, state_out


class _Joiner(nn.Module):
    output_dim: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, source_encodings, source_lengths, target_encodings, target_lengths):
        joint = source_encodings[:, :, None, :] + target_encodings[:, None, :, :]
        if self.activation == "relu":
            joint = nn.relu(joint)
        elif self.activation == "tanh":
            joint = jnp.tanh(joint)
        else:
            raise ValueError(f"Unsupported activation {self.activation}")
        output = nn.Dense(self.output_dim, name="linear")(joint)
        return output, source_lengths, target_lengths


class RNNT(nn.Module):
    """RNN-T transducer: call one of the factory functions to build."""

    transcriber: _EmformerEncoder
    predictor: _Predictor
    joiner: _Joiner

    def __call__(self, sources, source_lengths, targets, target_lengths, predictor_state=None,
                 deterministic: bool = True):
        source_encodings, source_lengths = self.transcriber(sources, source_lengths, deterministic=deterministic)
        target_encodings, target_lengths, predictor_state = self.predictor(
            targets, target_lengths, predictor_state, deterministic=deterministic
        )
        output, source_lengths, target_lengths = self.joiner(
            source_encodings, source_lengths, target_encodings, target_lengths
        )
        return output, source_lengths, target_lengths, predictor_state

    def transcribe_streaming(self, sources, source_lengths, state, deterministic: bool = True):
        return self.transcriber.infer(sources, source_lengths, state, deterministic=deterministic)

    def transcribe(self, sources, source_lengths, deterministic: bool = True):
        return self.transcriber(sources, source_lengths, deterministic=deterministic)

    def predict(self, targets, target_lengths, state, deterministic: bool = True):
        return self.predictor(targets, target_lengths, state, deterministic=deterministic)

    def join(self, source_encodings, source_lengths, target_encodings, target_lengths):
        return self.joiner(source_encodings, source_lengths, target_encodings, target_lengths)


def emformer_rnnt_model(
    *,
    input_dim: int,
    encoding_dim: int,
    num_symbols: int,
    segment_length: int,
    right_context_length: int,
    time_reduction_input_dim: int,
    time_reduction_stride: int,
    transformer_num_heads: int,
    transformer_ffn_dim: int,
    transformer_num_layers: int,
    transformer_dropout: float,
    transformer_activation: str,
    transformer_left_context_length: int,
    transformer_max_memory_size: int,
    transformer_weight_init_scale_strategy: str,
    transformer_tanh_on_mem: bool,
    symbol_embedding_dim: int,
    num_lstm_layers: int,
    lstm_layer_norm: bool,
    lstm_layer_norm_epsilon: float,
    lstm_dropout: float,
) -> RNNT:
    encoder = _EmformerEncoder(
        input_dim=input_dim,
        output_dim=encoding_dim,
        segment_length=segment_length,
        right_context_length=right_context_length,
        time_reduction_input_dim=time_reduction_input_dim,
        time_reduction_stride=time_reduction_stride,
        transformer_num_heads=transformer_num_heads,
        transformer_ffn_dim=transformer_ffn_dim,
        transformer_num_layers=transformer_num_layers,
        transformer_dropout=transformer_dropout,
        transformer_activation=transformer_activation,
        transformer_left_context_length=transformer_left_context_length,
        transformer_max_memory_size=transformer_max_memory_size,
        transformer_weight_init_scale_strategy=transformer_weight_init_scale_strategy,
        transformer_tanh_on_mem=transformer_tanh_on_mem,
        name="transcriber",
    )
    predictor = _Predictor(
        num_symbols,
        encoding_dim,
        symbol_embedding_dim=symbol_embedding_dim,
        num_lstm_layers=num_lstm_layers,
        lstm_hidden_dim=symbol_embedding_dim,
        lstm_layer_norm=lstm_layer_norm,
        lstm_layer_norm_epsilon=lstm_layer_norm_epsilon,
        lstm_dropout=lstm_dropout,
        name="predictor",
    )
    joiner = _Joiner(num_symbols, name="joiner")
    return RNNT(transcriber=encoder, predictor=predictor, joiner=joiner)


def emformer_rnnt_base(num_symbols: int) -> RNNT:
    """Basic Emformer RNN-T (76.7M params at num_symbols=4097)."""
    return emformer_rnnt_model(
        input_dim=80,
        encoding_dim=1024,
        num_symbols=num_symbols,
        segment_length=16,
        right_context_length=4,
        time_reduction_input_dim=128,
        time_reduction_stride=4,
        transformer_num_heads=8,
        transformer_ffn_dim=2048,
        transformer_num_layers=20,
        transformer_dropout=0.1,
        transformer_activation="gelu",
        transformer_left_context_length=30,
        transformer_max_memory_size=0,
        transformer_weight_init_scale_strategy="depthwise",
        transformer_tanh_on_mem=True,
        symbol_embedding_dim=512,
        num_lstm_layers=3,
        lstm_layer_norm=True,
        lstm_layer_norm_epsilon=1e-3,
        lstm_dropout=0.3,
    )


def import_rnnt_state_dict(state_dict) -> dict:
    """Convert a torchaudio RNNT state_dict into flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {"transcriber": {}, "predictor": {}, "joiner": {}}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    emformer_sd = {}
    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] == "transcriber":
            if parts[1] == "input_linear":
                put(("transcriber", "input_linear", "kernel"), value.T)
            elif parts[1] == "transformer":
                emformer_sd[".".join(parts[2:])] = value
            elif parts[1] == "output_linear":
                put(("transcriber", "output_linear", "kernel" if parts[2] == "weight" else "bias"),
                    value.T if parts[2] == "weight" else value)
            elif parts[1] == "layer_norm":
                put(("transcriber", "layer_norm", "scale" if parts[2] == "weight" else "bias"), value)
        elif parts[0] == "predictor":
            if parts[1] == "embedding":
                put(("predictor", "embedding", "embedding"), value)
            elif parts[1] in ("input_layer_norm", "output_layer_norm"):
                put(("predictor", parts[1], "scale" if parts[2] == "weight" else "bias"), value)
            elif parts[1] == "lstm_layers":
                i, mod, kind = parts[2], parts[3], parts[4]
                base = ("predictor", f"lstm_layers_{i}", mod)
                if mod in ("x2g", "p2g"):
                    put(base + ("kernel" if kind == "weight" else "bias",),
                        value.T if kind == "weight" else value)
                else:  # c_norm / g_norm
                    put(base + ("scale" if kind == "weight" else "bias",), value)
            elif parts[1] == "linear":
                put(("predictor", "linear", "kernel" if parts[2] == "weight" else "bias"),
                    value.T if parts[2] == "weight" else value)
        elif parts[0] == "joiner":
            put(("joiner", "linear", "kernel" if parts[2] == "weight" else "bias"),
                value.T if parts[2] == "weight" else value)
        else:
            raise KeyError(f"Unrecognized key: {key}")
    if emformer_sd:
        params["transcriber"]["transformer"] = import_emformer_state_dict(emformer_sd)
    return params
