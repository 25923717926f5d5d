"""Tacotron2 TTS (flax.linen).

Architecture parity with /root/reference/src/torchaudio/models/tacotron2.py:
_LocationLayer (:122-169), location-sensitive _Attention (:171-257), _Prenet
with always-on dropout (:258-287), _Postnet (:288-348), conv+biLSTM _Encoder
(:349-420), _Decoder (teacher-forced forward :685-760, autoregressive infer
:779-868), Tacotron2 (:869-1046).

TPU-native: the teacher-forced decoder and the autoregressive ``infer`` are
``lax.scan``s over frames (fixed ``decoder_max_step`` with finished-masking
instead of the reference's early-stopping Python loop).  The reference keeps
prenet dropout active even in eval (:273-287) — pass
``prenet_dropout=False`` to disable it deterministically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["Tacotron2", "import_tacotron2_state_dict"]

_NEG_INF = -1e30


class _LSTMCell(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x, h, c):
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(), (x.shape[-1], 4 * self.hidden))
        w_hh = self.param("w_hh", nn.initializers.orthogonal(), (self.hidden, 4 * self.hidden))
        b_ih = self.param("b_ih", nn.initializers.zeros, (4 * self.hidden,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (4 * self.hidden,))
        gates = x @ w_ih + b_ih + h @ w_hh + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, c


class _BiLSTM(nn.Module):
    hidden: int

    def _dir(self, x, w_ih, w_hh, b_ih, b_hh, reverse):
        if reverse:
            x = jnp.flip(x, 1)
        b = x.shape[0]
        pre = x @ w_ih + b_ih

        def step(carry, pre_t):
            h, c = carry
            gates = pre_t + h @ w_hh + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((b, self.hidden), pre.dtype)
        _, ys = jax.lax.scan(step, (h0, h0), jnp.moveaxis(pre, 1, 0))
        ys = jnp.moveaxis(ys, 0, 1)
        return jnp.flip(ys, 1) if reverse else ys

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        p = {
            n: self.param(n, nn.initializers.lecun_normal(), shp)
            for n, shp in [("w_ih_f", (d, 4 * self.hidden)), ("w_hh_f", (self.hidden, 4 * self.hidden)),
                           ("w_ih_b", (d, 4 * self.hidden)), ("w_hh_b", (self.hidden, 4 * self.hidden))]
        }
        b = {n: self.param(n, nn.initializers.zeros, (4 * self.hidden,))
             for n in ("b_ih_f", "b_hh_f", "b_ih_b", "b_hh_b")}
        fwd = self._dir(x, p["w_ih_f"], p["w_hh_f"], b["b_ih_f"], b["b_hh_f"], False)
        bwd = self._dir(x, p["w_ih_b"], p["w_hh_b"], b["b_ih_b"], b["b_hh_b"], True)
        return jnp.concatenate([fwd, bwd], axis=-1)


class Tacotron2(nn.Module):
    mask_padding: bool = False
    n_mels: int = 80
    n_symbol: int = 148
    n_frames_per_step: int = 1
    symbol_embedding_dim: int = 512
    encoder_embedding_dim: int = 512
    encoder_n_convolution: int = 3
    encoder_kernel_size: int = 5
    decoder_rnn_dim: int = 1024
    decoder_max_step: int = 2000
    decoder_dropout: float = 0.1
    decoder_early_stopping: bool = True
    attention_rnn_dim: int = 1024
    attention_hidden_dim: int = 128
    attention_location_n_filter: int = 32
    attention_location_kernel_size: int = 31
    attention_dropout: float = 0.1
    prenet_dim: int = 256
    postnet_n_convolution: int = 5
    postnet_kernel_size: int = 5
    postnet_embedding_dim: int = 512
    gate_threshold: float = 0.5

    def setup(self):
        self.embedding = nn.Embed(self.n_symbol, self.symbol_embedding_dim, name="embedding")
        # encoder convs
        self.encoder_convs = [
            nn.Conv(self.encoder_embedding_dim, (self.encoder_kernel_size,),
                    padding=[((self.encoder_kernel_size - 1) // 2,) * 2], name=f"encoder_conv_{i}")
            for i in range(self.encoder_n_convolution)
        ]
        self.encoder_bns = [
            nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5, name=f"encoder_bn_{i}")
            for i in range(self.encoder_n_convolution)
        ]
        self.encoder_lstm = _BiLSTM(self.encoder_embedding_dim // 2, name="encoder_lstm")
        # prenet
        self.prenet_1 = nn.Dense(self.prenet_dim, use_bias=False, name="prenet_1")
        self.prenet_2 = nn.Dense(self.prenet_dim, use_bias=False, name="prenet_2")
        # attention
        self.attention_rnn = _LSTMCell(self.attention_rnn_dim, name="attention_rnn")
        self.query_layer = nn.Dense(self.attention_hidden_dim, use_bias=False, name="query_layer")
        self.memory_layer = nn.Dense(self.attention_hidden_dim, use_bias=False, name="memory_layer")
        self.v = nn.Dense(1, use_bias=False, name="v")
        pad = (self.attention_location_kernel_size - 1) // 2
        self.location_conv = nn.Conv(
            self.attention_location_n_filter, (self.attention_location_kernel_size,),
            padding=[(pad, pad)], use_bias=False, name="location_conv",
        )
        self.location_dense = nn.Dense(self.attention_hidden_dim, use_bias=False, name="location_dense")
        # decoder
        self.decoder_rnn = _LSTMCell(self.decoder_rnn_dim, name="decoder_rnn")
        self.linear_projection = nn.Dense(self.n_mels * self.n_frames_per_step, name="linear_projection")
        self.gate_layer = nn.Dense(1, name="gate_layer")
        # postnet
        self.postnet_convs = [
            nn.Conv(
                self.n_mels if i == self.postnet_n_convolution - 1 else self.postnet_embedding_dim,
                (self.postnet_kernel_size,),
                padding=[((self.postnet_kernel_size - 1) // 2,) * 2],
                name=f"postnet_conv_{i}",
            )
            for i in range(self.postnet_n_convolution)
        ]
        self.postnet_bns = [
            nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5, name=f"postnet_bn_{i}")
            for i in range(self.postnet_n_convolution)
        ]

    # ----- components ---------------------------------------------------
    def _encode(self, tokens, token_lengths):
        x = self.embedding(tokens)  # (B, L, E)
        for conv, bn in zip(self.encoder_convs, self.encoder_bns):
            x = nn.relu(bn(conv(x)))
        return self.encoder_lstm(x)  # (B, L, E)

    def _prenet(self, x, dropout_rng, prenet_dropout):
        for layer in (self.prenet_1, self.prenet_2):
            x = nn.relu(layer(x))
            if prenet_dropout:
                dropout_rng, sub = jax.random.split(dropout_rng)
                keep = jax.random.bernoulli(sub, 0.5, x.shape)
                x = jnp.where(keep, x / 0.5, 0.0)
        return x, dropout_rng

    def _postnet(self, x, n_frames=None):
        # x: (B, n_mels, T) -> channels-last.  ``n_frames`` (scalar) emulates
        # the reference operating on an array TRUNCATED to n_frames steps
        # (tacotron2.py infer truncates at the gate stop before the postnet):
        # frames >= n_frames are re-zeroed after every conv so each layer
        # sees the same zero padding a shorter array would have.  XLA static
        # shapes make truncation itself impossible under jit.
        y = jnp.swapaxes(x, 1, 2)
        tmask = None
        if n_frames is not None:
            tmask = (jnp.arange(y.shape[1]) < n_frames)[None, :, None]
            y = jnp.where(tmask, y, 0.0)
        for i, (conv, bn) in enumerate(zip(self.postnet_convs, self.postnet_bns)):
            y = bn(conv(y))
            if i < self.postnet_n_convolution - 1:
                y = jnp.tanh(y)
            if tmask is not None:
                y = jnp.where(tmask, y, 0.0)
        return jnp.swapaxes(y, 1, 2)

    def _attend(self, attention_hidden, memory, processed_memory, attention_weights_cat, mask):
        query = self.query_layer(attention_hidden[:, None])  # (B, 1, H)
        processed = self.location_dense(self.location_conv(jnp.swapaxes(attention_weights_cat, 1, 2)))
        energies = self.v(jnp.tanh(query + processed + processed_memory))[..., 0]  # (B, L)
        energies = jnp.where(mask, _NEG_INF, energies)
        weights = jax.nn.softmax(energies, axis=1)
        context = jnp.einsum("bl,bld->bd", weights, memory)
        return context, weights

    def _decode_step(self, state, decoder_input, memory, processed_memory, mask):
        (att_h, att_c, dec_h, dec_c, att_w, att_w_cum, att_ctx) = state
        cell_input = jnp.concatenate([decoder_input, att_ctx], -1)
        att_h, att_c = self.attention_rnn(cell_input, att_h, att_c)
        att_w_cat = jnp.stack([att_w, att_w_cum], axis=1)  # (B, 2, L)
        att_ctx, att_w = self._attend(att_h, memory, processed_memory, att_w_cat, mask)
        att_w_cum = att_w_cum + att_w
        dec_in = jnp.concatenate([att_h, att_ctx], -1)
        dec_h, dec_c = self.decoder_rnn(dec_in, dec_h, dec_c)
        dha = jnp.concatenate([dec_h, att_ctx], 1)
        mel = self.linear_projection(dha)
        gate = self.gate_layer(dha)
        return (att_h, att_c, dec_h, dec_c, att_w, att_w_cum, att_ctx), mel, gate

    def _init_decoder_state(self, memory):
        b, l, _ = memory.shape
        z = lambda d: jnp.zeros((b, d), memory.dtype)
        return (
            z(self.attention_rnn_dim), z(self.attention_rnn_dim),
            z(self.decoder_rnn_dim), z(self.decoder_rnn_dim),
            jnp.zeros((b, l), memory.dtype), jnp.zeros((b, l), memory.dtype),
            z(self.encoder_embedding_dim),
        )

    # ----- public -------------------------------------------------------
    def __call__(
        self,
        tokens: jnp.ndarray,
        token_lengths: jnp.ndarray,
        mel_specgram: jnp.ndarray,
        mel_specgram_lengths: jnp.ndarray,
        prenet_dropout: bool = True,
        dropout_rng: Optional[jax.Array] = None,
    ):
        """Teacher-forced training forward.

        tokens (B, L), mel_specgram (B, n_mels, T) →
        (mel (B, n_mels, T), mel_postnet, gate (B, T), alignments (B, T, L)).
        """
        if dropout_rng is None:
            dropout_rng = jax.random.PRNGKey(0)
        memory = self._encode(tokens, token_lengths)
        processed_memory = self.memory_layer(memory)
        l = memory.shape[1]
        mask = jnp.arange(l)[None, :] >= token_lengths[:, None]

        # teacher-forced inputs: go frame + ground truth shifted
        dec_in = jnp.swapaxes(mel_specgram, 1, 2)  # (B, T, n_mels)
        go = jnp.zeros_like(dec_in[:, :1])
        dec_in = jnp.concatenate([go, dec_in[:, :-1]], axis=1)
        dec_in, dropout_rng = self._prenet(dec_in, dropout_rng, prenet_dropout)

        state = self._init_decoder_state(memory)
        if self.is_initializing():
            # create the decoder-step params eagerly: inside the scan body
            # they would be traced values and leak out of init
            self._decode_step(state, dec_in[:, 0], memory, processed_memory, mask)

        def step(state, x_t):
            state, mel, gate = self._decode_step(state, x_t, memory, processed_memory, mask)
            return state, (mel, gate[:, 0], state[4])

        _, (mels, gates, aligns) = jax.lax.scan(step, state, jnp.moveaxis(dec_in, 1, 0))
        mel_out = jnp.moveaxis(mels, 0, 1)  # (B, T, n_mels)
        mel_out = jnp.swapaxes(mel_out, 1, 2)  # (B, n_mels, T)
        gate_out = jnp.moveaxis(gates, 0, 1)
        aligns = jnp.moveaxis(aligns, 0, 1)

        mel_post = mel_out + self._postnet(mel_out)

        if self.mask_padding:
            t = mel_out.shape[-1]
            out_mask = jnp.arange(t)[None, :] >= mel_specgram_lengths[:, None]  # (B, T)
            mel_out = jnp.where(out_mask[:, None, :], 0.0, mel_out)
            mel_post = jnp.where(out_mask[:, None, :], 0.0, mel_post)
            gate_out = jnp.where(out_mask, 1e3, gate_out)
        return mel_out, mel_post, gate_out, aligns

    def infer(
        self,
        tokens: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        prenet_dropout: bool = True,
        dropout_rng: Optional[jax.Array] = None,
        max_steps: Optional[int] = None,
    ):
        """Autoregressive inference: (mel (B, n_mels, S), lengths (B,), alignments)."""
        if dropout_rng is None:
            dropout_rng = jax.random.PRNGKey(0)
        b, l = tokens.shape
        if lengths is None:
            lengths = jnp.full((b,), l, jnp.int32)
        steps = max_steps or self.decoder_max_step
        memory = self._encode(tokens, lengths)
        processed_memory = self.memory_layer(memory)
        mask = jnp.arange(l)[None, :] >= lengths[:, None]

        state = self._init_decoder_state(memory)
        mel0 = jnp.zeros((b, self.n_mels * self.n_frames_per_step), memory.dtype)
        finished0 = jnp.zeros((b,), bool)
        out_len0 = jnp.zeros((b,), jnp.int32)
        keys = jax.random.split(dropout_rng, steps)
        if self.is_initializing():
            x0, _ = self._prenet(mel0, keys[0], prenet_dropout)
            self._decode_step(state, x0, memory, processed_memory, mask)

        def step(carry, key_t):
            state, mel_prev, finished, out_len = carry
            x, _ = self._prenet(mel_prev, key_t, prenet_dropout)
            state, mel, gate = self._decode_step(state, x, memory, processed_memory, mask)
            out_len = out_len + (~finished).astype(jnp.int32)
            finished = finished | (jax.nn.sigmoid(gate[:, 0]) > self.gate_threshold)
            return (state, mel, finished, out_len), (mel, gate[:, 0], state[4])

        (state, _, finished, out_len), (mels, gates, aligns) = jax.lax.scan(
            step, (state, mel0, finished0, out_len0), keys
        )
        mel_out = jnp.swapaxes(jnp.moveaxis(mels, 0, 1), 1, 2)  # (B, n_mels, S)
        # the reference loop stops once EVERY gate has fired (only when
        # decoder_early_stopping) and truncates the mel there
        # (tacotron2.py:843-858); frames past that step are padding here, so
        # zero them and give the postnet the truncated-array view
        n_frames = jnp.max(out_len) if self.decoder_early_stopping else steps
        mel_out = jnp.where((jnp.arange(steps) < n_frames)[None, None, :], mel_out, 0.0)
        mel_out = mel_out + self._postnet(mel_out, n_frames)
        aligns = jnp.moveaxis(aligns, 0, 1)
        return mel_out, out_len, aligns


def import_tacotron2_state_dict(state_dict) -> dict:
    """Convert a torchaudio Tacotron2 state_dict into flax params+batch_stats."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def dense(tpre, jname, bias=True):
        put(params, (jname, "kernel"), sd[f"{tpre}.weight"].T)
        if bias and f"{tpre}.bias" in sd:
            put(params, (jname, "bias"), sd[f"{tpre}.bias"])

    def lstm_cell(tpre, jname):
        put(params, (jname, "w_ih"), sd[f"{tpre}.weight_ih"].T)
        put(params, (jname, "w_hh"), sd[f"{tpre}.weight_hh"].T)
        put(params, (jname, "b_ih"), sd[f"{tpre}.bias_ih"])
        put(params, (jname, "b_hh"), sd[f"{tpre}.bias_hh"])

    def bn(tpre, jname):
        put(params, (jname, "scale"), sd[f"{tpre}.weight"])
        put(params, (jname, "bias"), sd[f"{tpre}.bias"])
        put(batch_stats, (jname, "mean"), sd[f"{tpre}.running_mean"])
        put(batch_stats, (jname, "var"), sd[f"{tpre}.running_var"])

    put(params, ("embedding", "embedding"), sd["embedding.weight"])
    n_enc = len({k.split(".")[2] for k in sd if k.startswith("encoder.convolutions.")})
    for i in range(n_enc):
        put(params, (f"encoder_conv_{i}", "kernel"), sd[f"encoder.convolutions.{i}.0.weight"].transpose(2, 1, 0))
        put(params, (f"encoder_conv_{i}", "bias"), sd[f"encoder.convolutions.{i}.0.bias"])
        bn(f"encoder.convolutions.{i}.1", f"encoder_bn_{i}")
    put(params, ("encoder_lstm", "w_ih_f"), sd["encoder.lstm.weight_ih_l0"].T)
    put(params, ("encoder_lstm", "w_hh_f"), sd["encoder.lstm.weight_hh_l0"].T)
    put(params, ("encoder_lstm", "b_ih_f"), sd["encoder.lstm.bias_ih_l0"])
    put(params, ("encoder_lstm", "b_hh_f"), sd["encoder.lstm.bias_hh_l0"])
    put(params, ("encoder_lstm", "w_ih_b"), sd["encoder.lstm.weight_ih_l0_reverse"].T)
    put(params, ("encoder_lstm", "w_hh_b"), sd["encoder.lstm.weight_hh_l0_reverse"].T)
    put(params, ("encoder_lstm", "b_ih_b"), sd["encoder.lstm.bias_ih_l0_reverse"])
    put(params, ("encoder_lstm", "b_hh_b"), sd["encoder.lstm.bias_hh_l0_reverse"])

    dense("decoder.prenet.layers.0", "prenet_1", bias=False)
    dense("decoder.prenet.layers.1", "prenet_2", bias=False)
    lstm_cell("decoder.attention_rnn", "attention_rnn")
    dense("decoder.attention_layer.query_layer", "query_layer", bias=False)
    dense("decoder.attention_layer.memory_layer", "memory_layer", bias=False)
    dense("decoder.attention_layer.v", "v", bias=False)
    put(params, ("location_conv", "kernel"),
        sd["decoder.attention_layer.location_layer.location_conv.weight"].transpose(2, 1, 0))
    dense("decoder.attention_layer.location_layer.location_dense", "location_dense", bias=False)
    lstm_cell("decoder.decoder_rnn", "decoder_rnn")
    dense("decoder.linear_projection", "linear_projection")
    dense("decoder.gate_layer", "gate_layer")

    n_post = len({k.split(".")[2] for k in sd if k.startswith("postnet.convolutions.")})
    for i in range(n_post):
        put(params, (f"postnet_conv_{i}", "kernel"), sd[f"postnet.convolutions.{i}.0.weight"].transpose(2, 1, 0))
        put(params, (f"postnet_conv_{i}", "bias"), sd[f"postnet.convolutions.{i}.0.bias"])
        bn(f"postnet.convolutions.{i}.1", f"postnet_bn_{i}")
    return {"params": params, "batch_stats": batch_stats}
