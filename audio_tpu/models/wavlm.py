"""WavLM model: gated relative-position-bias attention (flax.linen).

Architecture parity with
/root/reference/src/torchaudio/models/wav2vec2/wavlm_attention.py:32-215
(bucketed relative position embeddings, GRU-gated bias, packed-qkv
projection) and the wavlm factories in model.py:1216-1430.  The position
bias is computed in the first layer and threaded through subsequent layers,
each applying its own gating, exactly as the reference.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .wav2vec2.components import FeatureExtractor, FeatureProjection, FeedForward, ConvolutionalPositionalEmbedding
from .wav2vec2.model import _DEFAULT_CONV_CONFIG

__all__ = ["WavLMModel", "wavlm_model", "wavlm_base", "wavlm_base_plus", "wavlm_large", "import_wavlm_state_dict"]

_NEG_MASK = -1e4


def _relative_positions_bucket(relative_positions: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    """Bucketed relative positions (host-side; shapes are static)."""
    relative_buckets = np.zeros_like(relative_positions)
    num_buckets = num_buckets // 2
    relative_buckets += (relative_positions > 0).astype(np.int64) * num_buckets
    relative_positions = np.abs(relative_positions)
    max_exact = num_buckets // 2
    is_small = relative_positions < max_exact
    large = max_exact + (
        np.log(np.maximum(relative_positions, 1) / max_exact) / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    relative_buckets += np.where(is_small, relative_positions, large)
    return relative_buckets


class WavLMSelfAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    bias: bool = True
    has_relative_attention_bias: bool = False
    num_buckets: int = 32
    max_distance: int = 128
    gru_rel_pos: bool = True

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        position_bias: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        b, t, _ = query.shape
        head_dim = self.embed_dim // self.num_heads

        if self.has_relative_attention_bias and position_bias is None:
            ctx = np.arange(t)[:, None]
            mem = np.arange(t)[None, :]
            buckets = _relative_positions_bucket(mem - ctx, self.num_buckets, self.max_distance)
            rel_embed = self.param("rel_attn_embed", nn.initializers.normal(0.02), (self.num_buckets, self.num_heads))
            values = rel_embed[jnp.asarray(buckets)]  # (T, T, H)
            position_bias = jnp.broadcast_to(
                jnp.transpose(values, (2, 0, 1))[None], (b, self.num_heads, t, t)
            )

        attn_bias = None
        if position_bias is not None:
            attn_bias = position_bias
            if self.gru_rel_pos:
                gru_linear = nn.Dense(8, name="gru_rel_pos_linear")
                gru_const = self.param("gru_rel_pos_const", nn.initializers.ones, (1, self.num_heads, 1, 1))
                q_heads = query.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)
                gates = jax.nn.sigmoid(
                    gru_linear(q_heads).reshape(b, self.num_heads, t, 2, 4).sum(-1)
                )
                gate_a, gate_b = gates[..., 0], gates[..., 1]
                gate_a_1 = gate_a * (gate_b * gru_const[..., 0] - 1.0) + 2.0
                attn_bias = gate_a_1[..., None] * position_bias

        if attention_mask is not None:
            attn_bias = attention_mask if attn_bias is None else attn_bias + attention_mask
        if key_padding_mask is not None:
            pad_bias = (_NEG_MASK * key_padding_mask.astype(query.dtype))[:, None, None, :]
            attn_bias = pad_bias if attn_bias is None else attn_bias + pad_bias

        qkv = nn.Dense(3 * self.embed_dim, use_bias=self.bias, name="in_proj")(query)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.num_heads, head_dim)
        k = k.reshape(b, t, self.num_heads, head_dim)
        v = v.reshape(b, t, self.num_heads, head_dim)
        bias_bhqk = None if attn_bias is None else attn_bias
        out = jax.nn.dot_product_attention(q, k, v, bias=bias_bhqk)
        out = out.reshape(b, t, self.embed_dim)
        out = nn.Dense(self.embed_dim, use_bias=self.bias, name="out_proj")(out)
        return out, position_bias


class _WavLMEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    num_buckets: int
    max_distance: int
    attention_dropout: float
    dropout: float
    layer_norm_first: bool
    ff_interm_features: int
    ff_interm_dropout: float
    has_relative_attention_bias: bool

    @nn.compact
    def __call__(self, x, attention_mask=None, position_bias=None, key_padding_mask=None, deterministic=True):
        attention = WavLMSelfAttention(
            self.embed_dim, self.num_heads, self.attention_dropout,
            has_relative_attention_bias=self.has_relative_attention_bias,
            num_buckets=self.num_buckets, max_distance=self.max_distance, name="attention",
        )
        feed_forward = FeedForward(
            self.embed_dim, self.ff_interm_features, self.ff_interm_dropout, self.dropout, name="feed_forward"
        )
        residual = x
        if self.layer_norm_first:
            x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        x, position_bias = attention(
            x, attention_mask=attention_mask, position_bias=position_bias,
            key_padding_mask=key_padding_mask, deterministic=deterministic,
        )
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = residual + x
        if self.layer_norm_first:
            x = x + feed_forward(nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x), deterministic=deterministic)
        else:
            x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
            x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x + feed_forward(x, deterministic=deterministic))
        return x, position_bias


class _WavLMTransformer(nn.Module):
    embed_dim: int
    num_layers: int
    num_heads: int
    num_buckets: int
    max_distance: int
    attention_dropout: float
    dropout: float
    layer_norm_first: bool  # preprocess norm (reference passes NOT layer_norm_first)
    layer_layer_norm_first: bool
    layer_drop: float
    ff_interm_features: int
    ff_interm_dropout: float
    pos_conv_kernel: int
    pos_conv_groups: int

    def setup(self):
        self.pos_conv_embed = ConvolutionalPositionalEmbedding(
            self.embed_dim, self.pos_conv_kernel, self.pos_conv_groups, name="pos_conv_embed"
        )
        self.layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
        self.drop = nn.Dropout(self.dropout)
        self.layers = [
            _WavLMEncoderLayer(
                self.embed_dim, self.num_heads, self.num_buckets, self.max_distance,
                self.attention_dropout, self.dropout, self.layer_layer_norm_first,
                self.ff_interm_features, self.ff_interm_dropout,
                has_relative_attention_bias=(i == 0),
                name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]

    def _preprocess(self, x, deterministic):
        x = x + self.pos_conv_embed(x)
        if self.layer_norm_first:
            x = self.layer_norm(x)
        return self.drop(x, deterministic=deterministic)

    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        x = self._preprocess(x, deterministic)
        position_bias = None
        for layer in self.layers:
            x, position_bias = layer(
                x, position_bias=position_bias, key_padding_mask=key_padding_mask, deterministic=deterministic
            )
        if not self.layer_norm_first:
            x = self.layer_norm(x)
        return x

    def get_intermediate_outputs(self, x, key_padding_mask=None, num_layers=None, deterministic=True):
        if num_layers is not None and not 0 < num_layers <= len(self.layers):
            raise ValueError(f"`num_layers` must be between [1, {len(self.layers)}]")
        ret = []
        position_bias = None
        x = self._preprocess(x, deterministic)
        for layer in self.layers:
            x, position_bias = layer(
                x, position_bias=position_bias, key_padding_mask=key_padding_mask, deterministic=deterministic
            )
            ret.append(x)
            if num_layers is not None and len(ret) >= num_layers:
                break
        return ret


class WavLMModel(nn.Module):
    """WavLM acoustic model (Wav2Vec2Model API with gated rel-pos attention)."""

    extractor_mode: str
    extractor_conv_layer_config: Tuple[Tuple[int, int, int], ...]
    extractor_conv_bias: bool
    encoder_embed_dim: int
    encoder_projection_dropout: float
    encoder_pos_conv_kernel: int
    encoder_pos_conv_groups: int
    encoder_num_layers: int
    encoder_num_heads: int
    encoder_num_buckets: int
    encoder_max_distance: int
    encoder_attention_dropout: float
    encoder_ff_interm_features: int
    encoder_ff_interm_dropout: float
    encoder_dropout: float
    encoder_layer_norm_first: bool
    encoder_layer_drop: float
    aux_num_out: Optional[int] = None

    def setup(self):
        self.feature_extractor = FeatureExtractor(
            self.extractor_conv_layer_config, self.extractor_conv_bias, self.extractor_mode, name="feature_extractor"
        )
        self.feature_projection = FeatureProjection(
            self.encoder_embed_dim, self.encoder_projection_dropout, name="encoder_feature_projection"
        )
        self.transformer = _WavLMTransformer(
            self.encoder_embed_dim,
            self.encoder_num_layers,
            self.encoder_num_heads,
            self.encoder_num_buckets,
            self.encoder_max_distance,
            self.encoder_attention_dropout,
            self.encoder_dropout,
            not self.encoder_layer_norm_first,
            self.encoder_layer_norm_first,
            self.encoder_layer_drop,
            self.encoder_ff_interm_features,
            self.encoder_ff_interm_dropout,
            self.encoder_pos_conv_kernel,
            self.encoder_pos_conv_groups,
            name="encoder_transformer",
        )
        if self.aux_num_out is not None:
            self.aux = nn.Dense(self.aux_num_out, name="aux")

    def _encode_prep(self, waveforms, lengths, deterministic):
        x, lengths = self.feature_extractor(waveforms, lengths)
        x = self.feature_projection(x, deterministic=deterministic)
        key_padding_mask = None
        if lengths is not None:
            key_padding_mask = jnp.arange(x.shape[1])[None, :] >= lengths[:, None]
            x = jnp.where(key_padding_mask[..., None], 0.0, x)
        return x, lengths, key_padding_mask

    def __call__(self, waveforms, lengths=None, deterministic: bool = True):
        x, lengths, kpm = self._encode_prep(waveforms, lengths, deterministic)
        x = self.transformer(x, key_padding_mask=kpm, deterministic=deterministic)
        if self.aux_num_out is not None:
            x = self.aux(x)
        return x, lengths

    def extract_features(self, waveforms, lengths=None, num_layers=None, deterministic: bool = True):
        x, lengths, kpm = self._encode_prep(waveforms, lengths, deterministic)
        feats = self.transformer.get_intermediate_outputs(x, kpm, num_layers, deterministic)
        return feats, lengths


def wavlm_model(
    extractor_mode: str,
    extractor_conv_layer_config: Optional[List[Tuple[int, int, int]]],
    extractor_conv_bias: bool,
    encoder_embed_dim: int,
    encoder_projection_dropout: float,
    encoder_pos_conv_kernel: int,
    encoder_pos_conv_groups: int,
    encoder_num_layers: int,
    encoder_num_heads: int,
    encoder_num_buckets: int,
    encoder_max_distance: int,
    encoder_attention_dropout: float,
    encoder_ff_interm_features: int,
    encoder_ff_interm_dropout: float,
    encoder_dropout: float,
    encoder_layer_norm_first: bool,
    encoder_layer_drop: float,
    aux_num_out: Optional[int] = None,
) -> WavLMModel:
    if extractor_conv_layer_config is None:
        extractor_conv_layer_config = _DEFAULT_CONV_CONFIG
    return WavLMModel(
        extractor_mode=extractor_mode,
        extractor_conv_layer_config=tuple(tuple(c) for c in extractor_conv_layer_config),
        extractor_conv_bias=extractor_conv_bias,
        encoder_embed_dim=encoder_embed_dim,
        encoder_projection_dropout=encoder_projection_dropout,
        encoder_pos_conv_kernel=encoder_pos_conv_kernel,
        encoder_pos_conv_groups=encoder_pos_conv_groups,
        encoder_num_layers=encoder_num_layers,
        encoder_num_heads=encoder_num_heads,
        encoder_num_buckets=encoder_num_buckets,
        encoder_max_distance=encoder_max_distance,
        encoder_attention_dropout=encoder_attention_dropout,
        encoder_ff_interm_features=encoder_ff_interm_features,
        encoder_ff_interm_dropout=encoder_ff_interm_dropout,
        encoder_dropout=encoder_dropout,
        encoder_layer_norm_first=encoder_layer_norm_first,
        encoder_layer_drop=encoder_layer_drop,
        aux_num_out=aux_num_out,
    )


def wavlm_base(
    encoder_projection_dropout: float = 0.1,
    encoder_attention_dropout: float = 0.1,
    encoder_ff_interm_dropout: float = 0.1,
    encoder_dropout: float = 0.1,
    encoder_layer_drop: float = 0.1,
    aux_num_out: Optional[int] = None,
) -> WavLMModel:
    return wavlm_model(
        "group_norm", None, False, 768, encoder_projection_dropout, 128, 16, 12, 12, 320, 800,
        encoder_attention_dropout, 3072, encoder_ff_interm_dropout, encoder_dropout, False,
        encoder_layer_drop, aux_num_out,
    )


def wavlm_base_plus(**kw) -> WavLMModel:
    return wavlm_base(**kw)


def wavlm_large(
    encoder_projection_dropout: float = 0.1,
    encoder_attention_dropout: float = 0.1,
    encoder_ff_interm_dropout: float = 0.0,
    encoder_dropout: float = 0.1,
    encoder_layer_drop: float = 0.1,
    aux_num_out: Optional[int] = None,
) -> WavLMModel:
    return wavlm_model(
        "layer_norm", None, False, 1024, encoder_projection_dropout, 128, 16, 24, 16, 320, 800,
        encoder_attention_dropout, 4096, encoder_ff_interm_dropout, encoder_dropout, True,
        encoder_layer_drop, aux_num_out,
    )


def import_wavlm_state_dict(state_dict) -> dict:
    """Convert a torchaudio WavLM state_dict into flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    pos_prefix = "encoder.transformer.pos_conv_embed.conv"
    if f"{pos_prefix}.parametrizations.weight.original0" in sd:
        g = sd.pop(f"{pos_prefix}.parametrizations.weight.original0")
        v = sd.pop(f"{pos_prefix}.parametrizations.weight.original1")
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        sd[f"{pos_prefix}.weight"] = g * v / np.maximum(norm, 1e-12)
    elif f"{pos_prefix}.weight_g" in sd:
        g = sd.pop(f"{pos_prefix}.weight_g")
        v = sd.pop(f"{pos_prefix}.weight_v")
        norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
        sd[f"{pos_prefix}.weight"] = g * v / np.maximum(norm, 1e-12)

    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] == "feature_extractor":
            i, mod, kind = parts[2], parts[3], parts[4]
            base = ("feature_extractor", f"conv_layers_{i}", mod)
            if mod == "conv":
                put(base + ("kernel",) if kind == "weight" else base + ("bias",),
                    value.transpose(2, 1, 0) if kind == "weight" else value)
            else:
                put(base + ("scale" if kind == "weight" else "bias",), value)
        elif parts[:2] == ["encoder", "feature_projection"]:
            mod, kind = parts[2], parts[3]
            base = ("encoder_feature_projection", mod)
            if mod == "projection":
                put(base + ("kernel" if kind == "weight" else "bias",),
                    value.T if kind == "weight" else value)
            else:
                put(base + ("scale" if kind == "weight" else "bias",), value)
        elif parts[:2] == ["encoder", "transformer"]:
            if parts[2] == "pos_conv_embed":
                kind = parts[4]
                base = ("encoder_transformer", "pos_conv_embed", "conv")
                put(base + ("kernel" if kind == "weight" else "bias",),
                    value.transpose(2, 1, 0) if kind == "weight" else value)
            elif parts[2] == "layer_norm":
                put(("encoder_transformer", "layer_norm", "scale" if parts[3] == "weight" else "bias"), value)
            elif parts[2] == "layers":
                i = parts[3]
                rest = parts[4:]
                base = ("encoder_transformer", f"layers_{i}")
                if rest[0] == "attention":
                    if rest[1] == "attention":  # packed MultiheadAttention
                        if rest[2] == "in_proj_weight":
                            put(base + ("attention", "in_proj", "kernel"), value.T)
                        elif rest[2] == "in_proj_bias":
                            put(base + ("attention", "in_proj", "bias"), value)
                        elif rest[2] == "out_proj":
                            put(base + ("attention", "out_proj", "kernel" if rest[3] == "weight" else "bias"),
                                value.T if rest[3] == "weight" else value)
                    elif rest[1] == "rel_attn_embed":
                        put(base + ("attention", "rel_attn_embed"), value)
                    elif rest[1] == "gru_rel_pos_linear":
                        put(base + ("attention", "gru_rel_pos_linear", "kernel" if rest[2] == "weight" else "bias"),
                            value.T if rest[2] == "weight" else value)
                    elif rest[1] == "gru_rel_pos_const":
                        put(base + ("attention", "gru_rel_pos_const"), value)
                elif rest[0] == "feed_forward":
                    dense, kind = rest[1], rest[2]
                    put(base + ("feed_forward", dense, "kernel" if kind == "weight" else "bias"),
                        value.T if kind == "weight" else value)
                elif rest[0] in ("layer_norm", "final_layer_norm"):
                    put(base + (rest[0], "scale" if rest[1] == "weight" else "bias"), value)
        elif parts[0] == "aux":
            put(("aux", "kernel" if parts[1] == "weight" else "bias"),
                value.T if parts[1] == "weight" else value)
        else:
            raise KeyError(f"Unrecognized key: {key}")
    return params
