"""Conformer encoder (flax.linen).

Architecture parity with /root/reference/src/torchaudio/models/conformer.py:
_ConvolutionModule (:18-90, pointwise→GLU→depthwise→BatchNorm/GroupNorm→SiLU→
pointwise), _FeedForwardModule (:93-119, half-step residuals), ConformerLayer
(:122-215), Conformer (:215-...).  The torch MultiheadAttention packed-qkv
params map through ``import_conformer_state_dict``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["Conformer", "import_conformer_state_dict"]

_NEG_MASK = -1e9


class _FeedForwardModule(nn.Module):
    input_dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        x = nn.Dense(self.hidden_dim, name="linear1")(x)
        x = nn.silu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.input_dim, name="linear2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class _ConvolutionModule(nn.Module):
    input_dim: int
    num_channels: int
    depthwise_kernel_size: int
    dropout: float = 0.0
    bias: bool = False
    use_group_norm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if (self.depthwise_kernel_size - 1) % 2 != 0:
            raise ValueError("depthwise_kernel_size must be odd to achieve 'SAME' padding.")
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        x = nn.Dense(2 * self.num_channels, use_bias=self.bias, name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU over the channel axis
        pad = (self.depthwise_kernel_size - 1) // 2
        x = nn.Conv(
            self.num_channels,
            kernel_size=(self.depthwise_kernel_size,),
            padding=[(pad, pad)],
            feature_group_count=self.num_channels,
            use_bias=self.bias,
            name="depthwise_conv",
        )(x)
        if self.use_group_norm:
            x = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm")(x)
        else:
            x = nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5, name="norm"
            )(x)
        x = nn.silu(x)
        x = nn.Dense(self.input_dim, use_bias=self.bias, name="pointwise_conv2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class _MultiheadSelfAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent self attention."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, key_padding_mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        b, t, _ = x.shape
        head_dim = self.embed_dim // self.num_heads
        qkv = nn.Dense(3 * self.embed_dim, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.num_heads, head_dim)
        k = k.reshape(b, t, self.num_heads, head_dim)
        v = v.reshape(b, t, self.num_heads, head_dim)
        bias = None
        if key_padding_mask is not None:  # (B, T) True = pad
            bias = (_NEG_MASK * key_padding_mask.astype(x.dtype))[:, None, None, :]
        out = jax.nn.dot_product_attention(q, k, v, bias=bias)
        out = out.reshape(b, t, self.embed_dim)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class ConformerLayer(nn.Module):
    input_dim: int
    ffn_dim: int
    num_attention_heads: int
    depthwise_conv_kernel_size: int
    dropout: float = 0.0
    use_group_norm: bool = False
    convolution_first: bool = False

    @nn.compact
    def __call__(self, x, key_padding_mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        conv_module = _ConvolutionModule(
            self.input_dim,
            self.input_dim,
            self.depthwise_conv_kernel_size,
            self.dropout,
            bias=True,
            use_group_norm=self.use_group_norm,
            name="conv_module",
        )

        residual = x
        x = _FeedForwardModule(self.input_dim, self.ffn_dim, self.dropout, name="ffn1")(x, deterministic)
        x = x * 0.5 + residual

        if self.convolution_first:
            x = x + conv_module(x, deterministic)

        residual = x
        x = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        x = _MultiheadSelfAttention(self.input_dim, self.num_attention_heads, self.dropout, name="self_attn")(
            x, key_padding_mask, deterministic
        )
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = x + residual

        if not self.convolution_first:
            x = x + conv_module(x, deterministic)

        residual = x
        x = _FeedForwardModule(self.input_dim, self.ffn_dim, self.dropout, name="ffn2")(x, deterministic)
        x = x * 0.5 + residual

        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)


class Conformer(nn.Module):
    """Conformer encoder: (B, T, D) + lengths -> (B, T, D) + lengths."""

    input_dim: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    depthwise_conv_kernel_size: int
    dropout: float = 0.0
    use_group_norm: bool = False
    convolution_first: bool = False

    @nn.compact
    def __call__(self, input: jnp.ndarray, lengths: jnp.ndarray, deterministic: bool = True):
        t = input.shape[1]
        key_padding_mask = jnp.arange(t)[None, :] >= lengths[:, None]
        x = input
        for i in range(self.num_layers):
            x = ConformerLayer(
                self.input_dim,
                self.ffn_dim,
                self.num_heads,
                self.depthwise_conv_kernel_size,
                self.dropout,
                self.use_group_norm,
                self.convolution_first,
                name=f"conformer_layers_{i}",
            )(x, key_padding_mask, deterministic)
        return x, lengths


def import_conformer_state_dict(state_dict) -> Dict:
    """Convert a torchaudio Conformer state_dict into flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    batch_stats: Dict = {}

    def put_bs(path, value):
        node = batch_stats
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] != "conformer_layers":
            raise KeyError(f"Unrecognized key: {key}")
        layer = f"conformer_layers_{parts[1]}"
        rest = parts[2:]
        if rest[0] in ("ffn1", "ffn2"):
            # sequential: 0 LayerNorm, 1 Linear, 4 Linear
            idx, kind = rest[2], rest[3]
            sub = {"0": ("layer_norm",), "1": ("linear1",), "4": ("linear2",)}[idx]
            if sub[0] == "layer_norm":
                put((layer, rest[0], "layer_norm", "scale" if kind == "weight" else "bias"), value)
            else:
                put((layer, rest[0], sub[0], "kernel" if kind == "weight" else "bias"),
                    value.T if kind == "weight" else value)
        elif rest[0] == "self_attn_layer_norm":
            put((layer, "self_attn_layer_norm", "scale" if rest[1] == "weight" else "bias"), value)
        elif rest[0] == "self_attn":
            if rest[1] == "in_proj_weight":
                put((layer, "self_attn", "in_proj", "kernel"), value.T)
            elif rest[1] == "in_proj_bias":
                put((layer, "self_attn", "in_proj", "bias"), value)
            elif rest[1] == "out_proj":
                put((layer, "self_attn", "out_proj", "kernel" if rest[2] == "weight" else "bias"),
                    value.T if rest[2] == "weight" else value)
        elif rest[0] == "conv_module":
            if rest[1] == "layer_norm":
                put((layer, "conv_module", "layer_norm", "scale" if rest[2] == "weight" else "bias"), value)
            elif rest[1] == "sequential":
                idx, kind = rest[2], rest[3]
                if idx == "0":  # pointwise conv1 (1x1) -> Dense
                    if kind == "weight":  # (2C, C, 1) -> (C, 2C)
                        put((layer, "conv_module", "pointwise_conv1", "kernel"), value[:, :, 0].T)
                    else:
                        put((layer, "conv_module", "pointwise_conv1", "bias"), value)
                elif idx == "2":  # depthwise conv (C, 1, K) -> (K, 1, C)
                    if kind == "weight":
                        put((layer, "conv_module", "depthwise_conv", "kernel"), value.transpose(2, 1, 0))
                    else:
                        put((layer, "conv_module", "depthwise_conv", "bias"), value)
                elif idx == "3":  # BatchNorm / GroupNorm
                    if kind == "weight":
                        put((layer, "conv_module", "norm", "scale"), value)
                    elif kind == "bias":
                        put((layer, "conv_module", "norm", "bias"), value)
                    elif kind == "running_mean":
                        put_bs((layer, "conv_module", "norm", "mean"), value)
                    elif kind == "running_var":
                        put_bs((layer, "conv_module", "norm", "var"), value)
                    # num_batches_tracked ignored
                elif idx == "5":  # pointwise conv2 (D, C, 1) -> (C, D)
                    if kind == "weight":
                        put((layer, "conv_module", "pointwise_conv2", "kernel"), value[:, :, 0].T)
                    else:
                        put((layer, "conv_module", "pointwise_conv2", "bias"), value)
        elif rest[0] == "final_layer_norm":
            put((layer, "final_layer_norm", "scale" if rest[1] == "weight" else "bias"), value)
        else:
            raise KeyError(f"Unrecognized key: {key}")
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
