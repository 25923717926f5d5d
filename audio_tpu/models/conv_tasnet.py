"""Conv-TasNet source separation (flax.linen).

Architecture parity with /root/reference/src/torchaudio/models/conv_tasnet.py:
ConvBlock (:11-68), MaskGenerator (:70-160), ConvTasNet (:162-330, incl. the
stride-alignment padding), conv_tasnet_base (:333-366).  Channels-last
internally (TPU conv layout); the transposed-conv decoder is expressed as an
input-dilated convolution.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ConvTasNet", "conv_tasnet_base", "import_conv_tasnet_state_dict"]


class _PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda *_: jnp.asarray(0.25), ())
        return jnp.where(x >= 0, x, a * x)


class _ChannelNorm(nn.Module):
    """GroupNorm(num_groups=1) over the channel axis for (B, T, C) input,
    normalizing over (T, C) jointly like torch's GroupNorm on (B, C, T)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = x.mean(axis=(-2, -1), keepdims=True)
        var = x.var(axis=(-2, -1), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class ConvBlock(nn.Module):
    io_channels: int
    hidden_channels: int
    kernel_size: int
    padding: int
    dilation: int = 1
    no_residual: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
        feats = nn.Dense(self.hidden_channels, name="conv1x1_in")(x)
        feats = _PReLU(name="prelu1")(feats)
        feats = _ChannelNorm(name="norm1")(feats)
        feats = nn.Conv(
            self.hidden_channels,
            (self.kernel_size,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            feature_group_count=self.hidden_channels,
            name="depthwise",
        )(feats)
        feats = _PReLU(name="prelu2")(feats)
        feats = _ChannelNorm(name="norm2")(feats)
        residual = None if self.no_residual else nn.Dense(self.io_channels, name="res_out")(feats)
        skip = nn.Dense(self.io_channels, name="skip_out")(feats)
        return residual, skip


class MaskGenerator(nn.Module):
    input_dim: int
    num_sources: int
    kernel_size: int
    num_feats: int
    num_hidden: int
    num_layers: int
    num_stacks: int
    msk_activate: str

    @nn.compact
    def __call__(self, x):
        """x: (B, M, F) -> masks (B, S, M, F)."""
        b = x.shape[0]
        feats = _ChannelNorm(name="input_norm")(x)
        feats = nn.Dense(self.num_feats, name="input_conv")(feats)
        output = 0.0
        idx = 0
        for s in range(self.num_stacks):
            for l in range(self.num_layers):
                multi = 2**l
                residual, skip = ConvBlock(
                    self.num_feats,
                    self.num_hidden,
                    self.kernel_size,
                    padding=multi,
                    dilation=multi,
                    no_residual=(l == (self.num_layers - 1) and s == (self.num_stacks - 1)),
                    name=f"conv_layers_{idx}",
                )(feats)
                if residual is not None:
                    feats = feats + residual
                output = output + skip
                idx += 1
        output = _PReLU(name="output_prelu")(output)
        output = nn.Dense(self.input_dim * self.num_sources, name="output_conv")(output)
        if self.msk_activate == "sigmoid":
            output = jax.nn.sigmoid(output)
        elif self.msk_activate == "relu":
            output = nn.relu(output)
        else:
            raise ValueError(f"Unsupported activation {self.msk_activate}")
        m = output.shape[1]
        # torch reshapes (B, S*F, M) -> (B, S, F, M); channels-last equivalent:
        return output.reshape(b, m, self.num_sources, self.input_dim).transpose(0, 2, 1, 3)


class ConvTasNet(nn.Module):
    num_sources: int = 2
    enc_kernel_size: int = 16
    enc_num_feats: int = 512
    msk_kernel_size: int = 3
    msk_num_feats: int = 128
    msk_num_hidden_feats: int = 512
    msk_num_layers: int = 8
    msk_num_stacks: int = 3
    msk_activate: str = "sigmoid"

    @nn.compact
    def __call__(self, input: jnp.ndarray) -> jnp.ndarray:
        """input (B, 1, L) -> separated (B, num_sources, L)."""
        if input.ndim != 3 or input.shape[1] != 1:
            raise ValueError(f"Expected 3D tensor (batch, channel==1, frames). Found: {input.shape}")
        stride = self.enc_kernel_size // 2
        b, _, num_frames = input.shape
        is_odd = self.enc_kernel_size % 2
        num_strides = (num_frames - is_odd) // stride
        num_remainings = num_frames - (is_odd + num_strides * stride)
        num_pads = 0 if num_remainings == 0 else stride - num_remainings
        x = jnp.pad(input, ((0, 0), (0, 0), (0, num_pads)))
        num_padded = x.shape[-1]

        x = x[:, 0, :, None]  # (B, L', 1) channels-last
        feats = nn.Conv(
            self.enc_num_feats,
            (self.enc_kernel_size,),
            strides=(stride,),
            padding=[(stride, stride)],
            use_bias=False,
            name="encoder",
        )(x)  # (B, M, F)
        masks = MaskGenerator(
            self.enc_num_feats,
            self.num_sources,
            self.msk_kernel_size,
            self.msk_num_feats,
            self.msk_num_hidden_feats,
            self.msk_num_layers,
            self.msk_num_stacks,
            self.msk_activate,
            name="mask_generator",
        )(feats)  # (B, S, M, F)
        masked = masks * feats[:, None]  # (B, S, M, F)
        masked = masked.reshape(b * self.num_sources, masked.shape[2], self.enc_num_feats)

        # ConvTranspose1d(F→1, k, stride, padding=stride, no bias) as an
        # input-dilated conv with flipped kernel.
        dec_kernel = self.param(
            "decoder_kernel", nn.initializers.lecun_normal(), (self.enc_kernel_size, self.enc_num_feats, 1)
        )
        pad = self.enc_kernel_size - 1 - stride
        decoded = jax.lax.conv_general_dilated(
            masked,
            jnp.flip(dec_kernel, 0),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )  # (B*S, L', 1)
        output = decoded[..., 0].reshape(b, self.num_sources, num_padded)
        if num_pads > 0:
            output = output[..., :-num_pads]
        return output


def conv_tasnet_base(num_sources: int = 2) -> ConvTasNet:
    """Non-causal ConvTasNet with the paper's best Si-SNR settings (relu masks)."""
    return ConvTasNet(
        num_sources=num_sources,
        enc_kernel_size=16,
        enc_num_feats=512,
        msk_kernel_size=3,
        msk_num_feats=128,
        msk_num_hidden_feats=512,
        msk_num_layers=8,
        msk_num_stacks=3,
        msk_activate="relu",
    )


def import_conv_tasnet_state_dict(state_dict) -> Dict:
    """Convert a torchaudio ConvTasNet state_dict into flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv1x1(base, tkey):
        put(base + ("kernel",), sd[f"{tkey}.weight"][:, :, 0].T)
        if f"{tkey}.bias" in sd:
            put(base + ("bias",), sd[f"{tkey}.bias"])

    put(("encoder", "kernel"), sd["encoder.weight"].transpose(2, 1, 0))
    put(("decoder_kernel",), sd["decoder.weight"].transpose(2, 0, 1))  # (in, out, K) -> (K, in, out)

    mg = "mask_generator"
    put((mg, "input_norm", "scale"), sd[f"{mg}.input_norm.weight"])
    put((mg, "input_norm", "bias"), sd[f"{mg}.input_norm.bias"])
    conv1x1((mg, "input_conv"), f"{mg}.input_conv")
    put((mg, "output_prelu", "alpha"), sd[f"{mg}.output_prelu.weight"].reshape(()))
    conv1x1((mg, "output_conv"), f"{mg}.output_conv")

    n_blocks = len({k.split(".")[2] for k in sd if k.startswith(f"{mg}.conv_layers.")})
    for i in range(n_blocks):
        base = (mg, f"conv_layers_{i}")
        t = f"{mg}.conv_layers.{i}.conv_layers"
        conv1x1(base + ("conv1x1_in",), f"{t}.0")
        put(base + ("prelu1", "alpha"), sd[f"{t}.1.weight"].reshape(()))
        put(base + ("norm1", "scale"), sd[f"{t}.2.weight"])
        put(base + ("norm1", "bias"), sd[f"{t}.2.bias"])
        put(base + ("depthwise", "kernel"), sd[f"{t}.3.weight"].transpose(2, 1, 0))
        put(base + ("depthwise", "bias"), sd[f"{t}.3.bias"])
        put(base + ("prelu2", "alpha"), sd[f"{t}.4.weight"].reshape(()))
        put(base + ("norm2", "scale"), sd[f"{t}.5.weight"])
        put(base + ("norm2", "bias"), sd[f"{t}.5.bias"])
        if f"{mg}.conv_layers.{i}.res_out.weight" in sd:
            conv1x1(base + ("res_out",), f"{mg}.conv_layers.{i}.res_out")
        conv1x1(base + ("skip_out",), f"{mg}.conv_layers.{i}.skip_out")
    return {"params": params}
