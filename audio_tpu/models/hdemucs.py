"""HDemucs: hybrid spectrogram/waveform source separation (flax.linen).

Architecture parity with /root/reference/src/torchaudio/models/_hdemucs.py:
_ScaledEmbedding (:35-70), _HEncLayer (:73-182), _HDecLayer (:183-300),
HDemucs with its own normalized spectrogram framing (:301-636, _spec/_ispec
pad conventions at :465-498), _DConv dilated residual branches (:637-723),
chunked _BLSTM (:724-790), _LocalState decay attention (:791-860),
_LayerScale (:860-878), hdemucs_low/medium/high factories (:949-1008).

Implementation is channels-first (torch layout) via explicit lax convs so the
checkpoint importer is a direct key mapping.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..functional._stft import istft as _istft_fn, stft as _stft_fn
from .._internal.windows import hann_window

__all__ = ["HDemucs", "hdemucs_low", "hdemucs_medium", "hdemucs_high", "import_hdemucs_state_dict"]


# ---------------------------------------------------------------------------
# channels-first conv primitives with torch-layout weights
# ---------------------------------------------------------------------------


class _Conv(nn.Module):
    chout: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...]
    padding: Tuple[int, ...]
    dilation: Tuple[int, ...] = None

    @nn.compact
    def __call__(self, x):
        nd = len(self.kernel)
        chin = x.shape[1]
        w = self.param("weight", nn.initializers.lecun_normal(), (self.chout, chin) + tuple(self.kernel))
        b = self.param("bias", nn.initializers.zeros, (self.chout,))
        dn = ("NCH", "OIH", "NCH") if nd == 1 else ("NCHW", "OIHW", "NCHW")
        y = jax.lax.conv_general_dilated(
            x, w, tuple(self.stride), [(p, p) for p in self.padding],
            rhs_dilation=tuple(self.dilation) if self.dilation else None,
            dimension_numbers=dn,
        )
        return y + b.reshape((1, -1) + (1,) * nd)


class _ConvT(nn.Module):
    chout: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        nd = len(self.kernel)
        chin = x.shape[1]
        # torch ConvTranspose layout: (in, out, *k)
        w = self.param("weight", nn.initializers.lecun_normal(), (chin, self.chout) + tuple(self.kernel))
        b = self.param("bias", nn.initializers.zeros, (self.chout,))
        w_flip = jnp.flip(w, axis=tuple(range(2, 2 + nd))).swapaxes(0, 1)  # (out, in, *k)
        dn = ("NCH", "OIH", "NCH") if nd == 1 else ("NCHW", "OIHW", "NCHW")
        pads = [(k - 1, k - 1) for k in self.kernel]
        y = jax.lax.conv_general_dilated(
            x, w_flip, (1,) * nd, pads, lhs_dilation=tuple(self.stride), dimension_numbers=dn
        )
        return y + b.reshape((1, -1) + (1,) * nd)


class _GroupNormCF(nn.Module):
    """GroupNorm over channels-first input (B, C, *spatial)."""

    groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[1]
        scale = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        b = x.shape[0]
        spatial = x.shape[2:]
        g = self.groups
        xg = x.reshape((b, g, c // g) + spatial)
        axes = tuple(range(2, xg.ndim))
        mean = xg.mean(axis=axes, keepdims=True)
        var = xg.var(axis=axes, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        x = xg.reshape((b, c) + spatial)
        shape = (1, c) + (1,) * len(spatial)
        return x * scale.reshape(shape) + bias.reshape(shape)


def _glu(x, axis=1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def _gelu(x):
    return nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# DConv branch components
# ---------------------------------------------------------------------------


class _LayerScale(nn.Module):
    channels: int
    init: float = 0.0

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.constant(self.init), (self.channels,))
        return scale[:, None] * x


class _BLSTM(nn.Module):
    """2-layer bidirectional LSTM over (B, C, T) with 200-step chunking."""

    dim: int
    layers: int = 2
    skip: bool = True
    max_steps: int = 200

    def _lstm_dir(self, x, w_ih, w_hh, b_ih, b_hh, reverse):
        # x: (B, T, D)
        if reverse:
            x = jnp.flip(x, 1)
        b = x.shape[0]
        pre = x @ w_ih.T + b_ih

        def step(carry, pre_t):
            h, c = carry
            gates = pre_t + h @ w_hh.T + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((b, self.dim), x.dtype)
        _, ys = jax.lax.scan(step, (h0, h0), jnp.moveaxis(pre, 1, 0))
        ys = jnp.moveaxis(ys, 0, 1)
        return jnp.flip(ys, 1) if reverse else ys

    @nn.compact
    def __call__(self, x):
        b, c, t = x.shape
        y_in = x
        framed = False
        if self.max_steps is not None and t > self.max_steps:
            width = self.max_steps
            stride = width // 2
            n_frames = math.ceil(t / stride)
            tgt = (n_frames - 1) * stride + width
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, tgt - t)))
            idx = jnp.arange(n_frames)[:, None] * stride + jnp.arange(width)[None, :]
            frames = xp[:, :, idx]  # (B, C, F, width)
            x = frames.transpose(0, 2, 1, 3).reshape(-1, c, width)
            framed = True

        h = jnp.swapaxes(x, 1, 2)  # (B', T', C)
        for layer in range(self.layers):
            d_in = h.shape[-1]
            p = {
                name: self.param(name, nn.initializers.lecun_normal(), shape)
                for name, shape in [
                    (f"weight_ih_l{layer}", (4 * self.dim, d_in)),
                    (f"weight_hh_l{layer}", (4 * self.dim, self.dim)),
                    (f"weight_ih_l{layer}_reverse", (4 * self.dim, d_in)),
                    (f"weight_hh_l{layer}_reverse", (4 * self.dim, self.dim)),
                ]
            }
            bss = {
                name: self.param(name, nn.initializers.zeros, (4 * self.dim,))
                for name in (f"bias_ih_l{layer}", f"bias_hh_l{layer}",
                             f"bias_ih_l{layer}_reverse", f"bias_hh_l{layer}_reverse")
            }
            fwd = self._lstm_dir(h, p[f"weight_ih_l{layer}"], p[f"weight_hh_l{layer}"],
                                 bss[f"bias_ih_l{layer}"], bss[f"bias_hh_l{layer}"], False)
            bwd = self._lstm_dir(h, p[f"weight_ih_l{layer}_reverse"], p[f"weight_hh_l{layer}_reverse"],
                                 bss[f"bias_ih_l{layer}_reverse"], bss[f"bias_hh_l{layer}_reverse"], True)
            h = jnp.concatenate([fwd, bwd], axis=-1)
        lin_w = self.param("linear_weight", nn.initializers.lecun_normal(), (self.dim, 2 * self.dim))
        lin_b = self.param("linear_bias", nn.initializers.zeros, (self.dim,))
        h = h @ lin_w.T + lin_b
        x = jnp.swapaxes(h, 1, 2)  # (B', C, T')

        if framed:
            width = self.max_steps
            stride = width // 2
            frames = x.reshape(b, -1, c, width)
            n_frames = frames.shape[1]
            limit = stride // 2
            out = [frames[:, 0, :, :-limit]]
            for k in range(1, n_frames - 1):
                out.append(frames[:, k, :, limit:-limit])
            if n_frames > 1:
                out.append(frames[:, n_frames - 1, :, limit:])
            x = jnp.concatenate(out, axis=-1)[..., :t]
        if self.skip:
            x = x + y_in
        return x


class _LocalState(nn.Module):
    channels: int
    heads: int = 4
    ndecay: int = 4

    @nn.compact
    def __call__(self, x):
        b, c, t = x.shape
        heads = self.heads
        content = _Conv(c, (1,), (1,), (0,), name="content")(x).reshape(b, heads, -1, t)
        queries = _Conv(c, (1,), (1,), (0,), name="query")(x).reshape(b, heads, -1, t)
        keys = _Conv(c, (1,), (1,), (0,), name="key")(x).reshape(b, heads, -1, t)
        dots = jnp.einsum("bhct,bhcs->bhts", keys, queries) / math.sqrt(keys.shape[2])
        if self.ndecay:
            idx = jnp.arange(t, dtype=x.dtype)
            delta = idx[:, None] - idx[None, :]
            decays = jnp.arange(1, self.ndecay + 1, dtype=x.dtype)
            decay_q = _Conv(heads * self.ndecay, (1,), (1,), (0,), name="query_decay")(x).reshape(b, heads, -1, t)
            decay_q = jax.nn.sigmoid(decay_q) / 2
            decay_kernel = -decays[:, None, None] * jnp.abs(delta) / math.sqrt(self.ndecay)
            dots = dots + jnp.einsum("fts,bhfs->bhts", decay_kernel, decay_q)
        dots = jnp.where(jnp.eye(t, dtype=bool)[None, None], -100.0, dots)
        weights = jax.nn.softmax(dots, axis=2)
        result = jnp.einsum("bhts,bhct->bhcs", weights, content).reshape(b, -1, t)
        return x + _Conv(c, (1,), (1,), (0,), name="proj")(result)


class _DConv(nn.Module):
    channels: int
    compress: float = 4
    depth: int = 2
    init: float = 1e-4
    norm_type: str = "group_norm"
    attn: bool = False
    heads: int = 4
    ndecay: int = 4
    lstm: bool = False
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        hidden = int(self.channels / self.compress)
        use_norm = self.norm_type == "group_norm"
        for d in range(abs(self.depth)):
            dilation = 2**d if self.depth > 0 else 1
            padding = dilation * (self.kernel_size // 2)
            y = _Conv(hidden, (self.kernel_size,), (1,), (padding,), (dilation,), name=f"layers_{d}_conv1")(x)
            if use_norm:
                y = _GroupNormCF(1, name=f"layers_{d}_norm1")(y)
            y = _gelu(y)
            idx = 3
            if self.lstm:
                y = _BLSTM(hidden, layers=2, skip=True, name=f"layers_{d}_blstm")(y)
            if self.attn:
                y = _LocalState(hidden, self.heads, self.ndecay, name=f"layers_{d}_attn")(y)
            y = _Conv(2 * self.channels, (1,), (1,), (0,), name=f"layers_{d}_conv2")(y)
            if use_norm:
                y = _GroupNormCF(1, name=f"layers_{d}_norm2")(y)
            y = _glu(y, axis=1)
            y = _LayerScale(self.channels, self.init, name=f"layers_{d}_scale")(y)
            x = x + y
        return x


# ---------------------------------------------------------------------------
# Encoder / decoder layers
# ---------------------------------------------------------------------------


class _HEncLayer(nn.Module):
    chout: int
    kernel_size: int = 8
    stride: int = 4
    norm_groups: int = 4
    empty: bool = False
    freq: bool = True
    norm_type: str = "group_norm"
    context: int = 0
    dconv_kw: Optional[Dict[str, Any]] = None
    pad: bool = True

    @nn.compact
    def __call__(self, x, inject=None):
        pad_val = self.kernel_size // 4 if self.pad else 0
        use_norm = self.norm_type == "group_norm"
        if not self.freq and x.ndim == 4:
            b, c, fr, t = x.shape
            x = x.reshape(b, -1, t)
        if not self.freq:
            le = x.shape[-1]
            if le % self.stride != 0:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, self.stride - (le % self.stride))))
        if self.freq:
            y = _Conv(self.chout, (self.kernel_size, 1), (self.stride, 1), (pad_val, 0), name="conv")(x)
        else:
            y = _Conv(self.chout, (self.kernel_size,), (self.stride,), (pad_val,), name="conv")(x)
        if self.empty:
            return y
        if inject is not None:
            if inject.ndim == 3 and y.ndim == 4:
                inject = inject[:, :, None]
            y = y + inject
        if use_norm:
            y = _GroupNormCF(self.norm_groups, name="norm1")(y)
        y = _gelu(y)
        dconv = _DConv(self.chout, **(self.dconv_kw or {}), name="dconv")
        if self.freq:
            b, c, fr, t = y.shape
            y = y.transpose(0, 2, 1, 3).reshape(-1, c, t)
            y = dconv(y)
            y = y.reshape(b, fr, c, t).transpose(0, 2, 1, 3)
        else:
            y = dconv(y)
        ctx = self.context
        if self.freq:
            # torch passes a scalar kernel to Conv2d -> square (k, k), pad (ctx, ctx)
            z = _Conv(2 * self.chout, (1 + 2 * ctx, 1 + 2 * ctx), (1, 1), (ctx, ctx), name="rewrite")(y)
        else:
            z = _Conv(2 * self.chout, (1 + 2 * ctx,), (1,), (ctx,), name="rewrite")(y)
        if use_norm:
            z = _GroupNormCF(self.norm_groups, name="norm2")(z)
        return _glu(z, axis=1)


class _HDecLayer(nn.Module):
    chin: int
    chout: int
    last: bool = False
    kernel_size: int = 8
    stride: int = 4
    norm_groups: int = 1
    empty: bool = False
    freq: bool = True
    norm_type: str = "group_norm"
    context: int = 1
    pad: bool = True

    @nn.compact
    def __call__(self, x, skip, length):
        pad_val = (self.kernel_size - self.stride) // 2 if self.pad else 0
        use_norm = self.norm_type == "group_norm"
        if self.freq and x.ndim == 3:
            b, c, t = x.shape
            x = x.reshape(b, self.chin, -1, t)
        if not self.empty:
            x = x + skip
            ctx = self.context
            if self.freq:
                y = _Conv(2 * self.chin, (1 + 2 * ctx, 1 + 2 * ctx), (1, 1), (ctx, ctx), name="rewrite")(x)
            else:
                y = _Conv(2 * self.chin, (1 + 2 * ctx,), (1,), (ctx,), name="rewrite")(x)
            if use_norm:
                y = _GroupNormCF(self.norm_groups, name="norm1")(y)
            y = _glu(y, axis=1)
        else:
            y = x
            if skip is not None:
                raise ValueError("Skip must be none when empty is true.")
        if self.freq:
            z = _ConvT(self.chout, (self.kernel_size, 1), (self.stride, 1), name="conv_tr")(y)
        else:
            z = _ConvT(self.chout, (self.kernel_size,), (self.stride,), name="conv_tr")(y)
        if use_norm:
            z = _GroupNormCF(self.norm_groups, name="norm2")(z)
        if self.freq:
            if pad_val:
                z = z[..., pad_val:-pad_val, :]
        else:
            z = z[..., pad_val : pad_val + length]
        if not self.last:
            z = _gelu(z)
        return z, y


# ---------------------------------------------------------------------------
# Main model
# ---------------------------------------------------------------------------


class HDemucs(nn.Module):
    sources: Tuple[str, ...]
    audio_channels: int = 2
    channels: int = 48
    growth: int = 2
    nfft: int = 4096
    depth: int = 6
    freq_emb: float = 0.2
    emb_scale: int = 10
    emb_smooth: bool = True
    kernel_size: int = 8
    time_stride: int = 2
    stride: int = 4
    context: int = 1
    context_enc: int = 0
    norm_starts: int = 4
    norm_groups: int = 4
    dconv_depth: int = 2
    dconv_comp: int = 4
    dconv_attn: int = 4
    dconv_lstm: int = 4
    dconv_init: float = 1e-4

    def _layer_plan(self):
        """Static plan of all layer configs (mirrors HDemucs.__init__)."""
        plan = []
        chin = self.audio_channels
        chin_z = chin * 2
        chout = self.channels
        chout_z = self.channels
        freqs = self.nfft // 2
        for index in range(self.depth):
            lstm = index >= self.dconv_lstm
            attn = index >= self.dconv_attn
            norm_type = "group_norm" if index >= self.norm_starts else "none"
            freq = freqs > 1
            stri, ker = self.stride, self.kernel_size
            if not freq:
                ker, stri = self.time_stride * 2, self.time_stride
            pad = True
            last_freq = False
            if freq and freqs <= self.kernel_size:
                ker, pad, last_freq = freqs, False, True
            dconv_kw = dict(lstm=lstm, attn=attn, depth=self.dconv_depth, compress=self.dconv_comp,
                            init=self.dconv_init)
            kwt_stride, kwt_kernel = self.stride, self.kernel_size
            if freq and last_freq and self.nfft == 2048:
                kwt_stride, kwt_kernel = 2, 4
            if last_freq:
                chout_z = max(chout, chout_z)
                chout = chout_z
            entry = dict(
                index=index, chin=chin, chin_z=chin_z, chout=chout, chout_z=chout_z,
                freq=freq, last_freq=last_freq, ker=ker, stri=stri, pad=pad,
                norm_type=norm_type, dconv_kw=dconv_kw,
                kwt_kernel=kwt_kernel, kwt_stride=kwt_stride, freqs=freqs,
            )
            if index == 0:
                entry["dec_chin_z"] = self.audio_channels * len(self.sources) * 2
                entry["dec_chin"] = self.audio_channels * len(self.sources)
            else:
                entry["dec_chin_z"] = chin_z
                entry["dec_chin"] = chin
            plan.append(entry)
            chin, chin_z = chout, chout_z
            chout = int(self.growth * chout)
            chout_z = int(self.growth * chout_z)
            if freq:
                freqs = 1 if freqs <= self.kernel_size else freqs // self.stride
        return plan

    def setup(self):
        plan = self._layer_plan()
        self._plan = plan
        freq_enc, freq_dec, time_enc, time_dec = [], [], [], []
        for e in plan:
            i = e["index"]
            freq_enc.append(_HEncLayer(
                e["chout_z"], e["ker"], e["stri"], self.norm_groups, False, e["freq"],
                e["norm_type"], self.context_enc, e["dconv_kw"], e["pad"], name=f"freq_encoder_{i}",
            ))
            if e["freq"]:
                time_enc.append(_HEncLayer(
                    e["chout"], e["kwt_kernel"], e["kwt_stride"], self.norm_groups, e["last_freq"], False,
                    e["norm_type"], self.context_enc, e["dconv_kw"], True, name=f"time_encoder_{i}",
                ))
            freq_dec.append(_HDecLayer(
                e["chout_z"], e["dec_chin_z"], i == 0, e["ker"], e["stri"], self.norm_groups, False,
                e["freq"], e["norm_type"], self.context, e["pad"], name=f"freq_decoder_{i}",
            ))
            if e["freq"]:
                time_dec.append(_HDecLayer(
                    e["chout"], e["dec_chin"], i == 0, e["kwt_kernel"], e["kwt_stride"], self.norm_groups,
                    e["last_freq"], False, e["norm_type"], self.context, True, name=f"time_decoder_{i}",
                ))
        self.freq_encoder = freq_enc
        self.time_encoder = time_enc
        # decoders run deepest-first
        self.freq_decoder = freq_dec[::-1]
        self.time_decoder = time_dec[::-1]
        if self.freq_emb > 0:
            n_freq_emb = plan[1]["freqs"] if self.depth > 1 else plan[0]["freqs"]
            self.freq_emb_weight = self.param(
                "freq_emb_weight", nn.initializers.normal(1.0), (n_freq_emb, plan[0]["chout_z"])
            )

    @property
    def hop_length(self):
        return self.nfft // 4

    def _spec(self, x):
        hl = self.hop_length
        le = int(math.ceil(x.shape[-1] / hl))
        pad = hl // 2 * 3
        pad_right = pad + le * hl - x.shape[-1]
        # reflect pad with the reference's length guard
        length = x.shape[-1]
        max_pad = max(pad, pad_right)
        if length <= max_pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, max_pad - length + 1)])
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad_right)], mode="reflect")
        shape = x.shape[:-1]
        z = _stft_fn(
            x.reshape(-1, x.shape[-1]), self.nfft, hl, self.nfft,
            hann_window(self.nfft), center=True, pad_mode="reflect", normalized=True,
        )
        z = z.reshape(shape + z.shape[-2:])[..., :-1, :]
        return z[..., 2 : 2 + le]

    def _ispec(self, z, length):
        hl = self.hop_length
        z = jnp.pad(z, [(0, 0)] * (z.ndim - 2) + [(0, 1), (2, 2)])
        pad = hl // 2 * 3
        le = hl * int(math.ceil(length / hl)) + 2 * pad
        shape = z.shape[:-2]
        x = _istft_fn(
            z.reshape((-1,) + z.shape[-2:]), 2 * z.shape[-2] - 2, hl, 2 * z.shape[-2] - 2,
            hann_window(2 * z.shape[-2] - 2), center=True, normalized=True, length=le,
        )
        x = x.reshape(shape + (x.shape[-1],))
        return x[..., pad : pad + length]

    def __call__(self, input: jnp.ndarray) -> jnp.ndarray:
        """(B, audio_channels, T) -> (B, num_sources, audio_channels, T)."""
        if input.ndim != 3:
            raise ValueError(f"Expected 3D tensor with dimensions (batch, channel, frames). Found: {input.shape}")
        if input.shape[1] != self.audio_channels:
            raise ValueError(
                "The channel dimension of input Tensor must match `audio_channels` of HDemucs model. "
                f"Found:{input.shape[1]}."
            )
        length = input.shape[-1]
        z = self._spec(input)
        b, c, fr, t = z.shape
        mag = jnp.stack([z.real, z.imag], axis=2).reshape(b, c * 2, fr, t)
        x = mag

        mean = x.mean(axis=(1, 2, 3), keepdims=True)
        std = x.std(axis=(1, 2, 3), keepdims=True, ddof=1)
        x = (x - mean) / (1e-5 + std)

        xt = input
        meant = xt.mean(axis=(1, 2), keepdims=True)
        stdt = xt.std(axis=(1, 2), keepdims=True, ddof=1)
        xt = (xt - meant) / (1e-5 + stdt)

        saved, saved_t, lengths, lengths_t = [], [], [], []
        for idx, encode in enumerate(self.freq_encoder):
            lengths.append(x.shape[-1])
            inject = None
            if idx < len(self.time_encoder):
                lengths_t.append(xt.shape[-1])
                tenc = self.time_encoder[idx]
                xt = tenc(xt)
                if not tenc.empty:
                    saved_t.append(xt)
                else:
                    inject = xt
            x = encode(x, inject)
            if idx == 0 and self.freq_emb > 0:
                emb = (self.freq_emb_weight * self.emb_scale).T[None, :, : x.shape[-2], None]
                x = x + self.freq_emb * jnp.broadcast_to(emb, x.shape)
            saved.append(x)

        x = jnp.zeros_like(x)
        xt = jnp.zeros_like(x)

        for idx, decode in enumerate(self.freq_decoder):
            skip = saved.pop(-1)
            x, pre = decode(x, skip, lengths.pop(-1))
            offset = self.depth - len(self.time_decoder)
            if idx >= offset:
                tdec = self.time_decoder[idx - offset]
                length_t = lengths_t.pop(-1)
                if tdec.empty:
                    pre = pre[:, :, 0]
                    xt, _ = tdec(pre, None, length_t)
                else:
                    skip_t = saved_t.pop(-1)
                    xt, _ = tdec(xt, skip_t, length_t)

        s = len(self.sources)
        x = x.reshape(b, s, -1, fr, t)
        x = x * std[:, None] + mean[:, None]
        # back to complex: channel pairs (real, imag)
        x = x.reshape(b, s, -1, 2, fr, t)
        zout = x[:, :, :, 0] + 1j * x[:, :, :, 1]
        x = self._ispec(zout, length)

        xt = xt.reshape(b, s, -1, length)
        xt = xt * stdt[:, None] + meant[:, None]
        return xt + x


def hdemucs_low(sources: List[str]) -> HDemucs:
    return HDemucs(sources=tuple(sources), nfft=1024, depth=5)


def hdemucs_medium(sources: List[str]) -> HDemucs:
    return HDemucs(sources=tuple(sources), nfft=2048, depth=6)


def hdemucs_high(sources: List[str]) -> HDemucs:
    return HDemucs(sources=tuple(sources), nfft=4096, depth=6)


def import_hdemucs_state_dict(state_dict) -> dict:
    """Convert a torchaudio HDemucs state_dict into flax params.

    The reference builds decoders with ``insert(0, ...)`` (_hdemucs.py:447-448),
    so torch key ``freq_decoder.0`` is the DEEPEST layer; flax modules here are
    named shallow-first — indices are reversed on import.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    branches = ("freq_encoder", "freq_decoder", "time_encoder", "time_decoder")
    n_layers = {b: 0 for b in branches}
    # how many modules (lstm/attn) are inserted at Sequential index 3 per dconv
    extras: Dict[Tuple[str, str, str, str], int] = {}
    for key in sd:
        parts = key.split(".")
        if parts[0] in branches:
            n_layers[parts[0]] = max(n_layers[parts[0]], int(parts[1]) + 1)
            if len(parts) > 6 and parts[2] == "dconv":
                loc = (parts[0], parts[1], parts[4], parts[5])  # branch, layer, d, seq
                if parts[6] in ("lstm", "linear"):
                    extras.setdefault((parts[0], parts[1], parts[4], "lstm"), 1)
                elif parts[6] in ("content", "query", "key", "query_decay", "proj"):
                    extras.setdefault((parts[0], parts[1], parts[4], "attn"), 1)
                del loc

    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] == "freq_emb":
            # freq_emb.embedding.weight (stored pre-divided by emb_scale)
            put(("freq_emb_weight",), value)
            continue
        if parts[0] not in branches:
            raise KeyError(f"Unrecognized key: {key}")
        branch, tidx = parts[0], int(parts[1])
        if branch.endswith("decoder"):
            tidx = n_layers[branch] - 1 - tidx
        layer = f"{branch}_{tidx}"
        rest = parts[2:]
        base = (layer,)
        if rest[0] in ("conv", "rewrite", "conv_tr", "norm1", "norm2"):
            put(base + (rest[0], rest[1]), value)
        elif rest[0] == "dconv":
            # dconv.layers.{d}.{seq}... with Sequential layout (_hdemucs.py:693-706):
            # 0 conv1, 1 norm1, 2 GELU, [3 lstm][3/4 attn], conv2, norm2, GLU, scale
            d, seq, sub = rest[2], int(rest[3]), rest[4:]
            n_extra = extras.get((parts[0], parts[1], d, "lstm"), 0) + extras.get(
                (parts[0], parts[1], d, "attn"), 0
            )
            if sub and sub[0] == "lstm":
                put(base + ("dconv", f"layers_{d}_blstm", sub[1]), value)
            elif sub and sub[0] == "linear":
                put(base + ("dconv", f"layers_{d}_blstm", f"linear_{sub[1]}"), value)
            elif sub and sub[0] in ("content", "query", "key", "query_decay", "proj"):
                put(base + ("dconv", f"layers_{d}_attn", sub[0], sub[1]), value)
            elif sub and sub[0] == "scale":
                put(base + ("dconv", f"layers_{d}_scale", "scale"), value)
            elif seq == 0:
                put(base + ("dconv", f"layers_{d}_conv1", sub[0]), value)
            elif seq == 1:
                put(base + ("dconv", f"layers_{d}_norm1", sub[0]), value)
            elif seq == 3 + n_extra:
                put(base + ("dconv", f"layers_{d}_conv2", sub[0]), value)
            elif seq == 4 + n_extra:
                put(base + ("dconv", f"layers_{d}_norm2", sub[0]), value)
            else:
                raise KeyError(f"Unrecognized dconv key: {key}")
        else:
            raise KeyError(f"Unrecognized key: {key}")
    return {"params": params}
