"""WaveRNN vocoder (flax.linen).

Architecture parity with /root/reference/src/torchaudio/models/wavernn.py:
ResBlock (:17-50), MelResNet (:52-93), Stretch2d (:95-126), UpsampleNetwork
(:128-197), WaveRNN forward (:274-330) and the autoregressive ``infer``
(:332-430) — the latter as a ``lax.scan`` over samples with multinomial
sampling via ``jax.random.categorical``, instead of the reference's Python
loop with per-sample host sync.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["WaveRNN", "ResBlock", "MelResNet", "Stretch2d", "UpsampleNetwork", "import_wavernn_state_dict"]


class _GRUCellParams(nn.Module):
    """torch.nn.GRU-equivalent single-layer GRU over (B, T, D)."""

    hidden: int

    @nn.compact
    def __call__(self, x, h0=None):
        b, t, _ = x.shape
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(), (x.shape[-1], 3 * self.hidden))
        w_hh = self.param("w_hh", nn.initializers.orthogonal(), (self.hidden, 3 * self.hidden))
        b_ih = self.param("b_ih", nn.initializers.zeros, (3 * self.hidden,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (3 * self.hidden,))
        pre = x @ w_ih + b_ih  # (B, T, 3H) hoisted
        if h0 is None:
            # match the promoted compute dtype (params may be f64 under x64)
            h0 = jnp.zeros((b, self.hidden), pre.dtype)

        def step(h, pre_t):
            gh = h @ w_hh + b_hh
            ir, iz, in_ = jnp.split(pre_t, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(ir + hr)
            z = jax.nn.sigmoid(iz + hz)
            n = jnp.tanh(in_ + r * hn)
            h = (1 - z) * n + z * h
            return h, h

        h, ys = jax.lax.scan(step, h0, jnp.moveaxis(pre, 1, 0))
        return jnp.moveaxis(ys, 0, 1), h


class ResBlock(nn.Module):
    n_freq: int = 128

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, T, F) channels-last."""
        y = nn.Dense(self.n_freq, use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.n_freq, use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, epsilon=1e-5, name="bn2")(y)
        return y + x


class MelResNet(nn.Module):
    n_res_block: int = 10
    n_freq: int = 128
    n_hidden: int = 128
    n_output: int = 128
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, T, F) -> (B, T - kernel + 1, n_output)."""
        y = nn.Conv(self.n_hidden, (self.kernel_size,), padding="VALID", use_bias=False, name="conv_in")(x)
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, epsilon=1e-5, name="bn_in")(y)
        y = nn.relu(y)
        for i in range(self.n_res_block):
            y = ResBlock(self.n_hidden, name=f"resblock_{i}")(y, deterministic)
        return nn.Dense(self.n_output, name="conv_out")(y)


class Stretch2d(nn.Module):
    time_scale: int
    freq_scale: int

    def __call__(self, x):
        """x: (..., n_freq, n_time)."""
        x = jnp.repeat(x, self.freq_scale, axis=-2)
        return jnp.repeat(x, self.time_scale, axis=-1)


class UpsampleNetwork(nn.Module):
    upsample_scales: Tuple[int, ...]
    n_res_block: int = 10
    n_freq: int = 128
    n_hidden: int = 128
    n_output: int = 128
    kernel_size: int = 5

    @property
    def total_scale(self) -> int:
        total = 1
        for s in self.upsample_scales:
            total *= s
        return total

    @nn.compact
    def __call__(self, specgram, deterministic: bool = True):
        """specgram: (B, n_freq, T) -> (upsampled (B, n_freq, T'), aux (B, n_output, T'))."""
        total_scale = self.total_scale
        indent = (self.kernel_size - 1) // 2 * total_scale
        resnet = MelResNet(self.n_res_block, self.n_freq, self.n_hidden, self.n_output, self.kernel_size,
                           name="resnet")
        resnet_out = resnet(jnp.swapaxes(specgram, 1, 2), deterministic)  # (B, T-k+1, n_output)
        resnet_out = jnp.swapaxes(resnet_out, 1, 2)  # (B, n_output, T-k+1)
        aux = Stretch2d(total_scale, 1)(resnet_out)

        x = specgram[:, None]  # (B, 1, F, T)
        for i, scale in enumerate(self.upsample_scales):
            x = Stretch2d(scale, 1)(x)
            # Conv2d(1,1,(1, 2s+1), padding=(0,s), avg-init) over the time axis
            k = self.param(f"up_conv_{i}", nn.initializers.constant(1.0 / (scale * 2 + 1)), (1, 1, 1, scale * 2 + 1))
            x = jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1), [(0, 0), (scale, scale)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
        x = x[:, 0, :, indent:-indent]
        return x, aux


class WaveRNN(nn.Module):
    upsample_scales: Tuple[int, ...]
    n_classes: int
    hop_length: int
    n_res_block: int = 10
    n_rnn: int = 512
    n_fc: int = 512
    kernel_size: int = 5
    n_freq: int = 128
    n_hidden: int = 128
    n_output: int = 128

    def setup(self):
        self._pad = (self.kernel_size - 1 if self.kernel_size % 2 else self.kernel_size) // 2
        self.n_aux = self.n_output // 4
        self.n_bits = int(math.log2(self.n_classes))
        total_scale = 1
        for s in self.upsample_scales:
            total_scale *= s
        if total_scale != self.hop_length:
            raise ValueError(f"Expected: total_scale == hop_length, but found {total_scale} != {self.hop_length}")
        self.upsample = UpsampleNetwork(
            tuple(self.upsample_scales), self.n_res_block, self.n_freq, self.n_hidden, self.n_output,
            self.kernel_size, name="upsample",
        )
        self.fc = nn.Dense(self.n_rnn, name="fc")
        self.rnn1 = _GRUCellParams(self.n_rnn, name="rnn1")
        self.rnn2 = _GRUCellParams(self.n_rnn, name="rnn2")
        self.fc1 = nn.Dense(self.n_fc, name="fc1")
        self.fc2 = nn.Dense(self.n_fc, name="fc2")
        self.fc3 = nn.Dense(self.n_classes, name="fc3")

    def __call__(self, waveform, specgram, deterministic: bool = True):
        """waveform (B, 1, L), specgram (B, 1, F, T) -> logits (B, 1, L, n_classes)."""
        if waveform.shape[1] != 1:
            raise ValueError("Require the input channel of waveform is 1")
        if specgram.shape[1] != 1:
            raise ValueError("Require the input channel of specgram is 1")
        waveform, specgram = waveform[:, 0], specgram[:, 0]
        specgram, aux = self.upsample(specgram, deterministic)
        specgram = jnp.swapaxes(specgram, 1, 2)  # (B, T', F)
        aux = jnp.swapaxes(aux, 1, 2)  # (B, T', n_output)
        a1, a2, a3, a4 = [aux[:, :, self.n_aux * i : self.n_aux * (i + 1)] for i in range(4)]

        x = jnp.concatenate([waveform[..., None], specgram, a1], axis=-1)
        x = self.fc(x)
        res = x
        x, _ = self.rnn1(x)
        x = x + res
        res = x
        x, _ = self.rnn2(jnp.concatenate([x, a2], axis=-1))
        x = x + res
        x = nn.relu(self.fc1(jnp.concatenate([x, a3], axis=-1)))
        x = nn.relu(self.fc2(jnp.concatenate([x, a4], axis=-1)))
        x = self.fc3(x)
        return x[:, None]

    def infer(self, specgram, lengths=None, key: Optional[jax.Array] = None, deterministic: bool = True):
        """Autoregressive sampling: specgram (B, F, T) -> waveform (B, 1, T·hop)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        specgram = jnp.pad(specgram, ((0, 0), (0, 0), (self._pad, self._pad)))
        specgram, aux = self.upsample(specgram, deterministic)
        if lengths is not None:
            lengths = lengths * self.upsample.total_scale
        b, _, seq_len = specgram.shape

        spec_t = jnp.moveaxis(specgram, 2, 0)  # (T, B, F)
        aux_t = jnp.moveaxis(aux, 2, 0)  # (T, B, n_output)
        keys = jax.random.split(key, seq_len)

        p = self.variables["params"]

        def gru_step(pname, x, h):
            w_ih, w_hh = p[pname]["w_ih"], p[pname]["w_hh"]
            b_ih, b_hh = p[pname]["b_ih"], p[pname]["b_hh"]
            pre = x @ w_ih + b_ih
            gh = h @ w_hh + b_hh
            ir, iz, in_ = jnp.split(pre, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(ir + hr)
            z = jax.nn.sigmoid(iz + hz)
            n = jnp.tanh(in_ + r * hn)
            return (1 - z) * n + z * h

        def dense(pname, x):
            return x @ p[pname]["kernel"] + p[pname]["bias"]

        def step(carry, inp):
            h1, h2, x_prev = carry
            m_t, a_t, k_t = inp
            a1_t, a2_t, a3_t, a4_t = [a_t[:, self.n_aux * i : self.n_aux * (i + 1)] for i in range(4)]
            x = jnp.concatenate([x_prev, m_t, a1_t], axis=1)
            x = dense("fc", x)
            h1 = gru_step("rnn1", x, h1)
            x = x + h1
            h2 = gru_step("rnn2", jnp.concatenate([x, a2_t], axis=1), h2)
            x = x + h2
            x = nn.relu(dense("fc1", jnp.concatenate([x, a3_t], axis=1)))
            x = nn.relu(dense("fc2", jnp.concatenate([x, a4_t], axis=1)))
            logits = dense("fc3", x)
            sample = jax.random.categorical(k_t, logits, axis=1)  # (B,)
            x_new = (2 * sample.astype(logits.dtype) / (2**self.n_bits - 1.0) - 1.0)[:, None]
            return (h1, h2, x_new), x_new[:, 0]

        h1 = jnp.zeros((b, self.n_rnn), specgram.dtype)
        h2 = jnp.zeros((b, self.n_rnn), specgram.dtype)
        x0 = jnp.zeros((b, 1), specgram.dtype)
        _, samples = jax.lax.scan(step, (h1, h2, x0), (spec_t, aux_t, keys))
        return jnp.moveaxis(samples, 0, 1)[:, None, :], lengths


def import_wavernn_state_dict(state_dict) -> dict:
    """Convert a torchaudio WaveRNN state_dict into flax params+batch_stats."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for pth in path[:-1]:
            node = node.setdefault(pth, {})
        node[path[-1]] = value

    def bn(tpre, jpath):
        put(params, jpath + ("scale",), sd[f"{tpre}.weight"])
        put(params, jpath + ("bias",), sd[f"{tpre}.bias"])
        put(batch_stats, jpath + ("mean",), sd[f"{tpre}.running_mean"])
        put(batch_stats, jpath + ("var",), sd[f"{tpre}.running_var"])

    def dense(tpre, jpath, bias=True, conv1x1=False):
        w = sd[f"{tpre}.weight"]
        put(params, jpath + ("kernel",), w[:, :, 0].T if conv1x1 else w.T)
        if bias and f"{tpre}.bias" in sd:
            put(params, jpath + ("bias",), sd[f"{tpre}.bias"])

    def gru(tpre, jpath):
        put(params, jpath + ("w_ih",), sd[f"{tpre}.weight_ih_l0"].T)
        put(params, jpath + ("w_hh",), sd[f"{tpre}.weight_hh_l0"].T)
        put(params, jpath + ("b_ih",), sd[f"{tpre}.bias_ih_l0"])
        put(params, jpath + ("b_hh",), sd[f"{tpre}.bias_hh_l0"])

    # upsample: resnet (melresnet_model: 0 conv, 1 bn, 3.. resblocks, last conv)
    mel = "upsample.resnet.melresnet_model"
    put(params, ("upsample", "resnet", "conv_in", "kernel"), sd[f"{mel}.0.weight"].transpose(2, 1, 0))
    bn(f"{mel}.1", ("upsample", "resnet", "bn_in"))
    n_res = len({k.split(".")[3] for k in sd if k.startswith(mel)}) - 3  # minus conv_in, bn_in, conv_out
    for i in range(n_res):
        t = f"{mel}.{3 + i}.resblock_model"
        base = ("upsample", "resnet", f"resblock_{i}")
        dense(f"{t}.0", base + ("conv1",), bias=False, conv1x1=True)
        bn(f"{t}.1", base + ("bn1",))
        dense(f"{t}.3", base + ("conv2",), bias=False, conv1x1=True)
        bn(f"{t}.4", base + ("bn2",))
    dense(f"{mel}.{3 + n_res}", ("upsample", "resnet", "conv_out"), conv1x1=True)
    # upsample conv layers: upsample_layers.{2i+1}.weight (1,1,1,2s+1)
    up_idx = sorted(int(k.split(".")[2]) for k in sd if k.startswith("upsample.upsample_layers"))
    for j, i in enumerate(up_idx):
        put(params, ("upsample", f"up_conv_{j}"), sd[f"upsample.upsample_layers.{i}.weight"])
    dense("fc", ("fc",))
    gru("rnn1", ("rnn1",))
    gru("rnn2", ("rnn2",))
    dense("fc1", ("fc1",))
    dense("fc2", ("fc2",))
    dense("fc3", ("fc3",))
    return {"params": params, "batch_stats": batch_stats}
