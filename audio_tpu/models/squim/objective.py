"""SQUIM objective model: STOI/PESQ/SI-SDR prediction (flax.linen).

Architecture parity with
/root/reference/src/torchaudio/models/squim/objective.py: RangeSigmoid
(:31-41), Encoder (:43-68), SingleRNN/bi-LSTM (:70-95), DPRNN dual-path
chunking (:96-191), AutoPool (:192-203), transformer branches (:245-275),
squim_objective_model/base (:277-326).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["SquimObjective", "squim_objective_model", "squim_objective_base", "import_squim_objective_state_dict"]


def transform_wb_pesq_range(x: float) -> float:
    return 0.999 + (4.999 - 0.999) / (1 + math.exp(-1.3669 * x + 3.8224))


PESQ_RANGE: Tuple[float, float] = (1.0, transform_wb_pesq_range(4.5))


class _PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        # dtype pinned so fresh init matches x even under jax_enable_x64
        a = self.param("alpha", lambda *_: jnp.asarray(0.25, jnp.float32), ())
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class _BiLSTM(nn.Module):
    """torch.nn.LSTM(bidirectional=True, batch_first=True) single layer."""

    hidden: int

    def _run(self, x, w_ih, w_hh, b_ih, b_hh, reverse: bool):
        if reverse:
            x = jnp.flip(x, 1)
        b, t, _ = x.shape
        pre = x @ w_ih + b_ih  # (B, T, 4H)

        def step(carry, pre_t):
            h, c = carry
            gates = pre_t + h @ w_hh + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        h0 = jnp.zeros((b, self.hidden), x.dtype)
        _, ys = jax.lax.scan(step, (h0, h0), jnp.moveaxis(pre, 1, 0))
        ys = jnp.moveaxis(ys, 0, 1)
        return jnp.flip(ys, 1) if reverse else ys

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        shapes = [("w_ih_f", (d, 4 * self.hidden)), ("w_hh_f", (self.hidden, 4 * self.hidden)),
                  ("w_ih_b", (d, 4 * self.hidden)), ("w_hh_b", (self.hidden, 4 * self.hidden))]
        # explicit f32 param dtype: default initializers follow jnp.float_,
        # which is float64 under jax_enable_x64 and breaks the scan carry
        p = {name: self.param(name, nn.initializers.lecun_normal(), shp, jnp.float32)
             for name, shp in shapes}
        b = {name: self.param(name, nn.initializers.zeros, (4 * self.hidden,), jnp.float32)
             for name in ("b_ih_f", "b_hh_f", "b_ih_b", "b_hh_b")}
        fwd = self._run(x, p["w_ih_f"], p["w_hh_f"], b["b_ih_f"], b["b_hh_f"], False)
        bwd = self._run(x, p["w_ih_b"], p["w_hh_b"], b["b_ih_b"], b["b_hh_b"], True)
        return jnp.concatenate([fwd, bwd], axis=-1)


class SingleRNN(nn.Module):
    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        out = _BiLSTM(self.hidden_size, name="rnn")(x)
        return nn.Dense(self.input_size, name="proj")(out)


class _ChannelNorm2d(nn.Module):
    """GroupNorm(1, C) for (B, C, H, W) stored as (B, H, W, C): normalize over (H, W, C)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = x.mean(axis=(-3, -2, -1), keepdims=True)
        var = x.var(axis=(-3, -2, -1), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class DPRNN(nn.Module):
    feat_dim: int = 64
    hidden_dim: int = 128
    num_blocks: int = 6
    d_model: int = 256
    chunk_size: int = 100
    chunk_stride: int = 50

    def _chunking(self, x):
        # x: (B, N, T)
        seq_len = x.shape[-1]
        rest = self.chunk_size - (self.chunk_stride + seq_len % self.chunk_size) % self.chunk_size
        out = jnp.pad(x, ((0, 0), (0, 0), (self.chunk_stride, rest + self.chunk_stride)))
        b, n, _ = out.shape
        seg1 = out[:, :, : -self.chunk_stride].reshape(b, n, -1, self.chunk_size)
        seg2 = out[:, :, self.chunk_stride :].reshape(b, n, -1, self.chunk_size)
        out = jnp.concatenate([seg1, seg2], axis=3).reshape(b, n, -1, self.chunk_size)
        return jnp.swapaxes(out, 2, 3), rest  # (B, N, chunk, n_chunks)

    def _merging(self, x, rest):
        b, d = x.shape[0], x.shape[1]
        out = jnp.swapaxes(x, 2, 3).reshape(b, d, -1, self.chunk_size * 2)
        out1 = out[:, :, :, : self.chunk_size].reshape(b, d, -1)[:, :, self.chunk_stride :]
        out2 = out[:, :, :, self.chunk_size :].reshape(b, d, -1)[:, :, : -self.chunk_stride]
        out = out1 + out2
        if rest > 0:
            out = out[:, :, :-rest]
        return out

    @nn.compact
    def __call__(self, x):
        """x: (B, N, T) -> (B, T', d_model)."""
        x, rest = self._chunking(x)  # (B, N, dim1=chunk, dim2=n_chunks)
        b, n, dim1, dim2 = x.shape
        out = x
        for i in range(self.num_blocks):
            # row RNN over dim1 (chunk axis) for each (batch, chunk-group)
            row_in = out.transpose(0, 3, 2, 1).reshape(b * dim2, dim1, n)
            row_out = SingleRNN(self.feat_dim, self.hidden_dim, name=f"row_rnn_{i}")(row_in)
            row_out = row_out.reshape(b, dim2, dim1, n).transpose(0, 2, 1, 3)  # (B, dim1, dim2, N)
            row_out = _ChannelNorm2d(name=f"row_norm_{i}")(row_out)
            out = out + row_out.transpose(0, 3, 1, 2)

            col_in = out.transpose(0, 2, 3, 1).reshape(b * dim1, dim2, n)
            col_out = SingleRNN(self.feat_dim, self.hidden_dim, name=f"col_rnn_{i}")(col_in)
            col_out = col_out.reshape(b, dim1, dim2, n)  # (B, dim1, dim2, N)
            col_out = _ChannelNorm2d(name=f"col_norm_{i}")(col_out)
            out = out + col_out.transpose(0, 3, 1, 2)
        # conv 1x1 (N -> d_model) + PReLU; operate channels-last then restore
        y = out.transpose(0, 2, 3, 1)  # (B, dim1, dim2, N)
        y = nn.Dense(self.d_model, name="conv")(y)
        y = _PReLU(name="conv_prelu")(y)
        y = y.transpose(0, 3, 1, 2)  # (B, d_model, dim1, dim2)
        y = self._merging(y, rest)
        return jnp.swapaxes(y, 1, 2)


class AutoPool(nn.Module):
    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (1,))
        weight = jax.nn.softmax(x * alpha, axis=1)
        return jnp.sum(x * weight, axis=1)


class _TorchTransformerLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer (post-norm, relu, batch_first)."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        head_dim = self.d_model // self.nhead
        qkv = nn.Dense(3 * self.d_model, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.nhead, head_dim)
        k = k.reshape(b, t, self.nhead, head_dim)
        v = v.reshape(b, t, self.nhead, head_dim)
        attn = jax.nn.dot_product_attention(q, k, v).reshape(b, t, self.d_model)
        attn = nn.Dense(self.d_model, name="out_proj")(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        ff = nn.Dense(self.d_model * 4, name="linear1")(x)
        ff = nn.Dense(self.d_model, name="linear2")(nn.relu(ff))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


class _Branch(nn.Module):
    d_model: int
    nhead: int
    metric: str

    @nn.compact
    def __call__(self, x):
        x = _TorchTransformerLayer(self.d_model, self.nhead, name="transformer")(x)
        x = AutoPool(name="autopool")(x)
        x = nn.Dense(self.d_model, name="linear1")(x)
        x = _PReLU(name="prelu")(x)
        x = nn.Dense(1, name="linear2")(x)
        if self.metric == "stoi":
            x = jax.nn.sigmoid(x)
        elif self.metric == "pesq":
            lo, hi = PESQ_RANGE
            x = jax.nn.sigmoid(x) * (hi - lo) + lo
        return x[:, 0]


class SquimObjective(nn.Module):
    """Predicts [STOI, PESQ, SI-SDR] for input waveforms (B, T)."""

    feat_dim: int
    win_len: int
    d_model: int
    nhead: int
    hidden_dim: int
    num_blocks: int
    chunk_size: int
    chunk_stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        if x.ndim != 2:
            raise ValueError(f"The input must be a 2D Tensor. Found dimension {x.ndim}.")
        x = x / (jnp.mean(x**2, axis=1, keepdims=True) ** 0.5 * 20)
        # encoder: Conv1d(1, feat_dim, win, stride=win//2, bias=False) + relu
        feats = nn.Conv(
            self.feat_dim, (self.win_len,), strides=(self.win_len // 2,), padding="VALID",
            use_bias=False, name="encoder",
        )(x[..., None])
        feats = nn.relu(feats)  # (B, frames, feat_dim)
        out = DPRNN(
            self.feat_dim, self.hidden_dim, self.num_blocks, self.d_model, self.chunk_size, self.chunk_stride,
            name="dprnn",
        )(jnp.swapaxes(feats, 1, 2))
        scores = []
        for metric in ("stoi", "pesq", "sisdr"):
            scores.append(_Branch(self.d_model, self.nhead, metric, name=f"branch_{metric}")(out))
        return scores


def squim_objective_model(
    feat_dim: int,
    win_len: int,
    d_model: int,
    nhead: int,
    hidden_dim: int,
    num_blocks: int,
    rnn_type: str = "LSTM",
    chunk_size: int = 100,
    chunk_stride: Optional[int] = None,
) -> SquimObjective:
    if rnn_type != "LSTM":
        raise NotImplementedError("Only LSTM DPRNN is implemented")
    if chunk_stride is None:
        chunk_stride = chunk_size // 2
    return SquimObjective(feat_dim, win_len, d_model, nhead, hidden_dim, num_blocks, chunk_size, chunk_stride)


def squim_objective_base() -> SquimObjective:
    return squim_objective_model(
        feat_dim=256, win_len=64, d_model=256, nhead=4, hidden_dim=256, num_blocks=2, rnn_type="LSTM", chunk_size=71
    )


def import_squim_objective_state_dict(state_dict) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def dense(tpre, jpath):
        put(jpath + ("kernel",), sd[f"{tpre}.weight"].T)
        if f"{tpre}.bias" in sd:
            put(jpath + ("bias",), sd[f"{tpre}.bias"])

    def bilstm(tpre, jpath):
        put(jpath + ("w_ih_f",), sd[f"{tpre}.weight_ih_l0"].T)
        put(jpath + ("w_hh_f",), sd[f"{tpre}.weight_hh_l0"].T)
        put(jpath + ("b_ih_f",), sd[f"{tpre}.bias_ih_l0"])
        put(jpath + ("b_hh_f",), sd[f"{tpre}.bias_hh_l0"])
        put(jpath + ("w_ih_b",), sd[f"{tpre}.weight_ih_l0_reverse"].T)
        put(jpath + ("w_hh_b",), sd[f"{tpre}.weight_hh_l0_reverse"].T)
        put(jpath + ("b_ih_b",), sd[f"{tpre}.bias_ih_l0_reverse"])
        put(jpath + ("b_hh_b",), sd[f"{tpre}.bias_hh_l0_reverse"])

    put(("encoder", "kernel"), sd["encoder.conv1d.weight"].transpose(2, 1, 0))

    n_blocks = len({k.split(".")[2] for k in sd if k.startswith("dprnn.row_rnn.")})
    for i in range(n_blocks):
        bilstm(f"dprnn.row_rnn.{i}.rnn", ("dprnn", f"row_rnn_{i}", "rnn"))
        dense(f"dprnn.row_rnn.{i}.proj", ("dprnn", f"row_rnn_{i}", "proj"))
        bilstm(f"dprnn.col_rnn.{i}.rnn", ("dprnn", f"col_rnn_{i}", "rnn"))
        dense(f"dprnn.col_rnn.{i}.proj", ("dprnn", f"col_rnn_{i}", "proj"))
        for which in ("row", "col"):
            put(("dprnn", f"{which}_norm_{i}", "scale"), sd[f"dprnn.{which}_norm.{i}.weight"])
            put(("dprnn", f"{which}_norm_{i}", "bias"), sd[f"dprnn.{which}_norm.{i}.bias"])
    put(("dprnn", "conv", "kernel"), sd["dprnn.conv.0.weight"][:, :, 0, 0].T)
    put(("dprnn", "conv", "bias"), sd["dprnn.conv.0.bias"])
    put(("dprnn", "conv_prelu", "alpha"), sd["dprnn.conv.1.weight"].reshape(()))

    for bi, metric in enumerate(("stoi", "pesq", "sisdr")):
        t = f"branches.{bi}"
        base = (f"branch_{metric}",)
        put(base + ("transformer", "in_proj", "kernel"), sd[f"{t}.0.self_attn.in_proj_weight"].T)
        put(base + ("transformer", "in_proj", "bias"), sd[f"{t}.0.self_attn.in_proj_bias"])
        dense(f"{t}.0.self_attn.out_proj", base + ("transformer", "out_proj"))
        dense(f"{t}.0.linear1", base + ("transformer", "linear1"))
        dense(f"{t}.0.linear2", base + ("transformer", "linear2"))
        put(base + ("transformer", "norm1", "scale"), sd[f"{t}.0.norm1.weight"])
        put(base + ("transformer", "norm1", "bias"), sd[f"{t}.0.norm1.bias"])
        put(base + ("transformer", "norm2", "scale"), sd[f"{t}.0.norm2.weight"])
        put(base + ("transformer", "norm2", "bias"), sd[f"{t}.0.norm2.bias"])
        put(base + ("autopool", "alpha"), sd[f"{t}.1.alpha"])
        dense(f"{t}.2.0", base + ("linear1",))
        put(base + ("prelu", "alpha"), sd[f"{t}.2.1.weight"].reshape(()))
        dense(f"{t}.2.2", base + ("linear2",))
    return {"params": params}
