"""Emformer: efficient-memory streaming transformer (flax.linen).

Architecture parity with /root/reference/src/torchaudio/models/emformer.py:
_EmformerAttention (:76-318, joint [right-context|utterance|summary] query vs
[mems|right-context|(left-context)|utterance] key), _EmformerLayer (:319-589),
_EmformerImpl (:591-805, hard-copied right-context blocks, the segment
attention mask, AvgPool summary), Emformer (:806-884).

TPU-native design differences (behavior preserved):

* ``infer`` carries **fixed-shape** per-layer state
  (mems (M,B,D), lc_key/lc_val (L,B,D), past_length (1,B)) and excludes
  not-yet-filled entries with an attention bias instead of the reference's
  ``past_length.item()`` dynamic slicing (emformer.py:391-398) — so the
  streaming step jits once and runs with device-resident state.
* the training attention mask is built host-side at trace time (static
  shapes), exactly replicating ``_gen_attention_mask`` (:661-707).
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audio_tpu.ops.pallas_attention import (
    emformer_attention,
    fused_attention_supported,
)

__all__ = ["Emformer", "import_emformer_state_dict"]


def _fused_attention_mode() -> str:
    """AUDIO_TPU_FUSED_ATTENTION: "1" (default, TPU train shapes), "0"
    (always einsum), "interpret" (force the kernel in interpreter mode on
    any backend — CPU equivalence tests)."""
    return os.environ.get("AUDIO_TPU_FUSED_ATTENTION", "1")


def _use_fused_attention(b: int, h: int, tq: int, tk: int, dh: int) -> bool:
    """Route the training-path shapes to the fused Pallas attention kernel.

    The kernel wins where the (B, H, Tq, Tk) score tensor is the dominant
    HBM traffic (training: Tq=Tk=O(segments × segment)); the streaming-infer
    shapes (Tq = segment + rc ≈ 5) are below the per-tile overhead knee and
    stay on the einsum path.  CPU always uses einsum (interpret mode is for
    tests only).
    """
    mode = _fused_attention_mode()
    if mode == "0":
        return False
    if mode == "interpret":
        return fused_attention_supported(b, h, tq, tk, dh)
    if jax.default_backend() in ("cpu",):
        return False
    return tq >= 32 and tk >= 32 and fused_attention_supported(b, h, tq, tk, dh)


def import_emformer_state_dict(state_dict, prefix: str = "emformer_layers") -> dict:
    """Convert a torchaudio Emformer state_dict into flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] != prefix:
            raise KeyError(f"Unrecognized key: {key}")
        layer = f"emformer_layers_{parts[1]}"
        rest = parts[2:]
        if rest[0] == "attention":
            mod, kind = rest[1], rest[2]
            put((layer, "attention", mod, "kernel" if kind == "weight" else "bias"),
                value.T if kind == "weight" else value)
        elif rest[0] == "pos_ff":
            idx, kind = rest[1], rest[2]
            if idx == "0":
                put((layer, "pos_ff_layer_norm", "scale" if kind == "weight" else "bias"), value)
            elif idx == "1":
                put((layer, "pos_ff_1", "kernel" if kind == "weight" else "bias"),
                    value.T if kind == "weight" else value)
            elif idx == "4":
                put((layer, "pos_ff_2", "kernel" if kind == "weight" else "bias"),
                    value.T if kind == "weight" else value)
        elif rest[0] in ("layer_norm_input", "layer_norm_output"):
            put((layer, rest[0], "scale" if rest[1] == "weight" else "bias"), value)
        else:
            raise KeyError(f"Unrecognized key: {key}")
    return params


def _get_weight_init_gains(strategy: Optional[str], num_layers: int):
    if strategy is None:
        return [None] * num_layers
    if strategy == "depthwise":
        return [1.0 / math.sqrt(i + 1) for i in range(num_layers)]
    if strategy == "constant":
        return [1.0 / math.sqrt(2)] * num_layers
    raise ValueError(f"Unsupported weight_init_scale_strategy value {strategy}")


def _activation(name: str):
    if name == "relu":
        return nn.relu
    if name == "gelu":
        # exact erf in full precision; tanh under bf16/f16 (deviation below
        # the dtype's quantization noise; erf is pure VPU time — see
        # wav2vec2/components.py:_gelu_exact_f32)
        return lambda x: nn.gelu(x, approximate=x.dtype in (jnp.bfloat16, jnp.float16))
    if name == "silu":
        return nn.silu
    raise ValueError(f"Unsupported activation {name}")


def _xavier_uniform(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -a, a)

    return init


def _avg_pool_ceil(utterance: jnp.ndarray, segment_length: int) -> jnp.ndarray:
    """AvgPool1d(kernel=stride=segment, ceil_mode=True) over the time axis.

    utterance: (T, B, D) -> (ceil(T/segment), B, D); the last partial segment
    is averaged over its actual length (torch clips the window).
    """
    t = utterance.shape[0]
    n = -(-t // segment_length)
    pad = n * segment_length - t
    x = jnp.pad(utterance, ((0, pad), (0, 0), (0, 0)))
    sums = x.reshape(n, segment_length, *utterance.shape[1:]).sum(axis=1)
    counts = jnp.minimum(
        segment_length, t - jnp.arange(n) * segment_length
    ).astype(utterance.dtype)[:, None, None]
    return sums / counts


class _EmformerAttention(nn.Module):
    input_dim: int
    num_heads: int
    dropout: float = 0.0
    weight_init_gain: Optional[float] = None
    tanh_on_mem: bool = False
    negative_inf: float = -1e8

    def setup(self):
        if self.input_dim % self.num_heads != 0:
            raise ValueError(f"input_dim ({self.input_dim}) is not a multiple of num_heads ({self.num_heads}).")
        kernel_init = (
            _xavier_uniform(self.weight_init_gain) if self.weight_init_gain else nn.initializers.lecun_normal()
        )
        self.emb_to_key_value = nn.Dense(2 * self.input_dim, kernel_init=kernel_init, name="emb_to_key_value")
        self.emb_to_query = nn.Dense(self.input_dim, kernel_init=kernel_init, name="emb_to_query")
        self.out_proj = nn.Dense(self.input_dim, name="out_proj")

    def _attend(self, query, key, value, mask2d, key_bias):
        """query (Tq, B, D), key/value (Tk, B, D), mask2d (Tq, Tk) shared
        additive mask, key_bias (B, Tk) per-batch additive key-padding bias.

        The mask stays in its two factors so the fused kernel never builds
        the (B, Tq, Tk) combined bias; the einsum fallback recombines them
        by broadcasting (bit-identical math to the pre-split formulation).
        """
        tq, b, _ = query.shape
        tk = key.shape[0]
        h = self.num_heads
        dh = self.input_dim // h
        scaling = dh**-0.5
        if _use_fused_attention(b, h, tq, tk, dh):
            # (T, B, D) -> (B, H, T, dh) tiles for the per-(batch, head)
            # VMEM-resident softmax(QKᵀ+bias)V (ops/pallas_attention.py)
            q = (query * scaling).reshape(tq, b, h, dh).transpose(1, 2, 0, 3)
            k = key.reshape(tk, b, h, dh).transpose(1, 2, 0, 3)
            v = value.reshape(tk, b, h, dh).transpose(1, 2, 0, 3)
            attn = emformer_attention(
                q, k, v, mask2d.astype(jnp.float32), key_bias.astype(jnp.float32),
                _fused_attention_mode() == "interpret",
            )
            return attn.transpose(2, 0, 1, 3).reshape(tq, b, self.input_dim)
        q = (query * scaling).reshape(tq, b, h, dh)
        k = key.reshape(tk, b, h, dh)
        v = value.reshape(tk, b, h, dh)
        if tq * tk <= 1024:
            # streaming-infer shapes (Tq = segment+rc ≈ 5, Tk ≈ 36): the
            # einsum lowers to (B·H)-batched (5, dh)x(dh, 36) matmuls that
            # the MXU pads catastrophically — measured 0.4 TFLOP/s
            # effective, 13.5 ms of a 16.6 ms S=384 encoder tick.  A VPU
            # broadcast-multiply-reduce of the same contraction (f32
            # accumulate, fused into the reductions by XLA) removes the
            # tiny-matmul path: tick 16.6 -> ~4 ms.  Identical math.
            w = jnp.sum(
                q[:, None].astype(jnp.float32) * k[None].astype(jnp.float32),
                axis=-1,
            )  # (Tq, Tk, B, H)
            w = (
                w + mask2d.astype(jnp.float32)[:, :, None, None]
                + key_bias.astype(jnp.float32).T[None, :, :, None]
            )
            probs = jax.nn.softmax(w, axis=1)
            attn = jnp.sum(
                probs.astype(v.dtype)[..., None] * v[None], axis=1
            )  # (Tq, B, H, dh)
            return attn.reshape(tq, b, self.input_dim)
        weights = jnp.einsum("qbhd,kbhd->bhqk", q, k)
        # f32 bias also promotes the logits, which is where softmax
        # stability wants f32 anyway
        weights = (
            weights + mask2d.astype(jnp.float32)[None, None]
            + key_bias.astype(jnp.float32)[:, None, None, :]
        )
        probs = jax.nn.softmax(weights, axis=-1)
        # cast probs back to the value dtype: without this the PV matmul and
        # every op downstream (out_proj, FFN) silently run in f32 under bf16
        # params — measured as the main encoder MFU loss at B=64
        attn = jnp.einsum("bhqk,kbhd->qbhd", probs.astype(v.dtype), v)
        return attn.reshape(tq, b, self.input_dim)

    def _forward_impl(
        self,
        utterance,
        lengths,
        right_context,
        summary,
        mems,
        attention_mask_bias,  # (Tq, Tk) additive
        key_extra_valid=None,  # (B, Tk) bool or None (True = valid)
        left_context_key=None,
        left_context_val=None,
    ):
        b = utterance.shape[1]
        t = right_context.shape[0] + utterance.shape[0] + summary.shape[0]

        query = self.emb_to_query(jnp.concatenate([right_context, utterance, summary], axis=0))
        kv_in = jnp.concatenate([mems, right_context, utterance], axis=0)
        kv = self.emb_to_key_value(kv_in)
        key, value = jnp.split(kv, 2, axis=2)

        if left_context_key is not None and left_context_val is not None:
            split = mems.shape[0] + right_context.shape[0]
            key = jnp.concatenate([key[:split], left_context_key, key[split:]], axis=0)
            value = jnp.concatenate([value[:split], left_context_val, value[split:]], axis=0)

        tk = key.shape[0]
        # padding over trailing utterance frames (per batch)
        utt_start = tk - utterance.shape[0]
        pos = jnp.arange(tk)
        utt_valid = (pos[None, :] < utt_start) | (
            (pos[None, :] - utt_start) < lengths[:, None]
        )  # (B, Tk)
        if key_extra_valid is not None:
            utt_valid = utt_valid & key_extra_valid
        key_bias = jnp.where(utt_valid, 0.0, self.negative_inf)  # (B, Tk)

        attention = self._attend(query, key, value, attention_mask_bias, key_bias)
        output_right_context_mems = self.out_proj(attention)

        summary_length = summary.shape[0]
        output_right_context = output_right_context_mems[: t - summary_length]
        output_mems = output_right_context_mems[t - summary_length :]
        if self.tanh_on_mem:
            output_mems = jnp.tanh(output_mems)
        else:
            output_mems = jnp.clip(output_mems, -10, 10)
        return output_right_context, output_mems, key, value

    def __call__(self, utterance, lengths, right_context, summary, mems, attention_mask_bias):
        output, output_mems, _, _ = self._forward_impl(
            utterance, lengths, right_context, summary, mems, attention_mask_bias
        )
        return output, output_mems[:-1] if output_mems.shape[0] > 0 else output_mems

    def infer(self, utterance, lengths, right_context, summary, mems, lc_key, lc_val, key_extra_valid):
        tq = right_context.shape[0] + utterance.shape[0] + summary.shape[0]
        tk = right_context.shape[0] + utterance.shape[0] + mems.shape[0] + lc_key.shape[0]
        # summary row must not attend to mems
        mask_bias = jnp.zeros((tq, tk))
        if summary.shape[0] > 0 and mems.shape[0] > 0:
            mask_bias = mask_bias.at[-1, : mems.shape[0]].set(self.negative_inf)
        output, output_mems, key, value = self._forward_impl(
            utterance,
            lengths,
            right_context,
            summary,
            mems,
            mask_bias,
            key_extra_valid=key_extra_valid,
            left_context_key=lc_key,
            left_context_val=lc_val,
        )
        split = mems.shape[0] + right_context.shape[0]
        return output, output_mems, key[split:], value[split:]


class _EmformerLayer(nn.Module):
    input_dim: int
    num_heads: int
    ffn_dim: int
    segment_length: int
    dropout: float = 0.0
    activation: str = "relu"
    left_context_length: int = 0
    max_memory_size: int = 0
    weight_init_gain: Optional[float] = None
    tanh_on_mem: bool = False
    negative_inf: float = -1e8

    def setup(self):
        self.attention = _EmformerAttention(
            self.input_dim,
            self.num_heads,
            self.dropout,
            self.weight_init_gain,
            self.tanh_on_mem,
            self.negative_inf,
            name="attention",
        )
        self.pos_ff_layer_norm = nn.LayerNorm(epsilon=1e-5, name="pos_ff_layer_norm")
        self.pos_ff_1 = nn.Dense(self.ffn_dim, name="pos_ff_1")
        self.pos_ff_2 = nn.Dense(self.input_dim, name="pos_ff_2")
        self.layer_norm_input = nn.LayerNorm(epsilon=1e-5, name="layer_norm_input")
        self.layer_norm_output = nn.LayerNorm(epsilon=1e-5, name="layer_norm_output")
        self.drop = nn.Dropout(self.dropout)
        self.use_mem = self.max_memory_size > 0

    def init_state(self, batch_size: int, dtype=jnp.float32):
        return (
            jnp.zeros((self.max_memory_size, batch_size, self.input_dim), dtype),
            jnp.zeros((self.left_context_length, batch_size, self.input_dim), dtype),
            jnp.zeros((self.left_context_length, batch_size, self.input_dim), dtype),
            jnp.zeros((1, batch_size), jnp.int32),
        )

    def _pos_ff(self, x, deterministic):
        y = self.pos_ff_layer_norm(x)
        y = _activation(self.activation)(self.pos_ff_1(y))
        y = self.drop(y, deterministic=deterministic)
        y = self.pos_ff_2(y)
        y = self.drop(y, deterministic=deterministic)
        return y

    def _process_attention_output(self, rc_output, utterance, right_context, deterministic):
        result = self.drop(rc_output, deterministic=deterministic) + jnp.concatenate(
            [right_context, utterance], axis=0
        )
        result = self._pos_ff(result, deterministic) + result
        return self.layer_norm_output(result)

    def _pre_norm(self, utterance, right_context):
        x = self.layer_norm_input(jnp.concatenate([right_context, utterance], axis=0))
        return x[right_context.shape[0] :], x[: right_context.shape[0]]

    def __call__(self, utterance, lengths, right_context, mems, attention_mask_bias, deterministic: bool = True):
        ln_utt, ln_rc = self._pre_norm(utterance, right_context)
        if self.use_mem:
            summary = _avg_pool_ceil(ln_utt, self.segment_length)
        else:
            summary = jnp.zeros((0,) + ln_utt.shape[1:], ln_utt.dtype)
        rc_output, next_m = self.attention(ln_utt, lengths, ln_rc, summary, mems, attention_mask_bias)
        out = self._process_attention_output(rc_output, utterance, right_context, deterministic)
        return out[right_context.shape[0] :], out[: right_context.shape[0]], next_m

    def infer(self, utterance, lengths, right_context, state, mems, deterministic: bool = True):
        if state is None:
            state = self.init_state(utterance.shape[1], utterance.dtype)
        state_mems, lc_key, lc_val, past_length = state
        pl = past_length[0]  # (B,)

        ln_utt, ln_rc = self._pre_norm(utterance, right_context)
        if self.use_mem:
            summary = _avg_pool_ceil(ln_utt, self.segment_length)[:1]
        else:
            summary = jnp.zeros((0,) + ln_utt.shape[1:], ln_utt.dtype)

        # validity of fixed-size state entries (stored right-aligned):
        m = self.max_memory_size
        l = self.left_context_length
        past_lc = jnp.minimum(l, pl)  # (B,)
        past_mem = jnp.minimum(m, -(-pl // self.segment_length)) if m > 0 else jnp.zeros_like(pl)
        # key layout: [mems(M), right_context(R), lc(L), utterance(T)]
        mem_valid = jnp.arange(m)[None, :] >= (m - past_mem)[:, None]  # (B, M)
        rc_valid = jnp.ones((pl.shape[0], right_context.shape[0]), bool)
        lc_valid = jnp.arange(l)[None, :] >= (l - past_lc)[:, None]  # (B, L)
        utt_valid = jnp.ones((pl.shape[0], utterance.shape[0]), bool)
        key_extra_valid = jnp.concatenate([mem_valid, rc_valid, lc_valid, utt_valid], axis=1)

        rc_output, next_m, next_k, next_v = self.attention.infer(
            ln_utt, lengths, ln_rc, summary, state_mems, lc_key, lc_val, key_extra_valid
        )

        # pack state: append and keep last M / L entries (static shapes).
        # NB: the packed memory is this layer's INPUT mems (the previous
        # layer's output), matching _pack_state(mems=...) at emformer.py:400-414.
        new_mems = jnp.concatenate([state_mems, mems], axis=0)[-m:] if m > 0 else state_mems
        new_k = jnp.concatenate([lc_key, next_k], axis=0)[-l:] if l > 0 else lc_key
        new_v = jnp.concatenate([lc_val, next_v], axis=0)[-l:] if l > 0 else lc_val
        new_state = (new_mems, new_k, new_v, past_length + utterance.shape[0])

        out = self._process_attention_output(rc_output, utterance, right_context, deterministic)
        return out[right_context.shape[0] :], out[: right_context.shape[0]], new_state, next_m


class Emformer(nn.Module):
    """Emformer encoder; forward (B, T+R, D) → (B, T, D), infer carries state."""

    input_dim: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    segment_length: int
    dropout: float = 0.0
    activation: str = "relu"
    left_context_length: int = 0
    right_context_length: int = 0
    max_memory_size: int = 0
    weight_init_scale_strategy: Optional[str] = "depthwise"
    tanh_on_mem: bool = False
    negative_inf: float = -1e8

    def setup(self):
        gains = _get_weight_init_gains(self.weight_init_scale_strategy, self.num_layers)
        self.emformer_layers = [
            _EmformerLayer(
                self.input_dim,
                self.num_heads,
                self.ffn_dim,
                self.segment_length,
                self.dropout,
                self.activation,
                self.left_context_length,
                self.max_memory_size,
                gains[i],
                self.tanh_on_mem,
                self.negative_inf,
                name=f"emformer_layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.use_mem = self.max_memory_size > 0

    # ---- training-path helpers (host-side static mask construction) ----

    def _gen_right_context(self, x):
        t = x.shape[0]
        num_segs = math.ceil((t - self.right_context_length) / self.segment_length)
        blocks = []
        for seg_idx in range(num_segs - 1):
            start = (seg_idx + 1) * self.segment_length
            blocks.append(x[start : start + self.right_context_length])
        blocks.append(x[t - self.right_context_length :])
        return jnp.concatenate(blocks, axis=0)

    def _gen_attention_mask_col_widths(self, seg_idx: int, utterance_length: int) -> List[int]:
        num_segs = math.ceil(utterance_length / self.segment_length)
        rc = self.right_context_length
        lc = self.left_context_length
        rc_start = seg_idx * rc
        rc_end = rc_start + rc
        seg_start = max(seg_idx * self.segment_length - lc, 0)
        seg_end = min((seg_idx + 1) * self.segment_length, utterance_length)
        rc_length = rc * num_segs
        if self.use_mem:
            m_start = max(seg_idx - self.max_memory_size, 0)
            mem_length = num_segs - 1
            return [
                m_start, seg_idx - m_start, mem_length - seg_idx,
                rc_start, rc, rc_length - rc_end,
                seg_start, seg_end - seg_start, utterance_length - seg_end,
            ]
        return [rc_start, rc, rc_length - rc_end, seg_start, seg_end - seg_start, utterance_length - seg_end]

    def _gen_attention_mask(self, utterance_length: int) -> np.ndarray:
        num_segs = math.ceil(utterance_length / self.segment_length)
        rc_mask, query_mask, summary_mask = [], [], []
        if self.use_mem:
            num_cols = 9
            rc_q_cols_mask = [i in (1, 4, 7) for i in range(num_cols)]
            s_cols_mask = [i in (4, 7) for i in range(num_cols)]
            masks_to_concat = [rc_mask, query_mask, summary_mask]
        else:
            num_cols = 6
            rc_q_cols_mask = [i in (1, 4) for i in range(num_cols)]
            s_cols_mask = None
            masks_to_concat = [rc_mask, query_mask]

        def block(col_widths, col_mask, num_rows):
            return np.concatenate(
                [np.full((num_rows, w), 1.0 if m else 0.0) for w, m in zip(col_widths, col_mask)], axis=1
            )

        for seg_idx in range(num_segs):
            col_widths = self._gen_attention_mask_col_widths(seg_idx, utterance_length)
            rc_mask.append(block(col_widths, rc_q_cols_mask, self.right_context_length))
            query_mask.append(
                block(col_widths, rc_q_cols_mask, min(self.segment_length, utterance_length - seg_idx * self.segment_length))
            )
            if s_cols_mask is not None:
                summary_mask.append(block(col_widths, s_cols_mask, 1))
        mask = np.concatenate([np.concatenate(m) for m in masks_to_concat])
        return np.where(mask > 0, 0.0, self.negative_inf)

    def __call__(self, input: jnp.ndarray, lengths: jnp.ndarray, deterministic: bool = True):
        """Training / non-streaming forward: input (B, T+R, D) → (B, T, D)."""
        x = jnp.swapaxes(input, 0, 1)  # (T+R, B, D)
        right_context = self._gen_right_context(x)
        utterance = x[: x.shape[0] - self.right_context_length]
        attention_mask_bias = jnp.asarray(self._gen_attention_mask(utterance.shape[0]), x.dtype)
        if self.use_mem:
            mems = _avg_pool_ceil(utterance, self.segment_length)[:-1]
        else:
            mems = jnp.zeros((0,) + utterance.shape[1:], x.dtype)
        output = utterance
        for layer in self.emformer_layers:
            output, right_context, mems = layer(
                output, lengths, right_context, mems, attention_mask_bias, deterministic
            )
        return jnp.swapaxes(output, 0, 1), lengths

    def infer(
        self,
        input: jnp.ndarray,
        lengths: jnp.ndarray,
        states: Optional[List] = None,
        deterministic: bool = True,
    ):
        """Streaming step: input (B, segment+R, D) → (B, segment, D) + states."""
        if input.shape[1] != self.segment_length + self.right_context_length:
            raise ValueError(
                "Per configured segment_length and right_context_length"
                f", expected size of {self.segment_length + self.right_context_length} for dimension 1 of input"
                f", but got {input.shape[1]}."
            )
        x = jnp.swapaxes(input, 0, 1)
        rc_start = x.shape[0] - self.right_context_length
        right_context = x[rc_start:]
        utterance = x[:rc_start]
        output_lengths = jnp.clip(lengths - self.right_context_length, 0)
        if self.use_mem:
            mems = _avg_pool_ceil(utterance, self.segment_length)
        else:
            mems = jnp.zeros((0,) + utterance.shape[1:], x.dtype)
        output = utterance
        output_states = []
        for i, layer in enumerate(self.emformer_layers):
            output, right_context, new_state, mems = layer.infer(
                output, output_lengths, right_context, None if states is None else states[i], mems, deterministic
            )
            output_states.append(new_state)
        return jnp.swapaxes(output, 0, 1), output_lengths, output_states
