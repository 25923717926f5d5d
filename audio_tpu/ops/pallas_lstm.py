"""Fused layer-norm LSTM decode step — the RNN-T predictor's inner loop.

The beam search runs the predictor LSTM stack once per inner expansion
iteration on (S*K,) lanes with sequence length 1 (reference predictor:
/root/reference/src/torchaudio/models/rnnt.py ``_CustomLSTM``, one-token
steps driven by /root/reference/src/torchaudio/models/rnnt_decoder.py).
As XLA ops the step is ~8 HBM passes over (N, 4H) f32 intermediates — the
two LayerNorm reductions (gate norm over 4H, cell norm over H) fence the
sigmoid/tanh elementwise chain into separate fusions, and the static
profile showed the predictor at HALF the search tick at ~20% of memory
bandwidth (tools/profile_streaming_tick.py --static, S=512).

This kernel computes one whole step per row block in VMEM: the recurrent
``h @ W_p2g`` matmul on the MXU (weight resident across row blocks),
gate LayerNorm, the i/f/g/o nonlinearities, cell update, cell LayerNorm,
and the output gate — one read of (gx, h, c), one write of (h', c').
The hoisted input matmul ``x @ W_x2g`` stays an XLA op (it is a clean
MXU matmul with no fusion problem).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_gate_step", "lstm_gate_step_reference", "use_lstm_kernel"]


def _ln(x, scale, bias, eps):
    """flax.linen.LayerNorm semantics (fast variance, f32 stats)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _lstm_step_kernel(gx_ref, h_ref, c_ref, wp_ref, gs_ref, gb_ref, cs_ref,
                      cb_ref, h_out_ref, c_out_ref, *, eps):
    h = h_ref[...]  # (RB, H) model dtype
    gx = gx_ref[...].astype(jnp.float32)  # (RB, 4H)
    rec = jax.lax.dot_general(
        h, wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gates = _ln(gx + rec, gs_ref[...].astype(jnp.float32),
                gb_ref[...].astype(jnp.float32), eps)
    hdim = h.shape[-1]
    i_g = gates[:, 0 * hdim:1 * hdim]
    f_g = gates[:, 1 * hdim:2 * hdim]
    c_g = gates[:, 2 * hdim:3 * hdim]
    o_g = gates[:, 3 * hdim:4 * hdim]
    c = (jax.nn.sigmoid(f_g) * c_ref[...].astype(jnp.float32)
         + jax.nn.sigmoid(i_g) * jnp.tanh(c_g))
    c = _ln(c, cs_ref[...].astype(jnp.float32),
            cb_ref[...].astype(jnp.float32), eps)
    h_new = jax.nn.sigmoid(o_g) * jnp.tanh(c)
    h_out_ref[...] = h_new.astype(h_out_ref.dtype)
    c_out_ref[...] = c.astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _lstm_step_call(gx, h, c, wp, gs, gb, cs, cb, eps, interpret=False):
    n, h4 = gx.shape
    hdim = h.shape[-1]
    rb = 256
    while n % rb:
        rb //= 2
    full = lambda r, cdim: pl.BlockSpec(  # noqa: E731
        (r, cdim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda r, cdim: pl.BlockSpec(  # noqa: E731
        (r, cdim), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lstm_step_kernel, eps=eps),
        grid=(n // rb,),
        in_specs=[
            full(rb, h4), full(rb, hdim), full(rb, hdim),
            const(hdim, h4), const(1, h4), const(1, h4),
            const(1, hdim), const(1, hdim),
        ],
        out_specs=(full(rb, hdim), full(rb, hdim)),
        out_shape=(
            jax.ShapeDtypeStruct((n, hdim), h.dtype),
            jax.ShapeDtypeStruct((n, hdim), c.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hdim * h4 + 12 * n * h4,
            bytes_accessed=(n * h4 * gx.dtype.itemsize
                            + 4 * n * hdim * h.dtype.itemsize
                            + hdim * h4 * wp.dtype.itemsize),
            transcendentals=6 * n * hdim),
        interpret=interpret,
    )(gx, h, c, wp, gs, gb, cs, cb)


def lstm_gate_step(gx, h, c, w_p2g, g_scale, g_bias, c_scale, c_bias,
                   eps: float, interpret: bool = False):
    """One layer-norm LSTM step on precomputed input gates.

    Args:
        gx: (N, 4H) hoisted input projection ``x @ W_x2g`` (model dtype).
        h, c: (N, H) carried state.
        w_p2g: (H, 4H) recurrent weight; g_*/c_*: (4H,)/(H,) LayerNorm
            parameters of the gate and cell norms.
        eps: LayerNorm epsilon (the reference's ``lstm_layer_norm_epsilon``).

    Returns (h', c') in the state dtype.  Matches ``_CustomLSTM``'s step
    (models/rnnt.py) at f32-stats LayerNorm semantics.
    """
    n = gx.shape[0]
    pad = (-n) % 128
    if pad:
        gx = jnp.pad(gx, ((0, pad), (0, 0)))
        h = jnp.pad(h, ((0, pad), (0, 0)))
        c = jnp.pad(c, ((0, pad), (0, 0)))
    h2, c2 = _lstm_step_call(gx, h, c, w_p2g,
                             g_scale.reshape(1, -1), g_bias.reshape(1, -1),
                             c_scale.reshape(1, -1), c_bias.reshape(1, -1),
                             float(eps), interpret=interpret)
    if pad:
        h2, c2 = h2[:n], c2[:n]
    return h2, c2


def lstm_gate_step_reference(gx, h, c, w_p2g, g_scale, g_bias, c_scale,
                             c_bias, eps: float):
    """jnp formulation (CPU fallback / parity oracle)."""
    rec = jnp.dot(h, w_p2g, preferred_element_type=jnp.float32)
    gates = _ln(gx.astype(jnp.float32) + rec, g_scale.astype(jnp.float32),
                g_bias.astype(jnp.float32), eps)
    i_g, f_g, c_g, o_g = jnp.split(gates, 4, axis=-1)
    c2 = (jax.nn.sigmoid(f_g) * c.astype(jnp.float32)
          + jax.nn.sigmoid(i_g) * jnp.tanh(c_g))
    c2 = _ln(c2, c_scale.astype(jnp.float32), c_bias.astype(jnp.float32), eps)
    h2 = jax.nn.sigmoid(o_g) * jnp.tanh(c2)
    return h2.astype(h.dtype), c2.astype(c.dtype)


def use_lstm_kernel() -> bool:
    """Kernel on TPU; jnp/flax formulation elsewhere."""
    return jax.default_backend() not in ("cpu",)
