"""Fused Emformer attention — flash-style Pallas kernel with analytic VJP.

Replaces the einsum → (+bias) → softmax → einsum chain of
``_EmformerAttention._attend`` (the mask-based joint attention of the
reference, /root/reference/src/torchaudio/models/emformer.py:160-260) for
the training-path shapes.  The einsum formulation materializes the
(B, H, Tq, Tk) score/probability tensors in HBM several times per layer
(52 MB f32 at the flagship's B=64, Tq=Tk=160) — measured as the dominant
non-matmul cost of the encoder (docs/performance.md).  Here the whole
softmax(QKᵀ + bias)V runs per (batch, head) tile inside VMEM:

* scores never touch HBM — only Q, K, V, O and an (B, H, Tq, 1) f32
  logsumexp residual move;
* the Emformer mask enters as its two factors — the shared (Tq, Tk)
  segment/right-context mask and the per-batch (B, Tk) key-padding bias —
  so the (B, Tq, Tk) combined bias is never built;
* the backward is the standard flash recompute (dV = PᵀdO, dS = P∘(dOVᵀ −
  rowsum(dO∘O)), dQ = dS·K, dK = dSᵀQ) from the saved (O, lse), again one
  VMEM-resident pass per (batch, head) tile.

Tq and Tk are small for Emformer (segments × right-context + utterance:
160 at the flagship train shapes), so a full (Tq, Tk) score tile fits VMEM
and no online-softmax streaming over key blocks is needed; the kernel
rejects shapes where the tile would not fit and callers fall back to the
einsum path (always used on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["emformer_attention", "emformer_attention_reference",
           "fused_attention_supported"]


def _pick_block_b(b: int, bytes_per_batch: int, fixed_bytes: int = 0) -> int:
    """Largest divisor of ``b`` keeping the (double-buffered) working set
    comfortably inside VMEM: ~5 MB of block bytes per pipeline stage after
    subtracting ``fixed_bytes`` (one fori iteration's live temporaries)."""
    budget = max(5 * 1024 * 1024 - fixed_bytes, bytes_per_batch)
    bb = max(1, min(b, budget // max(bytes_per_batch, 1)))
    while b % bb:
        bb -= 1
    return bb


def fused_attention_supported(b: int, h: int, tq: int, tk: int, dh: int) -> bool:
    """Shape gate: score tile + one (batch, head) q/k/v/o set must fit VMEM."""
    tile = tq * tk * 4 * 2  # s and p/ds f32
    qkvo = (2 * tq + 2 * tk) * dh * 4
    return tq >= 1 and tk >= 1 and dh % 8 == 0 and (tile + qkvo) < 8 * 1024 * 1024


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _bdot(a, b, contract, prefer=jnp.float32):
    """Head-batched matmul: a (H, M, Ka), b (H, N, Kb) contracting the given
    axes (1-based within each head matrix), batched over axis 0."""
    return jax.lax.dot_general(
        a, b, (((contract[0],), (contract[1],)), ((0,), (0,))),
        preferred_element_type=prefer,
    )


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, kb_ref, o_ref, lse_ref):
    bb, h, tq, dh = q_ref.shape
    bias = mask_ref[...].astype(jnp.float32)[None]  # (1, Tq, Tk)

    def body(b, _):
        q = q_ref[b]  # (H, Tq, dh)
        k = k_ref[b]  # (H, Tk, dh)
        # one head-batched MXU contraction per step instead of H small dots
        s = _bdot(q, k, (2, 2))  # (H, Tq, Tk) f32
        s = s + bias + kb_ref[b][None, :, :]  # + per-batch key bias (1, 1, Tk)
        m = jnp.max(s, axis=-1, keepdims=True)  # (H, Tq, 1)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)  # >= 1 (finite -1e8 mask)
        o = _bdot(p.astype(v_ref.dtype), v_ref[b], (2, 1))  # (H, Tq, dh)
        o_ref[b] = (o / l).astype(o_ref.dtype)
        lse_ref[b] = m + jnp.log(l)
        return 0

    jax.lax.fori_loop(0, bb, body, 0)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, kb_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    bb, h, tq, dh = q_ref.shape
    bias = mask_ref[...].astype(jnp.float32)[None]

    def body(b, _):
        q = q_ref[b]
        k = k_ref[b]
        v = v_ref[b]
        o = o_ref[b].astype(jnp.float32)
        do = do_ref[b]
        lse = lse_ref[b]  # (H, Tq, 1) f32
        s = _bdot(q, k, (2, 2)) + bias + kb_ref[b][None, :, :]
        p = jnp.exp(s - lse)  # normalized probabilities, (H, Tq, Tk) f32
        pc = p.astype(do.dtype)
        dv = _bdot(pc, do, (1, 1))  # Pᵀ dO (contract Tq) -> (H, Tk, dh)
        dp = _bdot(do, v, (2, 2))  # dO Vᵀ (contract dh) -> (H, Tq, Tk)
        delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)  # (H, Tq, 1)
        ds = (p * (dp - delta)).astype(do.dtype)
        dq = _bdot(ds, k, (2, 1))  # dS K (contract Tk) -> (H, Tq, dh)
        dk = _bdot(ds, q, (1, 1))  # dSᵀ Q (contract Tq) -> (H, Tk, dh)
        dq_ref[b] = dq.astype(dq_ref.dtype)
        dk_ref[b] = dk.astype(dk_ref.dtype)
        dv_ref[b] = dv.astype(dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb, body, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------
def _lead(*shape):
    """BlockSpec blocked over the leading (batch) axis only."""
    return pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM)


def _in_specs(bb, h, tq, tk, dh):
    """Block specs for [q, k, v, mask, kb] with a (B//bb,) grid."""
    return [
        _lead(bb, h, tq, dh),
        _lead(bb, h, tk, dh),
        _lead(bb, h, tk, dh),
        pl.BlockSpec((tq, tk), lambda i: (0, 0), memory_space=pltpu.VMEM),
        _lead(bb, 1, tk),  # key bias as (B, 1, Tk): last-two block dims = array dims
    ]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(q, k, v, mask, kb, interpret=False):
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    isz = q.dtype.itemsize
    # per-batch bytes: q/k/v/o blocks + lse; fixed: one fori iteration's
    # (H, Tq, Tk) f32 score/prob temporaries
    bb = _pick_block_b(
        b, h * (2 * tq + 2 * tk) * dh * isz + h * tq * 8,
        fixed_bytes=h * tq * tk * 8)
    out, lse = pl.pallas_call(
        _fwd_kernel,
        grid=(b // bb,),
        in_specs=_in_specs(bb, h, tq, tk, dh),
        out_specs=(_lead(bb, h, tq, dh), _lead(bb, h, tq, 1)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tq, dh), v.dtype),
            jax.ShapeDtypeStruct((b, h, tq, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * dh,
            bytes_accessed=4 * b * h * tq * dh * isz,
            transcendentals=b * h * tq * tk),
        interpret=interpret,
    )(q, k, v, mask, kb[:, None, :])
    return out, lse


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(q, k, v, mask, kb, o, lse, do, interpret=False):
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    isz = q.dtype.itemsize
    bb = _pick_block_b(
        b, h * (4 * tq + 4 * tk) * dh * isz + h * tq * 8,
        fixed_bytes=h * tq * tk * 12)
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=(b // bb,),
        in_specs=_in_specs(bb, h, tq, tk, dh)
        + [_lead(bb, h, tq, dh), _lead(bb, h, tq, 1), _lead(bb, h, tq, dh)],
        out_specs=(_lead(bb, h, tq, dh), _lead(bb, h, tk, dh), _lead(bb, h, tk, dh)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tq, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, tk, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, tk, dh), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * tq * tk * dh,
            bytes_accessed=7 * b * h * tq * dh * isz,
            transcendentals=b * h * tq * tk),
        interpret=interpret,
    )(q, k, v, mask, kb[:, None, :], o, lse, do)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def emformer_attention(q, k, v, mask_bias, key_bias, interpret=False):
    """softmax(q·kᵀ + mask_bias + key_bias)·v, fused on TPU.

    Args:
        q: (B, H, Tq, dh) pre-scaled queries (multiply by dh**-0.5 first).
        k, v: (B, H, Tk, dh).
        mask_bias: (Tq, Tk) f32 additive mask shared across batch/head
            (0 or ``negative_inf`` — the Emformer segment mask).
        key_bias: (B, Tk) f32 additive per-batch key-padding bias.
        interpret: run the Pallas interpreter (CPU testing).

    Returns:
        (B, H, Tq, dh) attention output in ``v.dtype``.  Gradients flow to
        q, k, v only (the mask factors are non-differentiable constants —
        they derive from segment geometry and integer lengths).
    """
    out, _ = _fwd_call(q, k, v, mask_bias, key_bias, interpret=interpret)
    return out


def _emformer_attention_fwd(q, k, v, mask_bias, key_bias, interpret):
    out, lse = _fwd_call(q, k, v, mask_bias, key_bias, interpret=interpret)
    return out, (q, k, v, mask_bias, key_bias, out, lse)


def _emformer_attention_bwd(interpret, res, g):
    q, k, v, mask_bias, key_bias, out, lse = res
    dq, dk, dv = _bwd_call(q, k, v, mask_bias, key_bias, out, lse,
                           g.astype(v.dtype), interpret=interpret)
    return dq, dk, dv, jnp.zeros_like(mask_bias), jnp.zeros_like(key_bias)


emformer_attention.defvjp(_emformer_attention_fwd, _emformer_attention_bwd)


def emformer_attention_reference(q, k, v, mask_bias, key_bias):
    """The einsum formulation (parity oracle and CPU fallback).

    Bit-level twin of ``_EmformerAttention._attend``: f32 scores/softmax,
    probabilities cast back to the value dtype before the PV matmul.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s + mask_bias[None, None] + key_bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
