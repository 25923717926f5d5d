"""Single-pass lattice row statistics — the RNN-T losses' V-axis reads.

Both transducer losses reduce the (..., V) joiner lattice to three per-row
scalars before any DP: the log-softmax denominator ``lse``, the blank logit,
and the label logit.  Issued as separate XLA ops these cost far more than
the lattice's one-read minimum: the logsumexp is a multi-pass reduction
that materializes an f32 copy of the (bf16) lattice, and the blank/label
column reads are 2-byte loads on a ``V``-element stride (measured ~6 ms for
the "free" blank slice of a 1 GiB band lattice on one v5e — DRAM reads
sub-line strides at a few percent efficiency).  The reference hides the
same three reads inside its fused CUDA kernels
(/root/reference/src/libtorchaudio/rnnt/gpu/gpu_transducer.h:86-211,
``LogSumExp2D`` + in-kernel blank/label indexing).

This kernel reads each lattice row tile into VMEM ONCE and emits all three
statistics: max → exp-sum → lse on the VPU, the blank column as a static
lane slice, and the label logit as an iota-compare masked reduction (no
per-row gather).  Traffic = one HBM read of the lattice + three (N, 1)
writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "lattice_row_stats",
    "lattice_row_stats_reference",
    "row_stats_topk",
    "row_stats_topk_reference",
    "join_stats_topk",
    "join_stats_topk_reference",
]


def _row_stats_kernel(x_ref, tgt_ref, lse_ref, blank_ref, label_ref, *, blank):
    x = x_ref[...].astype(jnp.float32)  # (RB, V)
    m = jnp.max(x, axis=-1, keepdims=True)
    s = jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True)
    lse_ref[...] = m + jnp.log(s)
    blank_ref[...] = x[:, blank:blank + 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    label_ref[...] = jnp.sum(
        jnp.where(lane == tgt_ref[...], x, 0.0), axis=-1, keepdims=True
    )


@functools.partial(jax.jit, static_argnames=("blank", "interpret"))
def _row_stats_call(x2, tgt2, blank, interpret=False):
    n, v = x2.shape
    # row block: one bf16 tile + its f32 working copy ≈ 3 MB at RB=128
    rb = 128
    while n % rb:
        rb //= 2
    col = lambda: pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    lse, blank_raw, label_raw = pl.pallas_call(
        functools.partial(_row_stats_kernel, blank=blank),
        grid=(n // rb,),
        in_specs=[
            pl.BlockSpec((rb, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
            col(),
        ],
        out_specs=(col(), col(), col()),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * v, bytes_accessed=n * v * x2.dtype.itemsize,
            transcendentals=n * v),
        interpret=interpret,
    )(x2, tgt2)
    return lse[:, 0], blank_raw[:, 0], label_raw[:, 0]


def lattice_row_stats(x, tgt, blank: int, interpret: bool = False):
    """Per-row (lse, blank_logit, label_logit) of a logits lattice.

    Args:
        x: (..., V) logits in any float dtype (math in f32).
        tgt: (...,) int32 label index per row (in [0, V)); rows whose label
            is out of lattice can pass any valid index — callers mask later.
        blank: static blank index.

    Returns:
        Three f32 arrays shaped like ``x`` without the final axis:
        ``logsumexp(x, -1)``, ``x[..., blank]``, ``x[..., tgt]``.
    """
    lead = x.shape[:-1]
    v = x.shape[-1]
    x2 = x.reshape(-1, v)
    tgt2 = tgt.reshape(-1, 1).astype(jnp.int32)
    n = x2.shape[0]
    pad = (-n) % 128
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        tgt2 = jnp.pad(tgt2, ((0, pad), (0, 0)))
    lse, blank_raw, label_raw = _row_stats_call(x2, tgt2, blank, interpret=interpret)
    if pad:
        lse, blank_raw, label_raw = lse[:n], blank_raw[:n], label_raw[:n]
    return lse.reshape(lead), blank_raw.reshape(lead), label_raw.reshape(lead)


def _row_stats_topk_kernel(x_ref, lse_ref, blank_ref, vals_ref, idx_ref, *,
                           blank, k, v_valid):
    """lse + blank + per-row top-k over columns [0, blank) in ONE read.

    The beam search's candidate selection needs, per (stream, hypothesis)
    row: the logsumexp (score normalizer), the blank logit (b-set merge),
    and the k best non-blank logits (every global top-k extension of a
    stream comes from some row's top-k — two-stage selection is exact).
    Issued as XLA ops this costs a multi-pass TopK over the materialized
    (S, K*(V-1)) candidate pool (~6 GB/s effective, measured) plus a
    separate stats pass; here one VMEM-resident tile serves all four
    outputs.  Top-k is k unrolled VPU rounds of (max → first-index →
    mask-out), ties by lowest index like ``lax.top_k``.
    """
    x = x_ref[...].astype(jnp.float32)  # (RB, V)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    valid = lane < v_valid
    xv = jnp.where(valid, x, -jnp.inf)
    m = jnp.max(xv, axis=-1, keepdims=True)
    s = jnp.sum(jnp.where(valid, jnp.exp(x - m), 0.0), axis=-1, keepdims=True)
    lse_ref[...] = m + jnp.log(s)
    blank_ref[...] = x[:, blank:blank + 1]
    xm = jnp.where(lane < blank, x, -jnp.inf)  # non-blank candidates only
    big = jnp.int32(x.shape[1])
    for j in range(k):
        mj = jnp.max(xm, axis=-1, keepdims=True)
        aj = jnp.min(jnp.where(xm >= mj, lane, big), axis=-1, keepdims=True)
        vals_ref[:, j:j + 1] = mj
        idx_ref[:, j:j + 1] = aj
        xm = jnp.where(lane == aj, -jnp.inf, xm)


@functools.partial(jax.jit, static_argnames=("blank", "k", "v_valid", "interpret"))
def _row_stats_topk_call(x2, blank, k, v_valid, interpret=False):
    n, v = x2.shape
    rb = 128
    while n % rb:
        rb //= 2
    col = lambda: pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    kcol = lambda: pl.BlockSpec((rb, k), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_row_stats_topk_kernel, blank=blank, k=k,
                          v_valid=v_valid),
        grid=(n // rb,),
        in_specs=[pl.BlockSpec((rb, v), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(col(), col(), kcol(), kcol()),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * v * (1 + k), bytes_accessed=n * v * x2.dtype.itemsize,
            transcendentals=n * v),
        interpret=interpret,
    )(x2)


def row_stats_topk(x, blank: int, k: int, interpret: bool = False):
    """Per-row (lse, blank_logit, top-k non-blank values, indices).

    Args:
        x: (..., V) logits, blank assumed scored at column ``blank`` with
            the non-blank candidates at columns [0, blank) (the search's
            layout; columns past ``blank`` are ignored).
        blank: static blank column (== V-1 for the RNN-T search).
        k: static number of per-row candidates (beam width).

    Returns:
        lse (...), blank_raw (...) f32 over ALL columns <= blank;
        vals (..., k) f32 / idx (..., k) int32: the k largest of
        ``x[..., :blank]`` per row, descending, ties by lowest index
        (``lax.top_k`` order).
    """
    lead = x.shape[:-1]
    v = x.shape[-1]
    x2 = x.reshape(-1, v)
    n = x2.shape[0]
    pad = (-n) % 128
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    lse, blank_raw, vals, idx = _row_stats_topk_call(
        x2, blank, k, blank + 1, interpret=interpret)
    if pad:
        lse, blank_raw, vals, idx = lse[:n], blank_raw[:n], vals[:n], idx[:n]
    return (lse[:, 0].reshape(lead), blank_raw[:, 0].reshape(lead),
            vals.reshape(lead + (k,)), idx.reshape(lead + (k,)))


def _join_stats_topk_kernel(act_ref, w_ref, b_ref, lse_ref, blank_ref,
                            vals_ref, idx_ref, *, blank, k, v_valid):
    """Joiner matmul + lse/blank/top-k with the logits tile VMEM-resident.

    The beam search's join logits (S*K, V) exist only to be reduced to
    (lse, blank, per-row top-k); computing the (RB, V) tile on the MXU
    inside the kernel means the full logits lattice NEVER touches HBM —
    per inner iteration the traffic drops from write+read of the (S, K, V)
    lattice to one read of the (S*K, D) activations (the (D, V) weight
    stays VMEM-resident across row blocks: constant index_map).
    """
    act = act_ref[...]  # (RB, D) model dtype
    w = w_ref[...]  # (D, V) model dtype
    x = jax.lax.dot_general(
        act, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)  # (RB, V) f32
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    valid = lane < v_valid
    xv = jnp.where(valid, x, -jnp.inf)
    m = jnp.max(xv, axis=-1, keepdims=True)
    s = jnp.sum(jnp.where(valid, jnp.exp(x - m), 0.0), axis=-1, keepdims=True)
    lse_ref[...] = m + jnp.log(s)
    blank_ref[...] = x[:, blank:blank + 1]
    xm = jnp.where(lane < blank, x, -jnp.inf)
    big = jnp.int32(x.shape[1])
    for j in range(k):
        mj = jnp.max(xm, axis=-1, keepdims=True)
        aj = jnp.min(jnp.where(xm >= mj, lane, big), axis=-1, keepdims=True)
        vals_ref[:, j:j + 1] = mj
        idx_ref[:, j:j + 1] = aj
        xm = jnp.where(lane == aj, -jnp.inf, xm)


@functools.partial(jax.jit, static_argnames=("blank", "k", "v_valid", "interpret"))
def _join_stats_topk_call(act2, w, b, blank, k, v_valid, interpret=False):
    n, d = act2.shape
    v = w.shape[1]
    # rb=128: (D,V) bf16 weight ~8.4 MB resident + (RB,V) f32 logits tile
    # ~2.1 MB (+ its top-k working copy) fits v5e VMEM with headroom
    rb = 128
    while n % rb:
        rb //= 2
    col = lambda: pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    kcol = lambda: pl.BlockSpec((rb, k), lambda i: (i, 0), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_join_stats_topk_kernel, blank=blank, k=k,
                          v_valid=v_valid),
        grid=(n // rb,),
        in_specs=[
            pl.BlockSpec((rb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, v), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(col(), col(), kcol(), kcol()),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * v + 2 * n * v * (1 + k),
            bytes_accessed=n * d * act2.dtype.itemsize + d * v * w.dtype.itemsize,
            transcendentals=n * v),
        interpret=interpret,
    )(act2, w, b)


def join_stats_topk(act, w, b, blank: int, k: int, interpret: bool = False):
    """(lse, blank_logit, top-k vals/idx) of ``act @ w + b`` per row.

    Args:
        act: (..., D) joiner activations (``relu(src + tgt)``), model dtype.
        w: (D, V) joiner output weight; b: (V,) bias.
        blank: static blank column (== V-1); candidates are columns
            [0, blank).
        k: static per-row candidate count (beam width).

    Returns the same four arrays as :func:`row_stats_topk` — the (..., V)
    logits are never materialized in HBM.
    """
    lead = act.shape[:-1]
    d = act.shape[-1]
    act2 = act.reshape(-1, d)
    n = act2.shape[0]
    pad = (-n) % 128
    if pad:
        act2 = jnp.pad(act2, ((0, pad), (0, 0)))
    lse, blank_raw, vals, idx = _join_stats_topk_call(
        act2, w, b.reshape(1, -1), blank, k, blank + 1, interpret=interpret)
    if pad:
        lse, blank_raw, vals, idx = lse[:n], blank_raw[:n], vals[:n], idx[:n]
    return (lse[:, 0].reshape(lead), blank_raw[:, 0].reshape(lead),
            vals.reshape(lead + (k,)), idx.reshape(lead + (k,)))


def join_stats_topk_reference(act, w, b, blank: int, k: int):
    """jnp formulation (CPU fallback / parity oracle)."""
    x = (jnp.dot(act, w, preferred_element_type=jnp.float32)
         + b.astype(jnp.float32))
    return row_stats_topk_reference(x, blank, k)


def row_stats_topk_reference(x, blank: int, k: int):
    """jnp formulation (CPU fallback / parity oracle)."""
    xf = x[..., :blank + 1].astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(xf, axis=-1)
    blank_raw = xf[..., blank]
    vals, idx = jax.lax.top_k(xf[..., :blank], k)
    return lse, blank_raw, vals, idx


def lattice_row_stats_reference(x, tgt, blank: int):
    """jnp formulation (CPU fallback / parity oracle)."""
    xf = x.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(xf, axis=-1)
    blank_raw = xf[..., blank]
    label_raw = jnp.take_along_axis(xf, tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return lse, blank_raw, label_raw


def use_row_stats_kernel() -> bool:
    """Kernel on TPU; jnp formulation elsewhere."""
    return jax.default_backend() not in ("cpu",)
