"""Pallas TPU kernel for CTC forced-alignment Viterbi.

Counterpart of the reference's native forced_align kernels
(/root/reference/src/libtorchaudio/forced_align/cpu/compute.cpp:18-139;
gpu/compute.cu:26-318 launches one kernel PER FRAME and stages backpointers
to the CPU for backtracking).  Here the entire DP runs in ONE kernel launch
per batch block: the (BB, S) state front, the int8 backpointer cube, and the
backtrack all live in VMEM, so the sequential per-frame update touches HBM
only to stream the gathered emission scores in and the final paths out.

Semantics identical to :func:`audio_tpu.ops.viterbi.viterbi_align` (same tie
breaking, length freezing and final-state selection); the wrapper there
dispatches to this kernel on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["viterbi_pallas_core"]

_NEG_INF = -1e30
_BB = 96  # batch rows per grid step (VMEM-capped by the 2x double-buffered (BB,T,S) f32 emits block + int8 bp cube; 64->96 measured 5.52->5.02 ms on the 4096x101x101 bench shape)


def _shift_right(x, k, fill):
    """Shift (BB, S) right by k along lanes, filling with ``fill``."""
    rolled = pltpu.roll(x, k, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= k, rolled, fill)


def _make_kernel(t_max: int, blank: int):
    def kernel(emits_ref, skip_ref, validm_ref, len_ref, labels_ref, slast_ref,
               paths_ref, bp_ref):
        bb, s = labels_ref.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (bb, s), 1)
        valid = validm_ref[:]  # bool as int32 (1 valid)
        lengths = len_ref[:]   # (BB, 1) int32

        def emit_at(t):
            return emits_ref[:, pl.ds(t, 1), :].reshape(bb, s)

        front0 = jnp.where(
            (col < 2) & (valid > 0), emit_at(0), jnp.float32(_NEG_INF)
        )
        bp_ref[0] = jnp.zeros((bb, s), jnp.int8)

        def fwd(t, front):
            emit = emit_at(t)
            x0 = front
            x1 = _shift_right(front, 1, jnp.float32(_NEG_INF))
            x2 = _shift_right(front, 2, jnp.float32(_NEG_INF))
            x2 = jnp.where(skip_ref[:] > 0, x2, jnp.float32(_NEG_INF))
            stay = (x0 >= x1) & (x0 >= x2)
            back = jnp.where(stay, 0, jnp.where(x1 >= x2, 1, 2)).astype(jnp.int8)
            best = jnp.maximum(x0, jnp.maximum(x1, x2))
            newf = jnp.where(valid > 0, best + emit, jnp.float32(_NEG_INF))
            active = t < lengths  # (BB, 1) broadcasts over lanes
            bp_ref[t] = jnp.where(active, back, jnp.int8(0))
            return jnp.where(active, newf, front)

        front = jax.lax.fori_loop(1, t_max, fwd, front0)

        slast = slast_ref[:]  # (BB, 1)
        a_last = jnp.max(jnp.where(col == slast, front, _NEG_INF), axis=1, keepdims=True)
        a_tok = jnp.max(
            jnp.where(col == jnp.maximum(slast - 1, 0), front, _NEG_INF), axis=1, keepdims=True
        )
        ltr0 = jnp.where(a_last > a_tok, slast, jnp.maximum(slast - 1, 0))

        # Backtrack in reverse 128-frame chunks: Mosaic requires lane-dim
        # stores at 128-aligned offsets, so each chunk's (BB, 128) path tile
        # is assembled with static-lane masked selects and stored once.
        # The per-frame label and backpointer share ONE masked-max reduction:
        # packed = label*4 + move (move in {0,1,2}), halving the lane-reduce
        # work on the serial chain.
        n_chunks = pl.cdiv(t_max, 128)
        tile_col = jax.lax.broadcasted_iota(jnp.int32, (bb, 128), 1)
        labels4 = labels_ref[:] * 4

        def bwd_chunk(ci, ltr):
            base = (n_chunks - 1 - ci) * 128
            base = pl.multiple_of(base, 128)
            tile = jnp.full((bb, 128), blank, jnp.int32)
            for j in range(127, -1, -1):
                t = base + j
                valid_t = t < t_max
                onehot = col == ltr
                bp_t = bp_ref[jnp.minimum(t, t_max - 1)].astype(jnp.int32)
                packed = jnp.max(
                    jnp.where(onehot, labels4 + bp_t, 0), axis=1, keepdims=True
                )
                lbl = packed >> 2
                move = packed & 3
                active = (t < lengths) & valid_t
                tile = jnp.where(tile_col == j, jnp.where(active, lbl, blank), tile)
                ltr = jnp.where(active, ltr - move, ltr)
            paths_ref[:, pl.ds(base, 128)] = tile
            return ltr

        jax.lax.fori_loop(0, n_chunks, bwd_chunk, ltr0)

    return kernel


@functools.partial(jax.jit, static_argnames=("blank", "interpret"))
def viterbi_pallas_core(
    emits: jnp.ndarray,        # (B, T, S) gathered per-state log probs
    can_skip: jnp.ndarray,     # (B, S) bool
    state_valid: jnp.ndarray,  # (B, S) bool
    input_lengths: jnp.ndarray,   # (B,) int32
    labels: jnp.ndarray,       # (B, S) int32 state token ids
    s_last: jnp.ndarray,       # (B,) int32 final blank state index
    blank: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns paths (B, T) int32.  All DP + backtrack in one kernel."""
    b, t_max, s = emits.shape
    s_pad = -(-s // 128) * 128
    b_pad = -(-b // _BB) * _BB

    def padb(x, fill=0):
        return jnp.pad(x, ((0, b_pad - b),) + ((0, 0),) * (x.ndim - 1), constant_values=fill)

    emits_p = jnp.pad(
        padb(emits, 0.0), ((0, 0), (0, 0), (0, s_pad - s)), constant_values=_NEG_INF
    )  # (Bp, T, Sp) — kept batch-major; the kernel slices frames from VMEM
    skip_p = jnp.pad(padb(can_skip).astype(jnp.int32), ((0, 0), (0, s_pad - s)))
    valid_p = jnp.pad(padb(state_valid).astype(jnp.int32), ((0, 0), (0, s_pad - s)))
    labels_p = jnp.pad(padb(labels).astype(jnp.int32), ((0, 0), (0, s_pad - s)))
    len_p = padb(input_lengths.astype(jnp.int32))[:, None]
    slast_p = padb(s_last.astype(jnp.int32))[:, None]

    t_pad = -(-t_max // 128) * 128
    grid = (b_pad // _BB,)
    paths = pl.pallas_call(
        _make_kernel(t_max, blank),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BB, t_max, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, s_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BB, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((t_max, _BB, s_pad), jnp.int8)],
        interpret=interpret,
    )(emits_p, skip_p, valid_p, len_p, labels_p, slast_p)
    return paths[:b, :t_max]
