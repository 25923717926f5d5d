"""Shared ~f32-faithful (HIGH-precision) matmul building blocks for kernels.

Mosaic lowers only DEFAULT (1-pass bf16) and HIGHEST (6-pass exact-f32)
``dot_general`` precisions; the 3-pass middle ground (xh@ah + xh@al + xl@ah,
dropping only the lo*lo term — what XLA calls ``Precision.HIGH``) is built
manually from bf16 hi/lo splits.  Used by the Pallas spectrogram and IIR
kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["split_bf16", "dot3_bf16"]


def split_bf16(x):
    """Split f32 ``x`` into (hi, lo) bf16 with x ≈ hi + lo."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot3_bf16(xh, xl, ah, al, dimension_numbers=(((1,), (0,)), ((), ()))):
    """3-pass bf16 matmul of the splits: xh@ah + xh@al + xl@ah, f32 accum."""

    def d(p, q):
        return jax.lax.dot_general(
            p, q, dimension_numbers, preferred_element_type=jnp.float32
        )

    return d(xh, ah) + (d(xh, al) + d(xl, ah))
