"""Window functions as pure JAX constructors.

TPU-native equivalents of ``torch.hann_window`` et al. used throughout the
reference (e.g. /root/reference/src/torchaudio/functional/functional.py:54-144,
/root/reference/src/torchaudio/compliance/kaldi.py:86-116).  All windows are
built in float64 on host (numpy) or float32 traced, matching torch's
"periodic=True" convention by default.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "hamming_window",
    "blackman_window",
    "bartlett_window",
    "kaiser_window",
    "povey_window",
    "get_window",
]


def _raised_cosine(window_length: int, periodic: bool, a0: float, a1: float, a2: float, dtype) -> jnp.ndarray:
    if window_length == 1:
        return jnp.ones((1,), dtype=dtype)
    n = np.arange(window_length, dtype=np.float64)
    denom = window_length if periodic else window_length - 1
    w = a0 - a1 * np.cos(2.0 * math.pi * n / denom) + a2 * np.cos(4.0 * math.pi * n / denom)
    return jnp.asarray(w, dtype=dtype)


def hann_window(window_length: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    return _raised_cosine(window_length, periodic, 0.5, 0.5, 0.0, dtype)


def hamming_window(
    window_length: int,
    periodic: bool = True,
    alpha: float = 0.54,
    beta: float = 0.46,
    dtype=jnp.float32,
) -> jnp.ndarray:
    return _raised_cosine(window_length, periodic, alpha, beta, 0.0, dtype)


def blackman_window(window_length: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    return _raised_cosine(window_length, periodic, 0.42, 0.5, 0.08, dtype)


def bartlett_window(window_length: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    if window_length == 1:
        return jnp.ones((1,), dtype=dtype)
    n = np.arange(window_length, dtype=np.float64)
    denom = window_length if periodic else window_length - 1
    w = 1.0 - np.abs(2.0 * n / denom - 1.0)
    return jnp.asarray(w, dtype=dtype)


def kaiser_window(
    window_length: int,
    periodic: bool = True,
    beta: float = 12.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    if window_length == 1:
        return jnp.ones((1,), dtype=dtype)
    length = window_length if periodic else window_length - 1
    n = np.arange(window_length, dtype=np.float64)
    ratio = 2.0 * n / length - 1.0
    w = np.i0(beta * np.sqrt(np.maximum(0.0, 1.0 - ratio**2))) / np.i0(beta)
    return jnp.asarray(w, dtype=dtype)


def povey_window(window_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Kaldi's "povey" window: hann(sym)**0.85 (kaldi.py:99-103)."""
    n = np.arange(window_length, dtype=np.float64)
    w = (0.5 - 0.5 * np.cos(2.0 * math.pi * n / (window_length - 1))) ** 0.85
    return jnp.asarray(w, dtype=dtype)


_WINDOWS = {
    "hann": hann_window,
    "hamming": hamming_window,
    "blackman": blackman_window,
    "bartlett": bartlett_window,
    "kaiser": kaiser_window,
}


def get_window(name: str, window_length: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    try:
        fn = _WINDOWS[name]
    except KeyError:
        raise ValueError(f"Unknown window {name!r}; available: {sorted(_WINDOWS)}")
    return fn(window_length, periodic=periodic, dtype=dtype)
