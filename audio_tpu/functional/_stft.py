"""Core short-time Fourier transform for TPU.

Semantics match ``torch.stft`` / ``torch.istft`` (the primitive under the
reference's spectrogram path, /root/reference/src/torchaudio/functional/functional.py:123-134)
but the implementation is TPU-native: framing is a strided gather that XLA
fuses, the DFT runs through ``jnp.fft.rfft`` (XLA FFT), and everything is
jittable/vmappable with static shapes.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["frame_signal", "stft", "istft", "num_frames"]


def _pad_center(waveform: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    cfg = [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)]
    if mode == "reflect":
        return jnp.pad(waveform, cfg, mode="reflect")
    if mode == "constant":
        return jnp.pad(waveform, cfg, mode="constant")
    if mode == "replicate":
        return jnp.pad(waveform, cfg, mode="edge")
    if mode == "circular":
        return jnp.pad(waveform, cfg, mode="wrap")
    raise ValueError(f"Unsupported pad_mode {mode!r}")


def num_frames(length: int, n_fft: int, hop_length: int, center: bool) -> int:
    if center:
        return 1 + length // hop_length
    return 1 + (length - n_fft) // hop_length


def frame_signal(waveform: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice ``waveform`` (..., T) into overlapping frames (..., n_frames, frame_length).

    Static-shape gather; XLA lowers this to an efficient strided read.
    """
    t = waveform.shape[-1]
    n = 1 + (t - frame_length) // hop_length
    idx = jnp.arange(n)[:, None] * hop_length + jnp.arange(frame_length)[None, :]
    return waveform[..., idx]


def _prepare_window(window: Optional[jnp.ndarray], n_fft: int, win_length: int, dtype) -> jnp.ndarray:
    if window is None:
        window = jnp.ones((win_length,), dtype=dtype)
    if window.shape[-1] != win_length:
        raise ValueError(f"window length {window.shape[-1]} != win_length {win_length}")
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))
    return window.astype(dtype)


def stft(
    waveform: jnp.ndarray,
    n_fft: int,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    normalized: bool = False,
    onesided: bool = True,
) -> jnp.ndarray:
    """Complex STFT of shape (..., n_freq, n_frames); torch.stft semantics."""
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    window = _prepare_window(window, n_fft, win_length, waveform.dtype)
    if center:
        waveform = _pad_center(waveform, n_fft // 2, pad_mode)
    frames = frame_signal(waveform, n_fft, hop_length)  # (..., n_frames, n_fft)
    frames = frames * window
    if onesided:
        spec = jnp.fft.rfft(frames, axis=-1)
    else:
        spec = jnp.fft.fft(frames, axis=-1)
    if normalized:
        spec = spec * (1.0 / math.sqrt(n_fft))
    return jnp.swapaxes(spec, -1, -2)


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    normalized: bool = False,
    onesided: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add; torch.istft semantics.

    ``spec`` is (..., n_freq, n_frames) complex; returns (..., T).
    """
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    real_dtype = jnp.zeros((), dtype=spec.dtype).real.dtype
    window = _prepare_window(window, n_fft, win_length, real_dtype)

    frames_f = jnp.swapaxes(spec, -1, -2)  # (..., n_frames, n_freq)
    if normalized:
        frames_f = frames_f * math.sqrt(n_fft)
    if onesided:
        frames = jnp.fft.irfft(frames_f, n=n_fft, axis=-1)
    else:
        frames = jnp.fft.ifft(frames_f, axis=-1).real
    frames = frames * window  # (..., n_frames, n_fft)

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    # Overlap-add via scatter-add over frame offsets.
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    flat_idx = idx.reshape(-1)
    batch_shape = frames.shape[:-2]
    flat_frames = frames.reshape(batch_shape + (n_frames * n_fft,))
    y = jnp.zeros(batch_shape + (out_len,), dtype=frames.dtype)
    y = y.at[..., flat_idx].add(flat_frames)

    wsq = (window * window)[None, :] * jnp.ones((n_frames, 1), dtype=window.dtype)
    norm = jnp.zeros((out_len,), dtype=window.dtype).at[flat_idx].add(wsq.reshape(-1))

    if center:
        start = n_fft // 2
        end = out_len - n_fft // 2
    else:
        start, end = 0, out_len
    y = y[..., start:end]
    norm = norm[start:end]
    if length is not None:
        if y.shape[-1] < length:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])])
            norm = jnp.pad(norm, (0, length - norm.shape[-1]))
        else:
            y = y[..., :length]
            norm = norm[:length]
    norm = jnp.where(norm > 1e-11, norm, 1.0)
    return y / norm
