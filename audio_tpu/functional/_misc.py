"""Miscellaneous functional DSP ops.

Behavioral parity with /root/reference/src/torchaudio/functional/functional.py:
mu-law (:670-731), SpecAugment masks (:813-960), compute_deltas (:961-1014),
NCCF pitch detection (:1015-1163), sliding_window_cmn (:1164-1256),
edit_distance (:1494), loudness ITU-R BS.1770-4 (:1535-1594),
pitch_shift (:1596-1720), convolve/fftconvolve (:2189-2316), add_noise
(:2317-2384), speed (:2385-2424), pre/deemphasis (:2426-2475),
frechet_distance (:2476-2511).

TPU-native choices: SpecAugment takes explicit JAX PRNG keys;
sliding_window_cmn is an exact cumulative-sum reformulation of the reference's
sequential per-frame loop (window starts/ends are computed in closed form so
the whole op is two cumsums + gathers instead of an O(T) Python loop).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ._resample import resample
from ._spectral import phase_vocoder
from ._stft import istft as _istft
from ._stft import stft as _stft
from .._internal.windows import hann_window

__all__ = [
    "mu_law_encoding",
    "mu_law_decoding",
    "mask_along_axis",
    "mask_along_axis_iid",
    "compute_deltas",
    "detect_pitch_frequency",
    "sliding_window_cmn",
    "edit_distance",
    "loudness",
    "pitch_shift",
    "convolve",
    "fftconvolve",
    "add_noise",
    "speed",
    "preemphasis",
    "deemphasis",
    "frechet_distance",
]


def mu_law_encoding(x: jnp.ndarray, quantization_channels: int) -> jnp.ndarray:
    """Mu-law companding; expects [-1, 1] floats, returns int in [0, Q-1]."""
    mu = quantization_channels - 1.0
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    x_mu = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / math.log1p(mu)
    return ((x_mu + 1) / 2 * mu + 0.5).astype(jnp.int32)


def mu_law_decoding(x_mu: jnp.ndarray, quantization_channels: int) -> jnp.ndarray:
    mu = quantization_channels - 1.0
    if not jnp.issubdtype(x_mu.dtype, jnp.floating):
        x_mu = x_mu.astype(jnp.float32)
    x = (x_mu / mu) * 2 - 1.0
    return jnp.sign(x) * (jnp.exp(jnp.abs(x) * math.log1p(mu)) - 1.0) / mu


def _get_mask_param(mask_param: int, p: float, axis_length: int) -> int:
    if p == 1.0:
        return mask_param
    return min(mask_param, int(axis_length * p))


def mask_along_axis(
    specgram: jnp.ndarray,
    mask_param: int,
    mask_value: float,
    axis: int,
    p: float = 1.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Mask a random span [v0, v0+v) along ``axis``; same span for all examples."""
    dim = specgram.ndim
    if dim < 2:
        raise ValueError(f"Spectrogram must have at least two dimensions (time and frequency) ({dim} given).")
    if axis not in (dim - 2, dim - 1):
        raise ValueError(f"Only Frequency and Time masking are supported ({dim - 2}, {dim - 1} supported; {axis} given).")
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"The value of p must be between 0.0 and 1.0 ({p} given).")
    mask_param = _get_mask_param(mask_param, p, specgram.shape[axis])
    if mask_param < 1:
        return specgram
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    size = specgram.shape[axis]
    value = jax.random.uniform(k1, ()) * mask_param
    min_value = jax.random.uniform(k2, ()) * (size - value)
    mask_start = min_value.astype(jnp.int32)
    mask_end = (min_value.astype(jnp.int32) + value.astype(jnp.int32))
    arange = jnp.arange(size)
    mask = (arange >= mask_start) & (arange < mask_end)
    shape = [1] * dim
    shape[axis] = size
    return jnp.where(mask.reshape(shape), jnp.asarray(mask_value, specgram.dtype), specgram)


def mask_along_axis_iid(
    specgrams: jnp.ndarray,
    mask_param: int,
    mask_value: Union[float, jnp.ndarray],
    axis: int,
    p: float = 1.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Mask independent random spans per (batch, channel) along ``axis``."""
    dim = specgrams.ndim
    if dim < 3:
        raise ValueError(f"Spectrogram must have at least three dimensions ({dim} given).")
    if axis not in (dim - 2, dim - 1):
        raise ValueError(f"Only Frequency and Time masking are supported ({dim - 2}, {dim - 1} supported; {axis} given).")
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"The value of p must be between 0.0 and 1.0 ({p} given).")
    mask_param = _get_mask_param(mask_param, p, specgrams.shape[axis])
    if mask_param < 1:
        return specgrams
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    lead_shape = specgrams.shape[: dim - 2]
    size = specgrams.shape[axis]
    value = jax.random.uniform(k1, lead_shape) * mask_param
    min_value = jax.random.uniform(k2, lead_shape) * (size - value)
    mask_start = min_value.astype(jnp.int32)[..., None, None]
    mask_end = (min_value.astype(jnp.int32) + value.astype(jnp.int32))[..., None, None]
    arange_shape = [1] * dim
    arange_shape[axis] = size
    arange = jnp.arange(size).reshape(arange_shape)
    mask = (arange >= mask_start) & (arange < mask_end)
    return jnp.where(mask, jnp.asarray(mask_value, specgrams.dtype), specgrams)


def compute_deltas(specgram: jnp.ndarray, win_length: int = 5, mode: str = "replicate") -> jnp.ndarray:
    """Delta coefficients along the last axis; (..., freq, time) -> same shape."""
    if win_length < 3:
        raise ValueError(f"Window length should be greater than or equal to 3. Found win_length {win_length}")
    n = (win_length - 1) // 2
    denom = n * (n + 1) * (2 * n + 1) / 3
    pad_mode = {"replicate": "edge", "constant": "constant", "reflect": "reflect"}[mode]
    padded = jnp.pad(specgram, [(0, 0)] * (specgram.ndim - 1) + [(n, n)], mode=pad_mode)
    # correlation with [-n..n]: out[t] = sum_k k * x[t+k]
    kernel = jnp.arange(-n, n + 1, dtype=specgram.dtype)
    idx = jnp.arange(specgram.shape[-1])[:, None] + jnp.arange(2 * n + 1)[None, :]
    frames = padded[..., idx]  # (..., time, win)
    return jnp.einsum("...tw,w->...t", frames, kernel) / denom


def _compute_nccf(waveform: jnp.ndarray, sample_rate: int, frame_time: float, freq_low: int) -> jnp.ndarray:
    eps = 1e-9
    lags = int(math.ceil(sample_rate / freq_low))
    frame_size = int(math.ceil(sample_rate * frame_time))
    waveform_length = waveform.shape[-1]
    num_of_frames = int(math.ceil(waveform_length / frame_size))
    p = lags + num_of_frames * frame_size - waveform_length
    waveform = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(0, p)])

    # Frames of the base signal and every lagged signal, gathered at once:
    # s1[f, i] = w[f*frame_size + i], s2[lag, f, i] = w[lag + f*frame_size + i]
    base_idx = jnp.arange(num_of_frames)[:, None] * frame_size + jnp.arange(frame_size)[None, :]
    lag_idx = jnp.arange(1, lags + 1)[:, None, None] + base_idx[None]
    s1 = waveform[..., base_idx]  # (..., F, N)
    s2 = waveform[..., lag_idx]  # (..., lags, F, N)
    num = jnp.einsum("...fn,...lfn->...fl", s1, s2)
    e1 = eps + jnp.linalg.norm(s1, axis=-1)  # (..., F)
    e2 = eps + jnp.linalg.norm(s2, axis=-1)  # (..., lags, F)
    out = num / (e1[..., None] ** 2) / jnp.moveaxis(e2, -2, -1) ** 2
    return out  # (..., F, lags)


def _combine_max(a, b, thresh: float = 0.99):
    mask = a[0] > thresh * b[0]
    values = jnp.where(mask, a[0], b[0])
    indices = jnp.where(mask, a[1], b[1])
    return values, indices


def _find_max_per_frame(nccf: jnp.ndarray, sample_rate: int, freq_high: int) -> jnp.ndarray:
    lag_min = int(math.ceil(sample_rate / freq_high))
    best = (jnp.max(nccf[..., lag_min:], -1), jnp.argmax(nccf[..., lag_min:], -1))
    half_size = nccf.shape[-1] // 2
    half = (jnp.max(nccf[..., lag_min:half_size], -1), jnp.argmax(nccf[..., lag_min:half_size], -1))
    values, indices = _combine_max(half, best)
    return indices + lag_min + 1


def _median_smoothing(indices: jnp.ndarray, win_length: int) -> jnp.ndarray:
    pad_length = (win_length - 1) // 2
    indices = jnp.pad(indices, [(0, 0)] * (indices.ndim - 1) + [(pad_length, 0)], mode="edge")
    idx = jnp.arange(indices.shape[-1] - win_length + 1)[:, None] + jnp.arange(win_length)[None, :]
    roll = indices[..., idx]
    # torch.median returns the lower of the two middle values for even windows
    return jnp.sort(roll, axis=-1)[..., (win_length - 1) // 2]


def detect_pitch_frequency(
    waveform: jnp.ndarray,
    sample_rate: int,
    frame_time: float = 1e-2,
    win_length: int = 30,
    freq_low: int = 85,
    freq_high: int = 3400,
) -> jnp.ndarray:
    """Pitch frequency per frame via NCCF + median smoothing; (..., frame)."""
    shape = waveform.shape
    waveform = waveform.reshape((-1, shape[-1]))
    nccf = _compute_nccf(waveform, sample_rate, frame_time, freq_low)
    indices = _find_max_per_frame(nccf, sample_rate, freq_high)
    indices = _median_smoothing(indices, win_length)
    eps = 1e-9
    freq = sample_rate / (eps + indices.astype(jnp.float32))
    return freq.reshape(shape[:-1] + freq.shape[-1:])


def sliding_window_cmn(
    specgram: jnp.ndarray,
    cmn_window: int = 600,
    min_cmn_window: int = 100,
    center: bool = False,
    norm_vars: bool = False,
) -> jnp.ndarray:
    """Sliding-window cepstral mean (and variance) normalization, (..., time, freq).

    Exact reformulation of the reference's incremental loop
    (functional.py:1164-1256) using closed-form window bounds + cumulative sums.
    """
    input_shape = specgram.shape
    num_frames, num_feats = input_shape[-2:]
    x = specgram.reshape((-1, num_frames, num_feats))

    t = np.arange(num_frames)
    if center:
        s = t - cmn_window // 2
        e = s + cmn_window
    else:
        s = t - cmn_window
        e = t + 1
    e = np.where(s < 0, e - s, e)
    s = np.maximum(s, 0)
    if not center:
        e = np.where(e > t, np.maximum(t + 1, min_cmn_window), e)
    over = e > num_frames
    s = np.where(over, np.maximum(s - (e - num_frames), 0), s)
    e = np.where(over, num_frames, e)
    window_frames = (e - s).astype(np.float64)

    csum = jnp.cumsum(x, axis=1)
    csum = jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum], axis=1)  # (B, T+1, F)
    cur_sum = csum[:, e] - csum[:, s]  # (B, T, F)
    wf = jnp.asarray(window_frames, x.dtype)[None, :, None]
    out = x - cur_sum / wf
    if norm_vars:
        csumsq = jnp.cumsum(x * x, axis=1)
        csumsq = jnp.concatenate([jnp.zeros_like(csumsq[:, :1]), csumsq], axis=1)
        cur_sumsq = csumsq[:, e] - csumsq[:, s]
        variance = cur_sumsq / wf - (cur_sum**2) / (wf**2)
        out = out * jax.lax.rsqrt(variance)
        out = jnp.where(wf == 1, jnp.zeros_like(out), out)
    out = out.reshape(input_shape)
    return out


def edit_distance(seq1: Sequence, seq2: Sequence) -> int:
    """Levenshtein distance between two host-side sequences."""
    len_sent2 = len(seq2)
    dold = list(range(len_sent2 + 1))
    dnew = [0 for _ in range(len_sent2 + 1)]
    for i in range(1, len(seq1) + 1):
        dnew[0] = i
        for j in range(1, len_sent2 + 1):
            if seq1[i - 1] == seq2[j - 1]:
                dnew[j] = dold[j - 1]
            else:
                dnew[j] = min(dold[j - 1] + 1, dnew[j - 1] + 1, dold[j] + 1)
        dnew, dold = dold, dnew
    return int(dold[-1])


def loudness(waveform: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    """ITU-R BS.1770-4 loudness (LKFS) with K-weighting and two-stage gating."""
    from ._filtering import highpass_biquad, treble_biquad

    if waveform.shape[-2] > 5:
        raise ValueError("Only up to 5 channels are supported.")
    # compliance meter: the 38 Hz K-weighting highpass has a near-unit pole,
    # so reduced-precision recurrences random-walk (~7 dB error in bf16);
    # always measure in f32 and cast the scalar back
    in_dtype = waveform.dtype
    if in_dtype in (jnp.bfloat16, jnp.float16):
        return loudness(waveform.astype(jnp.float32), sample_rate).astype(in_dtype)
    gate_duration = 0.4
    overlap = 0.75
    gamma_abs = -70.0
    kweight_bias = -0.691
    gate_samples = int(round(gate_duration * sample_rate))
    step = int(round(gate_samples * (1 - overlap)))

    waveform = treble_biquad(waveform, sample_rate, 4.0, 1500.0, 1 / math.sqrt(2))
    waveform = highpass_biquad(waveform, sample_rate, 38.0, 0.5)

    n_blocks = (waveform.shape[-1] - gate_samples) // step + 1
    idx = jnp.arange(n_blocks)[:, None] * step + jnp.arange(gate_samples)[None, :]
    energy = jnp.mean(jnp.square(waveform)[..., idx], axis=-1)  # (..., ch, blocks)

    g = jnp.asarray([1.0, 1.0, 1.0, 1.41, 1.41], dtype=waveform.dtype)[: energy.shape[-2]]
    energy_weighted = jnp.sum(g[..., None] * energy, axis=-2)
    block_loudness = kweight_bias + 10 * jnp.log10(energy_weighted)

    gated = (block_loudness > gamma_abs)[..., None, :]
    energy_filtered = jnp.sum(gated * energy, axis=-1) / jnp.maximum(jnp.sum(gated, axis=-1), 1)
    energy_weighted = jnp.sum(g * energy_filtered, axis=-1)
    gamma_rel = kweight_bias + 10 * jnp.log10(energy_weighted) - 10

    gated = (gated[..., 0, :] & (block_loudness > gamma_rel[..., None]))[..., None, :]
    energy_filtered = jnp.sum(gated * energy, axis=-1) / jnp.maximum(jnp.sum(gated, axis=-1), 1)
    energy_weighted = jnp.sum(g * energy_filtered, axis=-1)
    return kweight_bias + 10 * jnp.log10(energy_weighted)


def _stretch_waveform(
    waveform: jnp.ndarray,
    n_steps: int,
    bins_per_octave: int = 12,
    n_fft: int = 512,
    win_length: Optional[int] = None,
    hop_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    if hop_length is None:
        hop_length = n_fft // 4
    if win_length is None:
        win_length = n_fft
    if window is None:
        window = hann_window(win_length, dtype=waveform.dtype)
    shape = waveform.shape
    waveform = waveform.reshape((-1, shape[-1]))
    ori_len = shape[-1]
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    spec_f = _stft(
        waveform, n_fft=n_fft, hop_length=hop_length, win_length=win_length, window=window,
        center=True, pad_mode="reflect", normalized=False, onesided=True,
    )
    phase_advance = jnp.linspace(0, math.pi * hop_length, spec_f.shape[-2])[..., None]
    spec_stretch = phase_vocoder(spec_f, rate, phase_advance)
    len_stretch = int(round(ori_len / rate))
    return _istft(
        spec_stretch, n_fft=n_fft, hop_length=hop_length, win_length=win_length, window=window, length=len_stretch
    )


def pitch_shift(
    waveform: jnp.ndarray,
    sample_rate: int,
    n_steps: int,
    bins_per_octave: int = 12,
    n_fft: int = 512,
    win_length: Optional[int] = None,
    hop_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Shift pitch by n_steps (phase vocoder stretch + resample).

    Half-precision inputs cast-compute in f32 (there is no complex half
    dtype for the STFT core) and cast back on return.
    """
    shape = waveform.shape
    in_dtype = waveform.dtype
    if in_dtype in (jnp.bfloat16, jnp.float16):
        out = pitch_shift(waveform.astype(jnp.float32), sample_rate, n_steps,
                          bins_per_octave, n_fft, win_length, hop_length, window)
        return out.astype(in_dtype)
    stretched = _stretch_waveform(waveform, n_steps, bins_per_octave, n_fft, win_length, hop_length, window)
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    shifted = resample(stretched, int(sample_rate / rate), sample_rate)
    ori_len = shape[-1]
    shift_len = shifted.shape[-1]
    if shift_len > ori_len:
        shifted = shifted[..., :ori_len]
    else:
        shifted = jnp.pad(shifted, [(0, 0)] * (shifted.ndim - 1) + [(0, ori_len - shift_len)])
    return shifted.reshape(shape[:-1] + (ori_len,))


def _check_shape_compatible(x: jnp.ndarray, y: jnp.ndarray) -> None:
    if x.ndim != y.ndim:
        raise ValueError(f"The operands must be the same dimension (got {x.ndim} and {y.ndim}).")
    for xi, yi in zip(x.shape[:-1], y.shape[:-1]):
        if xi != yi and xi != 1 and yi != 1:
            raise ValueError(f"Leading dimensions of x and y are not broadcastable (got {x.shape} and {y.shape}).")


def _apply_convolve_mode(conv_result: jnp.ndarray, x_length: int, y_length: int, mode: str) -> jnp.ndarray:
    if mode == "full":
        return conv_result
    if mode == "valid":
        target_length = max(x_length, y_length) - min(x_length, y_length) + 1
        start_idx = (conv_result.shape[-1] - target_length) // 2
        return conv_result[..., start_idx : start_idx + target_length]
    if mode == "same":
        start_idx = (conv_result.shape[-1] - x_length) // 2
        return conv_result[..., start_idx : start_idx + x_length]
    raise ValueError(f"Unrecognized mode value '{mode}'. Please specify one of ['full', 'valid', 'same'].")


def fftconvolve(x: jnp.ndarray, y: jnp.ndarray, mode: str = "full") -> jnp.ndarray:
    """True convolution along the last axis via rfft (XLA FFT)."""
    _check_shape_compatible(x, y)
    out_dtype = jnp.result_type(x.dtype, y.dtype)
    if out_dtype in (jnp.bfloat16, jnp.float16):
        # FFT kernels only exist for f32/f64: compute in f32, cast back
        x, y = x.astype(jnp.float32), y.astype(jnp.float32)
    n = x.shape[-1] + y.shape[-1] - 1
    fresult = jnp.fft.rfft(x, n=n) * jnp.fft.rfft(y, n=n)
    result = jnp.fft.irfft(fresult, n=n).astype(out_dtype)
    return _apply_convolve_mode(result, x.shape[-1], y.shape[-1], mode)


def convolve(x: jnp.ndarray, y: jnp.ndarray, mode: str = "full") -> jnp.ndarray:
    """True convolution along the last axis via direct method."""
    _check_shape_compatible(x, y)
    x_size, y_size = x.shape[-1], y.shape[-1]
    if x.shape[-1] < y.shape[-1]:
        x, y = y, x
    if x.shape[:-1] != y.shape[:-1]:
        new_shape = [max(i, j) for i, j in zip(x.shape[:-1], y.shape[:-1])]
        x = jnp.broadcast_to(x, tuple(new_shape) + (x.shape[-1],))
        y = jnp.broadcast_to(y, tuple(new_shape) + (y.shape[-1],))
    num = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    rx = x.reshape((1, num, x.shape[-1]))  # (N=1, C=num, W) depthwise
    ry = jnp.flip(y.reshape((num, 1, y.shape[-1])), -1)  # (O=num, I=1, K)
    out = jax.lax.conv_general_dilated(
        rx,
        ry,
        window_strides=(1,),
        padding=[(y.shape[-1] - 1, y.shape[-1] - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=num,
    )
    result = out.reshape(x.shape[:-1] + (out.shape[-1],))
    return _apply_convolve_mode(result, x_size, y_size, mode)


def add_noise(
    waveform: jnp.ndarray,
    noise: jnp.ndarray,
    snr: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scale and add noise to waveform per SNR (dB)."""
    if not (waveform.ndim - 1 == noise.ndim - 1 == snr.ndim and (lengths is None or lengths.ndim == snr.ndim)):
        raise ValueError("Input leading dimensions don't match.")
    length = waveform.shape[-1]
    if length != noise.shape[-1]:
        raise ValueError(f"Length dimensions of waveform and noise don't match (got {length} and {noise.shape[-1]}).")
    if lengths is not None:
        mask = jnp.arange(length) < lengths[..., None]
        masked_waveform = waveform * mask
        masked_noise = noise * mask
    else:
        masked_waveform = waveform
        masked_noise = noise
    energy_signal = jnp.sum(masked_waveform**2, axis=-1)
    energy_noise = jnp.sum(masked_noise**2, axis=-1)
    original_snr_db = 10 * (jnp.log10(energy_signal) - jnp.log10(energy_noise))
    scale = 10 ** ((original_snr_db - snr) / 20.0)
    return waveform + scale[..., None] * noise


def speed(
    waveform: jnp.ndarray,
    orig_freq: int,
    factor: float,
    lengths: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Adjust waveform speed by ``factor`` via resampling."""
    source_sample_rate = int(factor * orig_freq)
    target_sample_rate = int(orig_freq)
    gcd = math.gcd(source_sample_rate, target_sample_rate)
    source_sample_rate //= gcd
    target_sample_rate //= gcd
    if lengths is None:
        out_lengths = None
    else:
        out_lengths = jnp.ceil(lengths * target_sample_rate / source_sample_rate).astype(lengths.dtype)
    return resample(waveform, source_sample_rate, target_sample_rate), out_lengths


def preemphasis(waveform: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """y[i] = x[i] - coeff * x[i-1]."""
    shifted = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(1, 0)])[..., :-1]
    return waveform - coeff * shifted


def deemphasis(waveform: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """y[i] = x[i] + coeff * y[i-1] (inverse of preemphasis)."""
    from ._filtering import lfilter

    a = jnp.asarray([1.0, -coeff], dtype=waveform.dtype)
    b = jnp.asarray([1.0, 0.0], dtype=waveform.dtype)
    return lfilter(waveform, a_coeffs=a, b_coeffs=b)


def frechet_distance(mu_x, sigma_x, mu_y, sigma_y):
    """Fréchet distance between two multivariate normals.

    Half-precision inputs cast-compute in f32 (LAPACK has no half-precision
    eigensolver) and cast back on return.
    """
    if mu_x.ndim != 1:
        raise ValueError(f"Input mu_x must be one-dimensional; got dimension {mu_x.ndim}.")
    if sigma_x.ndim != 2:
        raise ValueError(f"Input sigma_x must be two-dimensional; got dimension {sigma_x.ndim}.")
    in_dtype = mu_x.dtype
    if in_dtype in (jnp.bfloat16, jnp.float16):
        out = frechet_distance(
            mu_x.astype(jnp.float32), sigma_x.astype(jnp.float32),
            mu_y.astype(jnp.float32), sigma_y.astype(jnp.float32),
        )
        return out.astype(in_dtype)
    a = jnp.sum((mu_x - mu_y) ** 2)
    b = jnp.trace(sigma_x) + jnp.trace(sigma_y)
    # Tr(sqrt(Sx @ Sy)) via eigenvalues; XLA has no general complex sqrtm, but
    # the eigenvalues of Sx@Sy are real nonneg for PSD inputs.
    eigs = jnp.linalg.eigvals(sigma_x @ sigma_y)
    c = jnp.sum(jnp.real(jnp.sqrt(eigs.astype(jnp.complex64))))
    return a + b - 2 * c
