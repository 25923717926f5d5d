"""Spectral ops: spectrogram, inverse, Griffin-Lim, phase vocoder, centroid.

Behavioral parity with /root/reference/src/torchaudio/functional/functional.py:
spectrogram (:54-144), inverse_spectrogram (:146-227), griffinlim (:255-355),
amplitude_to_DB / DB_to_amplitude (:356-423), phase_vocoder (:732-812),
spectral_centroid (:1257-1304).  TPU-native: static shapes, fori_loop for the
Griffin-Lim iteration, everything jit/vmap-safe.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ._stft import istft as _istft
from ._stft import stft as _stft

__all__ = [
    "spectrogram",
    "inverse_spectrogram",
    "griffinlim",
    "amplitude_to_DB",
    "DB_to_amplitude",
    "mel_spectrogram",
    "phase_vocoder",
    "spectral_centroid",
]


def _get_spec_norms(normalized: Union[str, bool]):
    frame_length_norm, window_norm = False, False
    if isinstance(normalized, str):
        if normalized not in ("frame_length", "window"):
            raise ValueError(f"Invalid normalized parameter: {normalized}")
        frame_length_norm = normalized == "frame_length"
        window_norm = normalized == "window"
    elif isinstance(normalized, bool):
        window_norm = normalized
    else:
        raise TypeError("normalized must be bool or str")
    return frame_length_norm, window_norm


def _use_conv_dft() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
    except Exception:
        return False


def _use_pallas_spectrogram(n_fft: int, hop: int, power: float) -> bool:
    """Whether to run the fused Pallas spectrogram kernel.

    Off by default: on v5e the XLA strided-conv DFT measured FASTER in-chain
    than the fused kernel (north-star bench 25.8k vs 24.7k streams/chip for
    F.spectrogram, 25.5k for the mel-fused variant), even though the kernel
    wins when timed standalone (7.3 ms vs 9.4 ms per 4096×1 s batch) —
    XLA overlaps the conv with neighboring-op DMA in ways the opaque
    custom-call boundary prevents.  Kept as an env-gated alternative
    (AUDIO_TPU_PALLAS_SPECTROGRAM=1) for other configs/topologies.
    """
    from .._internal.module_utils import eval_env
    from ..ops.pallas_spectrogram import spectrogram_pallas_supported

    return (
        _use_conv_dft()  # TPU backend only — Mosaic won't lower elsewhere
        and eval_env("AUDIO_TPU_PALLAS_SPECTROGRAM", False)
        and spectrogram_pallas_supported(n_fft, hop, power)
    )


def _power_spec_ref_tm(x_padded, window, fb, n_fft: int, hop: int, power: float):
    """Pure-jnp time-major power/mel spectrogram (..., n_frames, bins).

    Reference math for the fused Pallas kernel: also serves as its custom-VJP
    backward (recompute + XLA autodiff) and as the CPU path of
    :func:`mel_spectrogram`.
    """
    from ._stft import frame_signal

    if x_padded.dtype not in (jnp.float32, jnp.float64):
        x_padded = x_padded.astype(jnp.float32)  # rfft needs f32/f64
    fr = frame_signal(x_padded, n_fft, hop) * window.astype(x_padded.dtype)
    s = jnp.fft.rfft(fr, n_fft)
    p = s.real**2 + s.imag**2
    if fb is not None:
        p = p @ fb
    if power == 1.0:
        p = jnp.sqrt(p)
    return p


def _fused_power_spec(x_padded, window, fb, n_fft: int, hop: int, power: float):
    """Fused Pallas power/mel spectrogram with autodiff via the jnp reference."""
    return _fps_runner(n_fft, hop, power, x_padded, window, fb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fps_runner(n_fft, hop, power, x_padded, window, fb):
    from ..ops.pallas_spectrogram import power_spectrogram_pallas

    return power_spectrogram_pallas(x_padded, window, n_fft, hop, power, fb=fb)


def _fps_fwd(n_fft, hop, power, x_padded, window, fb):
    return _fps_runner(n_fft, hop, power, x_padded, window, fb), (x_padded, window, fb)


def _fps_bwd(n_fft, hop, power, res, g):
    x_padded, window, fb = res
    _, vjp = jax.vjp(
        lambda xx, ww, ff: _power_spec_ref_tm(xx, ww, ff, n_fft, hop, power),
        x_padded, window, fb,
    )
    return vjp(g)


_fps_runner.defvjp(_fps_fwd, _fps_bwd)


def _power_spec_pallas_api(
    waveform: jnp.ndarray,
    window: Optional[jnp.ndarray],
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool,
    pad_mode: str,
    power: float,
    frame_length_norm: bool,
) -> jnp.ndarray:
    """Fused-kernel path of :func:`spectrogram`; returns (..., freq, time)."""
    from ._stft import _pad_center, _prepare_window

    window = _prepare_window(window, n_fft, win_length, jnp.float32)
    if center:
        waveform = _pad_center(waveform, n_fft // 2, pad_mode)
    lead = waveform.shape[:-1]
    x = waveform.reshape(-1, waveform.shape[-1]).astype(jnp.float32)
    p = _fused_power_spec(x, window, None, n_fft, hop_length, float(power))
    if frame_length_norm:
        p = p * (float(n_fft) ** (-power / 2.0))
    p = jnp.swapaxes(p, -1, -2)
    return p.reshape(lead + p.shape[1:]).astype(waveform.dtype)


def mel_spectrogram(
    waveform: jnp.ndarray,
    fb: jnp.ndarray,
    window: Optional[jnp.ndarray] = None,
    n_fft: int = 400,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    power: float = 2.0,
    normalized: Union[bool, str] = False,
    time_major: bool = False,
) -> jnp.ndarray:
    """Mel power spectrogram in one call (TPU-native convenience op).

    Extension of the reference's ``MelSpectrogram`` transform chain
    (/root/reference/src/torchaudio/transforms/_transforms.py:612-622, which
    composes Spectrogram → MelScale).  On TPU this runs the strided-conv DFT
    (implicit GEMM, no frame materialization) into the mel matmul; with
    ``AUDIO_TPU_PALLAS_SPECTROGRAM=1`` the whole chain (framing, windowed
    DFT, power, mel GEMM) runs in one fused Pallas kernel instead.  ``fb``
    is the (n_freq, n_mels) filterbank from :func:`melscale_fbanks`.

    Returns (..., n_mels, time), or (..., time, n_mels) when ``time_major``
    (the compute-native layout, free of the final transpose).
    """
    from ._stft import _pad_center, _prepare_window

    hop_length = hop_length or n_fft // 2
    win_length = win_length or n_fft
    if power != 2.0:
        raise ValueError("mel fusion requires power=2.0")
    frame_length_norm, window_norm = _get_spec_norms(normalized)
    if center:
        waveform = _pad_center(waveform, n_fft // 2, pad_mode)
    lead = waveform.shape[:-1]
    x = waveform.reshape(-1, waveform.shape[-1])
    if _use_pallas_spectrogram(n_fft, hop_length, 2.0):
        window_p = _prepare_window(window, n_fft, win_length, jnp.float32)
        p = _fused_power_spec(
            x.astype(jnp.float32), window_p, fb, n_fft, hop_length, 2.0
        )
        window_p = window_p.astype(waveform.dtype)
    elif _use_conv_dft():
        # Strided-conv DFT (implicit GEMM, no frame materialization) + mel
        # matmul — the fastest measured TPU path; see _use_pallas_spectrogram.
        window_p = _prepare_window(window, n_fft, win_length, waveform.dtype)
        p_ft = _power_spec_conv(
            x, window, n_fft, hop_length, win_length, False, pad_mode, 2.0, False
        )
        p = jnp.einsum("bft,fm->btm", p_ft, fb)
    else:
        window_p = _prepare_window(window, n_fft, win_length, waveform.dtype)
        p = _power_spec_ref_tm(x, window_p, fb, n_fft, hop_length, 2.0)
    if frame_length_norm:
        p = p / n_fft
    if window_norm:
        # sum in f32 regardless of waveform dtype: the composed
        # Spectrogram->MelScale path normalizes by the user's (f32) window,
        # and a bf16 sum here would diverge from it by ~1%
        p = p / jnp.sum(window_p.astype(jnp.float32) * window_p.astype(jnp.float32))
    if not time_major:
        p = jnp.swapaxes(p, -1, -2)
    # dtype follows the composed Spectrogram -> MelScale chain: the mel
    # matmul promotes (e.g. bf16 waveform x f32 filterbank -> f32 output),
    # and the filterbank is never quantized down to the waveform dtype.
    return p.reshape(lead + p.shape[1:]).astype(
        jnp.result_type(waveform.dtype, fb.dtype)
    )


def _power_spec_conv(
    waveform: jnp.ndarray,
    window: Optional[jnp.ndarray],
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool,
    pad_mode: str,
    power: float,
    frame_length_norm: bool,
) -> jnp.ndarray:
    """Magnitude/power spectrogram as one strided conv (matmul-DFT).

    On TPU the frame gather materializes n_fft/hop x the input in HBM; the
    windowed DFT as a stride-``hop`` convolution is an implicit-GEMM on the
    MXU with no frame materialization.  Used only for real power/magnitude
    outputs; the complex path keeps the rfft formulation.
    """
    from ._stft import _pad_center, _prepare_window

    window = _prepare_window(window, n_fft, win_length, waveform.dtype)
    if center:
        waveform = _pad_center(waveform, n_fft // 2, pad_mode)
    lead = waveform.shape[:-1]
    x = waveform.reshape(-1, 1, waveform.shape[-1])
    n_freq = n_fft // 2 + 1
    n = jnp.arange(n_fft, dtype=jnp.float32)
    f = jnp.arange(n_freq, dtype=jnp.float32)
    ang = (2.0 * math.pi / n_fft) * f[:, None] * n[None, :]
    w32 = window.astype(jnp.float32)
    kernel = jnp.concatenate([jnp.cos(ang) * w32, -jnp.sin(ang) * w32], axis=0)[:, None, :]
    # HIGH (3-pass bf16) matches HIGHEST within the f32-input noise floor
    # (max rel err 1.2e-3 vs 1.1e-3 on the bench signal) at ~0.76x the time;
    # DEFAULT (1-pass bf16) loses 2 decimal digits and is not acceptable here.
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel, (hop_length,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), precision=jax.lax.Precision.HIGH,
    )
    re, im = y[:, :n_freq], y[:, n_freq:]
    p = re * re + im * im
    if frame_length_norm:
        p = p / n_fft
    if power == 1.0:
        p = jnp.sqrt(p)
    elif power != 2.0:
        p = jnp.sqrt(p) ** power
    return p.reshape(lead + p.shape[1:]).astype(waveform.dtype)


def spectrogram(
    waveform: jnp.ndarray,
    pad: int = 0,
    window: Optional[jnp.ndarray] = None,
    n_fft: int = 400,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    power: Optional[float] = 2.0,
    normalized: Union[bool, str] = False,
    center: bool = True,
    pad_mode: str = "reflect",
    onesided: bool = True,
    return_complex: Optional[bool] = None,
) -> jnp.ndarray:
    """Magnitude/power or complex spectrogram of shape (..., freq, time)."""
    if return_complex is not None:
        import warnings

        # deprecated no-op kwarg, kept for reference signature parity
        # (functional.py:105-111): power=None always returns complex
        warnings.warn(
            "`return_complex` argument is now deprecated and is not effective."
            "`audio_tpu.functional.spectrogram(power=None)` always returns a tensor with "
            "complex dtype. Please remove the argument in the function call."
        )
    hop_length = hop_length or n_fft // 2
    win_length = win_length or n_fft
    # reduced-precision inputs: FFT kernels only exist for f32/f64, so
    # compute in f32 and cast real outputs back (complex output is
    # complex64 either way) — mirrors torch.stft's half/CUDA promotion
    in_dtype = waveform.dtype
    reduced = in_dtype in (jnp.bfloat16, jnp.float16)
    if reduced:
        waveform = waveform.astype(jnp.float32)
        if window is not None:
            window = window.astype(jnp.float32)
        out = spectrogram(
            waveform, pad, window, n_fft, hop_length, win_length, power,
            normalized, center, pad_mode, onesided,
        )
        return out.astype(in_dtype) if power is not None else out
    if pad > 0:
        waveform = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)])
    frame_length_norm, window_norm = _get_spec_norms(normalized)
    if power is not None and onesided and _use_conv_dft():
        if _use_pallas_spectrogram(n_fft, hop_length, float(power)):
            spec = _power_spec_pallas_api(
                waveform, window, n_fft, hop_length, win_length, center,
                pad_mode, float(power), frame_length_norm,
            )
        else:
            spec = _power_spec_conv(
                waveform, window, n_fft, hop_length, win_length, center, pad_mode,
                power, frame_length_norm,
            )
        if window_norm:
            w = window if window is not None else jnp.ones((win_length,), waveform.dtype)
            spec = spec / jnp.sum(w * w) ** (power / 2.0)
        return spec
    spec_f = _stft(
        waveform,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        window=window,
        center=center,
        pad_mode=pad_mode,
        normalized=frame_length_norm,
        onesided=onesided,
    )
    if window_norm:
        w = window if window is not None else jnp.ones((win_length,), waveform.dtype)
        spec_f = spec_f / jnp.sqrt(jnp.sum(w * w))
    if power is not None:
        if power == 1.0:
            return jnp.abs(spec_f)
        return jnp.abs(spec_f) ** power
    return spec_f


def inverse_spectrogram(
    spectrogram: jnp.ndarray,
    length: Optional[int],
    pad: int = 0,
    window: Optional[jnp.ndarray] = None,
    n_fft: int = 400,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    normalized: Union[bool, str] = False,
    center: bool = True,
    pad_mode: str = "reflect",
    onesided: bool = True,
) -> jnp.ndarray:
    """Least-squares inverse of a complex spectrogram; returns (..., time)."""
    hop_length = hop_length or n_fft // 2
    win_length = win_length or n_fft
    if not jnp.iscomplexobj(spectrogram):
        raise ValueError("Expected `spectrogram` to be complex dtype.")
    frame_length_norm, window_norm = _get_spec_norms(normalized)
    if window_norm:
        w = window if window is not None else jnp.ones((win_length,))
        spectrogram = spectrogram * jnp.sqrt(jnp.sum(w * w))
    waveform = _istft(
        spectrogram,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        window=window,
        center=center,
        normalized=frame_length_norm,
        onesided=onesided,
        length=length + 2 * pad if length is not None else None,
    )
    if length is not None and pad > 0:
        waveform = waveform[..., pad:-pad]
    return waveform


def griffinlim(
    specgram: jnp.ndarray,
    window: Optional[jnp.ndarray] = None,
    n_fft: int = 400,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    power: float = 2.0,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: Optional[int] = None,
    rand_init: bool = True,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Griffin-Lim phase recovery (fast variant with momentum).

    Half-precision inputs cast-compute in f32 (the FFT core has no complex
    half dtype) and cast back on return.
    """
    if not 0 <= momentum < 1:
        raise ValueError(f"momentum must be in range [0, 1). Found: {momentum}")
    if specgram.dtype in (jnp.bfloat16, jnp.float16):
        out = griffinlim(
            specgram.astype(jnp.float32), window=window, n_fft=n_fft,
            hop_length=hop_length, win_length=win_length, power=power,
            n_iter=n_iter, momentum=momentum, length=length,
            rand_init=rand_init, key=key,
        )
        return out.astype(specgram.dtype)
    hop_length = hop_length or n_fft // 2
    win_length = win_length or n_fft
    momentum = momentum / (1 + momentum)

    mag = specgram ** (1 / power)
    cdtype = jnp.complex64 if mag.dtype != jnp.float64 else jnp.complex128
    if rand_init:
        if key is None:
            key = jax.random.PRNGKey(0)
        kr, ki = jax.random.split(key)
        angles = (
            jax.random.uniform(kr, mag.shape, mag.dtype) + 1j * jax.random.uniform(ki, mag.shape, mag.dtype)
        ).astype(cdtype)
    else:
        angles = jnp.ones(mag.shape, dtype=cdtype)

    def body(_, carry):
        angles, tprev = carry
        inverse = _istft(
            mag * angles, n_fft=n_fft, hop_length=hop_length, win_length=win_length, window=window, length=length
        )
        rebuilt = _stft(
            inverse, n_fft=n_fft, hop_length=hop_length, win_length=win_length, window=window,
            center=True, pad_mode="reflect", normalized=False, onesided=True,
        )
        angles = rebuilt - tprev * momentum if momentum else rebuilt
        angles = angles / (jnp.abs(angles) + 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, jnp.zeros_like(angles)))
    return _istft(
        mag * angles, n_fft=n_fft, hop_length=hop_length, win_length=win_length, window=window, length=length
    )


def amplitude_to_DB(
    x: jnp.ndarray,
    multiplier: float,
    amin: float,
    db_multiplier: float,
    top_db: Optional[float] = None,
) -> jnp.ndarray:
    """Power/amplitude → decibel scale with optional per-clip top_db floor."""
    x_db = multiplier * jnp.log10(jnp.maximum(x, amin))
    x_db = x_db - multiplier * db_multiplier
    if top_db is not None:
        shape = x_db.shape
        packed_channels = shape[-3] if x_db.ndim > 2 else 1
        x_db = x_db.reshape((-1, packed_channels) + shape[-2:])
        cutoff = jnp.max(x_db, axis=(-3, -2, -1), keepdims=True) - top_db
        x_db = jnp.maximum(x_db, cutoff)
        x_db = x_db.reshape(shape)
    return x_db


def DB_to_amplitude(x: jnp.ndarray, ref: float, power: float) -> jnp.ndarray:
    return ref * jnp.power(jnp.power(10.0, 0.1 * x), power)


def phase_vocoder(complex_specgrams: jnp.ndarray, rate: float, phase_advance: jnp.ndarray) -> jnp.ndarray:
    """Time-stretch a complex spectrogram by ``rate`` without changing pitch.

    ``phase_advance`` is (freq, 1) expected phase advance per hop.  Output has
    ``ceil(time / rate)`` frames.
    """
    if rate == 1.0:
        return complex_specgrams
    time_steps = jnp.arange(0, complex_specgrams.shape[-1], rate, dtype=jnp.zeros((), complex_specgrams.dtype).real.dtype)
    alphas = time_steps % 1.0
    phase_0 = jnp.angle(complex_specgrams[..., :1])
    padded = jnp.pad(complex_specgrams, [(0, 0)] * (complex_specgrams.ndim - 1) + [(0, 2)])
    idx = time_steps.astype(jnp.int32)
    spec_0 = padded[..., idx]
    spec_1 = padded[..., idx + 1]
    angle_0 = jnp.angle(spec_0)
    angle_1 = jnp.angle(spec_1)
    norm_0 = jnp.abs(spec_0)
    norm_1 = jnp.abs(spec_1)
    phase = angle_1 - angle_0 - phase_advance
    phase = phase - 2 * math.pi * jnp.round(phase / (2 * math.pi))
    phase = phase + phase_advance
    phase = jnp.concatenate([phase_0, phase[..., :-1]], axis=-1)
    phase_acc = jnp.cumsum(phase, axis=-1)
    mag = alphas * norm_1 + (1 - alphas) * norm_0
    return mag * jnp.exp(1j * phase_acc)


def spectral_centroid(
    waveform: jnp.ndarray,
    sample_rate: int,
    pad: int = 0,
    window: Optional[jnp.ndarray] = None,
    n_fft: int = 400,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
) -> jnp.ndarray:
    """Spectral centroid in Hz per frame: (..., time).

    The frequency-weighted magnitude sum reaches Hz x frames scale, which
    overflows float16's 65504 max, so the reduction accumulates in f32 and
    the result is cast back to the input dtype.
    """
    hop_length = hop_length or n_fft // 2
    win_length = win_length or n_fft
    specgram = spectrogram(
        waveform, pad=pad, window=window, n_fft=n_fft, hop_length=hop_length,
        win_length=win_length, power=1.0, normalized=False,
    )
    acc = jnp.promote_types(specgram.dtype, jnp.float32)
    freqs = jnp.linspace(0, sample_rate // 2, 1 + n_fft // 2, dtype=acc)
    sg = specgram.astype(acc)
    out = jnp.sum(freqs[..., None] * sg, axis=-2) / jnp.sum(sg, axis=-2)
    return out.astype(specgram.dtype)
