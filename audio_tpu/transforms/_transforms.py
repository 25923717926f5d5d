"""Transforms: stateful wrappers caching precomputed buffers.

Behavioral parity with /root/reference/src/torchaudio/transforms/_transforms.py
(35 classes, :25-2139).  TPU-native design: instead of nn.Module buffers,
each transform is a plain callable object whose precomputed arrays (windows,
filterbanks, resample kernels) are jnp constants — they fold into the jaxpr
when the transform is called under ``jax.jit``.  Randomized transforms take
an explicit PRNG ``key``.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .. import functional as F
from .._internal.windows import hann_window

__all__ = [
    "Spectrogram",
    "InverseSpectrogram",
    "GriffinLim",
    "AmplitudeToDB",
    "MelScale",
    "InverseMelScale",
    "MelSpectrogram",
    "MFCC",
    "LFCC",
    "MuLawEncoding",
    "MuLawDecoding",
    "Resample",
    "ComputeDeltas",
    "TimeStretch",
    "Fade",
    "FrequencyMasking",
    "TimeMasking",
    "SpecAugment",
    "Loudness",
    "Vol",
    "SlidingWindowCmn",
    "SpectralCentroid",
    "PitchShift",
    "RNNTLoss",
    "Convolve",
    "FFTConvolve",
    "Speed",
    "SpeedPerturbation",
    "AddNoise",
    "Preemphasis",
    "Deemphasis",
    "Vad",
]


class _Transform:
    """Minimal module-like base: ``__call__`` dispatches to ``forward``."""

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)


class Spectrogram(_Transform):
    def __init__(
        self,
        n_fft: int = 400,
        win_length: Optional[int] = None,
        hop_length: Optional[int] = None,
        pad: int = 0,
        window_fn: Callable = hann_window,
        power: Optional[float] = 2.0,
        normalized: Union[bool, str] = False,
        wkwargs: Optional[dict] = None,
        center: bool = True,
        pad_mode: str = "reflect",
        onesided: bool = True,
        return_complex: Optional[bool] = None,
    ) -> None:
        if return_complex is not None:
            import warnings

            # deprecated no-op kwarg, kept for reference signature parity
            # (_transforms.py:94-100)
            warnings.warn(
                "`return_complex` argument is now deprecated and is not effective."
                "`power=None` always returns a tensor with complex dtype."
            )
        self.n_fft = n_fft
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = hop_length if hop_length is not None else self.win_length // 2
        self.pad = pad
        self.power = power
        self.normalized = normalized
        self.center = center
        self.pad_mode = pad_mode
        self.onesided = onesided
        self.window = window_fn(self.win_length, **(wkwargs or {}))

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        return F.spectrogram(
            waveform,
            pad=self.pad,
            window=self.window,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            power=self.power,
            normalized=self.normalized,
            center=self.center,
            pad_mode=self.pad_mode,
            onesided=self.onesided,
        )


class InverseSpectrogram(_Transform):
    def __init__(
        self,
        n_fft: int = 400,
        win_length: Optional[int] = None,
        hop_length: Optional[int] = None,
        pad: int = 0,
        window_fn: Callable = hann_window,
        normalized: Union[bool, str] = False,
        wkwargs: Optional[dict] = None,
        center: bool = True,
        pad_mode: str = "reflect",
        onesided: bool = True,
    ) -> None:
        self.n_fft = n_fft
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = hop_length if hop_length is not None else self.win_length // 2
        self.pad = pad
        self.normalized = normalized
        self.center = center
        self.pad_mode = pad_mode
        self.onesided = onesided
        self.window = window_fn(self.win_length, **(wkwargs or {}))

    def forward(self, spectrogram: jnp.ndarray, length: Optional[int] = None) -> jnp.ndarray:
        return F.inverse_spectrogram(
            spectrogram,
            length=length,
            pad=self.pad,
            window=self.window,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            normalized=self.normalized,
            center=self.center,
            pad_mode=self.pad_mode,
            onesided=self.onesided,
        )


class GriffinLim(_Transform):
    def __init__(
        self,
        n_fft: int = 400,
        n_iter: int = 32,
        win_length: Optional[int] = None,
        hop_length: Optional[int] = None,
        window_fn: Callable = hann_window,
        power: float = 2.0,
        wkwargs: Optional[dict] = None,
        momentum: float = 0.99,
        length: Optional[int] = None,
        rand_init: bool = True,
    ) -> None:
        self.n_fft = n_fft
        self.n_iter = n_iter
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = hop_length if hop_length is not None else self.win_length // 2
        self.window = window_fn(self.win_length, **(wkwargs or {}))
        self.power = power
        self.momentum = momentum
        self.length = length
        self.rand_init = rand_init

    def forward(self, specgram: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        return F.griffinlim(
            specgram,
            window=self.window,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            power=self.power,
            n_iter=self.n_iter,
            momentum=self.momentum,
            length=self.length,
            rand_init=self.rand_init,
            key=key,
        )


class AmplitudeToDB(_Transform):
    def __init__(self, stype: str = "power", top_db: Optional[float] = None) -> None:
        self.stype = stype
        if top_db is not None and top_db < 0:
            raise ValueError("top_db must be positive value")
        self.top_db = top_db
        self.multiplier = 10.0 if stype == "power" else 20.0
        self.amin = 1e-10
        self.ref_value = 1.0
        self.db_multiplier = math.log10(max(self.amin, self.ref_value))

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        return F.amplitude_to_DB(x, self.multiplier, self.amin, self.db_multiplier, self.top_db)


class MelScale(_Transform):
    def __init__(
        self,
        n_mels: int = 128,
        sample_rate: int = 16000,
        f_min: float = 0.0,
        f_max: Optional[float] = None,
        n_stft: int = 201,
        norm: Optional[str] = None,
        mel_scale: str = "htk",
    ) -> None:
        self.n_mels = n_mels
        self.sample_rate = sample_rate
        self.f_max = f_max if f_max is not None else float(sample_rate // 2)
        self.f_min = f_min
        if f_min > self.f_max:
            raise ValueError(f"Require f_min: {f_min} <= f_max: {self.f_max}")
        self.fb = F.melscale_fbanks(n_stft, self.f_min, self.f_max, self.n_mels, self.sample_rate, norm, mel_scale)

    def forward(self, specgram: jnp.ndarray) -> jnp.ndarray:
        # dtype-following: the precomputed f32 bank casts to the input dtype
        # so a bf16 serving path keeps the mel matmul in bf16 on the MXU
        return jnp.swapaxes(
            jnp.swapaxes(specgram, -1, -2) @ self.fb.astype(specgram.dtype), -1, -2
        )


class InverseMelScale(_Transform):
    """Least-squares inversion of the mel filterbank (non-negative).

    The reference solves the same problem with ``torch.linalg.lstsq``
    (_transforms.py:455-505).  ``driver`` is honored with the same solver
    split as LAPACK: ``"gels"`` assumes the filterbank is full row rank and
    solves via the normal equations (like LAPACK's QR path — and like it,
    produces garbage for rank-deficient banks); the rank-revealing drivers
    ``"gelsy"/"gelsd"/"gelss"`` use the SVD pseudo-inverse (minimum-norm
    solution).  For the full-rank banks mel inversion uses in practice the
    two agree within f32 tolerance.
    """

    def __init__(
        self,
        n_stft: int,
        n_mels: int = 128,
        sample_rate: int = 16000,
        f_min: float = 0.0,
        f_max: Optional[float] = None,
        norm: Optional[str] = None,
        mel_scale: str = "htk",
        driver: str = "gels",
    ) -> None:
        self.n_mels = n_mels
        self.sample_rate = sample_rate
        self.f_max = f_max or float(sample_rate // 2)
        self.f_min = f_min
        self.driver = driver
        if f_min > self.f_max:
            raise ValueError(f"Require f_min: {f_min} <= f_max: {self.f_max}")
        if driver not in ("gels", "gelsy", "gelsd", "gelss"):
            raise ValueError(f'driver must be one of ["gels", "gelsy", "gelsd", "gelss"]. Found {driver}.')
        self.fb = F.melscale_fbanks(n_stft, self.f_min, self.f_max, self.n_mels, self.sample_rate, norm, mel_scale)
        a = self.fb.T  # (n_mels, freq): solve a @ spec = mel per time column
        if driver == "gels":
            # full-rank minimum-norm solution x = Q R^-T b with a.T = QR —
            # the LQ path LAPACK gels takes for wide systems.  Like
            # torch.linalg.lstsq(driver="gels"), rank-deficient banks are an
            # error (torch: "input matrix does not have full rank"); here it
            # surfaces at construction rather than first forward.
            q, r = jnp.linalg.qr(a.T)  # (freq, n_mels), (n_mels, n_mels)
            diag = jnp.abs(jnp.diagonal(r))
            if float(diag.min()) <= 1e-7 * float(diag.max()):
                raise RuntimeError(
                    "InverseMelScale(driver='gels'): the mel filterbank does "
                    "not have full rank; use a rank-revealing driver "
                    "('gelsd'/'gelss'/'gelsy')"
                )
            rinvt = jax.scipy.linalg.solve_triangular(
                r, jnp.eye(r.shape[0], dtype=r.dtype), trans=1
            )
            self.fb_pinv = q @ rinvt  # (freq, n_mels)
        else:
            self.fb_pinv = jnp.linalg.pinv(a)  # rank-revealing SVD, (freq, n_mels)

    def forward(self, melspec: jnp.ndarray) -> jnp.ndarray:
        if melspec.shape[-2] != self.n_mels:
            raise ValueError(f"Expected an input with {self.n_mels} mel bins. Found: {melspec.shape[-2]}")
        # solve fb.T @ spec = mel in the least-squares sense, clamp at 0
        spec = jnp.einsum("fm,...mt->...ft", self.fb_pinv, melspec)
        return jax.nn.relu(spec)


class MelSpectrogram(_Transform):
    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 400,
        win_length: Optional[int] = None,
        hop_length: Optional[int] = None,
        f_min: float = 0.0,
        f_max: Optional[float] = None,
        pad: int = 0,
        n_mels: int = 128,
        window_fn: Callable = hann_window,
        power: float = 2.0,
        normalized: bool = False,
        wkwargs: Optional[dict] = None,
        center: bool = True,
        pad_mode: str = "reflect",
        onesided: Optional[bool] = None,
        norm: Optional[str] = None,
        mel_scale: str = "htk",
    ) -> None:
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = hop_length if hop_length is not None else self.win_length // 2
        self.pad = pad
        self.power = power
        self.normalized = normalized
        self.n_mels = n_mels
        self.f_max = f_max
        self.f_min = f_min
        self.spectrogram = Spectrogram(
            n_fft=self.n_fft,
            win_length=self.win_length,
            hop_length=self.hop_length,
            pad=self.pad,
            window_fn=window_fn,
            power=self.power,
            normalized=self.normalized,
            wkwargs=wkwargs,
            center=center,
            pad_mode=pad_mode,
            onesided=True,
        )
        self.mel_scale = MelScale(
            self.n_mels, self.sample_rate, self.f_min, self.f_max, self.n_fft // 2 + 1, norm, mel_scale
        )

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        # Fused TPU path: framing + DFT + power + mel in one Pallas pass
        # (F.mel_spectrogram falls back to the composed path off-TPU).
        if self.power == 2.0:
            spec = self.spectrogram
            x = waveform
            if spec.pad > 0:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(spec.pad, spec.pad)])
            return F.mel_spectrogram(
                x,
                fb=self.mel_scale.fb.astype(x.dtype),
                window=spec.window,
                n_fft=self.n_fft,
                hop_length=self.hop_length,
                win_length=self.win_length,
                center=spec.center,
                pad_mode=spec.pad_mode,
                power=2.0,
                normalized=self.normalized,
            )
        return self.mel_scale(self.spectrogram(waveform))


class MFCC(_Transform):
    def __init__(
        self,
        sample_rate: int = 16000,
        n_mfcc: int = 40,
        dct_type: int = 2,
        norm: str = "ortho",
        log_mels: bool = False,
        melkwargs: Optional[dict] = None,
    ) -> None:
        if dct_type != 2:
            raise ValueError(f"DCT type not supported: {dct_type}")
        self.sample_rate = sample_rate
        self.n_mfcc = n_mfcc
        self.dct_type = dct_type
        self.norm = norm
        self.top_db = 80.0
        self.amplitude_to_DB = AmplitudeToDB("power", self.top_db)
        self.MelSpectrogram = MelSpectrogram(sample_rate=sample_rate, **(melkwargs or {}))
        if self.n_mfcc > self.MelSpectrogram.n_mels:
            raise ValueError("Cannot select more MFCC coefficients than # mel bins")
        self.dct_mat = F.create_dct(self.n_mfcc, self.MelSpectrogram.n_mels, self.norm)
        self.log_mels = log_mels

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        mel_specgram = self.MelSpectrogram(waveform)
        if self.log_mels:
            mel_specgram = jnp.log(mel_specgram + 1e-6)
        else:
            mel_specgram = self.amplitude_to_DB(mel_specgram)
        return jnp.swapaxes(
            jnp.swapaxes(mel_specgram, -1, -2) @ self.dct_mat.astype(mel_specgram.dtype), -1, -2
        )


class LFCC(_Transform):
    def __init__(
        self,
        sample_rate: int = 16000,
        n_filter: int = 128,
        f_min: float = 0.0,
        f_max: Optional[float] = None,
        n_lfcc: int = 40,
        dct_type: int = 2,
        norm: str = "ortho",
        log_lf: bool = False,
        speckwargs: Optional[dict] = None,
    ) -> None:
        if dct_type != 2:
            raise ValueError(f"DCT type not supported: {dct_type}")
        self.sample_rate = sample_rate
        self.f_min = f_min
        self.f_max = f_max if f_max is not None else float(sample_rate // 2)
        self.n_filter = n_filter
        self.n_lfcc = n_lfcc
        self.top_db = 80.0
        self.amplitude_to_DB = AmplitudeToDB("power", self.top_db)
        self.Spectrogram = Spectrogram(**(speckwargs or {}))
        if self.n_lfcc > self.Spectrogram.n_fft:
            raise ValueError("Cannot select more LFCC coefficients than # fft bins")
        self.filter_mat = F.linear_fbanks(
            n_freqs=self.Spectrogram.n_fft // 2 + 1,
            f_min=self.f_min,
            f_max=self.f_max,
            n_filter=self.n_filter,
            sample_rate=self.sample_rate,
        )
        self.dct_mat = F.create_dct(self.n_lfcc, self.n_filter, norm)
        self.log_lf = log_lf

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        specgram = self.Spectrogram(waveform)
        specgram = jnp.swapaxes(
            jnp.swapaxes(specgram, -1, -2) @ self.filter_mat.astype(specgram.dtype), -1, -2
        )
        if self.log_lf:
            specgram = jnp.log(specgram + 1e-6)
        else:
            specgram = self.amplitude_to_DB(specgram)
        return jnp.swapaxes(
            jnp.swapaxes(specgram, -1, -2) @ self.dct_mat.astype(specgram.dtype), -1, -2
        )


class MuLawEncoding(_Transform):
    def __init__(self, quantization_channels: int = 256) -> None:
        self.quantization_channels = quantization_channels

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        return F.mu_law_encoding(x, self.quantization_channels)


class MuLawDecoding(_Transform):
    def __init__(self, quantization_channels: int = 256) -> None:
        self.quantization_channels = quantization_channels

    def forward(self, x_mu: jnp.ndarray) -> jnp.ndarray:
        return F.mu_law_decoding(x_mu, self.quantization_channels)


class Resample(_Transform):
    """Resampler with the polyphase kernel precomputed in the constructor
    (the reference caches it the same way, _transforms.py:899-982)."""

    def __init__(
        self,
        orig_freq: int = 16000,
        new_freq: int = 16000,
        resampling_method: str = "sinc_interp_hann",
        lowpass_filter_width: int = 6,
        rolloff: float = 0.99,
        beta: Optional[float] = None,
        dtype=jnp.float32,
    ) -> None:
        self.orig_freq = orig_freq
        self.new_freq = new_freq
        self.gcd = math.gcd(int(orig_freq), int(new_freq))
        self.resampling_method = resampling_method
        self.lowpass_filter_width = lowpass_filter_width
        self.rolloff = rolloff
        self.beta = beta
        if self.orig_freq != self.new_freq:
            from ..functional._resample import get_sinc_resample_kernel

            self.kernel, self.width = get_sinc_resample_kernel(
                orig_freq, new_freq, self.gcd, lowpass_filter_width, rolloff, resampling_method, beta, dtype=dtype
            )

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        if self.orig_freq == self.new_freq:
            return waveform
        from ..functional._resample import apply_sinc_resample_kernel

        return apply_sinc_resample_kernel(waveform, self.orig_freq, self.new_freq, self.gcd, self.kernel, self.width)


class ComputeDeltas(_Transform):
    def __init__(self, win_length: int = 5, mode: str = "replicate") -> None:
        self.win_length = win_length
        self.mode = mode

    def forward(self, specgram: jnp.ndarray) -> jnp.ndarray:
        return F.compute_deltas(specgram, win_length=self.win_length, mode=self.mode)


class TimeStretch(_Transform):
    def __init__(self, hop_length: Optional[int] = None, n_freq: int = 201, fixed_rate: Optional[float] = None) -> None:
        n_fft = (n_freq - 1) * 2
        hop_length = hop_length if hop_length is not None else n_fft // 2
        self.fixed_rate = fixed_rate
        self.phase_advance = jnp.linspace(0, math.pi * hop_length, n_freq)[..., None]

    def forward(self, complex_specgrams: jnp.ndarray, overriding_rate: Optional[float] = None) -> jnp.ndarray:
        rate = overriding_rate if overriding_rate is not None else self.fixed_rate
        if rate is None:
            raise ValueError("If no fixed_rate is specified, must pass a valid rate to the forward method.")
        return F.phase_vocoder(complex_specgrams, rate, self.phase_advance)


class Fade(_Transform):
    def __init__(self, fade_in_len: int = 0, fade_out_len: int = 0, fade_shape: str = "linear") -> None:
        self.fade_in_len = fade_in_len
        self.fade_out_len = fade_out_len
        self.fade_shape = fade_shape

    def _shape_in(self, fade: jnp.ndarray) -> jnp.ndarray:
        shape = self.fade_shape
        if shape == "linear":
            return fade
        if shape == "exponential":
            return jnp.power(2, fade - 1) * fade
        if shape == "logarithmic":
            return jnp.log10(0.1 + fade) + 1
        if shape == "quarter_sine":
            return jnp.sin(fade * math.pi / 2)
        if shape == "half_sine":
            return jnp.sin(fade * math.pi - math.pi / 2) / 2 + 0.5
        raise ValueError(f"Unknown fade_shape {shape}")

    def _shape_out(self, fade: jnp.ndarray) -> jnp.ndarray:
        shape = self.fade_shape
        if shape == "linear":
            return -fade + 1
        if shape == "exponential":
            return jnp.power(2, -fade) * (1 - fade)
        if shape == "logarithmic":
            return jnp.log10(1.1 - fade) + 1
        if shape == "quarter_sine":
            return jnp.sin(fade * math.pi / 2 + math.pi / 2)
        if shape == "half_sine":
            return jnp.sin(fade * math.pi + math.pi / 2) / 2 + 0.5
        raise ValueError(f"Unknown fade_shape {shape}")

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        length = waveform.shape[-1]
        fade_in = jnp.clip(
            jnp.concatenate([self._shape_in(jnp.linspace(0, 1, self.fade_in_len)), jnp.ones(length - self.fade_in_len)]),
            0,
            1,
        )
        fade_out = jnp.clip(
            jnp.concatenate([jnp.ones(length - self.fade_out_len), self._shape_out(jnp.linspace(0, 1, self.fade_out_len))]),
            0,
            1,
        )
        # ramps are built in f32; cast the product back to the input dtype
        return (waveform * fade_in * fade_out).astype(waveform.dtype)


class _AxisMasking(_Transform):
    def __init__(self, mask_param: int, axis: int, iid_masks: bool, p: float = 1.0) -> None:
        self.mask_param = mask_param
        self.axis = axis
        self.iid_masks = iid_masks
        self.p = p

    def forward(self, specgram: jnp.ndarray, mask_value: float = 0.0, key: Optional[jax.Array] = None) -> jnp.ndarray:
        if self.iid_masks and specgram.ndim == 4:
            return F.mask_along_axis_iid(specgram, self.mask_param, mask_value, self.axis + 1, p=self.p, key=key)
        return F.mask_along_axis(specgram, self.mask_param, mask_value, self.axis, p=self.p, key=key)


class FrequencyMasking(_AxisMasking):
    def __init__(self, freq_mask_param: int, iid_masks: bool = False) -> None:
        super().__init__(freq_mask_param, 1, iid_masks)


class TimeMasking(_AxisMasking):
    def __init__(self, time_mask_param: int, iid_masks: bool = False, p: float = 1.0) -> None:
        super().__init__(time_mask_param, 2, iid_masks, p=p)


class SpecAugment(_Transform):
    def __init__(
        self,
        n_time_masks: int,
        time_mask_param: int,
        n_freq_masks: int,
        freq_mask_param: int,
        iid_masks: bool = True,
        p: float = 1.0,
        zero_masking: bool = False,
    ) -> None:
        self.n_time_masks = n_time_masks
        self.time_mask_param = time_mask_param
        self.n_freq_masks = n_freq_masks
        self.freq_mask_param = freq_mask_param
        self.iid_masks = iid_masks
        self.p = p
        self.zero_masking = zero_masking

    def forward(self, specgram: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        if key is None:
            key = jax.random.PRNGKey(0)
        mask_value = 0.0 if self.zero_masking else specgram.mean()
        time_dim = specgram.ndim - 1
        freq_dim = time_dim - 1
        keys = jax.random.split(key, self.n_time_masks + self.n_freq_masks)
        k = 0
        if specgram.ndim > 2 and self.iid_masks:
            for _ in range(self.n_time_masks):
                specgram = F.mask_along_axis_iid(specgram, self.time_mask_param, mask_value, time_dim, p=self.p, key=keys[k])
                k += 1
            for _ in range(self.n_freq_masks):
                specgram = F.mask_along_axis_iid(specgram, self.freq_mask_param, mask_value, freq_dim, p=self.p, key=keys[k])
                k += 1
        else:
            for _ in range(self.n_time_masks):
                specgram = F.mask_along_axis(specgram, self.time_mask_param, mask_value, time_dim, p=self.p, key=keys[k])
                k += 1
            for _ in range(self.n_freq_masks):
                specgram = F.mask_along_axis(specgram, self.freq_mask_param, mask_value, freq_dim, p=self.p, key=keys[k])
                k += 1
        return specgram


class Loudness(_Transform):
    def __init__(self, sample_rate: int):
        self.sample_rate = sample_rate

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        return F.loudness(waveform, self.sample_rate)


class Vol(_Transform):
    def __init__(self, gain: float, gain_type: str = "amplitude"):
        self.gain = gain
        self.gain_type = gain_type
        if gain_type in ("amplitude", "power") and gain < 0:
            raise ValueError("If gain_type = amplitude or power, gain must be positive.")

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        if self.gain_type == "amplitude":
            waveform = waveform * self.gain
        elif self.gain_type == "db":
            waveform = F.gain(waveform, self.gain)
        elif self.gain_type == "power":
            waveform = F.gain(waveform, 10 * math.log10(self.gain))
        return jnp.clip(waveform, -1, 1)


class SlidingWindowCmn(_Transform):
    def __init__(
        self, cmn_window: int = 600, min_cmn_window: int = 100, center: bool = False, norm_vars: bool = False
    ) -> None:
        self.cmn_window = cmn_window
        self.min_cmn_window = min_cmn_window
        self.center = center
        self.norm_vars = norm_vars

    def forward(self, specgram: jnp.ndarray) -> jnp.ndarray:
        return F.sliding_window_cmn(specgram, self.cmn_window, self.min_cmn_window, self.center, self.norm_vars)


class SpectralCentroid(_Transform):
    def __init__(
        self,
        sample_rate: int,
        n_fft: int = 400,
        win_length: Optional[int] = None,
        hop_length: Optional[int] = None,
        pad: int = 0,
        window_fn: Callable = hann_window,
        wkwargs: Optional[dict] = None,
    ) -> None:
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = hop_length if hop_length is not None else self.win_length // 2
        self.pad = pad
        self.window = window_fn(self.win_length, **(wkwargs or {}))

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        return F.spectral_centroid(
            waveform, self.sample_rate, self.pad, self.window, self.n_fft, self.hop_length, self.win_length
        )


class PitchShift(_Transform):
    def __init__(
        self,
        sample_rate: int,
        n_steps: int,
        bins_per_octave: int = 12,
        n_fft: int = 512,
        win_length: Optional[int] = None,
        hop_length: Optional[int] = None,
        window_fn: Callable = hann_window,
        wkwargs: Optional[dict] = None,
    ) -> None:
        self.sample_rate = sample_rate
        self.n_steps = n_steps
        self.bins_per_octave = bins_per_octave
        self.n_fft = n_fft
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = hop_length if hop_length is not None else self.win_length // 4
        self.window = window_fn(self.win_length, **(wkwargs or {}))

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        return F.pitch_shift(
            waveform,
            self.sample_rate,
            self.n_steps,
            self.bins_per_octave,
            self.n_fft,
            self.win_length,
            self.hop_length,
            self.window,
        )


class RNNTLoss(_Transform):
    def __init__(
        self, blank: int = -1, clamp: float = -1.0, reduction: str = "mean", fused_log_softmax: bool = True
    ) -> None:
        self.blank = blank
        self.clamp = clamp
        self.reduction = reduction
        self.fused_log_softmax = fused_log_softmax

    def forward(self, logits, targets, logit_lengths, target_lengths):
        return F.rnnt_loss(
            logits, targets, logit_lengths, target_lengths, self.blank, self.clamp, self.reduction,
            self.fused_log_softmax,
        )


class Convolve(_Transform):
    def __init__(self, mode: str = "full") -> None:
        self.mode = mode

    def forward(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        return F.convolve(x, y, mode=self.mode)


class FFTConvolve(_Transform):
    def __init__(self, mode: str = "full") -> None:
        self.mode = mode

    def forward(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        return F.fftconvolve(x, y, mode=self.mode)


class Speed(_Transform):
    def __init__(self, orig_freq: int, factor: float) -> None:
        self.orig_freq = orig_freq
        self.factor = factor
        self.source_sample_rate = int(factor * orig_freq)
        self.target_sample_rate = int(orig_freq)
        gcd = math.gcd(self.source_sample_rate, self.target_sample_rate)
        self.source_sample_rate //= gcd
        self.target_sample_rate //= gcd
        self.resampler = Resample(orig_freq=self.source_sample_rate, new_freq=self.target_sample_rate)

    def forward(
        self, waveform: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        if lengths is None:
            out_lengths = None
        else:
            out_lengths = jnp.ceil(lengths * self.target_sample_rate / self.source_sample_rate).astype(lengths.dtype)
        return self.resampler(waveform), out_lengths


class SpeedPerturbation(_Transform):
    def __init__(self, orig_freq: int, factors: Sequence[float]) -> None:
        self.speeders = [Speed(orig_freq=orig_freq, factor=factor) for factor in factors]

    def forward(
        self, waveform: jnp.ndarray, lengths: Optional[jnp.ndarray] = None, key: Optional[jax.Array] = None
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        if key is None:
            key = jax.random.PRNGKey(0)
        idx = int(jax.random.randint(key, (), 0, len(self.speeders)))
        return self.speeders[idx](waveform, lengths)


class AddNoise(_Transform):
    def forward(
        self, waveform: jnp.ndarray, noise: jnp.ndarray, snr: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return F.add_noise(waveform, noise, snr, lengths)


class Preemphasis(_Transform):
    def __init__(self, coeff: float = 0.97) -> None:
        self.coeff = coeff

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        return F.preemphasis(waveform, coeff=self.coeff)


class Deemphasis(_Transform):
    def __init__(self, coeff: float = 0.97) -> None:
        self.coeff = coeff

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        return F.deemphasis(waveform, coeff=self.coeff)


class Vad(_Transform):
    """Voice activity detector (sox vad semantics)."""

    def __init__(self, sample_rate: int, **kwargs) -> None:
        self.sample_rate = sample_rate
        self.kwargs = kwargs

    def forward(self, waveform: jnp.ndarray) -> jnp.ndarray:
        from ..functional._vad import vad

        return vad(waveform, self.sample_rate, **self.kwargs)
