"""SOX ground-truth compatibility for the filtering stack.

The reference ships wav files produced by ACTUAL sox for each filtering op
(/root/reference/test/torchaudio_unittest/assets/sox_expected_results/,
replayed by common_utils/sox_utils.py:108-117 and compared in
functional/sox_compatibility_test.py).  These are read here as the oracle:
inputs are regenerated bit-identically (torch.randn whitenoise, seed 0,
/2*0.9, clamped — data_utils.py:37-80) and every op's output must match the
sox output within the reference's own tolerances.
"""

from pathlib import Path

import numpy as np
import pytest
import scipy.io.wavfile
import torch

import jax
import jax.numpy as jnp

import audio_tpu.functional as F

_ASSETS = Path("/root/reference/test/torchaudio_unittest/assets")
_GOLD = _ASSETS / "sox_expected_results" / "test" / "torchaudio_unittest" / "functional"
_PREFIX = "sox_compatibility_test.py__TestFunctionalFiltering__"


def _normalize(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.float32:
        return data
    out = data.astype(np.float32)
    if data.dtype == np.int32:
        out[out > 0] /= 2147483647.0
        out[out < 0] /= 2147483648.0
    elif data.dtype == np.int16:
        out[out > 0] /= 32767.0
        out[out < 0] /= 32768.0
    elif data.dtype == np.uint8:
        out -= 128
        out[out > 0] /= 127.0
        out[out < 0] /= 128.0
    return out


def _golden(test_name: str) -> np.ndarray:
    _, data = scipy.io.wavfile.read(_GOLD / f"{_PREFIX}{test_name}.wav")
    if data.ndim == 1:
        data = data[:, None]
    return _normalize(data).T  # (channels, time)


def _whitenoise(sample_rate: int = 8000) -> jnp.ndarray:
    with torch.random.fork_rng([]):
        torch.random.manual_seed(0)
        t = torch.randn([1, int(sample_rate * 3)], dtype=torch.float32)
    t = (t / 2.0 * 0.9).clamp_(-1.0, 1.0)
    return jnp.asarray(t.numpy())


def _steam_train() -> jnp.ndarray:
    _, data = scipy.io.wavfile.read(_ASSETS / "steam-train-whistle-daniel_simon.wav")
    if data.ndim == 1:
        data = data[:, None]
    return jnp.asarray(_normalize(data).T)


def _assert_sox(result, test_name, atol=1e-4, rtol=1e-5):
    expected = _golden(test_name)
    got = np.asarray(result, np.float32)
    assert got.shape == expected.shape, (got.shape, expected.shape)
    np.testing.assert_allclose(got, expected, atol=atol, rtol=rtol)


@pytest.mark.parametrize(
    "test_name,fn,atol",
    [
        ("test_lowpass", lambda x: F.lowpass_biquad(x, 8000, 3000), 1.5e-4),
        ("test_highpass", lambda x: F.highpass_biquad(x, 8000, 2000), 1.5e-4),
        ("test_allpass", lambda x: F.allpass_biquad(x, 8000, 1000, 0.707), 1e-4),
        ("test_bandpass_with_csg",
         lambda x: F.bandpass_biquad(x, 8000, 1000, 0.707, True), 1e-4),
        ("test_bandpass_without_csg",
         lambda x: F.bandpass_biquad(x, 8000, 1000, 0.707, False), 1e-4),
        ("test_bandreject", lambda x: F.bandreject_biquad(x, 8000, 1000, 0.707), 1e-4),
        ("test_band_with_noise", lambda x: F.band_biquad(x, 8000, 1000, 0.707, True), 1e-4),
        ("test_band_without_noise", lambda x: F.band_biquad(x, 8000, 1000, 0.707, False), 1e-4),
        ("test_treble", lambda x: F.treble_biquad(x, 8000, 40, 1000, 0.707), 1e-4),
        ("test_bass", lambda x: F.bass_biquad(x, 8000, 40, 1000, 0.707), 1.5e-4),
        ("test_equalizer", lambda x: F.equalizer_biquad(x, 8000, 300, 1, 0.707), 1e-4),
        ("test_perf_biquad_filtering",
         lambda x: F.lfilter(x, jnp.asarray([0.7, 0.2, 0.6]), jnp.asarray([0.4, 0.2, 0.9])),
         1e-4),
    ],
)
def test_biquads_vs_sox(test_name, fn, atol):
    _assert_sox(fn(_whitenoise(8000)), test_name, atol=atol)


@pytest.mark.parametrize(
    "test_name,sr,fn",
    [
        ("test_deemph", 44100, lambda x: F.deemph_biquad(x, 44100)),
        ("test_riaa", 44100, lambda x: F.riaa_biquad(x, 44100)),
    ],
)
def test_phono_filters_vs_sox(test_name, sr, fn):
    _assert_sox(fn(_whitenoise(sr)), test_name)


@pytest.mark.parametrize(
    "test_name,fn",
    [
        ("test_contrast", lambda x: F.contrast(x, 80.0)),
        ("test_dcshift_with_limiter", lambda x: F.dcshift(x, 0.5, 0.05)),
        ("test_dcshift_without_limiter", lambda x: F.dcshift(x, 0.6)),
        ("test_overdrive", lambda x: F.overdrive(x, 30, 40)),
    ],
)
def test_waveshapers_vs_sox(test_name, fn):
    _assert_sox(fn(_whitenoise(8000)), test_name)


@pytest.mark.parametrize(
    "test_name,sinusoidal",
    [("test_phaser_sine", True), ("test_phaser_triangle", False)],
)
def test_phaser_vs_sox(test_name, sinusoidal):
    x = _whitenoise(8000)
    out = F.phaser(x, 8000, 0.5, 0.8, 2.0, 0.4, 0.5, sinusoidal=sinusoidal)
    _assert_sox(out, test_name)


@pytest.mark.parametrize(
    "test_name,params",
    [
        ("test_flanger_triangle_linear",
         dict(delay=0.6, depth=0.87, regen=3.0, width=0.9, speed=0.5, phase=30,
              modulation="triangular", interpolation="linear")),
        ("test_flanger_triangle_quad",
         dict(delay=0.8, depth=0.88, regen=3.0, width=0.4, speed=0.5, phase=40,
              modulation="triangular", interpolation="quadratic")),
        ("test_flanger_sine_linear",
         dict(delay=0.8, depth=0.88, regen=3.0, width=0.23, speed=1.3, phase=60,
              modulation="sinusoidal", interpolation="linear")),
        ("test_flanger_sine_quad",
         dict(delay=0.9, depth=0.9, regen=4.0, width=0.23, speed=1.3, phase=25,
              modulation="sinusoidal", interpolation="quadratic")),
    ],
)
def test_flanger_vs_sox(test_name, params):
    x = _whitenoise(8000)
    out = F.flanger(x[None], 8000, **params)[0]
    _assert_sox(out, test_name)


def test_gain_vs_sox():
    _assert_sox(F.gain(_steam_train(), 3), "test_gain")


def test_dither_vs_sox():
    # sox's dither adds ~1 LSB (16-bit) noise, below the 1e-4 tolerance, so
    # any correctly-scaled TPDF dither matches (as in the reference test).
    out = F.dither(_steam_train(), key=jax.random.PRNGKey(0))
    _assert_sox(out, "test_dither")


def test_dither_noise_vs_sox():
    out = F.dither(_steam_train(), noise_shaping=True, key=jax.random.PRNGKey(0))
    _assert_sox(out, "test_dither_noise", atol=1.5e-4)
