"""Pallas fused spectrogram kernel vs the rfft reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

import audio_tpu.functional as F
from audio_tpu._internal.windows import hann_window
from audio_tpu.functional._stft import _pad_center, frame_signal
from audio_tpu.ops.pallas_spectrogram import (
    power_spectrogram_pallas,
    spectrogram_pallas_supported,
)


def _ref_power(x, w, n_fft, hop):
    xp = _pad_center(x, n_fft // 2, "reflect")
    fr = frame_signal(xp, n_fft, hop) * w
    s = jnp.fft.rfft(fr, n_fft)
    return s.real**2 + s.imag**2, xp


@pytest.mark.parametrize(
    "n_fft,hop,t",
    [(400, 160, 16000), (512, 128, 8000), (1024, 256, 5000), (256, 64, 777)],
)
def test_power_matches_rfft(n_fft, hop, t):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, t)).astype(np.float32) * 0.3)
    w = hann_window(n_fft)
    ref, xp = _ref_power(x, w, n_fft, hop)
    assert spectrogram_pallas_supported(n_fft, hop, 2.0)
    out = power_spectrogram_pallas(xp, w, n_fft, hop, 2.0, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-4 * float(jnp.max(ref)))


def test_magnitude_power_one():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    w = hann_window(400)
    ref, xp = _ref_power(x, w, 400, 160)
    out = power_spectrogram_pallas(xp, w, 400, 160, 1.0, interpret=True)
    np.testing.assert_allclose(
        out, jnp.sqrt(ref), rtol=0, atol=5e-4 * float(jnp.max(jnp.sqrt(ref)))
    )


def test_fused_mel_matches_unfused():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32) * 0.1)
    w = hann_window(400)
    fb = F.melscale_fbanks(201, 0.0, 8000.0, 80, 16000)
    ref, xp = _ref_power(x, w, 400, 160)
    refm = jnp.einsum("btf,fm->btm", ref, fb)
    out = power_spectrogram_pallas(xp, w, 400, 160, 2.0, fb=fb, interpret=True)
    assert out.shape == refm.shape
    np.testing.assert_allclose(out, refm, rtol=0, atol=5e-4 * float(jnp.max(refm)))


def test_unsupported_configs_reported():
    assert not spectrogram_pallas_supported(400, 160, 0.5)   # non-1/2 power
    assert not spectrogram_pallas_supported(4096, 512, 2.0)  # n_fft too large
    assert not spectrogram_pallas_supported(400, 8, 2.0)     # hop too small
