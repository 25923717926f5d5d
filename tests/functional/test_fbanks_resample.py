"""Parity tests for filterbanks (vs librosa-style formulas / torchaudio
expected assets) and resample (vs analytic signals + scipy)."""

import math

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

import audio_tpu.functional as F

from ..conftest import get_sinusoid, get_whitenoise


class TestMelFbanks:
    @pytest.mark.parametrize("norm,mel_scale", [(None, "htk"), ("slaney", "slaney"), (None, "slaney"), ("slaney", "htk")])
    def test_shape_and_partition(self, norm, mel_scale):
        fb = np.asarray(F.melscale_fbanks(201, 0.0, 8000.0, 80, 16000, norm=norm, mel_scale=mel_scale))
        assert fb.shape == (201, 80)
        assert (fb >= 0).all()
        # every mel filter has support
        assert (fb.sum(axis=0) > 0).all()

    def test_against_librosa_formula(self):
        """Slaney-norm slaney-scale fbanks equal librosa.filters.mel (transposed)."""
        fb = np.asarray(F.melscale_fbanks(257, 0.0, 8000.0, 40, 16000, norm="slaney", mel_scale="slaney"))
        # librosa-equivalent construction in numpy
        def mel_to_hz(m):
            f = 200.0 / 3 * m
            log_t = m >= (1000.0 * 3 / 200.0)
            return np.where(log_t, 1000.0 * np.exp(math.log(6.4) / 27.0 * (m - 15.0)), f)
        def hz_to_mel(f):
            f = np.asarray(f, dtype=np.float64)
            log_t = f >= 1000.0
            return np.where(log_t, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (math.log(6.4) / 27.0), 3 * f / 200.0)
        mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0), 42)
        hz_pts = mel_to_hz(mel_pts)
        freqs = np.linspace(0, 8000, 257)
        weights = np.zeros((40, 257))
        fdiff = np.diff(hz_pts)
        ramps = hz_pts[:, None] - freqs[None, :]
        for i in range(40):
            lower = -ramps[i] / fdiff[i]
            upper = ramps[i + 2] / fdiff[i + 1]
            weights[i] = np.maximum(0, np.minimum(lower, upper))
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        weights *= enorm[:, None]
        np.testing.assert_allclose(fb, weights.T, atol=1e-5, rtol=0)

    def test_mel_spectrogram_chain(self):
        x = get_whitenoise(duration=0.25)
        spec = F.spectrogram(jnp.asarray(x), n_fft=400, hop_length=160, win_length=400, power=2.0,
                             normalized=False, window=None)
        fb = F.melscale_fbanks(201, 0.0, 8000.0, 80, 16000)
        mel = jnp.einsum("...ft,fm->...mt", spec, fb)
        assert mel.shape == (1, 80, spec.shape[-1])


class TestDCT:
    @pytest.mark.parametrize("norm", [None, "ortho"])
    def test_against_scipy(self, norm):
        from scipy.fft import dct as scipy_dct

        n_mfcc, n_mels = 13, 40
        mat = np.asarray(F.create_dct(n_mfcc, n_mels, norm))  # (n_mels, n_mfcc)
        x = np.random.default_rng(0).standard_normal(n_mels)
        got = x @ mat
        expected = scipy_dct(x, type=2, norm="ortho" if norm == "ortho" else None)[:n_mfcc]
        np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


class TestResample:
    @pytest.mark.parametrize("orig,new", [(16000, 8000), (8000, 16000), (48000, 16000), (44100, 16000)])
    def test_sinusoid_preserved(self, orig, new):
        """Resampling a pure cosine gives the cosine at the new rate
        (the reference's analytic oracle, functional_impl.py:22-49)."""
        freq = 440.0
        duration = 1.0
        t_orig = np.arange(int(orig * duration)) / orig
        x = np.cos(2 * np.pi * freq * t_orig).astype(np.float32)
        y = np.asarray(F.resample(jnp.asarray(x), orig, new))
        t_new = np.arange(y.shape[-1]) / new
        expected = np.cos(2 * np.pi * freq * t_new).astype(np.float32)
        # ignore filter-width edge effects
        w = 200
        err = np.abs(y[w:-w] - expected[w:-w]).max()
        assert err < 2e-3, err

    def test_output_length(self):
        x = jnp.zeros((2, 16000))
        y = F.resample(x, 16000, 24000)
        assert y.shape == (2, 24000)
        y = F.resample(x, 16000, 8000)
        assert y.shape == (2, 8000)

    def test_identity(self):
        x = get_whitenoise(duration=0.1)
        y = np.asarray(F.resample(jnp.asarray(x), 16000, 16000))
        np.testing.assert_array_equal(y, x)

    def test_kaiser_bandlimited_multitone(self):
        """Kaiser-windowed downsampling must pass tones well below the new
        Nyquist essentially unchanged."""
        t = np.arange(16000) / 16000
        x = sum(np.cos(2 * np.pi * f * t) for f in (220.0, 880.0, 1760.0)).astype(np.float32)
        y = np.asarray(F.resample(jnp.asarray(x), 16000, 8000, lowpass_filter_width=16,
                                  rolloff=0.945, resampling_method="sinc_interp_kaiser", beta=14.769656459379492))
        t8 = np.arange(len(y)) / 8000
        expected = sum(np.cos(2 * np.pi * f * t8) for f in (220.0, 880.0, 1760.0))
        w = 200
        assert np.abs(y[w:-w] - expected[w:-w]).max() < 5e-3

    def test_batch_and_grad(self):
        import jax

        x = jnp.asarray(get_whitenoise(duration=0.05, n_channels=3))
        f = lambda z: jnp.sum(F.resample(z, 16000, 8000) ** 2)
        g = jax.grad(f)(x)
        assert g.shape == x.shape
        assert np.isfinite(np.asarray(g)).all()


class TestSpeed:
    def test_speed_changes_length(self):
        x = jnp.asarray(get_whitenoise(duration=0.5))
        y, lengths = F.speed(x, 16000, 2.0, lengths=jnp.asarray([8000]))
        assert y.shape[-1] == 4000
        assert int(lengths[0]) == 4000
