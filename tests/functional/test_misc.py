"""Parity tests for misc functional ops vs torch/scipy/analytic oracles."""

import math

import numpy as np
import pytest
import scipy.signal
import torch

import jax
import jax.numpy as jnp

import audio_tpu.functional as F

from ..conftest import get_sinusoid, get_whitenoise


class TestMuLaw:
    def test_roundtrip(self):
        x = jnp.asarray(get_whitenoise(duration=0.05))
        enc = F.mu_law_encoding(x, 256)
        dec = np.asarray(F.mu_law_decoding(enc, 256))
        # max mu-law quantization error at |x|≈1 is ln(1+mu)·(1+mu|x|)/(2mu) ≈ 0.011·(1+|x|)
        assert np.abs(dec - np.asarray(x)).max() < 0.025

    def test_matches_torch_formula(self):
        x = get_whitenoise(duration=0.01)
        mu = 255.0
        x_mu = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
        expected = ((x_mu + 1) / 2 * mu + 0.5).astype(np.int64)
        got = np.asarray(F.mu_law_encoding(jnp.asarray(x), 256))
        np.testing.assert_array_equal(got, expected)


class TestMasking:
    def test_mask_along_axis_shapes_and_span(self):
        x = jnp.ones((2, 80, 100))
        key = jax.random.PRNGKey(3)
        y = np.asarray(F.mask_along_axis(x, 20, 0.0, axis=2, key=key))
        assert y.shape == x.shape
        masked_cols = (y[0] == 0).all(axis=0).sum()
        assert 0 <= masked_cols <= 20
        # mask is identical across batch
        np.testing.assert_array_equal(y[0], y[1])

    def test_mask_along_axis_iid_independent(self):
        x = jnp.ones((4, 2, 80, 100))
        key = jax.random.PRNGKey(5)
        y = np.asarray(F.mask_along_axis_iid(x, 30, 0.0, axis=3, key=key))
        assert y.shape == x.shape
        spans = [(y[b, c] == 0).all(axis=0).sum() for b in range(4) for c in range(2)]
        assert max(spans) <= 30
        assert len(set(spans)) > 1  # i.i.d. draws differ

    def test_p_caps_mask(self):
        x = jnp.ones((2, 80, 100))
        y = np.asarray(F.mask_along_axis(x, 100, 0.0, axis=2, p=0.1, key=jax.random.PRNGKey(0)))
        assert (y[0] == 0).all(axis=0).sum() <= 10


class TestComputeDeltas:
    def test_matches_torchaudio_conv(self):
        x = get_whitenoise(duration=0.05).reshape(1, 1, -1)[..., :80].astype(np.float64)
        spec = np.tile(x, (1, 4, 1))
        win_length = 5
        n = (win_length - 1) // 2
        denom = n * (n + 1) * (2 * n + 1) / 3
        padded = np.pad(spec, ((0, 0), (0, 0), (n, n)), mode="edge")
        kernel = np.arange(-n, n + 1)
        expected = np.stack(
            [np.correlate(padded[0, c], kernel, mode="valid") for c in range(4)]
        )[None] / denom
        got = np.asarray(F.compute_deltas(jnp.asarray(spec), win_length=win_length))
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestSlidingWindowCmn:
    @pytest.mark.parametrize("center", [False, True])
    @pytest.mark.parametrize("norm_vars", [False, True])
    def test_matches_reference_loop(self, center, norm_vars):
        rng = np.random.default_rng(0)
        spec = rng.standard_normal((2, 50, 13)).astype(np.float64)
        got = np.asarray(F.sliding_window_cmn(jnp.asarray(spec), cmn_window=20, min_cmn_window=5,
                                              center=center, norm_vars=norm_vars))
        # reference sequential loop oracle (functional.py:1164-1256)
        num_frames, num_feats = spec.shape[-2:]
        x = spec.reshape(-1, num_frames, num_feats)
        out = np.zeros_like(x)
        for ch in range(x.shape[0]):
            for t in range(num_frames):
                if center:
                    ws = t - 20 // 2
                    we = ws + 20
                else:
                    ws = t - 20
                    we = t + 1
                if ws < 0:
                    we -= ws
                    ws = 0
                if not center and we > t:
                    we = max(t + 1, 5)
                if we > num_frames:
                    ws -= we - num_frames
                    we = num_frames
                    ws = max(ws, 0)
                window = x[ch, ws:we]
                n = we - ws
                out[ch, t] = x[ch, t] - window.mean(0)
                if norm_vars:
                    if n == 1:
                        out[ch, t] = 0.0
                    else:
                        var = (window**2).sum(0) / n - window.sum(0) ** 2 / n**2
                        out[ch, t] *= var**-0.5
        np.testing.assert_allclose(got, out.reshape(spec.shape), atol=1e-8, rtol=1e-6)


class TestEditDistance:
    @pytest.mark.parametrize("s1,s2,d", [
        ("abc", "abc", 0), ("abc", "", 3), ("", "abc", 3),
        ("kitten", "sitting", 3), ("aaa", "aba", 1),
        (["hello", "world"], ["hello", "there", "world"], 1),
    ])
    def test_cases(self, s1, s2, d):
        assert F.edit_distance(s1, s2) == d


class TestLoudness:
    def test_sine_997hz_reference_level(self):
        """A full-scale 997 Hz sine measures -3.2804 LKFS through the
        reference chain (the lfilter clamp shaves the ideal -3.01; verified
        against a scipy replication of functional.py:1535-1594)."""
        sr = 48000
        t = np.arange(sr * 2) / sr
        x = np.sin(2 * np.pi * 997.0 * t)[None].astype(np.float64)
        lkfs = float(F.loudness(jnp.asarray(x), sr))
        assert abs(lkfs - (-3.2804)) < 0.01, lkfs

    def test_gain_shifts_loudness(self):
        sr = 16000
        x = get_whitenoise(sample_rate=sr, duration=1.0).astype(np.float64) * 0.1
        l0 = float(F.loudness(jnp.asarray(x), sr))
        l1 = float(F.loudness(jnp.asarray(x * 10 ** (-10 / 20)), sr))
        assert abs((l0 - l1) - 10.0) < 0.3


class TestConvolve:
    @pytest.mark.parametrize("mode", ["full", "valid", "same"])
    @pytest.mark.parametrize("fn_name", ["convolve", "fftconvolve"])
    def test_against_numpy(self, mode, fn_name):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 3, 50))
        y = rng.standard_normal((2, 3, 11))
        fn = getattr(F, fn_name)
        got = np.asarray(fn(jnp.asarray(x), jnp.asarray(y), mode=mode))
        expected = np.stack([
            np.stack([np.convolve(x[i, j], y[i, j], mode=mode) for j in range(3)]) for i in range(2)
        ])
        np.testing.assert_allclose(got, expected, atol=1e-6, rtol=1e-6)


class TestAddNoise:
    def test_snr_is_achieved(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 1000)))
        n = jnp.asarray(rng.standard_normal((3, 1000)))
        snr = jnp.asarray([5.0, 10.0, 20.0])
        y = F.add_noise(x, n, snr)
        scaled_noise = np.asarray(y) - np.asarray(x)
        actual_snr = 10 * np.log10(np.sum(np.asarray(x) ** 2, -1) / np.sum(scaled_noise**2, -1))
        np.testing.assert_allclose(actual_snr, np.asarray(snr), atol=1e-4)


class TestPreemphasis:
    def test_roundtrip(self):
        x = jnp.asarray(get_whitenoise(duration=0.05) * 0.3)
        y = F.preemphasis(x, 0.97)
        z = np.asarray(F.deemphasis(y, 0.97))
        np.testing.assert_allclose(z, np.asarray(x), atol=1e-5)

    def test_formula(self):
        x = get_whitenoise(duration=0.01)
        got = np.asarray(F.preemphasis(jnp.asarray(x), 0.95))
        expected = x.copy()
        expected[..., 1:] -= 0.95 * x[..., :-1]
        np.testing.assert_allclose(got, expected, atol=1e-7)


class TestPitch:
    def test_detect_pitch_sine(self):
        """A pure sine is detected at the fundamental or a subharmonic lag
        multiple (the NCCF octave ambiguity is inherent to the algorithm,
        functional.py:1073-1100); the detected lag must divide the period."""
        x = get_sinusoid(frequency=440, sample_rate=16000, duration=1.0)
        freq = np.asarray(F.detect_pitch_frequency(jnp.asarray(x), 16000))
        med = np.median(freq)
        harmonics = [440 / k for k in (1, 2, 3)]
        assert min(abs(med - h) for h in harmonics) < 20, med

    def test_detect_pitch_matches_reference_impl(self):
        """Exact parity with a numpy replication of the reference NCCF chain
        (functional.py:1015-1163)."""
        x = get_sinusoid(frequency=256, sample_rate=8000, duration=0.8) * 0.8
        sr, frame_time, freq_low, freq_high, win_length = 8000, 1e-2, 85, 3400, 30
        got = np.asarray(F.detect_pitch_frequency(jnp.asarray(x), sr, frame_time, win_length, freq_low, freq_high))

        wav = x.reshape(-1, x.shape[-1]).astype(np.float64)
        eps = 1e-9
        lags = int(math.ceil(sr / freq_low))
        frame_size = int(math.ceil(sr * frame_time))
        t_len = wav.shape[-1]
        nf = int(math.ceil(t_len / frame_size))
        p = lags + nf * frame_size - t_len
        w = np.pad(wav, ((0, 0), (0, p)))
        nccf = np.zeros((wav.shape[0], nf, lags))
        for lag in range(1, lags + 1):
            s1 = w[:, : w.shape[1] - lag]
            s2 = w[:, lag:]
            n1 = (s1.shape[1] - frame_size) // frame_size + 1
            f1 = np.stack([s1[:, i * frame_size : i * frame_size + frame_size] for i in range(n1)], 1)[:, :nf]
            f2 = np.stack([s2[:, i * frame_size : i * frame_size + frame_size] for i in range(n1)], 1)[:, :nf]
            num = (f1 * f2).sum(-1)
            nccf[:, :, lag - 1] = num / (eps + np.linalg.norm(f1, axis=-1)) ** 2 / (eps + np.linalg.norm(f2, axis=-1)) ** 2
        lag_min = int(math.ceil(sr / freq_high))
        bv, bi = nccf[..., lag_min:].max(-1), nccf[..., lag_min:].argmax(-1)
        half = nccf.shape[-1] // 2
        hv, hi = nccf[..., lag_min:half].max(-1), nccf[..., lag_min:half].argmax(-1)
        mask = hv > 0.99 * bv
        indices = np.where(mask, hi, bi) + lag_min + 1
        pad_len = (win_length - 1) // 2
        ind = np.pad(indices, ((0, 0), (pad_len, 0)), mode="edge").astype(np.float64)
        smoothed = np.stack(
            [np.sort(ind[:, i : i + win_length], -1)[:, (win_length - 1) // 2] for i in range(ind.shape[1] - win_length + 1)], -1
        )
        expected = sr / (eps + smoothed)
        np.testing.assert_allclose(got.reshape(expected.shape), expected, rtol=1e-4)

    def test_pitch_shift_preserves_shape(self):
        x = jnp.asarray(get_whitenoise(duration=0.2))
        y = F.pitch_shift(x, 16000, 4)
        assert y.shape == x.shape


class TestPhaseVocoder:
    @pytest.mark.parametrize("rate", [0.7, 1.3])
    def test_matches_torchaudio(self, rate):
        """Oracle: torch reimplementation of the phase_vocoder formula."""
        rng = np.random.default_rng(0)
        spec = (rng.standard_normal((2, 201, 50)) + 1j * rng.standard_normal((2, 201, 50))).astype(np.complex64)
        hop, n_fft = 160, 400
        phase_advance = np.linspace(0, math.pi * hop, 201)[:, None]
        got = np.asarray(F.phase_vocoder(jnp.asarray(spec), rate, jnp.asarray(phase_advance)))

        # numpy oracle
        time_steps = np.arange(0, spec.shape[-1], rate)
        alphas = time_steps % 1.0
        phase_0 = np.angle(spec[..., :1])
        padded = np.pad(spec, [(0, 0), (0, 0), (0, 2)])
        idx = time_steps.astype(np.int64)
        s0, s1 = padded[..., idx], padded[..., idx + 1]
        phase = np.angle(s1) - np.angle(s0) - phase_advance
        phase = phase - 2 * np.pi * np.round(phase / (2 * np.pi))
        phase = phase + phase_advance
        phase = np.concatenate([phase_0, phase[..., :-1]], axis=-1)
        phase_acc = np.cumsum(phase, -1)
        mag = alphas * np.abs(s1) + (1 - alphas) * np.abs(s0)
        expected = mag * np.exp(1j * phase_acc)
        np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-3)


class TestFrechet:
    def test_identical_is_zero(self):
        rng = np.random.default_rng(0)
        mu = jnp.asarray(rng.standard_normal(8))
        a = rng.standard_normal((8, 8))
        sigma = jnp.asarray(a @ a.T)
        d = float(F.frechet_distance(mu, sigma, mu, sigma))
        assert abs(d) < 1e-3

    def test_mean_shift(self):
        mu1 = jnp.zeros(4)
        mu2 = jnp.ones(4) * 2
        sigma = jnp.eye(4)
        d = float(F.frechet_distance(mu1, sigma, mu2, sigma))
        np.testing.assert_allclose(d, 16.0, atol=1e-4)
