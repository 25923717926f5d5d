"""Parity tests for lfilter/biquads/effects vs scipy.signal and the
reference's semantics (SURVEY.md §3.3)."""

import math

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

import audio_tpu.functional as F
from audio_tpu.ops.iir import iir_blocked, iir_scan

from ..conftest import get_whitenoise


class TestIIREngines:
    @pytest.mark.parametrize("order", [1, 2, 4])
    @pytest.mark.parametrize("t_len", [50, 300, 1000])
    def test_blocked_matches_scan(self, order, t_len):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 3, t_len)), jnp.float32)
        # stable poles
        poles = 0.5 * rng.uniform(-1, 1, size=(3, order))
        a_tails = []
        for c in range(3):
            a = np.poly(poles[c])  # monic, stable
            a_tails.append(a[1:])
        a_tail = jnp.asarray(np.stack(a_tails), jnp.float32)
        y_scan = np.asarray(iir_scan(x, a_tail))
        y_blk = np.asarray(iir_blocked(x, a_tail, block_size=64))
        np.testing.assert_allclose(y_blk, y_scan, atol=1e-4, rtol=1e-4)

    def test_matches_scipy_allpole(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 1, 500)).astype(np.float64)
        a = np.array([1.0, -0.9, 0.2])
        y = np.asarray(iir_blocked(jnp.asarray(x), jnp.asarray(a[1:])[None], block_size=128))
        expected = scipy.signal.lfilter([1.0], a, x[0, 0])
        np.testing.assert_allclose(y[0, 0], expected, atol=1e-8, rtol=1e-6)


class TestLfilter:
    @pytest.mark.parametrize("b,a", [
        ([0.4, 0.2, 0.9], [0.7, 0.2, 0.6]),
        ([1.0, 0.0], [1.0, -0.95]),
        ([0.1, 0.2], [1.0, 0.0]),
    ])
    def test_against_scipy(self, b, a):
        x = get_whitenoise(duration=0.1).astype(np.float64) * 0.1
        y = np.asarray(F.lfilter(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), clamp=False))
        expected = scipy.signal.lfilter(b, a, x, axis=-1)
        np.testing.assert_allclose(y, expected, atol=1e-6, rtol=1e-5)

    def test_2d_coeffs_batching(self):
        x = np.random.default_rng(0).standard_normal((4, 2, 200)) * 0.05
        a = np.array([[1.0, -0.8, 0.1], [1.0, -0.5, 0.0]])
        b = np.array([[0.5, 0.1, 0.0], [0.3, 0.0, 0.2]])
        y = np.asarray(F.lfilter(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), clamp=False))
        for i in range(2):
            expected = scipy.signal.lfilter(b[i], a[i], x[:, i, :], axis=-1)
            np.testing.assert_allclose(y[:, i, :], expected, atol=1e-6, rtol=1e-5)

    def test_batching_false_stacks(self):
        x = np.random.default_rng(0).standard_normal((200,)) * 0.05
        a = np.array([[1.0, -0.8], [1.0, -0.5]])
        b = np.array([[0.5, 0.0], [0.3, 0.1]])
        y = np.asarray(F.lfilter(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), clamp=False, batching=False))
        assert y.shape == (2, 200)
        for i in range(2):
            expected = scipy.signal.lfilter(b[i], a[i], x)
            np.testing.assert_allclose(y[i], expected, atol=1e-6, rtol=1e-5)

    def test_clamp(self):
        x = np.ones((100,)) * 2.0
        y = np.asarray(F.lfilter(jnp.asarray(x), jnp.asarray([1.0, 0.0]), jnp.asarray([1.0, 0.0]), clamp=True))
        assert y.max() <= 1.0

    def test_gradients_vs_finite_difference(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 1, 40)) * 0.1)
        a = jnp.asarray([1.0, -0.7, 0.12])
        b = jnp.asarray([0.4, 0.2, 0.1])

        def loss(x_, a_, b_):
            y = F.lfilter(x_, a_, b_, clamp=False)
            return jnp.sum(y * jnp.arange(y.shape[-1]))  # non-trivial cotangent

        gx, ga, gb = jax.grad(loss, argnums=(0, 1, 2))(x, a, b)
        eps = 1e-5

        def num_grad(f, v):
            v = np.asarray(v, np.float64)
            g = np.zeros_like(v)
            it = np.nditer(v, flags=["multi_index"])
            while not it.finished:
                idx = it.multi_index
                vp, vm = v.copy(), v.copy()
                vp[idx] += eps
                vm[idx] -= eps
                g[idx] = (f(jnp.asarray(vp)) - f(jnp.asarray(vm))) / (2 * eps)
                it.iternext()
            return g

        np.testing.assert_allclose(gx[0, 0], num_grad(lambda v: loss(v[None, None], a, b), x[0, 0]), atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(ga, num_grad(lambda v: loss(x, v, b), a), atol=1e-2, rtol=1e-3)
        np.testing.assert_allclose(gb, num_grad(lambda v: loss(x, a, v), b), atol=1e-2, rtol=1e-3)

    def test_filtfilt_matches_scipy(self):
        x = get_whitenoise(duration=0.05).astype(np.float64) * 0.1
        b, a = scipy.signal.butter(2, 0.2)
        y = np.asarray(F.filtfilt(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), clamp=False))
        # reference filtfilt = forward + backward lfilter with zero initial
        # conditions (filtering.py:672-712), unlike scipy's lfilter_zi ICs
        fwd = scipy.signal.lfilter(b, a, x, axis=-1)
        expected = scipy.signal.lfilter(b, a, fwd[..., ::-1], axis=-1)[..., ::-1]
        np.testing.assert_allclose(y, expected, atol=1e-6, rtol=1e-4)


def _sos_for(name, sr, **kw):
    """Build scipy second-order-section oracle coefficients for RBJ designs."""
    if name == "lowpass":
        w0 = 2 * math.pi * kw["f"] / sr
        alpha = math.sin(w0) / 2 / kw["Q"]
        b = np.array([(1 - math.cos(w0)) / 2, 1 - math.cos(w0), (1 - math.cos(w0)) / 2])
        a = np.array([1 + alpha, -2 * math.cos(w0), 1 - alpha])
    elif name == "highpass":
        w0 = 2 * math.pi * kw["f"] / sr
        alpha = math.sin(w0) / 2 / kw["Q"]
        b = np.array([(1 + math.cos(w0)) / 2, -1 - math.cos(w0), (1 + math.cos(w0)) / 2])
        a = np.array([1 + alpha, -2 * math.cos(w0), 1 - alpha])
    else:
        raise ValueError(name)
    return b, a


class TestBiquads:
    @pytest.mark.parametrize("name,fn", [
        ("lowpass", lambda x: F.lowpass_biquad(x, 16000, 2000.0, 0.707)),
        ("highpass", lambda x: F.highpass_biquad(x, 16000, 2000.0, 0.707)),
    ])
    def test_against_rbj_oracle(self, name, fn):
        x = get_whitenoise(duration=0.1).astype(np.float64) * 0.1
        b, a = _sos_for(name, 16000, f=2000.0, Q=0.707)
        expected = scipy.signal.lfilter(b / a[0], a / a[0], x, axis=-1)
        got = np.asarray(fn(jnp.asarray(x)))
        np.testing.assert_allclose(got, np.clip(expected, -1, 1), atol=1e-6, rtol=1e-4)

    @pytest.mark.parametrize("fn", [
        lambda x: F.allpass_biquad(x, 16000, 1000.0),
        lambda x: F.bandpass_biquad(x, 16000, 1000.0),
        lambda x: F.bandreject_biquad(x, 16000, 1000.0),
        lambda x: F.band_biquad(x, 16000, 1000.0),
        lambda x: F.bass_biquad(x, 16000, 6.0),
        lambda x: F.treble_biquad(x, 16000, 6.0),
        lambda x: F.equalizer_biquad(x, 16000, 1000.0, 3.0),
        lambda x: F.deemph_biquad(x, 44100),
        lambda x: F.riaa_biquad(x, 44100),
    ])
    def test_runs_and_stays_finite(self, fn):
        x = jnp.asarray(get_whitenoise(duration=0.05) * 0.1)
        y = np.asarray(fn(x))
        assert y.shape == x.shape
        assert np.isfinite(y).all()

    def test_allpass_preserves_magnitude_spectrum(self):
        x = get_whitenoise(duration=0.5, seed=7) * 0.1
        y = np.asarray(F.allpass_biquad(jnp.asarray(x), 16000, 1000.0))
        fx = np.abs(np.fft.rfft(x[0][2000:-2000]))
        fy = np.abs(np.fft.rfft(y[0][2000:-2000]))
        # all-pass: magnitudes match to a few percent away from edges
        ratio = fy[10:-10] / np.maximum(fx[10:-10], 1e-6)
        assert np.median(np.abs(ratio - 1)) < 0.05


class TestEffects:
    def test_overdrive_matches_reference_loop(self):
        x = get_whitenoise(duration=0.02, n_channels=2) * 0.5
        got = np.asarray(F.overdrive(jnp.asarray(x), 20.0, 20.0))
        # reference loop oracle (filtering.py:1150-1204 semantics)
        g = math.exp(20.0 * math.log(10) / 20.0)
        colour = 20.0 / 200
        temp = x * g + colour
        temp = np.where(temp < -1, -2 / 3, np.where(temp > 1, 2 / 3, temp - temp**3 / 3))
        out = np.zeros_like(x)
        last_in = np.zeros(x.shape[0])
        last_out = np.zeros(x.shape[0])
        for i in range(x.shape[-1]):
            last_out = temp[:, i] - last_in + 0.995 * last_out
            last_in = temp[:, i]
            out[:, i] = x[:, i] * 0.5 + last_out * 0.75
        np.testing.assert_allclose(got, np.clip(out, -1, 1), atol=1e-5, rtol=1e-4)

    def test_contrast(self):
        x = jnp.asarray(get_whitenoise(duration=0.01) * 0.3)
        y = np.asarray(F.contrast(x, 75.0))
        expected = np.sin(np.asarray(x) * math.pi / 2 + 0.1 * np.sin(np.asarray(x) * math.pi / 2 * 4))
        np.testing.assert_allclose(y, expected, atol=1e-5)

    def test_dcshift(self):
        x = jnp.asarray(get_whitenoise(duration=0.01) * 0.3)
        y = np.asarray(F.dcshift(x, 0.2))
        np.testing.assert_allclose(y, np.clip(np.asarray(x) + 0.2, -1, 1), atol=1e-6)

    def test_gain(self):
        x = jnp.asarray(get_whitenoise(duration=0.01))
        np.testing.assert_allclose(np.asarray(F.gain(x, 6.0)), np.asarray(x) * 10 ** (6 / 20), rtol=1e-6)

    def test_phaser_runs(self):
        x = jnp.asarray(get_whitenoise(duration=0.05) * 0.3)
        y = np.asarray(F.phaser(x, 16000))
        assert y.shape == x.shape
        assert np.isfinite(y).all()

    def test_flanger_runs(self):
        x = jnp.asarray((get_whitenoise(duration=0.05, n_channels=2) * 0.3)[None])
        y = np.asarray(F.flanger(x, 16000))
        assert y.shape == x.shape
        assert np.isfinite(y).all()

    def test_dither_tpdf(self):
        x = jnp.asarray(get_whitenoise(duration=0.01))
        y = np.asarray(F.dither(x))
        assert y.shape == x.shape
        # output is quantized to 2^-15 grid
        q = y * 2**15
        np.testing.assert_allclose(q, np.round(q), atol=1e-4)
