"""Autograd breadth: per-op gradient checks matching the reference suite.

Covers the ops of
/root/reference/test/torchaudio_unittest/functional/autograd_impl.py:19-386
not already exercised by test_autograd.py: the ten sox biquad designs (also
w.r.t. their design parameters), flanger/gain/overdrive/phaser, the
beamforming family (complex-valued), convolve/add_noise/speed and
frechet_distance.  ``jax.test_util.check_grads`` compares reverse-mode
autodiff against numerical differentiation in float64.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

import audio_tpu.functional as F

_SR = 8000


def _wave64(shape=(2, 300), seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float64)


def _check(fn, args, atol=1e-5, rtol=1e-5, eps=1e-6):
    with jax.enable_x64(True):
        check_grads(fn, args, order=1, modes=("rev",), atol=atol, rtol=rtol, eps=eps)


# --- biquad designs: grads w.r.t. waveform AND design parameter -----------

_BIQUAD_CASES = [
    ("allpass", lambda w, p: F.allpass_biquad(w, _SR, p), 800.0),
    ("band", lambda w, p: F.band_biquad(w, _SR, p), 800.0),
    ("bandpass", lambda w, p: F.bandpass_biquad(w, _SR, p), 800.0),
    ("bandreject", lambda w, p: F.bandreject_biquad(w, _SR, p), 800.0),
    ("bass", lambda w, p: F.bass_biquad(w, _SR, p), 6.0),
    ("treble", lambda w, p: F.treble_biquad(w, _SR, p), 6.0),
    ("equalizer", lambda w, p: F.equalizer_biquad(w, _SR, 800.0, p), 3.0),
    ("highpass", lambda w, p: F.highpass_biquad(w, _SR, p), 300.0),
    ("lowpass", lambda w, p: F.lowpass_biquad(w, _SR, p), 1500.0),
]


@pytest.mark.parametrize("name,fn,param", _BIQUAD_CASES, ids=[c[0] for c in _BIQUAD_CASES])
def test_biquad_design_grads(name, fn, param):
    with jax.enable_x64(True):
        x = _wave64()
        p = jnp.asarray(param, jnp.float64)
        _check(lambda w: fn(w, p), (x,))
        _check(lambda q: jnp.sum(fn(x, q) ** 2), (p,), atol=1e-4, rtol=1e-4)


def test_deemph_riaa_grads():
    x = _wave64()
    _check(lambda w: F.deemph_biquad(w, 44100), (x,))
    _check(lambda w: F.riaa_biquad(w, 44100), (x,))


def test_lfilter_filterbank_grads():
    # (n_filters, order+1) coefficient banks applied to shared input, as the
    # reference's test_lfilter_filterbanks (autograd_impl.py:64-69)
    with jax.enable_x64(True):
        x = _wave64((1, 200))
        rng = np.random.default_rng(1)
        a = jnp.asarray(np.concatenate([np.ones((3, 1)), rng.uniform(-0.2, 0.2, (3, 2))], 1))
        b = jnp.asarray(rng.standard_normal((3, 3)) * 0.3)
        _check(lambda xx, aa, bb: F.lfilter(xx, aa, bb, clamp=False, batching=False),
               (x, a, b), atol=1e-4, rtol=1e-4)


# --- sox effects ----------------------------------------------------------

def test_gain_grad():
    _check(lambda w: F.gain(w, 2.5), (_wave64(),))


def test_overdrive_grad():
    _check(lambda w: F.overdrive(w, 20.0, 20.0), (_wave64(),), atol=1e-4, rtol=1e-4)


def test_flanger_grad():
    x = _wave64((1, 2, 400), seed=2)
    _check(lambda w: F.flanger(w, _SR), (x,), atol=1e-4, rtol=1e-4)


def test_phaser_grad():
    x = _wave64((1, 400), seed=3)
    _check(lambda w: F.phaser(x, _SR) if w is None else F.phaser(w, _SR), (x,),
           atol=1e-4, rtol=1e-4)


# --- beamforming (complex) -------------------------------------------------

def _cspec64(c=3, f=5, t=20, seed=4):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((c, f, t)) + 1j * rng.standard_normal((c, f, t)),
        jnp.complex128,
    )


def test_psd_grad():
    with jax.enable_x64(True):
        s = jnp.swapaxes(_cspec64(), 0, 1)  # (..., channel, freq, time) -> keep (c,f,t)
        s = _cspec64()
        mask = jnp.asarray(np.random.default_rng(5).uniform(0.2, 0.8, (5, 20)))
        _check(lambda x: F.psd(x), (s,), atol=1e-4, rtol=1e-4)
        _check(lambda x: F.psd(x, mask), (s,), atol=1e-4, rtol=1e-4)


def test_mvdr_weights_souden_grad():
    with jax.enable_x64(True):
        s = _cspec64()
        psd_s, psd_n = F.psd(s), F.psd(s * 0.5 + 0.1)
        _check(lambda p: F.mvdr_weights_souden(p, psd_n, 0), (psd_s,), atol=1e-3, rtol=1e-3)


def test_mvdr_weights_rtf_grad():
    with jax.enable_x64(True):
        s = _cspec64()
        rtf = F.rtf_evd(F.psd(s))
        psd_n = F.psd(s * 0.5 + 0.1)
        _check(lambda r: F.mvdr_weights_rtf(r, psd_n, 0), (rtf,), atol=1e-3, rtol=1e-3)


def test_rtf_power_grad():
    with jax.enable_x64(True):
        s = _cspec64()
        psd_s, psd_n = F.psd(s), F.psd(s * 0.5 + 0.1)
        _check(lambda p: F.rtf_power(p, psd_n, 0, 2), (psd_s,), atol=1e-3, rtol=1e-3)


def test_apply_beamforming_grad():
    with jax.enable_x64(True):
        s = _cspec64()
        w = F.mvdr_weights_souden(F.psd(s), F.psd(s * 0.5 + 0.1), 0)
        _check(lambda x: F.apply_beamforming(w, x), (s,), atol=1e-4, rtol=1e-4)


# --- misc -------------------------------------------------------------------

def test_convolve_grads():
    x = _wave64((2, 100), seed=6)
    y = _wave64((2, 11), seed=7)
    for mode in ("full", "valid", "same"):
        _check(lambda a, b: F.convolve(a, b, mode), (x, y))


def test_add_noise_grad():
    x = _wave64(seed=8)
    n = _wave64(seed=9)
    snr = jnp.asarray([5.0, 10.0], jnp.float64)
    _check(lambda a, b, s: F.add_noise(a, b, s), (x, n, snr), atol=1e-4, rtol=1e-4)


def test_speed_grad():
    x = _wave64((1, 400), seed=10)
    _check(lambda w: F.speed(w, 1000, 1.1)[0], (x,), atol=1e-4, rtol=1e-4)


def test_frechet_distance_grad():
    with jax.enable_x64(True):
        rng = np.random.default_rng(11)
        a = rng.standard_normal((4, 4))
        sx = jnp.asarray(a @ a.T + 4 * np.eye(4))
        b = rng.standard_normal((4, 4))
        sy = jnp.asarray(b @ b.T + 4 * np.eye(4))
        mu_x = jnp.asarray(rng.standard_normal(4))
        mu_y = jnp.asarray(rng.standard_normal(4))
        _check(lambda m: F.frechet_distance(m, sx, mu_y, sy), (mu_x,), atol=1e-3, rtol=1e-3)
