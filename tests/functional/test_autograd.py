"""Autograd property suite: gradients of differentiable functional ops.

Mirror of the reference's gradcheck suite
(/root/reference/test/torchaudio_unittest/functional/autograd_impl.py:19-386,
which runs torch.autograd.gradcheck per op).  The JAX analogue uses
``jax.test_util.check_grads`` (numerical vs autodiff) in float64 on small
shapes, plus finiteness checks on the custom-VJP paths (lfilter, rnnt_loss,
the fused spectrogram) that gradcheck exercised in the reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.test_util import check_grads

import audio_tpu.functional as F
from audio_tpu._internal.windows import hann_window

_SR = 16000


def _wave64(shape=(2, 600), seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float64)


def _check(fn, x, order=1, atol=1e-6, rtol=1e-6, eps=1e-5):
    with jax.enable_x64(True):
        check_grads(fn, (x,), order=order, modes=("rev",), atol=atol, rtol=rtol, eps=eps)


@pytest.mark.parametrize("power", [1.0, 2.0, None])
def test_spectrogram_grad(power):
    with jax.enable_x64(True):
        x = _wave64()
        w = jnp.asarray(np.hanning(129)[:-1], jnp.float64)

        def fn(xx):
            s = F.spectrogram(xx, window=w, n_fft=128, hop_length=64,
                              win_length=128, power=power)
            return jnp.abs(s) if power is None else s

        check_grads(fn, (x,), order=1, modes=("rev",), atol=1e-5, rtol=1e-5)


def test_mel_spectrogram_grad():
    with jax.enable_x64(True):
        x = _wave64()
        w = jnp.asarray(np.hanning(129)[:-1], jnp.float64)
        fb = F.melscale_fbanks(65, 0.0, 8000.0, 16, _SR).astype(jnp.float64)
        fn = lambda xx: F.mel_spectrogram(xx, fb=fb, window=w, n_fft=128, hop_length=64)
        check_grads(fn, (x,), order=1, modes=("rev",), atol=1e-5, rtol=1e-5)


def test_lfilter_grad_inputs_and_coeffs():
    with jax.enable_x64(True):
        x = _wave64((2, 200))
        b = jnp.asarray([0.4, 0.2, 0.9], jnp.float64)
        a = jnp.asarray([1.0, -0.6, 0.2], jnp.float64)
        check_grads(lambda xx: F.lfilter(xx, a, b, clamp=False), (x,),
                    order=1, modes=("rev",), atol=1e-4, rtol=1e-4)
        check_grads(lambda aa, bb: F.lfilter(x, aa, bb, clamp=False), (a, b),
                    order=1, modes=("rev",), atol=1e-4, rtol=1e-4)


def test_biquad_grad():
    with jax.enable_x64(True):
        x = _wave64((1, 200))
        check_grads(lambda xx: F.lowpass_biquad(xx, _SR, 3000.0), (x,),
                    order=1, modes=("rev",), atol=1e-4, rtol=1e-4)


def test_filtfilt_grad():
    with jax.enable_x64(True):
        x = _wave64((1, 150))
        b = jnp.asarray([0.4, 0.2], jnp.float64)
        a = jnp.asarray([1.0, -0.5], jnp.float64)
        check_grads(lambda xx: F.filtfilt(xx, a, b, clamp=False), (x,),
                    order=1, modes=("rev",), atol=1e-4, rtol=1e-4)


def test_resample_grad():
    with jax.enable_x64(True):
        x = _wave64((2, 400))
        check_grads(lambda xx: F.resample(xx, _SR, 8000), (x,),
                    order=1, modes=("rev",), atol=1e-5, rtol=1e-5)


def test_preemphasis_deemphasis_grad():
    with jax.enable_x64(True):
        x = _wave64((2, 200))
        check_grads(lambda xx: F.preemphasis(xx), (x,), order=2, modes=("rev",),
                    atol=1e-6, rtol=1e-6)
        check_grads(lambda xx: F.deemphasis(xx), (x,), order=1, modes=("rev",),
                    atol=1e-4, rtol=1e-4)


def test_compute_deltas_grad():
    with jax.enable_x64(True):
        x = _wave64((2, 3, 60))
        check_grads(F.compute_deltas, (x,), order=2, modes=("rev",), atol=1e-6, rtol=1e-6)


def test_rnnt_loss_grad_matches_numerical():
    with jax.enable_x64(True):
        rng = np.random.default_rng(1)
        B, T, U, V = 2, 4, 3, 4
        logits = jnp.asarray(rng.standard_normal((B, T, U, V)), jnp.float64)
        targets = jnp.asarray(rng.integers(1, V, (B, U - 1)).astype(np.int32))
        lg = jnp.full((B,), T, jnp.int32)
        tg = jnp.full((B,), U - 1, jnp.int32)

        def fn(lo):
            return F.rnnt_loss(lo, targets, lg, tg, reduction="sum")

        check_grads(fn, (logits,), order=1, modes=("rev",), atol=1e-5, rtol=1e-5)


def test_rnnt_loss_clamp_grad_finite():
    rng = np.random.default_rng(2)
    B, T, U, V = 2, 5, 3, 6
    logits = jnp.asarray(rng.standard_normal((B, T, U, V)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, V, (B, U - 1)).astype(np.int32))
    g = jax.grad(
        lambda lo: F.rnnt_loss(
            lo, targets, jnp.full((B,), T, jnp.int32), jnp.full((B,), U - 1, jnp.int32),
            clamp=0.5, reduction="sum",
        )
    )(logits)
    assert bool(jnp.isfinite(g).all())
    # clamp must actually bound the gradient
    assert float(jnp.max(jnp.abs(g))) <= 0.5 + 1e-6


def test_fftconvolve_grad():
    with jax.enable_x64(True):
        x = _wave64((1, 100))
        y = _wave64((1, 16), seed=3)
        check_grads(lambda xx, yy: F.fftconvolve(xx, yy, mode="same"), (x, y),
                    order=1, modes=("rev",), atol=1e-5, rtol=1e-5)


def test_psd_mvdr_grad_finite():
    rng = np.random.default_rng(4)
    C, Fq, T = 3, 8, 12
    spec_r = jnp.asarray(rng.standard_normal((C, Fq, T)).astype(np.float32))
    spec_i = jnp.asarray(rng.standard_normal((C, Fq, T)).astype(np.float32))
    mask = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((Fq, T)).astype(np.float32)))

    def fn(re, im):
        spec = re + 1j * im
        psd_s = F.psd(spec, mask)
        psd_n = F.psd(spec, 1.0 - mask)
        w = F.mvdr_weights_souden(psd_s, psd_n, 0)
        out = F.apply_beamforming(w, spec)
        return jnp.sum(jnp.abs(out) ** 2)

    gr, gi = jax.grad(fn, argnums=(0, 1))(spec_r, spec_i)
    assert bool(jnp.isfinite(gr).all()) and bool(jnp.isfinite(gi).all())


def test_griffinlim_grad_finite():
    rng = np.random.default_rng(5)
    spec = jnp.asarray(np.abs(rng.standard_normal((1, 65, 10))).astype(np.float32))
    w = hann_window(128)
    g = jax.grad(
        lambda s: jnp.sum(
            F.griffinlim(s, window=w, n_fft=128, hop_length=64, win_length=128,
                         power=2.0, n_iter=3, momentum=0.9, length=None,
                         rand_init=False) ** 2
        )
    )(spec)
    assert bool(jnp.isfinite(g).all())
