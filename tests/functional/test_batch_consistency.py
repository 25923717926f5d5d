"""Batch consistency: op(batch) == stack(op(item) for item in batch).

Mirror of the reference's dedicated property suite
(/root/reference/test/torchaudio_unittest/functional/batch_consistency_test.py):
every batched functional op must equal the per-sample op stacked.  On the
JAX side this guards the leading-batch-dim contract of every op (CLAUDE.md
convention) and the vmap-ability of the implementations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import audio_tpu.functional as F
from audio_tpu._internal.windows import hann_window

_SR = 16000


def _wave(b=3, t=4000, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * scale)


def _check(op, batched, *per_sample_args, atol=1e-5, rtol=1e-5):
    full = op(batched, *per_sample_args)
    single = jnp.stack([op(batched[i], *per_sample_args) for i in range(batched.shape[0])])
    np.testing.assert_allclose(np.asarray(full), np.asarray(single), rtol=rtol, atol=atol)


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("spectrogram", dict(n_fft=400, hop_length=160, win_length=400, power=2.0)),
        ("spectrogram_complex", dict(n_fft=256, hop_length=128, win_length=256, power=None)),
    ],
)
def test_spectrogram_batch(name, kwargs):
    x = _wave()
    w = hann_window(kwargs["win_length"])
    _check(lambda xx: F.spectrogram(xx, window=w, **kwargs), x)


def test_mel_spectrogram_batch():
    x = _wave()
    fb = F.melscale_fbanks(201, 0.0, 8000.0, 40, _SR)
    _check(lambda xx: F.mel_spectrogram(xx, fb=fb, window=hann_window(400)), x)


def test_lfilter_batch():
    x = _wave()
    b = jnp.asarray([0.4, 0.2, 0.9], jnp.float32)
    a = jnp.asarray([1.0, -0.6, 0.2], jnp.float32)
    _check(lambda xx: F.lfilter(xx, a, b), x)


@pytest.mark.parametrize(
    "op",
    [
        lambda xx: F.lowpass_biquad(xx, _SR, 3000.0),
        lambda xx: F.highpass_biquad(xx, _SR, 200.0),
        lambda xx: F.bandpass_biquad(xx, _SR, 1000.0),
        lambda xx: F.equalizer_biquad(xx, _SR, 1000.0, 3.0),
        lambda xx: F.treble_biquad(xx, _SR, 3.0),
        lambda xx: F.bass_biquad(xx, _SR, 3.0),
        lambda xx: F.allpass_biquad(xx, _SR, 1000.0),
        lambda xx: F.bandreject_biquad(xx, _SR, 1000.0),
        lambda xx: F.band_biquad(xx, _SR, 1000.0),
        lambda xx: F.riaa_biquad(xx, 44100),
        lambda xx: F.deemph_biquad(xx, 44100),
    ],
)
def test_biquads_batch(op):
    # The blocked-MXU IIR accumulates f32 rounding in a shape-dependent order;
    # recursive filters amplify it along time (near-unit-circle poles like the
    # bass shelf reach ~3e-4 over 4000 samples on a ±1 signal), so the
    # tolerance is absolute and looser than for the elementwise ops.
    _check(op, _wave(), atol=1e-3, rtol=0)


def test_filtfilt_batch():
    x = _wave()
    b = jnp.asarray([0.4, 0.2], jnp.float32)
    a = jnp.asarray([1.0, -0.6], jnp.float32)
    _check(lambda xx: F.filtfilt(xx, a, b), x)


@pytest.mark.parametrize(
    "op,atol",
    [
        (lambda xx: F.overdrive(xx), 1e-5),
        (lambda xx: F.contrast(xx, 50.0), 1e-5),
        (lambda xx: F.dcshift(xx, 0.1), 1e-5),
        (lambda xx: F.gain(xx, 3.0), 1e-5),
        (lambda xx: F.preemphasis(xx), 1e-5),
        (lambda xx: F.deemphasis(xx), 1e-5),
        (lambda xx: F.mu_law_encoding(xx, 256), 0),
        (lambda xx: F.compute_deltas(xx), 1e-5),
        (lambda xx: F.resample(xx, _SR, 8000), 1e-5),
        (lambda xx: F.loudness(xx[None] if xx.ndim == 1 else xx, _SR), 1e-4),
    ],
)
def test_elementwise_ops_batch(op, atol):
    _check(op, _wave(), atol=atol)


def test_phaser_flanger_batch():
    x = _wave()
    _check(lambda xx: F.phaser(xx, _SR), x)
    # flanger requires (..., channel, time)
    x3 = _wave().reshape(3, 1, 4000)
    full = F.flanger(x3, _SR)
    single = jnp.stack([F.flanger(x3[i], _SR) for i in range(3)])
    np.testing.assert_allclose(np.asarray(full), np.asarray(single), rtol=1e-5, atol=1e-5)


def test_sliding_window_cmn_batch():
    rng = np.random.default_rng(8)
    spec = jnp.asarray(rng.standard_normal((3, 50, 40)).astype(np.float32))
    _check(lambda s: F.sliding_window_cmn(s, 30, 10), spec, atol=1e-4)


def test_vad_batch():
    x = _wave(t=8000)
    _check(lambda xx: F.vad(xx, _SR), x, atol=1e-5)


def test_spectral_centroid_batch():
    x = _wave()
    w = hann_window(400)
    _check(lambda xx: F.spectral_centroid(xx, _SR, 0, w, 400, 160, 400), x, atol=1e-2)


def test_pitch_ops_batch():
    x = _wave(t=8000)
    _check(lambda xx: F.detect_pitch_frequency(xx, _SR), x, atol=1e-4)


def test_phase_vocoder_batch():
    rng = np.random.default_rng(1)
    spec = jnp.asarray(
        rng.standard_normal((3, 201, 40)) + 1j * rng.standard_normal((3, 201, 40))
    ).astype(jnp.complex64)
    ph = jnp.linspace(0, np.pi * 200, 201)[:, None].astype(jnp.float32) * 0
    full = F.phase_vocoder(spec, 1.3, ph)
    single = jnp.stack([F.phase_vocoder(spec[i], 1.3, ph) for i in range(3)])
    np.testing.assert_allclose(np.asarray(full), np.asarray(single), rtol=1e-4, atol=1e-4)


def test_convolve_batch():
    x = _wave()
    y = _wave(seed=5, t=64)
    for mode in ("full", "same", "valid"):
        full = F.convolve(x, y, mode=mode)
        single = jnp.stack([F.convolve(x[i], y[i], mode=mode) for i in range(3)])
        np.testing.assert_allclose(np.asarray(full), np.asarray(single), rtol=1e-5, atol=1e-5)
        ffull = F.fftconvolve(x, y, mode=mode)
        fsingle = jnp.stack([F.fftconvolve(x[i], y[i], mode=mode) for i in range(3)])
        np.testing.assert_allclose(np.asarray(ffull), np.asarray(fsingle), rtol=1e-4, atol=1e-4)


def test_add_noise_speed_batch():
    x = _wave()
    noise = _wave(seed=7)
    snr = jnp.asarray([5.0, 10.0, 20.0], jnp.float32)
    full = F.add_noise(x, noise, snr)
    single = jnp.stack([F.add_noise(x[i], noise[i], snr[i]) for i in range(3)])
    np.testing.assert_allclose(np.asarray(full), np.asarray(single), rtol=1e-5, atol=1e-5)

    lengths = jnp.asarray([4000, 3000, 2000], jnp.int32)
    full, flens = F.speed(x, _SR, 1.1, lengths=lengths)
    for i in range(3):
        s, sl = F.speed(x[i], _SR, 1.1, lengths=lengths[i])
        np.testing.assert_allclose(np.asarray(full[i]), np.asarray(s), rtol=1e-5, atol=1e-5)
        assert int(flens[i]) == int(sl)


def test_rnnt_loss_batch():
    rng = np.random.default_rng(3)
    B, T, U, V = 4, 6, 4, 5
    logits = jnp.asarray(rng.standard_normal((B, T, U, V)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, V, (B, U - 1)).astype(np.int32))
    logit_lengths = jnp.full((B,), T, jnp.int32)
    target_lengths = jnp.full((B,), U - 1, jnp.int32)
    full = F.rnnt_loss(logits, targets, logit_lengths, target_lengths, reduction="none")
    single = jnp.concatenate([
        F.rnnt_loss(
            logits[i:i + 1], targets[i:i + 1], logit_lengths[i:i + 1],
            target_lengths[i:i + 1], reduction="none",
        )
        for i in range(B)
    ])
    np.testing.assert_allclose(np.asarray(full), np.asarray(single), rtol=1e-5, atol=1e-5)


def test_forced_align_batch():
    rng = np.random.default_rng(4)
    B, T, V, L = 4, 20, 6, 5
    emissions = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32)), axis=-1
    )
    targets = jnp.asarray(rng.integers(1, V, (B, L)).astype(np.int32))
    paths, scores = F.forced_align(emissions, targets)
    for i in range(B):
        p, s = F.forced_align(emissions[i:i + 1], targets[i:i + 1])
        np.testing.assert_array_equal(np.asarray(paths[i]), np.asarray(p[0]))
        np.testing.assert_allclose(np.asarray(scores[i]), np.asarray(s[0]), rtol=1e-5, atol=1e-5)


def test_multichannel_batch():
    rng = np.random.default_rng(5)
    B, C, Fq, T = 3, 4, 16, 20
    specs = jnp.asarray(
        (rng.standard_normal((B, C, Fq, T)) + 1j * rng.standard_normal((B, C, Fq, T)))
    ).astype(jnp.complex64)
    mask = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((B, Fq, T)).astype(np.float32)))
    psd_full = F.psd(specs, mask)
    psd_single = jnp.stack([F.psd(specs[i], mask[i]) for i in range(B)])
    np.testing.assert_allclose(np.asarray(psd_full), np.asarray(psd_single), rtol=1e-4, atol=1e-4)

    psd_s = F.psd(specs, mask)
    psd_n = F.psd(specs, 1.0 - mask)
    w_full = F.mvdr_weights_souden(psd_s, psd_n, 0)
    w_single = jnp.stack([F.mvdr_weights_souden(psd_s[i], psd_n[i], 0) for i in range(B)])
    np.testing.assert_allclose(np.asarray(w_full), np.asarray(w_single), rtol=1e-3, atol=1e-3)


def test_masking_iid_matches_per_sample_distribution():
    # mask_along_axis_iid draws per-sample masks; check shape/zeroing contract
    rng = np.random.default_rng(6)
    spec = jnp.asarray(rng.standard_normal((4, 1, 40, 50)).astype(np.float32))
    out = F.mask_along_axis_iid(spec, 10, 0.0, 2, key=jax.random.PRNGKey(0))
    assert out.shape == spec.shape
    # each sample has an independent zeroed band
    zeros = (np.asarray(out) == 0.0).reshape(4, -1).sum(axis=1)
    assert (zeros > 0).all()
