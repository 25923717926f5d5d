"""jit-consistency for transforms: jitted apply == eager apply.

Transform-layer analogue of the reference's TorchScript-consistency tier
(/root/reference/test/torchaudio_unittest/transforms/torchscript_consistency_impl.py):
each transform must trace under jit with static shapes and match eager.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import audio_tpu.functional as F
import audio_tpu.transforms as T

_SR = 16000


def _wave(b=2, t=4000, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.3)


def _check(transform, *args, atol=1e-6):
    eager = transform(*args)
    jitted = jax.jit(lambda *a: transform(*a))(*args)
    for x, y in zip(jax.tree.leaves(eager), jax.tree.leaves(jitted)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6, atol=atol)


@pytest.mark.parametrize(
    "make",
    [
        lambda: T.Spectrogram(n_fft=400, hop_length=160),
        lambda: T.MelSpectrogram(sample_rate=_SR, n_fft=400, hop_length=160, n_mels=40),
        # MFCC/LFCC outputs are dB-scale (~1e2); jit refuses f32 matmul
        # reassociation parity beyond ~1e-5 absolute
        lambda: T.MFCC(sample_rate=_SR, n_mfcc=13, melkwargs={"n_fft": 400, "hop_length": 160, "n_mels": 40}),
        lambda: T.LFCC(sample_rate=_SR, n_lfcc=13, speckwargs={"n_fft": 400, "hop_length": 160}),
        lambda: T.Resample(_SR, 8000),
        lambda: T.MuLawEncoding(256),
        lambda: T.ComputeDeltas(),
        lambda: T.Fade(400, 400),
        lambda: T.Vol(3.0, gain_type="db"),
        lambda: T.Loudness(_SR),
        lambda: T.Preemphasis(),
        lambda: T.Deemphasis(),
        lambda: T.SpectralCentroid(_SR, n_fft=400, hop_length=160),
        # T.Vad is deliberately absent: its output LENGTH is data-dependent
        # (trim point found by the sox trigger search), which no static-shape
        # jit can express — same in the reference, where Vad returns a
        # variable-length tensor (filtering.py:1669-1702).
    ],
)
def test_waveform_transforms_jit(make):
    _check(make(), _wave(), atol=1e-4)


def test_spectrogram_domain_transforms_jit():
    spec = T.Spectrogram(n_fft=400, hop_length=160)(_wave())
    _check(T.AmplitudeToDB("power", 80.0), spec, atol=1e-4)
    _check(T.MelScale(n_mels=40, sample_rate=_SR, n_stft=201), spec, atol=1e-4)
    _check(T.SlidingWindowCmn(cmn_window=30), jnp.swapaxes(spec, -1, -2), atol=1e-4)
    key = jax.random.PRNGKey(0)
    fm = T.FrequencyMasking(27)
    _check(lambda s: fm(s, key=key), spec)
    tm = T.TimeMasking(40)
    _check(lambda s: tm(s, key=key), spec)


def test_complex_domain_transforms_jit():
    rng = np.random.default_rng(1)
    cspec = jnp.asarray(
        (rng.standard_normal((1, 201, 40)) + 1j * rng.standard_normal((1, 201, 40)))
    ).astype(jnp.complex64)
    ts = T.TimeStretch(hop_length=160, n_freq=201, fixed_rate=1.2)
    _check(lambda s: ts(s), cspec, atol=1e-5)
    _check(T.InverseSpectrogram(n_fft=400, hop_length=160), cspec, atol=1e-5)


def test_rnnt_loss_transform_jit():
    rng = np.random.default_rng(2)
    B, Tt, U, V = 2, 6, 4, 5
    logits = jnp.asarray(rng.standard_normal((B, Tt, U, V)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, V, (B, U - 1)).astype(np.int32))
    lg = jnp.full((B,), Tt, jnp.int32)
    tg = jnp.full((B,), U - 1, jnp.int32)
    loss_t = T.RNNTLoss(reduction="sum")
    _check(lambda lo: loss_t(lo, targets, lg, tg), logits, atol=1e-5)
