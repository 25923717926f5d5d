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


# --- remaining transforms: full 36/36 coverage ---------------------------


def test_mu_law_decoding_jit():
    enc = T.MuLawEncoding(256)(_wave())
    _check(T.MuLawDecoding(256), enc)


def test_griffinlim_jit():
    spec = T.Spectrogram(n_fft=256, hop_length=128, power=2.0)(_wave(1, 2000))
    gl = T.GriffinLim(n_fft=256, hop_length=128, n_iter=4)
    key = jax.random.PRNGKey(3)
    _check(lambda s: gl(s, key=key), spec, atol=1e-4)


@pytest.mark.parametrize("driver", ["gels", "gelsd"])
def test_inverse_mel_scale_jit(driver):
    mel = T.MelSpectrogram(sample_rate=_SR, n_fft=400, hop_length=160, n_mels=40)(_wave(1))
    inv = T.InverseMelScale(n_stft=201, n_mels=40, sample_rate=_SR, driver=driver)
    _check(inv, mel, atol=1e-4)


def test_spec_augment_jit():
    spec = T.Spectrogram(n_fft=400, hop_length=160)(_wave())
    sa = T.SpecAugment(n_time_masks=2, time_mask_param=10,
                       n_freq_masks=2, freq_mask_param=10, p=0.5)
    key = jax.random.PRNGKey(4)
    _check(lambda s: sa(s, key=key), spec)


def test_pitch_shift_jit():
    ps = T.PitchShift(_SR, n_steps=4, n_fft=256)
    _check(ps, _wave(1, 4000), atol=1e-4)


def test_speed_jit():
    sp = T.Speed(_SR, factor=1.1)
    lengths = jnp.asarray([4000, 3000], jnp.int32)
    _check(lambda w: sp(w, lengths), _wave(), atol=1e-5)


def test_speed_perturbation_consistency():
    # SpeedPerturbation's factor CHOICE is host-side randomness (matching the
    # reference's int(torch.randint(...)), _transforms.py:2039-2053) so the
    # transform itself is not traceable — but the selected Speed is.  Check
    # the dispatch picks a speeder whose jitted output matches.
    sp = T.SpeedPerturbation(_SR, factors=[0.9, 1.1, 1.0])
    key = jax.random.PRNGKey(5)
    out, _ = sp(_wave(), key=key)
    jitted = [jax.jit(lambda w, s=s: s(w, None)[0])(_wave()) for s in sp.speeders]
    assert any(
        o.shape == out.shape and np.allclose(np.asarray(o), np.asarray(out), atol=1e-6)
        for o in jitted
    )


def test_add_noise_jit():
    rng = np.random.default_rng(6)
    noise = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32) * 0.1)
    snr = jnp.asarray([5.0, 10.0])
    an = T.AddNoise()
    _check(lambda w: an(w, noise, snr), _wave())


@pytest.mark.parametrize("mode", ["full", "valid", "same"])
def test_convolve_transforms_jit(mode):
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.standard_normal((2, 31)).astype(np.float32))
    _check(lambda w: T.Convolve(mode)(w, y), _wave(2, 500), atol=1e-5)
    _check(lambda w: T.FFTConvolve(mode)(w, y), _wave(2, 500), atol=1e-4)


def _complex_spec(c=4, f=65, t=20, seed=8):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((c, f, t)) + 1j * rng.standard_normal((c, f, t))
    ).astype(jnp.complex64)


def test_psd_mvdr_family_jit():
    spec = _complex_spec()
    rng = np.random.default_rng(9)
    mask = jnp.asarray(rng.uniform(0.1, 0.9, (65, 20)).astype(np.float32))

    psd_t = T.PSD()
    _check(lambda s: psd_t(s, mask), spec, atol=1e-5)

    psd_s = psd_t(spec, mask)
    psd_n = psd_t(spec, 1.0 - mask)

    mvdr = T.MVDR(ref_channel=0, solution="ref_channel")
    _check(lambda s: mvdr(s, mask, 1.0 - mask), spec, atol=1e-4)

    rtf = F.rtf_evd(psd_s)
    _check(lambda s: T.RTFMVDR()(s, rtf, psd_n, 0), spec, atol=1e-4)
    _check(lambda s: T.SoudenMVDR()(s, psd_s, psd_n, 0), spec, atol=1e-4)
