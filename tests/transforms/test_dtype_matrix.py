"""Transform-level reduced-precision rows (bf16 / f16).

Extends the functional dtype matrix (tests/functional/test_dtype_matrix.py)
to the transform classes the serving path actually instantiates — mirrors
the reference's device x dtype mixin matrix at the transforms tier
(/root/reference/test/torchaudio_unittest/transforms/transforms_test.py).
Contract per transform: runs under a half-precision input, output dtype
follows the input (cast-compute ops cast back), values finite and within a
dtype-scaled tolerance of the f32 result.  Transforms whose precompute
buffers (mel banks, DCT, windows) are f32 by construction get the input
cast INSIDE forward — that promotion path is part of what is under test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import audio_tpu.transforms as T

_SR = 16000
_TOL = {jnp.bfloat16: 4e-2, jnp.float16: 5e-3}


def _wave(shape=(2, 2000), seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32) * 0.3


def _check(make, dtype, tol_mult=1.0, shape=(2, 2000), follow_dtype=True):
    tr = make()
    x32 = _wave(shape)
    lo = tr(jnp.asarray(x32, dtype))
    hi = tr(jnp.asarray(x32, jnp.float32))
    lo_np, hi_np = np.asarray(lo, np.float32), np.asarray(hi, np.float32)
    if follow_dtype:
        assert lo.dtype == dtype, (lo.dtype, dtype)
    assert np.isfinite(lo_np).all()
    scale = np.abs(hi_np).max() + 1e-6
    np.testing.assert_allclose(lo_np / scale, hi_np / scale,
                               atol=_TOL[dtype] * tol_mult)


# (name, transform factory, tol_mult, input shape).  Tolerance rationale
# follows the functional matrix: 1x for elementwise/matmul chains, higher
# where recurrences or long reductions accumulate rounding.
_CASES = [
    ("Spectrogram", lambda: T.Spectrogram(n_fft=256, hop_length=128), 1.0, (2, 2000)),
    ("MelSpectrogram", lambda: T.MelSpectrogram(
        sample_rate=_SR, n_fft=256, hop_length=128, n_mels=23), 1.0, (2, 2000)),
    ("MFCC", lambda: T.MFCC(sample_rate=_SR, n_mfcc=13, melkwargs={
        "n_fft": 256, "hop_length": 128, "n_mels": 23}), 2.0, (2, 2000)),
    ("LFCC", lambda: T.LFCC(sample_rate=_SR, n_lfcc=13, speckwargs={
        "n_fft": 256, "hop_length": 128}), 2.0, (2, 2000)),
    ("Resample", lambda: T.Resample(_SR, 8000), 1.0, (2, 2000)),
    ("MelScale", lambda: T.MelScale(n_mels=23, sample_rate=_SR, n_stft=129),
     1.0, (2, 129, 10)),
    ("AmplitudeToDB", lambda: T.AmplitudeToDB("power", 80.0), 1.0, (2, 200)),
    ("ComputeDeltas", lambda: T.ComputeDeltas(), 1.0, (2, 40, 50)),
    ("Fade", lambda: T.Fade(fade_in_len=200, fade_out_len=200), 1.0, (2, 2000)),
    ("Vol", lambda: T.Vol(2.0), 1.0, (2, 2000)),
    ("Preemphasis", lambda: T.Preemphasis(), 1.0, (2, 2000)),
    # ~2000-step first-order recurrence, pole 0.97 (see functional matrix)
    ("Deemphasis", lambda: T.Deemphasis(), 8.0, (2, 2000)),
    ("SlidingWindowCmn", lambda: T.SlidingWindowCmn(cmn_window=20), 2.0, (2, 50, 40)),
    ("SpectralCentroid", lambda: T.SpectralCentroid(
        _SR, n_fft=256, hop_length=128), 8.0, (2, 2000)),
    ("Speed", lambda: _first(T.Speed(_SR, 1.1)), 2.0, (2, 2000)),
    ("SpeedPerturbation", lambda: _first(T.SpeedPerturbation(_SR, [0.9])), 2.0, (2, 2000)),
    ("Loudness", lambda: T.Loudness(_SR), 1.0, (2, 8000)),
]


def _first(tr):
    return lambda x: tr(x)[0]


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
@pytest.mark.parametrize("name,make,tol_mult,shape", _CASES, ids=[c[0] for c in _CASES])
def test_transform_reduced_dtype(name, make, tol_mult, shape, dtype):
    _check(make, dtype, tol_mult=tol_mult, shape=shape)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_masking_reduced_dtype(dtype):
    """Masking zeroes spans; surviving values must be bit-exact."""
    x32 = _wave((2, 40, 50), seed=1)
    for tr in (T.FrequencyMasking(10), T.TimeMasking(10)):
        key = jax.random.PRNGKey(3)
        lo = tr(jnp.asarray(x32, dtype), key=key)
        hi = tr(jnp.asarray(x32, jnp.float32), key=key)
        assert lo.dtype == dtype
        np.testing.assert_array_equal(
            np.asarray(lo, np.float32) == 0.0, np.asarray(hi) == 0.0
        )


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_mulaw_roundtrip_reduced_dtype(dtype):
    x = jnp.asarray(_wave(), dtype)
    enc = T.MuLawEncoding(256)(x)
    dec = T.MuLawDecoding(256)(enc)
    assert np.isfinite(np.asarray(dec, np.float32)).all()


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_two_input_transforms_reduced_dtype(dtype):
    """AddNoise / Convolve / FFTConvolve take a second operand."""
    w = _wave()
    n = _wave(seed=5)
    k = _wave((2, 31), seed=6)
    for name, fn, tol in (
        ("AddNoise", lambda d: T.AddNoise()(jnp.asarray(w, d), jnp.asarray(n, d),
                                            jnp.asarray([5.0, 10.0], d)), 1.0),
        ("Convolve", lambda d: T.Convolve("same")(jnp.asarray(w, d), jnp.asarray(k, d)), 1.0),
        ("FFTConvolve", lambda d: T.FFTConvolve("same")(jnp.asarray(w, d), jnp.asarray(k, d)), 1.0),
    ):
        lo, hi = fn(dtype), fn(jnp.float32)
        assert lo.dtype == dtype, (name, lo.dtype)
        lo_np, hi_np = np.asarray(lo, np.float32), np.asarray(hi, np.float32)
        assert np.isfinite(lo_np).all(), name
        scale = np.abs(hi_np).max() + 1e-6
        np.testing.assert_allclose(lo_np / scale, hi_np / scale,
                                   atol=_TOL[dtype] * tol, err_msg=name)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_vad_transform_reduced_dtype(dtype):
    """Vad trims at a threshold decision: onset within 10 ms of f32."""
    t = np.concatenate([
        np.zeros(4000, np.float32),
        (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / _SR)).astype(np.float32),
    ])
    tr = T.Vad(_SR)
    lo = np.asarray(tr(jnp.asarray(t, dtype)), np.float32)
    hi = np.asarray(tr(jnp.asarray(t, jnp.float32)))
    onset = lambda x: int(np.argmax(np.abs(x) > 0.05)) if (np.abs(x) > 0.05).any() else -1  # noqa: E731
    assert abs(onset(lo) - onset(hi)) <= _SR // 100


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_specaugment_reduced_dtype(dtype):
    """SpecAugment zeroes spans; surviving values must be bit-exact."""
    x32 = _wave((2, 40, 50), seed=2)
    tr = T.SpecAugment(n_time_masks=2, time_mask_param=10, n_freq_masks=2,
                       freq_mask_param=10)
    key = jax.random.PRNGKey(5)
    lo = tr(jnp.asarray(x32, dtype), key=key)
    hi = tr(jnp.asarray(x32, jnp.float32), key=key)
    assert lo.dtype == dtype
    np.testing.assert_array_equal(np.asarray(lo, np.float32) == 0.0,
                                  np.asarray(hi) == 0.0)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_pitchshift_griffinlim_invmelscale_reduced_dtype(dtype):
    """Iterative / phase-retrieval transforms: scaled or task-level bounds
    (see the functional matrix's griffinlim/pitch_shift rationale)."""
    w = _wave()
    lo = T.PitchShift(_SR, 2, n_fft=256)(jnp.asarray(w, dtype))
    hi = T.PitchShift(_SR, 2, n_fft=256)(jnp.asarray(w, jnp.float32))
    assert lo.dtype == dtype
    scale = np.abs(np.asarray(hi)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(lo, np.float32) / scale,
                               np.asarray(hi) / scale, atol=_TOL[dtype] * 2)

    spec = T.Spectrogram(n_fft=256, hop_length=128, power=1.0)
    mag32 = spec(jnp.asarray(w))
    gl = T.GriffinLim(n_fft=256, hop_length=128, n_iter=8, momentum=0.0,
                      length=2000, rand_init=False)
    lo_wav = gl(mag32.astype(dtype))
    assert lo_wav.dtype == dtype
    assert np.isfinite(np.asarray(lo_wav, np.float32)).all()

    mel = T.MelSpectrogram(sample_rate=_SR, n_fft=256, hop_length=128, n_mels=23)(jnp.asarray(w))
    inv = T.InverseMelScale(n_stft=129, n_mels=23, sample_rate=_SR)
    lo_m = inv(mel.astype(dtype))
    hi_m = inv(mel)
    assert np.isfinite(np.asarray(lo_m, np.float32)).all()
    scale = np.abs(np.asarray(hi_m)).max() + 1e-6
    # least-squares unmixing of a half-quantized mel spectrogram: 4x
    np.testing.assert_allclose(np.asarray(lo_m, np.float32) / scale,
                               np.asarray(hi_m) / scale, atol=_TOL[dtype] * 4)


# Complex-domain transforms: no half-precision complex dtype exists, so the
# reduced row runs on complex64 derived from a half-quantized waveform (the
# same contract as the functional matrix's beamforming section).
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_complex_transforms_reduced_dtype(dtype):
    rng = np.random.default_rng(11)
    w = rng.standard_normal((4, 4000)).astype(np.float32) * 0.3
    wq = np.asarray(jnp.asarray(w, dtype), np.float32)
    spec = T.Spectrogram(n_fft=256, hop_length=128, power=None)

    def chain(x):
        sp = spec(jnp.asarray(x))  # (4, F, T) complex64
        mask = jnp.asarray(np.clip(rng.random(sp.shape[-2:]), 0.05, 0.95))
        psd_tr = T.PSD()
        psd_s, psd_n = psd_tr(sp, mask), psd_tr(sp, 1.0 - mask)
        souden = T.SoudenMVDR()(sp, psd_s, psd_n, 0)
        mvdr = T.MVDR(ref_channel=0, solution="stv_evd")(sp, mask, 1.0 - mask)
        import audio_tpu.functional as FF
        rtf = FF.rtf_evd(psd_s)
        rtfmvdr = T.RTFMVDR()(sp, rtf, psd_n, 0)
        stretch = T.TimeStretch(hop_length=128, n_freq=129, fixed_rate=1.1)(sp)
        return psd_s, souden, mvdr, rtfmvdr, stretch

    rng = np.random.default_rng(11)  # reset so both chains draw the same mask
    lo = chain(wq)
    rng = np.random.default_rng(11)
    hi = chain(w)
    for name, a, b in zip(("PSD", "SoudenMVDR", "MVDR", "RTFMVDR", "TimeStretch"), lo, hi):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(np.abs(a) / scale, np.abs(b) / scale,
                                   atol=_TOL[dtype] * 8, err_msg=name)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_inverse_spectrogram_transform_reduced_dtype(dtype):
    w = _wave()
    spec = T.Spectrogram(n_fft=256, hop_length=128, power=None)
    inv = T.InverseSpectrogram(n_fft=256, hop_length=128)
    wq = np.asarray(jnp.asarray(w, dtype), np.float32)
    lo = inv(spec(jnp.asarray(wq)), length=2000)
    hi = inv(spec(jnp.asarray(w)), length=2000)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(hi), atol=_TOL[dtype])


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_rnnt_loss_transform_reduced_dtype(dtype):
    rng = np.random.default_rng(8)
    logits32 = jnp.asarray(rng.standard_normal((2, 6, 4, 5)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, 5, (2, 3)), jnp.int32)
    lg = jnp.full((2,), 6, jnp.int32)
    tg = jnp.full((2,), 3, jnp.int32)
    tr = T.RNNTLoss(reduction="none")
    lo = tr(logits32.astype(dtype), tgt, lg, tg)
    hi = tr(logits32, tgt, lg, tg)
    np.testing.assert_allclose(np.asarray(lo, np.float32), np.asarray(hi),
                               rtol=_TOL[dtype])
