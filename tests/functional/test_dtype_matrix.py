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
