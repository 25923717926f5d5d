"""jit-consistency sweep over the functional layer: jit(op) == eager op.

Functional-layer analogue of the reference's TorchScript-consistency tier
(/root/reference/test/torchaudio_unittest/functional/torchscript_consistency_impl.py,
which scripts every functional and compares against eager).  Every public
op that operates on arrays must trace under jit with static shapes and
reproduce its eager output.

Host-side ops are excluded by nature, mirroring the reference's
non-scripted surface: ``edit_distance`` (python ints), ``merge_tokens``
(builds a python list of TokenSpan), ``vad`` (data-dependent output length,
filtering.py:1669-1702 in the reference).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import audio_tpu.functional as F
from audio_tpu._internal.windows import hann_window

_SR = 16000


def _wave(shape=(2, 2000), seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


def _spec(b=2, f=65, t=20, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.abs(rng.standard_normal((b, f, t))).astype(np.float32))


def _cspec(c=4, f=65, t=20, seed=2):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((c, f, t)) + 1j * rng.standard_normal((c, f, t))
    ).astype(jnp.complex64)


def _assert_jit_eq(fn, *args, atol=1e-6, rtol=1e-6):
    eager = fn(*args)
    jitted = jax.jit(fn)(*args)
    e, j = jax.tree.leaves(eager), jax.tree.leaves(jitted)
    assert len(e) == len(j)
    for x, y in zip(e, j):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


_W = _wave()
_KEY = jax.random.PRNGKey(0)
_WIN = hann_window(256)

# (id, fn, args, atol) — each fn must be a jit-traceable closure
_CASES = [
    # spectral
    ("spectrogram", lambda w: F.spectrogram(
        w, window=_WIN, n_fft=256, hop_length=128, win_length=256, power=2.0), (_W,), 1e-5),
    ("spectrogram_complex", lambda w: F.spectrogram(
        w, window=_WIN, n_fft=256, hop_length=128, win_length=256, power=None), (_W,), 1e-5),
    ("inverse_spectrogram", lambda s: F.inverse_spectrogram(
        s, length=2000, window=_WIN, n_fft=256, hop_length=128, win_length=256),
        (F.spectrogram(_W, window=_WIN, n_fft=256, hop_length=128, win_length=256,
                       power=None),), 1e-5),
    ("stft", lambda w: F.stft(w, n_fft=256, hop_length=128, window=_WIN), (_W,), 1e-5),
    ("istft", lambda s: F.istft(s, n_fft=256, hop_length=128, window=_WIN, length=2000),
        (F.stft(_W, n_fft=256, hop_length=128, window=_WIN),), 1e-5),
    ("mel_spectrogram", lambda w: F.mel_spectrogram(
        w, fb=F.melscale_fbanks(129, 0.0, 8000.0, 23, _SR), window=_WIN,
        n_fft=256, hop_length=128), (_W,), 1e-5),
    ("griffinlim", lambda s: F.griffinlim(
        s, window=_WIN, n_fft=256, hop_length=128, win_length=256, power=2.0,
        n_iter=3, momentum=0.9, length=None, rand_init=False), (_spec(2, 129, 16),), 1e-4),
    ("phase_vocoder", lambda s: F.phase_vocoder(
        s, 1.3, jnp.linspace(0, np.pi * 128, 65)[:, None]), (_cspec(2,),), 1e-5),
    ("amplitude_to_DB", lambda s: F.amplitude_to_DB(s, 10.0, 1e-10, 0.0, 80.0),
        (_spec(),), 1e-5),
    ("DB_to_amplitude", lambda s: F.DB_to_amplitude(s, 1.0, 0.5), (_spec(),), 1e-5),
    ("spectral_centroid", lambda w: F.spectral_centroid(
        w, _SR, 0, _WIN, 256, 128, 256), (_W,), 1e-3),
    ("loudness", lambda w: F.loudness(w, _SR), (_wave((2, 8000)),), 1e-5),
    ("detect_pitch_frequency", lambda w: F.detect_pitch_frequency(w, _SR),
        (_wave((1, 4000)),), 1e-4),
    ("compute_deltas", lambda s: F.compute_deltas(s), (_spec(),), 1e-6),
    ("sliding_window_cmn", lambda s: F.sliding_window_cmn(s, cmn_window=10),
        (jnp.swapaxes(_spec(), -1, -2),), 1e-5),
    ("create_dct", lambda s: s @ F.create_dct(13, 65, "ortho"), (_spec(2, 20, 65),), 1e-5),
    # masking / augmentation (explicit key)
    ("mask_along_axis", lambda s: F.mask_along_axis(s, 10, 0.0, 2, key=_KEY),
        (_spec(),), 0),
    ("mask_along_axis_iid", lambda s: F.mask_along_axis_iid(
        s[None], 10, 0.0, 3, key=_KEY), (_spec(),), 0),
    # mu-law
    ("mu_law_encoding", lambda w: F.mu_law_encoding(w, 256), (_W,), 0),
    ("mu_law_decoding", lambda w: F.mu_law_decoding(F.mu_law_encoding(w, 256), 256),
        (_W,), 1e-6),
    # resample / speed / pitch
    ("resample", lambda w: F.resample(w, _SR, 8000), (_W,), 1e-5),
    ("speed", lambda w: F.speed(w, _SR, 1.1, lengths=jnp.asarray([2000, 1500]))[0],
        (_W,), 1e-5),
    ("pitch_shift", lambda w: F.pitch_shift(w, _SR, 2, n_fft=256), (_W,), 1e-4),
    ("preemphasis", lambda w: F.preemphasis(w), (_W,), 1e-6),
    ("deemphasis", lambda w: F.deemphasis(w), (_W,), 1e-5),
    # filtering
    ("lfilter", lambda w: F.lfilter(
        w, jnp.asarray([1.0, -0.5, 0.1]), jnp.asarray([0.4, 0.2, 0.1])), (_W,), 1e-5),
    ("filtfilt", lambda w: F.filtfilt(
        w, jnp.asarray([1.0, -0.2]), jnp.asarray([0.7, 0.3])), (_W,), 1e-5),
    ("biquad", lambda w: F.biquad(w, 0.3, 0.2, 0.1, 1.0, -0.4, 0.05), (_W,), 1e-5),
    ("allpass_biquad", lambda w: F.allpass_biquad(w, _SR, 1000.0), (_W,), 1e-5),
    ("band_biquad", lambda w: F.band_biquad(w, _SR, 1000.0), (_W,), 1e-5),
    ("bandpass_biquad", lambda w: F.bandpass_biquad(w, _SR, 1000.0), (_W,), 1e-5),
    ("bandreject_biquad", lambda w: F.bandreject_biquad(w, _SR, 1000.0), (_W,), 1e-5),
    ("bass_biquad", lambda w: F.bass_biquad(w, _SR, 6.0), (_W,), 1e-5),
    ("treble_biquad", lambda w: F.treble_biquad(w, _SR, 6.0), (_W,), 1e-5),
    ("deemph_biquad", lambda w: F.deemph_biquad(w, 44100), (_W,), 1e-5),
    ("equalizer_biquad", lambda w: F.equalizer_biquad(w, _SR, 1000.0, 3.0), (_W,), 1e-5),
    ("highpass_biquad", lambda w: F.highpass_biquad(w, _SR, 300.0), (_W,), 1e-5),
    ("lowpass_biquad", lambda w: F.lowpass_biquad(w, _SR, 4000.0), (_W,), 1e-5),
    ("riaa_biquad", lambda w: F.riaa_biquad(w, 44100), (_W,), 1e-5),
    ("contrast", lambda w: F.contrast(w, 50.0), (_W,), 1e-6),
    ("dcshift", lambda w: F.dcshift(w, 0.1, 0.02), (_W,), 1e-6),
    # dither quantizes to 16-bit steps (1/32768); jit's fused ops can move a
    # value across a round(.5) boundary, so tolerate one quantizer step
    ("dither", lambda w: F.dither(w, "TPDF", key=_KEY), (_W,), 1.01 / 32768),
    ("flanger", lambda w: F.flanger(w[None], _SR), (_wave((2, 2000)),), 1e-5),
    ("gain", lambda w: F.gain(w, 3.0), (_W,), 1e-6),
    ("overdrive", lambda w: F.overdrive(w, 20.0, 20.0), (_W,), 1e-5),
    ("phaser", lambda w: F.phaser(w, _SR), (_W,), 1e-5),
    # convolution / noise
    ("convolve", lambda x: F.convolve(x, _wave((2, 31), seed=3), "full"), (_W,), 1e-5),
    ("fftconvolve", lambda x: F.fftconvolve(x, _wave((2, 31), seed=3), "same"),
        (_W,), 1e-4),
    ("add_noise", lambda w: F.add_noise(
        w, _wave((2, 2000), seed=4), jnp.asarray([5.0, 10.0])), (_W,), 1e-5),
    # fbanks (host precompute, still jit-traceable as constants)
    ("melscale_fbanks", lambda s: s @ F.melscale_fbanks(65, 0.0, 8000.0, 23, _SR),
        (_spec(2, 20, 65),), 1e-6),
    ("linear_fbanks", lambda s: s @ F.linear_fbanks(65, 0.0, 8000.0, 23, _SR),
        (_spec(2, 20, 65),), 1e-6),
    # beamforming
    ("psd", lambda s: F.psd(s), (_cspec(),), 1e-5),
    ("mvdr_weights_souden", lambda s: F.mvdr_weights_souden(
        F.psd(s), F.psd(s * 0.5 + 0.1), 0), (_cspec(),), 1e-4),
    ("mvdr_weights_rtf", lambda s: F.mvdr_weights_rtf(
        F.rtf_evd(F.psd(s)), F.psd(s * 0.5 + 0.1), 0), (_cspec(),), 1e-4),
    ("rtf_evd", lambda s: F.rtf_evd(F.psd(s)), (_cspec(),), 1e-4),
    ("rtf_power", lambda s: F.rtf_power(F.psd(s), F.psd(s * 0.5 + 0.1), 0, 2),
        (_cspec(),), 1e-4),
    ("apply_beamforming", lambda s: F.apply_beamforming(
        F.mvdr_weights_souden(F.psd(s), F.psd(s * 0.5 + 0.1), 0), s), (_cspec(),), 1e-4),
    # losses / alignment
    ("forced_align", lambda lp: F.forced_align(
        lp, jnp.asarray([[1, 2, 3, 2]], jnp.int32)),
        (jax.nn.log_softmax(_wave((1, 20, 5), seed=5) * 3, -1),), 0),
    ("rnnt_loss", lambda lo: F.rnnt_loss(
        lo, jnp.asarray([[1, 2, 3]], jnp.int32), jnp.asarray([6], jnp.int32),
        jnp.asarray([3], jnp.int32)),
        (_wave((1, 6, 4, 5), seed=6),), 1e-5),
    ("frechet_distance", lambda mu: F.frechet_distance(
        mu, jnp.eye(4) * 2.0, mu + 1.0, jnp.eye(4)), (jnp.arange(4.0),), 1e-4),
]


@pytest.mark.parametrize("name,fn,args,atol", _CASES, ids=[c[0] for c in _CASES])
def test_functional_jit_consistency(name, fn, args, atol):
    _assert_jit_eq(fn, *args, atol=atol, rtol=1e-5)
