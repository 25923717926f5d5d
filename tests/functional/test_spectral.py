"""Parity tests for the spectral stack vs torch.stft / torchaudio formulas.

Oracle strategy per SURVEY.md §4: golden comparison against torch CPU
(torch.stft is the primitive under the reference's spectrogram,
functional.py:123-134) and scipy.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import audio_tpu.functional as F
from audio_tpu._internal.windows import hann_window, hamming_window, blackman_window, kaiser_window

from ..conftest import get_whitenoise, get_sinusoid


class TestWindows:
    @pytest.mark.parametrize("n", [256, 400, 512, 1])
    def test_hann(self, n):
        np.testing.assert_allclose(np.asarray(hann_window(n)), torch.hann_window(n).numpy(), atol=1e-6, rtol=0)

    @pytest.mark.parametrize("n", [256, 400])
    def test_hamming(self, n):
        np.testing.assert_allclose(np.asarray(hamming_window(n)), torch.hamming_window(n).numpy(), atol=1e-6, rtol=0)

    @pytest.mark.parametrize("n", [256, 400])
    def test_blackman(self, n):
        np.testing.assert_allclose(np.asarray(blackman_window(n)), torch.blackman_window(n).numpy(), atol=1e-6, rtol=0)

    @pytest.mark.parametrize("n", [256, 400])
    def test_kaiser(self, n):
        np.testing.assert_allclose(
            np.asarray(kaiser_window(n, beta=12.0)),
            torch.kaiser_window(n, True, 12.0).numpy(),
            atol=1e-5,
            rtol=0,
        )


def _torch_stft(x, n_fft, hop, win_length, window, center=True, pad_mode="reflect", normalized=False, onesided=True):
    return torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win_length,
        window=torch.from_numpy(window) if window is not None else None,
        center=center,
        pad_mode=pad_mode,
        normalized=normalized,
        onesided=onesided,
        return_complex=True,
    ).numpy()


class TestStft:
    @pytest.mark.parametrize("n_fft,hop,win", [(400, 160, 400), (512, 128, 512), (512, 200, 320)])
    @pytest.mark.parametrize("center", [True, False])
    def test_match_torch(self, n_fft, hop, win, center):
        x = get_whitenoise(duration=0.5, n_channels=2)
        window = torch.hann_window(win).numpy()
        expected = _torch_stft(x, n_fft, hop, win, window, center=center)
        got = np.asarray(
            F.stft(jnp.asarray(x), n_fft=n_fft, hop_length=hop, win_length=win,
                   window=jnp.asarray(window), center=center)
        )
        np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)

    def test_normalized(self):
        x = get_whitenoise(duration=0.25)
        window = torch.hann_window(400).numpy()
        expected = _torch_stft(x, 400, 160, 400, window, normalized=True)
        got = np.asarray(
            F.stft(jnp.asarray(x), n_fft=400, hop_length=160, win_length=400,
                   window=jnp.asarray(window), normalized=True)
        )
        np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)

    @pytest.mark.parametrize("length", [None, 8000])
    def test_istft_roundtrip(self, length):
        x = get_whitenoise(duration=0.5)
        window = torch.hann_window(400).numpy()
        spec = F.stft(jnp.asarray(x), n_fft=400, hop_length=160, window=jnp.asarray(window))
        rec = np.asarray(F.istft(spec, n_fft=400, hop_length=160, window=jnp.asarray(window), length=length))
        n = rec.shape[-1] if length is None else length
        np.testing.assert_allclose(rec[..., :n], x[..., :n], atol=1e-5, rtol=0)

    def test_istft_match_torch(self):
        x = get_whitenoise(duration=0.5)
        window = torch.hann_window(400).numpy()
        spec_t = _torch_stft(x, 400, 160, 400, window)
        expected = torch.istft(
            torch.from_numpy(spec_t), n_fft=400, hop_length=160, window=torch.from_numpy(window), length=8000
        ).numpy()
        got = np.asarray(
            F.istft(jnp.asarray(spec_t), n_fft=400, hop_length=160, window=jnp.asarray(window), length=8000)
        )
        np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


class TestSpectrogram:
    @pytest.mark.parametrize("power", [None, 1.0, 2.0])
    @pytest.mark.parametrize("normalized", [False, True, "window", "frame_length"])
    def test_torchaudio_formula(self, power, normalized):
        """Check the full spectrogram contract (pad/norm/power) against a
        torch-built oracle replicating functional.py:54-144."""
        x = get_whitenoise(duration=0.25)
        n_fft, hop, win = 400, 160, 400
        window = torch.hann_window(win).numpy()
        frame_length_norm = normalized == "frame_length"
        window_norm = normalized in (True, "window")
        expected = _torch_stft(x, n_fft, hop, win, window, normalized=frame_length_norm)
        if window_norm:
            expected = expected / np.sqrt(np.sum(window**2))
        if power is not None:
            expected = np.abs(expected) ** power
        got = np.asarray(
            F.spectrogram(
                jnp.asarray(x), pad=0, window=jnp.asarray(window), n_fft=n_fft,
                hop_length=hop, win_length=win, power=power, normalized=normalized,
            )
        )
        np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-3)

    def test_batch_consistency(self):
        x = get_whitenoise(duration=0.25, n_channels=3)
        window = jnp.asarray(torch.hann_window(400).numpy())
        full = np.asarray(F.spectrogram(jnp.asarray(x), window=window, n_fft=400, hop_length=160, win_length=400,
                                        power=2.0, normalized=False))
        each = [
            np.asarray(F.spectrogram(jnp.asarray(x[i]), window=window, n_fft=400, hop_length=160, win_length=400,
                                     power=2.0, normalized=False))
            for i in range(3)
        ]
        np.testing.assert_allclose(full, np.stack(each), atol=1e-6, rtol=0)


class TestGriffinLim:
    def test_reconstruction_quality(self):
        """Griffin-Lim on a pure tone should reconstruct a highly correlated tone."""
        x = get_sinusoid(frequency=440, duration=0.5)
        window = jnp.asarray(torch.hann_window(400).numpy())
        spec = F.spectrogram(jnp.asarray(x), window=window, n_fft=400, hop_length=100, win_length=400,
                             power=2.0, normalized=False)
        rec = np.asarray(
            F.griffinlim(spec, window=window, n_fft=400, hop_length=100, win_length=400, power=2.0,
                         n_iter=32, momentum=0.99, length=x.shape[-1], rand_init=False)
        )
        # compare magnitude spectrograms
        spec_rec = np.asarray(F.spectrogram(jnp.asarray(rec), window=window, n_fft=400, hop_length=100,
                                            win_length=400, power=1.0, normalized=False))
        spec_ref = np.asarray(spec) ** 0.5
        corr = np.corrcoef(spec_rec.ravel(), spec_ref.ravel())[0, 1]
        assert corr > 0.98


class TestAmplitude:
    def test_amplitude_to_db_matches_torchaudio_formula(self):
        x = np.abs(get_whitenoise(duration=0.01)) + 1e-3
        multiplier, amin, db_mult, top_db = 10.0, 1e-10, 0.0, 80.0
        expected = multiplier * np.log10(np.clip(x, amin, None)) - multiplier * db_mult
        expected = np.maximum(expected, expected.max() - top_db)
        got = np.asarray(F.amplitude_to_DB(jnp.asarray(x), multiplier, amin, db_mult, top_db))
        np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)

    def test_db_roundtrip(self):
        x = np.abs(get_whitenoise(duration=0.01)).astype(np.float64) + 1e-3
        db = F.amplitude_to_DB(jnp.asarray(x), 10.0, 1e-10, 0.0, None)
        back = np.asarray(F.DB_to_amplitude(db, 1.0, 1.0))
        np.testing.assert_allclose(back, x, rtol=1e-5)


class TestSpectralCentroid:
    def test_sinusoid_centroid(self):
        x = get_sinusoid(frequency=1000, sample_rate=16000, duration=0.5)
        window = jnp.asarray(torch.hann_window(400).numpy())
        sc = np.asarray(F.spectral_centroid(jnp.asarray(x), 16000, 0, window, 400, 160, 400))
        assert np.abs(np.median(sc) - 1000) < 50


def test_power_spec_conv_matches_rfft_path():
    """The TPU conv-DFT spectrogram must agree with the rfft formulation."""
    import numpy as np
    import jax.numpy as jnp
    import audio_tpu.functional as F
    from audio_tpu.functional import _spectral
    from audio_tpu._internal.windows import hann_window

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32))
    w = hann_window(400)
    for power, fl_norm in [(2.0, False), (1.0, False), (2.0, True)]:
        ref = F.spectrogram(x, window=w, n_fft=400, hop_length=160, win_length=400,
                            power=power, normalized="frame_length" if fl_norm else False)
        got = _spectral._power_spec_conv(x, w, 400, 160, 400, True, "reflect", power, fl_norm)
        # fp32 cancellation differs between the two formulations on near-zero
        # bins; bound the error relative to the spectrum scale
        ref_np, got_np = np.asarray(ref), np.asarray(got)
        assert np.abs(got_np - ref_np).max() <= 5e-5 * ref_np.max() + 1e-3


def test_mel_spectrogram_dtype_promotion():
    """bf16 waveform x f32 filterbank must promote to f32 (the composed
    Spectrogram -> MelScale chain's behavior), not quantize the filterbank."""
    import numpy as np

    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((2, 2000)).astype(np.float32) * 0.3)
    fb = F.melscale_fbanks(201, 0.0, 8000.0, 40, 16000)
    w = hann_window(400)
    out_bf16 = F.mel_spectrogram(x32.astype(jnp.bfloat16), fb=fb, window=w)
    assert out_bf16.dtype == jnp.float32
    out_f32 = F.mel_spectrogram(x32, fb=fb, window=w)
    # bf16 input costs ~2^-8 relative; the filterbank must stay full precision
    np.testing.assert_allclose(
        np.asarray(out_bf16), np.asarray(out_f32), rtol=0,
        atol=2e-2 * float(jnp.max(out_f32)),
    )


def test_pallas_spectrogram_env_gate_requires_tpu(monkeypatch):
    """AUDIO_TPU_PALLAS_SPECTROGRAM=1 must be a no-op off-TPU (the Mosaic
    kernel cannot lower on the CPU backend)."""
    import numpy as np

    from audio_tpu.functional._spectral import _use_pallas_spectrogram

    monkeypatch.setenv("AUDIO_TPU_PALLAS_SPECTROGRAM", "1")
    assert not _use_pallas_spectrogram(400, 160, 2.0)  # CPU backend in tests
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2000)).astype(np.float32))
    fb = F.melscale_fbanks(201, 0.0, 8000.0, 40, 16000)
    out = F.mel_spectrogram(x, fb=fb, window=hann_window(400))
    assert bool(jnp.isfinite(out).all())
