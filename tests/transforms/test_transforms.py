"""Transforms tests: functional-consistency (transform == functional call, the
reference's own test pattern) plus torch-oracle checks for MelSpectrogram/MFCC."""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import audio_tpu.functional as F
import audio_tpu.transforms as T

from ..conftest import get_whitenoise, get_sinusoid


class TestSpectrogramTransforms:
    def test_spectrogram_equals_functional(self):
        x = jnp.asarray(get_whitenoise(duration=0.25))
        tr = T.Spectrogram(n_fft=400, hop_length=160)
        got = np.asarray(tr(x))
        expected = np.asarray(
            F.spectrogram(x, pad=0, window=tr.window, n_fft=400, hop_length=160, win_length=400,
                          power=2.0, normalized=False)
        )
        np.testing.assert_array_equal(got, expected)

    def test_roundtrip_inverse(self):
        x = jnp.asarray(get_whitenoise(duration=0.25))
        spec = T.Spectrogram(n_fft=400, hop_length=160, power=None)(x)
        rec = np.asarray(T.InverseSpectrogram(n_fft=400, hop_length=160)(spec, length=x.shape[-1]))
        np.testing.assert_allclose(rec, np.asarray(x), atol=1e-5)

    def test_melspectrogram_vs_torch_oracle(self):
        """MelSpectrogram matches torch.stft + mel filterbank composition."""
        x = get_whitenoise(duration=0.25)
        mel = T.MelSpectrogram(sample_rate=16000, n_fft=400, hop_length=160, n_mels=80)
        got = np.asarray(mel(jnp.asarray(x)))
        spec_t = torch.stft(
            torch.from_numpy(x), n_fft=400, hop_length=160, win_length=400,
            window=torch.hann_window(400), center=True, pad_mode="reflect", return_complex=True,
        ).abs().pow(2.0).numpy()
        fb = np.asarray(F.melscale_fbanks(201, 0.0, 8000.0, 80, 16000))
        expected = np.einsum("cft,fm->cmt", spec_t, fb)
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)

    def test_mfcc_shape_and_db_path(self):
        x = jnp.asarray(get_whitenoise(duration=0.25))
        mfcc = T.MFCC(sample_rate=16000, n_mfcc=13, melkwargs={"n_fft": 400, "hop_length": 160, "n_mels": 23})
        out = np.asarray(mfcc(x))
        assert out.shape[:2] == (1, 13)
        assert np.isfinite(out).all()

    def test_lfcc_shape(self):
        x = jnp.asarray(get_whitenoise(duration=0.25))
        lfcc = T.LFCC(sample_rate=16000, n_lfcc=13, speckwargs={"n_fft": 400, "hop_length": 160})
        out = np.asarray(lfcc(x))
        assert out.shape[:2] == (1, 13)

    def test_inverse_melscale_recovers(self):
        x = jnp.asarray(get_whitenoise(duration=0.25))
        spec = T.Spectrogram(n_fft=400, hop_length=160)(x)
        melscale = T.MelScale(n_mels=64, sample_rate=16000, n_stft=201)
        # the 201/64 bank is rank-deficient: gels (the default, like torch's
        # lstsq driver) refuses it, the rank-revealing drivers handle it
        inv = T.InverseMelScale(n_stft=201, n_mels=64, sample_rate=16000, driver="gelsd")
        mel = melscale(spec)
        rec = inv(mel)
        # reconstruction through the mel bottleneck keeps mel-domain energy
        mel2 = melscale(rec)
        err = float(jnp.linalg.norm(mel - mel2) / jnp.linalg.norm(mel))
        assert err < 0.05, err

    def test_inverse_melscale_driver_semantics(self):
        import numpy as np
        import pytest

        # rank-deficient bank: gels raises (torch.linalg.lstsq parity),
        # rank-revealing drivers solve via SVD
        with pytest.raises(RuntimeError, match="full rank"):
            T.InverseMelScale(n_stft=201, n_mels=64, sample_rate=16000, driver="gels")
        # full-rank bank: gels (QR) and gelsd (SVD) agree
        rng = np.random.default_rng(0)
        spec0 = jnp.asarray(np.abs(rng.standard_normal((2, 201, 12))).astype(np.float32))
        fb = T.MelScale(n_mels=40, sample_rate=16000, n_stft=201)
        mel = fb(spec0)
        a = T.InverseMelScale(201, 40, driver="gels")(mel)
        b = T.InverseMelScale(201, 40, driver="gelsd")(mel)
        assert bool(jnp.isfinite(a).all())
        assert float(jnp.abs(a - b).max()) < 1e-4
        with pytest.raises(ValueError, match="driver must be one of"):
            T.InverseMelScale(201, 40, driver="qr")

    def test_griffinlim_transform(self):
        x = jnp.asarray(get_sinusoid(frequency=440, duration=0.3))
        spec = T.Spectrogram(n_fft=400, hop_length=100)(x)
        rec = T.GriffinLim(n_fft=400, hop_length=100, n_iter=8, rand_init=False, length=x.shape[-1])(spec)
        assert rec.shape == x.shape


class TestSimpleTransforms:
    def test_amplitude_to_db(self):
        x = jnp.abs(jnp.asarray(get_whitenoise(duration=0.01))) + 1e-4
        np.testing.assert_allclose(
            np.asarray(T.AmplitudeToDB("power", 80.0)(x)),
            np.asarray(F.amplitude_to_DB(x, 10.0, 1e-10, 0.0, 80.0)),
        )

    def test_mulaw_roundtrip(self):
        x = jnp.asarray(get_whitenoise(duration=0.02))
        enc = T.MuLawEncoding(256)(x)
        dec = T.MuLawDecoding(256)(enc)
        assert np.abs(np.asarray(dec) - np.asarray(x)).max() < 0.025

    def test_resample_transform_equals_functional(self):
        x = jnp.asarray(get_whitenoise(duration=0.2))
        got = np.asarray(T.Resample(16000, 8000)(x))
        expected = np.asarray(F.resample(x, 16000, 8000))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_fade_shapes(self):
        x = jnp.ones((2, 1000))
        for shape in ("linear", "exponential", "logarithmic", "quarter_sine", "half_sine"):
            y = np.asarray(T.Fade(100, 200, shape)(x))
            assert y.shape == x.shape
            assert y[:, 0].max() <= 0.05 or shape == "logarithmic"
            assert np.isclose(y[:, 500], 1.0).all()

    def test_vol(self):
        x = jnp.asarray(get_whitenoise(duration=0.01) * 0.1)
        np.testing.assert_allclose(np.asarray(T.Vol(2.0, "amplitude")(x)), np.clip(np.asarray(x) * 2, -1, 1), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(T.Vol(6.0, "db")(x)), np.clip(np.asarray(x) * 10 ** 0.3, -1, 1), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(T.Vol(4.0, "power")(x)), np.clip(np.asarray(x) * 2, -1, 1), rtol=1e-5
        )

    def test_masking_transforms(self):
        x = jnp.ones((2, 80, 100))
        key = jax.random.PRNGKey(0)
        y = np.asarray(T.FrequencyMasking(20)(x, key=key))
        masked_rows = (y[0] == 0).all(axis=1).sum()
        assert 0 <= masked_rows <= 20
        y = np.asarray(T.TimeMasking(20)(x, key=key))
        masked_cols = (y[0] == 0).all(axis=0).sum()
        assert 0 <= masked_cols <= 20

    def test_specaugment(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 2, 80, 100)).astype(np.float32))
        y = np.asarray(T.SpecAugment(2, 20, 2, 15)(x, key=jax.random.PRNGKey(1)))
        assert y.shape == x.shape
        assert not np.array_equal(y, np.asarray(x))

    def test_speed_transform(self):
        x = jnp.asarray(get_whitenoise(duration=0.5))
        y, lengths = T.Speed(16000, 1.1)(x, jnp.asarray([8000]))
        expected_y, expected_l = F.speed(x, 16000, 1.1, jnp.asarray([8000]))
        np.testing.assert_allclose(np.asarray(y), np.asarray(expected_y), atol=1e-6)
        assert int(lengths[0]) == int(expected_l[0])

    def test_speed_perturbation(self):
        x = jnp.asarray(get_whitenoise(duration=0.2))
        y, _ = T.SpeedPerturbation(16000, [0.9, 1.0, 1.1])(x, key=jax.random.PRNGKey(3))
        assert y.ndim == x.ndim

    def test_preemphasis_roundtrip(self):
        x = jnp.asarray(get_whitenoise(duration=0.05) * 0.3)
        y = T.Preemphasis(0.97)(x)
        z = np.asarray(T.Deemphasis(0.97)(y))
        np.testing.assert_allclose(z, np.asarray(x), atol=1e-5)

    def test_compute_deltas_transform(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 40, 100)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(T.ComputeDeltas()(x)), np.asarray(F.compute_deltas(x)))

    def test_timestretch(self):
        spec = jnp.asarray(
            (np.random.default_rng(0).standard_normal((2, 201, 50)) + 1j * np.random.default_rng(1).standard_normal((2, 201, 50))).astype(np.complex64)
        )
        y = T.TimeStretch(hop_length=160, n_freq=201, fixed_rate=1.3)(spec)
        assert y.shape[-1] == math.ceil(50 / 1.3)
        with pytest.raises(ValueError):
            T.TimeStretch(hop_length=160, n_freq=201)(spec)

    def test_rnnt_loss_transform(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((2, 6, 4, 5)).astype(np.float32))
        targets = jnp.asarray(rng.integers(1, 5, (2, 3)).astype(np.int32))
        tl = jnp.asarray([6, 6]); ul = jnp.asarray([3, 3])
        got = float(T.RNNTLoss(blank=0, reduction="sum")(logits, targets, tl, ul))
        expected = float(F.rnnt_loss(logits, targets, tl, ul, blank=0, reduction="sum"))
        assert got == expected


class TestBeamforming:
    def _specs(self):
        rng = np.random.default_rng(0)
        spec = (rng.standard_normal((4, 201, 30)) + 1j * rng.standard_normal((4, 201, 30))).astype(np.complex64)
        mask = rng.uniform(0.1, 0.9, (201, 30)).astype(np.float32)
        return jnp.asarray(spec), jnp.asarray(mask)

    def test_psd_properties(self):
        spec, mask = self._specs()
        p = np.asarray(T.PSD()(spec, mask))
        assert p.shape == (201, 4, 4)
        # Hermitian PSD
        np.testing.assert_allclose(p, np.conj(np.swapaxes(p, -1, -2)), atol=1e-4)
        eig = np.linalg.eigvalsh(p)
        assert eig.min() > -1e-3

    def test_psd_matches_manual(self):
        spec, mask = self._specs()
        p = np.asarray(F.psd(spec, mask))
        s = np.asarray(spec).transpose(1, 0, 2)  # (freq, ch, time)
        m = np.asarray(mask)
        mn = m / (m.sum(-1, keepdims=True) + 1e-10)
        expected = np.einsum("fct,fet,ft->fce", s, s.conj(), mn)
        np.testing.assert_allclose(p, expected, atol=1e-4)

    def test_souden_mvdr_enhances(self):
        spec, mask = self._specs()
        psd_s = F.psd(spec, mask)
        psd_n = F.psd(spec, 1 - mask)
        out = T.SoudenMVDR()(spec, psd_s, psd_n, reference_channel=0)
        assert out.shape == (201, 30)
        assert np.isfinite(np.asarray(out)).view(np.uint8).all()

    def test_rtf_mvdr(self):
        spec, mask = self._specs()
        psd_s = F.psd(spec, mask)
        psd_n = F.psd(spec, 1 - mask)
        rtf = F.rtf_evd(psd_s)
        out = T.RTFMVDR()(spec, rtf, psd_n, reference_channel=0)
        assert out.shape == (201, 30)

    @pytest.mark.parametrize("solution", ["ref_channel", "stv_evd", "stv_power"])
    def test_mvdr_solutions(self, solution):
        spec, mask = self._specs()
        out = T.MVDR(ref_channel=0, solution=solution)(spec, mask)
        assert out.shape == (201, 30)
        assert np.isfinite(np.asarray(out).real).all()

    def test_mvdr_distortionless_on_steering(self):
        """w^H v = 1 for the rtf solution: the target direction is passed
        undistorted (the defining MVDR constraint)."""
        rng = np.random.default_rng(1)
        c = 4
        v = (rng.standard_normal((10, c)) + 1j * rng.standard_normal((10, c))).astype(np.complex128)
        a = rng.standard_normal((10, c, c)) + 1j * rng.standard_normal((10, c, c))
        psd_n = jnp.asarray(a @ np.conj(np.swapaxes(a, -1, -2)) + 4 * np.eye(c))
        w = F.mvdr_weights_rtf(jnp.asarray(v), psd_n, diagonal_loading=False)
        response = np.einsum("fc,fc->f", np.conj(np.asarray(w)), v)
        np.testing.assert_allclose(response.real, 1.0, atol=1e-5)
        np.testing.assert_allclose(response.imag, 0.0, atol=1e-5)
