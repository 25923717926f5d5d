"""Tier-3 smoke test (reference: test/smoke_test/smoke_test.py):
import the package and run one minimal op per major layer."""

import jax.numpy as jnp
import numpy as np


def test_smoke():
    import audio_tpu
    import audio_tpu.compliance.kaldi as kaldi
    import audio_tpu.functional as F
    import audio_tpu.transforms as T

    assert audio_tpu.__version__
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4000)), jnp.float32) * 0.1
    spec = T.Spectrogram(n_fft=400)(wav)
    assert spec.shape[-2] == 201
    out = F.lowpass_biquad(wav, 16000, 1000.0)
    assert out.shape == wav.shape
    fb = kaldi.fbank(wav, num_mel_bins=23)
    assert fb.shape[-1] == 23

    from audio_tpu import datasets, models, pipelines  # noqa: F401

    assert len(pipelines.__all__) >= 48
