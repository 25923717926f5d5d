"""Wav2Letter / DeepSpeech parity vs reference torch implementations."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_tpu.models.deepspeech import DeepSpeech, import_deepspeech_state_dict
from audio_tpu.models.wav2letter import Wav2Letter, import_wav2letter_state_dict


def _load(name, path):
    key = f"_ref_{name}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(key, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[key] = m
    spec.loader.exec_module(m)
    return m


class TestWav2Letter:
    @pytest.mark.parametrize("input_type,num_features", [("waveform", 1), ("mfcc", 13)])
    def test_parity(self, input_type, num_features):
        ref = _load("w2l", "/root/reference/src/torchaudio/models/wav2letter.py")
        torch.manual_seed(0)
        tmodel = ref.Wav2Letter(num_classes=11, input_type=input_type, num_features=num_features)
        tmodel.eval()
        variables = import_wav2letter_state_dict(
            {k: v.numpy() for k, v in tmodel.state_dict().items()}, input_type
        )
        jmodel = Wav2Letter(num_classes=11, input_type=input_type, num_features=num_features)
        rng = np.random.default_rng(0)
        t_len = 3200 if input_type == "waveform" else 50
        x = rng.standard_normal((2, num_features, t_len)).astype(np.float32) * 0.1
        with torch.no_grad():
            expected = tmodel(torch.from_numpy(x)).numpy()
        got = np.asarray(jmodel.apply(variables, jnp.asarray(x)))
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


class TestDeepSpeech:
    def test_parity(self):
        ref = _load("ds", "/root/reference/src/torchaudio/models/deepspeech.py")
        torch.manual_seed(0)
        tmodel = ref.DeepSpeech(n_feature=13, n_hidden=64, n_class=11, dropout=0.0)
        tmodel.eval()
        variables = import_deepspeech_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})
        jmodel = DeepSpeech(n_feature=13, n_hidden=64, n_class=11, dropout=0.0)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 1, 30, 13)).astype(np.float32)
        with torch.no_grad():
            expected = tmodel(torch.from_numpy(x)).numpy()
        got = np.asarray(jmodel.apply(variables, jnp.asarray(x), deterministic=True))
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)

    def test_init(self):
        model = DeepSpeech(n_feature=13, n_hidden=32, n_class=5)
        x = jnp.zeros((1, 1, 10, 13))
        v = model.init(jax.random.PRNGKey(0), x, deterministic=True)
        out = model.apply(v, x, deterministic=True)
        assert out.shape == (1, 10, 5)
