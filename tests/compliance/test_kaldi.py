"""Kaldi-compliance parity: bit-level comparison against the reference
torch implementation (/root/reference/src/torchaudio/compliance/kaldi.py)
executed as a test oracle with a stubbed torchaudio.functional.create_dct."""

import importlib.util
import math
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import audio_tpu.compliance.kaldi as K

from ..conftest import get_whitenoise


@pytest.fixture(scope="module")
def ref_kaldi():
    if "_ref_kaldi" in sys.modules:
        return sys.modules["_ref_kaldi"]
    # the reference module imports `torchaudio` only for functional.create_dct
    stub = types.ModuleType("torchaudio")
    func = types.ModuleType("torchaudio.functional")

    def create_dct(n_mfcc, n_mels, norm):
        n = torch.arange(float(n_mels))
        k = torch.arange(float(n_mfcc)).unsqueeze(1)
        dct = torch.cos(math.pi / float(n_mels) * (n + 0.5) * k)
        if norm is None:
            dct *= 2.0
        else:
            dct[0] *= 1.0 / math.sqrt(2.0)
            dct *= math.sqrt(2.0 / float(n_mels))
        return dct.t()

    func.create_dct = create_dct
    stub.functional = func
    had = sys.modules.get("torchaudio")
    sys.modules["torchaudio"] = stub
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_kaldi", "/root/reference/src/torchaudio/compliance/kaldi.py"
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules["_ref_kaldi"] = m
        spec.loader.exec_module(m)
    finally:
        if had is not None:
            sys.modules["torchaudio"] = had
        else:
            del sys.modules["torchaudio"]
    return m


WAV = get_whitenoise(duration=0.3, seed=11) * 0.5


@pytest.mark.parametrize("snip_edges", [True, False])
@pytest.mark.parametrize("window_type", ["povey", "hanning", "hamming", "rectangular", "blackman"])
def test_spectrogram_parity(ref_kaldi, snip_edges, window_type):
    expected = ref_kaldi.spectrogram(
        torch.from_numpy(WAV), snip_edges=snip_edges, window_type=window_type
    ).numpy()
    got = np.asarray(K.spectrogram(jnp.asarray(WAV), snip_edges=snip_edges, window_type=window_type))
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("kwargs", [
    {},
    {"num_mel_bins": 40, "low_freq": 40.0, "high_freq": 7600.0},
    {"use_energy": True},
    {"use_energy": True, "htk_compat": True},
    {"use_power": False, "use_log_fbank": False},
    {"snip_edges": False},
    {"vtln_warp": 1.1},
    {"raw_energy": False, "energy_floor": 0.0},
    {"preemphasis_coefficient": 0.0, "remove_dc_offset": False},
    {"round_to_power_of_two": False},
])
def test_fbank_parity(ref_kaldi, kwargs):
    expected = ref_kaldi.fbank(torch.from_numpy(WAV), **kwargs).numpy()
    got = np.asarray(K.fbank(jnp.asarray(WAV), **kwargs))
    np.testing.assert_allclose(got, expected, atol=3e-3, rtol=1e-4)


@pytest.mark.parametrize("kwargs", [
    {},
    {"num_ceps": 20, "num_mel_bins": 40},
    {"use_energy": True},
    {"use_energy": True, "htk_compat": True},
    {"htk_compat": True},
    {"cepstral_lifter": 0.0},
])
def test_mfcc_parity(ref_kaldi, kwargs):
    expected = ref_kaldi.mfcc(torch.from_numpy(WAV), **kwargs).numpy()
    got = np.asarray(K.mfcc(jnp.asarray(WAV), **kwargs))
    np.testing.assert_allclose(got, expected, atol=3e-3, rtol=1e-4)


def test_mel_banks_parity(ref_kaldi):
    expected, centers_t = ref_kaldi.get_mel_banks(23, 512, 16000.0, 20.0, 0.0, 100.0, -500.0, 1.0)
    got, centers_j = K.get_mel_banks(23, 512, 16000.0, 20.0, 0.0, 100.0, -500.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(centers_j), centers_t.numpy().squeeze(), atol=1e-3)


def test_vtln_warp_parity(ref_kaldi):
    freqs = np.linspace(0, 8000, 200)
    expected = ref_kaldi.vtln_warp_freq(100.0, 7500.0, 20.0, 7800.0, 1.1, torch.from_numpy(freqs)).numpy()
    got = np.asarray(K.vtln_warp_freq(100.0, 7500.0, 20.0, 7800.0, 1.1, jnp.asarray(freqs)))
    np.testing.assert_allclose(got, expected, atol=1e-6)
