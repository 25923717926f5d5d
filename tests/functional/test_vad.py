"""vad parity vs the reference torch implementation (filtering.py:1485-1702)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audio_tpu.functional import vad
from audio_tpu.transforms import Vad


@pytest.fixture(scope="module")
def ref():
    if "_ref_filtering" in sys.modules:
        return sys.modules["_ref_filtering"]
    ta = types.ModuleType("torchaudio")
    ext = types.ModuleType("torchaudio._extension")
    ext._IS_TORCHAUDIO_EXT_AVAILABLE = False
    ta._extension = ext
    sys.modules.setdefault("torchaudio", ta)
    sys.modules.setdefault("torchaudio._extension", ext)
    spec = importlib.util.spec_from_file_location(
        "_ref_filtering", "/root/reference/src/torchaudio/functional/filtering.py"
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules["_ref_filtering"] = m
    spec.loader.exec_module(m)
    return m


def _voiced(sr, dur=1.0, f0=150.0, amp=0.3, seed=0):
    t = np.arange(int(sr * dur)) / sr
    x = np.zeros(t.shape)
    for h in range(1, 12):
        x += np.sin(2 * np.pi * f0 * h * t) / h
    return (amp * x).astype(np.float32)


def _noise(sr, dur, seed, amp=0.005):
    return (amp * np.random.default_rng(seed).standard_normal(int(sr * dur))).astype(np.float32)


@pytest.mark.parametrize("sr", [8000, 16000])
def test_parity_mono(ref, sr):
    sig = np.concatenate([_noise(sr, 1.0, 0), _voiced(sr), _noise(sr, 0.5, 1)])
    expected = ref.vad(torch.from_numpy(sig), sr).numpy()
    got = np.asarray(vad(jnp.asarray(sig), sr))
    assert got.shape == expected.shape
    np.testing.assert_array_equal(got, expected)


def test_parity_multichannel_earliest_onset(ref):
    sr = 8000
    early = np.concatenate([_noise(sr, 0.5, 2), _voiced(sr), _noise(sr, 1.0, 3)])
    late = np.concatenate([_noise(sr, 1.0, 4), _voiced(sr), _noise(sr, 0.5, 5)])
    sig = np.stack([late, early])
    expected = ref.vad(torch.from_numpy(sig), sr).numpy()
    got = np.asarray(vad(jnp.asarray(sig), sr))
    assert got.shape == expected.shape
    np.testing.assert_array_equal(got, expected)
    # trimmed to the earlier activity
    assert got.shape[-1] > sig.shape[-1] - sr


def test_parity_no_trigger_and_pre_trigger(ref):
    sr = 8000
    sig = _noise(sr, 2.0, 6)
    for kwargs in ({}, {"pre_trigger_time": 0.25}):
        expected = ref.vad(torch.from_numpy(sig), sr, **kwargs).numpy()
        got = np.asarray(vad(jnp.asarray(sig), sr, **kwargs))
        assert got.shape == expected.shape
        np.testing.assert_array_equal(got, expected)


def test_parity_nondefault_params(ref):
    sr = 8000
    sig = np.concatenate([_noise(sr, 0.8, 7), _voiced(sr, f0=200.0), _noise(sr, 0.2, 8)])
    kwargs = dict(trigger_level=5.0, trigger_time=0.1, search_time=0.5, allowed_gap=0.1,
                  measure_freq=25.0, noise_reduction_amount=1.0)
    expected = ref.vad(torch.from_numpy(sig), sr, **kwargs).numpy()
    got = np.asarray(vad(jnp.asarray(sig), sr, **kwargs))
    assert got.shape == expected.shape
    np.testing.assert_array_equal(got, expected)


def test_transform_delegates():
    sr = 8000
    sig = np.concatenate([_noise(sr, 1.0, 9), _voiced(sr)])
    t_out = Vad(sr)(jnp.asarray(sig))
    f_out = vad(jnp.asarray(sig), sr)
    np.testing.assert_array_equal(np.asarray(t_out), np.asarray(f_out))
