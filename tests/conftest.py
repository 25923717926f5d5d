"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's device/dtype-matrix strategy (SURVEY.md §4) but uses
JAX CPU simulation so sharding/collective paths run in CI without TPU
hardware.  Must set flags before jax is imported anywhere.
"""

import os

# The session env pins JAX_PLATFORMS=axon (single real TPU chip); unit tests
# must run on the virtual CPU mesh, so force-override unless explicitly told.
os.environ["JAX_PLATFORMS"] = os.environ.get("AUDIO_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# sitecustomize imports jax at interpreter startup with JAX_PLATFORMS=axon
# already read into config, so env alone is not enough — update the config
# directly (the backend is not yet initialized at conftest time).
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)


@pytest.fixture
def rng():
    return np.random.default_rng(2861)


def get_whitenoise(sample_rate=16000, duration=1.0, n_channels=1, seed=0, dtype=np.float32, scale_factor=1.0):
    """Deterministic white noise, matching the reference fixture's role
    (/root/reference/test/torchaudio_unittest/common_utils/data_utils.py:37-80)."""
    t = int(sample_rate * duration)
    gen = np.random.default_rng(seed)
    x = gen.standard_normal((n_channels, t)).astype(dtype) * scale_factor
    x /= max(1.0, np.abs(x).max())
    return x


def get_sinusoid(frequency=300, sample_rate=16000, duration=1.0, n_channels=1, dtype=np.float32):
    t = np.arange(int(sample_rate * duration), dtype=np.float64) / sample_rate
    x = np.sin(2 * np.pi * frequency * t).astype(dtype)
    return np.tile(x, (n_channels, 1))


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running recipe/integration test")
