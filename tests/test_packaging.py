"""Packaging tier: wheel metadata + installed-package smoke.

Mirrors the reference's tier-3 smoke test
(/root/reference/test/smoke_test/smoke_test.py) and its pip-installable
build (/root/reference/setup.py:83-120).  The full wheel-build + venv
install is env-gated (slow, ~30 s): AUDIO_TPU_TEST_WHEEL=1.
"""

import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def test_pyproject_metadata():
    try:
        import tomllib
    except ImportError:  # py<3.11
        pytest.skip("tomllib unavailable")
    meta = tomllib.loads((ROOT / "pyproject.toml").read_text())
    assert meta["project"]["name"] == "audio-tpu"
    assert "version" in meta["project"]["dynamic"]
    # native sources must ship in the wheel (compiled on demand at runtime)
    pkg_data = meta["tool"]["setuptools"]["package-data"]["audio_tpu"]
    assert "csrc/*.cpp" in pkg_data and "io/csrc/*.cpp" in pkg_data


def test_version_attr():
    import audio_tpu

    assert isinstance(audio_tpu.__version__, str) and audio_tpu.__version__


@pytest.mark.skipif(
    os.environ.get("AUDIO_TPU_TEST_WHEEL") != "1",
    reason="set AUDIO_TPU_TEST_WHEEL=1 to build + install the wheel",
)
def test_wheel_builds_and_imports(tmp_path):
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", str(tmp_path), str(ROOT)],
        check=True, capture_output=True,
    )
    wheels = list(tmp_path.glob("audio_tpu-*.whl"))
    assert len(wheels) == 1
    target = tmp_path / "site"
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps", "--no-index",
         "--target", str(target), str(wheels[0])],
        check=True, capture_output=True,
    )
    assert (target / "audio_tpu" / "csrc" / "ctc_beam.cpp").exists()
    assert (target / "audio_tpu" / "io" / "csrc" / "flac.cpp").exists()
    # import the INSTALLED copy in a clean interpreter, not the repo checkout
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(target)] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                         if p and os.path.realpath(p) != os.path.realpath(str(ROOT))]
    )
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');\n"
         "import numpy as np, jax.numpy as jnp\n"
         "import audio_tpu, audio_tpu.transforms as T\n"
         "assert 'site' in audio_tpu.__file__, audio_tpu.__file__\n"
         "x = jnp.asarray(np.zeros((1, 4000), np.float32))\n"
         "m = T.MelSpectrogram(n_fft=400, hop_length=160, n_mels=40)(x)\n"
         "print('ok', m.shape)"],
        check=True, capture_output=True, env=env, cwd=str(tmp_path),
    )
    assert b"ok" in out.stdout
