"""Smoke tests: every training recipe runs 2 steps on the CPU test mesh."""

import importlib.util
import sys

import pytest

_REPO = __file__.rsplit("/tests/", 1)[0]


def _run(path, argv):
    spec = importlib.util.spec_from_file_location(f"_recipe_{abs(hash(path))}", path)
    mod = importlib.util.module_from_spec(spec)
    old_argv = sys.argv
    sys.argv = argv
    try:
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        sys.argv = old_argv


@pytest.mark.slow
def test_emformer_rnnt_recipe():
    _run(
        f"{_REPO}/examples/asr/emformer_rnnt/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_hubert_recipes(tmp_path):
    _run(
        f"{_REPO}/examples/hubert/preprocess.py",
        ["preprocess.py", "--synthetic", "--num-clusters", "10",
         "--num-utterances", "4", "--out", str(tmp_path / "labels.npz")],
    )
    _run(
        f"{_REPO}/examples/hubert/pretrain.py",
        ["pretrain.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_source_separation_recipe():
    _run(
        f"{_REPO}/examples/source_separation/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )
