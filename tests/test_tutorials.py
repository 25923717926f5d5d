"""Smoke tests for the offline-runnable tutorials (fast subset)."""

import runpy
import sys

import pytest

_REPO = __file__.rsplit("/tests/", 1)[0]

FAST = [
    "audio_feature_extractions_tutorial.py",
    "audio_data_augmentation_tutorial.py",
    "audio_feature_augmentation_tutorial.py",
    "ctc_forced_alignment_api_tutorial.py",
    "forced_alignment_for_multilingual_data_tutorial.py",
    "audio_datasets_tutorial.py",
    "mvdr_tutorial.py",
    "asr_inference_with_ctc_decoder_tutorial.py",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", FAST)
def test_tutorial_runs(name, monkeypatch):
    monkeypatch.setattr(sys, "argv", [name])
    runpy.run_path(f"{_REPO}/examples/tutorials/{name}", run_name="__main__")
