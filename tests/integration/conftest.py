"""Tier-2 integration tests (reference test/integration_tests/): pretrained
bundles + golden outputs. Need network + checkpoint downloads, so they run
only when AUDIO_TPU_RUN_INTEGRATION=1 (or CI) is set — mirroring the
reference's CI-gated tier."""

import os

import pytest

collect_ignore_glob = []


def pytest_collection_modifyitems(config, items):
    # NOTE: this hook sees the WHOLE session's items, not just this dir's —
    # scope the skip to tests that live under tests/integration/.
    if os.environ.get("AUDIO_TPU_RUN_INTEGRATION") or os.environ.get("CI"):
        return
    here = os.path.dirname(os.path.abspath(__file__))
    skip = pytest.mark.skip(reason="integration tier: set AUDIO_TPU_RUN_INTEGRATION=1 (needs network)")
    for item in items:
        if str(item.fspath).startswith(here):
            item.add_marker(skip)


_FILES = {
    "en": "Lab41-SRI-VOiCES-src-sp0307-ch127535-sg0042.flac",
}


@pytest.fixture
def sample_speech():
    from audio_tpu.utils import download_asset

    return download_asset(f"test-assets/{_FILES['en']}")
