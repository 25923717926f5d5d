"""MotionMouthDetector: detector-driven mouth crops on synthetic clips.

Role counterpart of the reference's detector backends
(/root/reference/examples/avsr/data_prep/detectors/mediapipe/detector.py):
given a clip with a textured face and an articulating mouth, the detector
must localize the mouth region; degenerate clips must fall back to the
deterministic center crop.
"""

import importlib.util
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def prep():
    name = "_avsr_preprocess"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, "/root/repo/examples/avsr/data_prep/preprocess_lrs3.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def _talking_face(t=24, h=64, w=64, mouth=(46, 32), seed=0):
    """Static textured face oval + oscillating mouth patch at ``mouth``."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    face = (((yy - 30) / 22.0) ** 2 + ((xx - 32) / 16.0) ** 2) < 1.0
    base = np.where(face, 0.55, 0.15).astype(np.float32)
    base += face * (rng.random((h, w)).astype(np.float32) - 0.5) * 0.25  # skin texture
    frames = np.repeat(base[None], t, 0).copy()
    my, mx = mouth
    for i in range(t):
        o = 0.35 * np.sin(i * 1.3)  # articulation
        frames[i, my - 3: my + 4, mx - 5: mx + 6] = 0.35 + o
    frames += rng.standard_normal(frames.shape).astype(np.float32) * 0.01
    return np.clip(frames, 0.0, 1.0)


class TestMotionMouthDetector:
    def test_localizes_articulating_mouth(self, prep):
        frames = _talking_face()
        centers, crop_half = prep.MotionMouthDetector()(frames)
        assert centers is not None and crop_half >= 3
        cy, cx = centers.mean(0)
        assert abs(cy - 46) <= 7, (cy, cx)
        assert abs(cx - 32) <= 7, (cy, cx)

    def test_crops_track_a_moving_mouth(self, prep):
        # mouth shifted well off the frame center: the detector-driven crop
        # must still capture the articulation (crop variance over time high),
        # where the naive center crop would see mostly static skin
        frames = _talking_face(mouth=(50, 44))
        roi = prep.detect_mouth_roi(frames, 24, detector="motion")
        assert roi.shape == (24, 24, 24)
        temporal_var = roi.std(axis=0).max()
        assert temporal_var > 0.1, temporal_var

    def test_static_clip_falls_back_to_center(self, prep):
        rng = np.random.default_rng(1)
        frames = np.repeat(rng.random((1, 40, 40)).astype(np.float32) * 0.0, 20, 0)
        got = prep.detect_mouth_roi(frames, 16, detector="motion")
        ref = prep.detect_mouth_roi(frames, 16, detector="center")
        np.testing.assert_array_equal(got, ref)

    def test_center_detector_is_deterministic_crop(self, prep):
        frames = _talking_face()
        got = prep.detect_mouth_roi(frames, 16, detector="center")
        assert got.shape == (24, 16, 16)

    def test_tiny_frames_do_not_crash(self, prep):
        frames = np.random.default_rng(2).random((5, 6, 6)).astype(np.float32)
        got = prep.detect_mouth_roi(frames, 8, detector="motion")
        assert got.shape == (5, 8, 8)
