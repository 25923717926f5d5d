"""LRS3 preprocessing for the TPU AVSR recipe.

Counterpart of /root/reference/examples/avsr/data_prep/preprocess_lrs3.py:
walks the raw LRS3 layout (``data_dir/{trainval,pretrain,test}/<spk>/<utt>``),
extracts per-utterance (mouth-ROI video, 16 kHz audio, transcript), applies
the reference's sanity filters (audio/video sample ratio in [560, 720],
video >= 12 frames, preprocess_lrs3.py:119-123), splits long pretrain
utterances into <= ``seg_duration``-second segments on word timings
(utils.split_file), and writes

    root_dir/labels/lrs3_{subset}_transcript_lengths_seg{N}s.csv
    root_dir/lrs3/video_seg/...npy   audio_seg/...wav   text_seg/...txt

which ``lrs3.LRS3`` consumes directly (decoded fixed-shape tensors — the
right input format for a TPU feed; decode cost is paid once here).

Input decoding:
* ``<utt>.mp4`` — frames and audio are extracted with the ffmpeg CLI
  (rawvideo gray / pcm f32le pipes);
* ``<utt>.npy`` + ``<utt>.wav`` — pre-decoded video frames and audio, used
  when the corpus was already extracted (and by the offline tests).

Mouth ROI: the reference runs a RetinaFace/MediaPipe face detector and
crops the mouth (data_prep/detectors/{retinaface,mediapipe}/detector.py).
Pretrained detector weights are network assets, so the default here is
:class:`MotionMouthDetector` — an in-repo, dependency-free detector that
localizes the face by spatial texture and the mouth by temporal motion
energy, then tracks it with temporally smoothed per-frame crops
(``--detector motion``).  ``--detector center`` selects the deterministic
lower-center crop, which is also the automatic fallback on degenerate
(static / near-uniform) clips.
"""

from __future__ import annotations

import argparse
import glob
import math
import os
import subprocess

import numpy as np

VIDEO_FPS = 25
SAMPLE_RATE = 16000


# --------------------------------------------------------------------------
# decoding
# --------------------------------------------------------------------------

def _ffmpeg_frames(path: str, size: int) -> np.ndarray:
    """Decode video to (T, size, size) float32 grayscale via the ffmpeg CLI."""
    out = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-f", "rawvideo",
         "-pix_fmt", "gray", "-vf", f"scale={size}:{size}", "-"],
        capture_output=True, check=True,
    ).stdout
    frames = np.frombuffer(out, np.uint8)
    t = len(frames) // (size * size)
    return frames[: t * size * size].reshape(t, size, size).astype(np.float32) / 255.0


def _ffmpeg_audio(path: str) -> np.ndarray:
    out = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", path, "-f", "f32le", "-ac", "1",
         "-ar", str(SAMPLE_RATE), "-"],
        capture_output=True, check=True,
    ).stdout
    return np.frombuffer(out, np.float32).copy()


def load_av(path_noext: str, size: int):
    """Returns (video (T, H, W) f32, audio (L,) f32) or (None, None)."""
    if os.path.exists(path_noext + ".npy"):
        vid = np.load(path_noext + ".npy")
        # normalize BEFORE the channel mean: mean(-1) of uint8 yields float64
        # in 0..255 and would skip the /255, leaving values that wrap modulo
        # 256 when the segment is re-quantized to uint8 on save
        if vid.dtype == np.uint8:
            vid = vid.astype(np.float32) / 255.0
        if vid.ndim == 4:  # (T, H, W, C) -> luma
            vid = vid.mean(-1)
        import audio_tpu

        wav, sr = audio_tpu.load(path_noext + ".wav")
        wav = np.asarray(wav, np.float32).reshape(-1)
        if sr != SAMPLE_RATE:
            import audio_tpu.functional as F

            wav = np.asarray(F.resample(wav, sr, SAMPLE_RATE))
        return np.asarray(vid, np.float32), wav
    if os.path.exists(path_noext + ".mp4"):
        return _ffmpeg_frames(path_noext + ".mp4", size), _ffmpeg_audio(path_noext + ".mp4")
    return None, None


def _box_filter(img: np.ndarray, k: int) -> np.ndarray:
    """k×k mean filter via integral image (edges renormalized)."""
    k = max(int(k), 1)
    pad = np.zeros((img.shape[0] + 1, img.shape[1] + 1), np.float64)
    pad[1:, 1:] = np.cumsum(np.cumsum(img, axis=0), axis=1)
    h, w = img.shape
    r = k // 2
    y0 = np.clip(np.arange(h) - r, 0, h)
    y1 = np.clip(np.arange(h) + r + 1, 0, h)
    x0 = np.clip(np.arange(w) - r, 0, w)
    x1 = np.clip(np.arange(w) + r + 1, 0, w)
    s = (pad[y1][:, x1] - pad[y0][:, x1] - pad[y1][:, x0] + pad[y0][:, x0])
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return (s / area).astype(np.float32)


def _resize_nearest(frames: np.ndarray, size: int) -> np.ndarray:
    ys = np.clip((np.arange(size) * frames.shape[1] / size).astype(int), 0, frames.shape[1] - 1)
    xs = np.clip((np.arange(size) * frames.shape[2] / size).astype(int), 0, frames.shape[2] - 1)
    return frames[:, ys][:, :, xs]


def _center_crop(frames: np.ndarray, size: int) -> np.ndarray:
    """Deterministic lower-center crop (the documented fallback)."""
    t, h, w = frames.shape
    crop = frames[:, h // 2:, w // 4: w - w // 4] if h > 2 and w > 4 else frames
    return _resize_nearest(crop, size)


class MotionMouthDetector:
    """Landmark-free mouth-ROI detector — no external dependencies.

    The reference ships RetinaFace/MediaPipe backends whose pretrained
    weights are network assets (data_prep/detectors/*/detector.py); this
    in-repo detector keeps the same two-stage contract — per-clip region
    proposal, then temporally smoothed per-frame crops — from image
    statistics instead of a learned face model:

    1. **face box** — the dominant spatial-texture blob: local absolute
       deviation from a smoothed frame, box-filtered and thresholded at
       half its peak (faces are high-texture against background);
    2. **mouth center** — the dominant temporal-motion blob (mean absolute
       frame difference, box-filtered) restricted to the lower half of the
       face box: during speech the articulating mouth is the most-moving
       facial region;
    3. **tracking** — per-frame motion centroid inside a window around the
       clip-level center, EMA-smoothed over time (the reference linearly
       interpolates missed detections — same spirit);
    4. fixed-size crops around each frame's center.

    Clips with no usable motion/texture signal (static or near-uniform)
    report ``None`` centers and callers fall back to the center crop.
    """

    def __init__(self, mouth_window_frac: float = 0.18, ema: float = 0.6):
        self.mouth_window_frac = mouth_window_frac
        self.ema = ema

    def __call__(self, frames: np.ndarray):
        """frames (T, H, W) f32 in [0, 1] → (centers (T, 2) f32 [y, x],
        crop_half int) or (None, None) when the signal is degenerate."""
        t, h, w = frames.shape
        if t < 3 or h < 8 or w < 8:
            return None, None
        k_tex = max(h // 8, 3)
        k_mouth = max(int(h * self.mouth_window_frac), 3)

        # 1. face box from texture
        mean_frame = frames.mean(0)
        texture = _box_filter(np.abs(mean_frame - _box_filter(mean_frame, k_tex)), k_tex)
        if texture.max() < 1e-4:
            return None, None
        mask = texture >= 0.5 * texture.max()
        ys, xs = np.nonzero(mask)
        fy0, fy1, fx0, fx1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1

        # 2. clip-level mouth center from motion in the lower face half
        diffs = np.abs(np.diff(frames, axis=0)).mean(0)
        motion = _box_filter(diffs, k_mouth)
        if motion.max() < 1e-5:
            return None, None
        lower = np.full_like(motion, -np.inf)
        my0 = (fy0 + fy1) // 2
        lower[my0:fy1, fx0:fx1] = motion[my0:fy1, fx0:fx1]
        if not np.isfinite(lower.max()):
            return None, None
        cy, cx = np.unravel_index(int(np.argmax(lower)), lower.shape)

        # 3. per-frame tracking: motion centroid inside a window around the
        # clip-level center, EMA-smoothed
        win = k_mouth
        centers = np.zeros((t, 2), np.float32)
        prev = np.array([cy, cx], np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        for i in range(t):
            d = np.abs(frames[i] - frames[i - 1]) if i else np.abs(frames[1] - frames[0])
            m = _box_filter(d, max(k_mouth // 2, 2))
            y0, y1 = max(cy - win, 0), min(cy + win + 1, h)
            x0, x1 = max(cx - win, 0), min(cx + win + 1, w)
            patch = m[y0:y1, x0:x1]
            tot = patch.sum()
            if tot > 1e-6:
                py = (patch * yy[y0:y1, x0:x1]).sum() / tot
                px = (patch * xx[y0:y1, x0:x1]).sum() / tot
                cur = np.array([py, px], np.float32)
            else:
                cur = prev
            prev = self.ema * prev + (1 - self.ema) * cur
            centers[i] = prev
        crop_half = max(int(0.35 * max(fy1 - fy0, fx1 - fx0)), 3)
        return centers, crop_half


def detect_mouth_roi(frames: np.ndarray, size: int, detector: str = "motion") -> np.ndarray:
    """Mouth-ROI crops (T, size, size) from raw grayscale frames.

    ``detector="motion"`` (default) runs :class:`MotionMouthDetector` with
    automatic fallback to the lower-center crop on degenerate clips;
    ``detector="center"`` forces the deterministic crop.  Role counterpart
    of the reference's detector-driven ``video_process`` pipeline
    (/root/reference/examples/avsr/data_prep/detectors/mediapipe/video_process.py).
    """
    t, h, w = frames.shape
    if detector == "motion":
        centers, crop_half = MotionMouthDetector()(frames)
        if centers is not None:
            out = np.empty((t, 2 * crop_half, 2 * crop_half), np.float32)
            for i in range(t):
                cy = int(round(np.clip(centers[i, 0], crop_half, h - crop_half))) if h >= 2 * crop_half else h // 2
                cx = int(round(np.clip(centers[i, 1], crop_half, w - crop_half))) if w >= 2 * crop_half else w // 2
                y0, x0 = max(cy - crop_half, 0), max(cx - crop_half, 0)
                patch = frames[i, y0:y0 + 2 * crop_half, x0:x0 + 2 * crop_half]
                # pad ragged borders (tiny frames) to the fixed crop size
                ph, pw = patch.shape
                if (ph, pw) != (2 * crop_half, 2 * crop_half):
                    full = np.zeros((2 * crop_half, 2 * crop_half), np.float32)
                    full[:ph, :pw] = patch
                    patch = full
                out[i] = patch
            return _resize_nearest(out, size)
    return _center_crop(frames, size)


# --------------------------------------------------------------------------
# transcript segmentation (reference utils.split_file)
# --------------------------------------------------------------------------

def parse_transcript(txt_path: str):
    """Returns (content, word_timings or None). LRS3 txts carry a
    'Text:  ...' header line and optionally 'WORD START END ASDSCORE'
    timing rows (pretrain subset)."""
    lines = open(txt_path).read().splitlines()
    content = None
    timings = []
    in_words = False
    for line in lines:
        if line.startswith("Text:"):
            content = line[len("Text:"):].strip()
        elif line.strip().startswith("WORD "):
            in_words = True
        elif in_words and line.strip():
            parts = line.split()
            if len(parts) >= 3:
                try:
                    timings.append((parts[0], float(parts[1]), float(parts[2])))
                except ValueError:
                    pass
    if content is None and lines:
        content = lines[0].strip()
    content = (content or "").replace("{", "").replace("}", "")
    return content, (timings or None)


def split_on_timings(timings, max_seconds: float):
    """Greedy word packing into <= max_seconds windows: list of
    (text, start_s, end_s)."""
    segs, cur, start = [], [], None
    for word, s, e in timings:
        if start is None:
            start = s
        if e - start > max_seconds and cur:
            segs.append((" ".join(w for w, *_ in cur), cur[0][1], cur[-1][2]))
            cur, start = [], s
        cur.append((word, s, e))
    if cur:
        segs.append((" ".join(w for w, *_ in cur), cur[0][1], cur[-1][2]))
    return segs


# --------------------------------------------------------------------------

def main():
    p = argparse.ArgumentParser(description="LRS3 preprocessing (TPU recipe)")
    p.add_argument("--data-dir", required=True, help="raw LRS3 root")
    p.add_argument("--root-dir", required=True, help="output root")
    p.add_argument("--subset", required=True, choices=["train", "test"])
    p.add_argument("--dataset", default="lrs3")
    p.add_argument("--seg-duration", type=int, default=16)
    p.add_argument("--resize", type=int, default=96)
    p.add_argument("--detector", default="motion", choices=["motion", "center"],
                   help="mouth-ROI detector: 'motion' (in-repo texture+motion "
                        "detector with center-crop fallback) or 'center' "
                        "(deterministic lower-center crop)")
    p.add_argument("--groups", type=int, default=1)
    p.add_argument("--job-index", type=int, default=0)
    args = p.parse_args()

    if args.subset == "test":
        patterns = [os.path.join(args.data_dir, "test", "**")]
    else:
        patterns = [os.path.join(args.data_dir, "trainval", "**"),
                    os.path.join(args.data_dir, "pretrain", "**")]
    stems = sorted({
        os.path.splitext(f)[0]
        for pat in patterns
        for ext in (".mp4", ".npy")
        for f in glob.glob(os.path.join(pat, "*" + ext), recursive=True)
    })
    unit = math.ceil(len(stems) / args.groups)
    stems = stems[args.job_index * unit: (args.job_index + 1) * unit]

    label_name = f"{args.dataset}_{args.subset}_transcript_lengths_seg{args.seg_duration}s"
    if args.groups > 1:
        label_name += f".{args.groups}.{args.job_index}"
    label_path = os.path.join(args.root_dir, "labels", label_name + ".csv")
    os.makedirs(os.path.dirname(label_path), exist_ok=True)

    import audio_tpu

    n_written = 0
    with open(label_path, "w") as label_f:
        for stem in stems:
            video, audio = load_av(stem, args.resize)
            if video is None or not os.path.exists(stem + ".txt"):
                continue
            video = detect_mouth_roi(video, args.resize, detector=args.detector)
            content, timings = parse_transcript(stem + ".txt")
            is_pretrain = f"{os.sep}pretrain{os.sep}" in stem
            if is_pretrain and timings:
                segs = split_on_timings(timings, float(args.seg_duration))
            else:
                segs = [(content, 0.0, len(video) / VIDEO_FPS)]

            rel = os.path.relpath(stem, args.data_dir)
            for i, (text, s, e) in enumerate(segs):
                v = video[int(s * VIDEO_FPS): int(np.ceil(e * VIDEO_FPS))]
                a = audio[int(s * SAMPLE_RATE): int(e * SAMPLE_RATE)]
                # reference sanity filters (preprocess_lrs3.py:119-123)
                if len(v) < 12 or a.size == 0 or not text:
                    continue
                ratio = a.size / len(v)
                if not (560.0 <= ratio <= 720.0):
                    continue
                seg_rel = rel + (f"_{i:02d}" if len(segs) > 1 else "")
                vp = os.path.join(args.root_dir, args.dataset, "video_seg", seg_rel + ".npy")
                ap = os.path.join(args.root_dir, args.dataset, "audio_seg", seg_rel + ".wav")
                tp = os.path.join(args.root_dir, args.dataset, "text_seg", seg_rel + ".txt")
                for q in (vp, ap, tp):
                    os.makedirs(os.path.dirname(q), exist_ok=True)
                np.save(vp, (np.clip(v, 0.0, 1.0) * 255).astype(np.uint8))
                audio_tpu.save(ap, a[None], SAMPLE_RATE)
                with open(tp, "w") as f:
                    f.write(text + "\n")
                label_f.write(
                    f"{args.dataset},{os.path.join('video_seg', seg_rel + '.npy')},"
                    f"{len(v)},{len(text)}\n"
                )
                n_written += 1
    print(f"wrote {n_written} segments -> {label_path}")


if __name__ == "__main__":
    main()
