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
crops the mouth (data_prep/detectors/). Pretrained detector weights are
network assets, so the default here is a DETERMINISTIC CENTER CROP of the
lower half of the frame resized to ``--resize`` (96x96), which preserves
the tensor contract end to end; plug a real detector into
``detect_mouth_roi`` for production-quality crops.
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


def detect_mouth_roi(frames: np.ndarray, size: int) -> np.ndarray:
    """Stub detector: center crop of the lower face half, resized to size².

    The production hook: replace with a real face/landmark detector (the
    reference uses RetinaFace, data_prep/detectors/retinaface/).
    """
    t, h, w = frames.shape
    crop = frames[:, h // 2:, w // 4: w - w // 4] if h > 2 and w > 4 else frames
    ys = np.clip((np.arange(size) * crop.shape[1] / size).astype(int), 0, crop.shape[1] - 1)
    xs = np.clip((np.arange(size) * crop.shape[2] / size).astype(int), 0, crop.shape[2] - 1)
    return crop[:, ys][:, :, xs]


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
            video = detect_mouth_roi(video, args.resize)
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
