"""SSL data pipeline: bucketized batching + crop/pad collation (numpy).

Counterpart of /root/reference/examples/self_supervised_learning/data_modules/
_utils.py — ``BucketizeBatchSampler`` (:15-145), ``DistributedBatchSampler``
(:147-230), ``_crop_audio_label`` (:325-369), ``CollateFnHubert`` (:370-436)
and ``CollateFnWav2Vec2`` (:437-488) — re-designed for a jit-compiled TPU
trainer:

* numpy end to end (no torch DataLoader); a sampler is just an iterable of
  index lists, a collate fn maps samples -> stacked arrays;
* ``bucket_pad=True`` pads every batch to its bucket's upper length boundary
  instead of the batch max, so XLA compiles ONE program per bucket rather
  than one per distinct batch shape — the TPU-native replacement for the
  reference's dynamic per-batch padding;
* sharding for data parallelism is a pure index transform
  (``shard_batches``), mirroring DistributedBatchSampler's rank slicing.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# wav2vec2/HuBERT conv feature extractor geometry (25 ms kernel, 20 ms stride)
_KERNEL_MS = 25
_STRIDE_MS = 20
_SAMPLES_PER_MS = 16  # 16 kHz


class BucketizeBatchSampler:
    """Length-bucketized batch sampler.

    Semantics follow the reference sampler: samples outside
    ``[min_len, max_len]`` are dropped, the rest are ordered into
    ``num_buckets`` evenly spaced length intervals, and batches are formed
    inside buckets either by ``batch_size`` (count) or ``max_token_count``
    (sum of lengths).  ``shuffle`` reshuffles within buckets each epoch with
    a deterministic per-epoch seed (call :meth:`set_epoch`).
    """

    def __init__(
        self,
        lengths: Sequence[int],
        num_buckets: int,
        min_len: int = 0,
        max_len: Optional[int] = None,
        max_token_count: Optional[int] = None,
        batch_size: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ) -> None:
        if max_len is None:
            max_len = int(max(lengths))
        if not 0 <= min_len <= max_len:
            raise ValueError("min_len must be non-negative and <= max_len")
        if (max_token_count is None) == (batch_size is None):
            raise ValueError("set exactly one of max_token_count / batch_size")
        if max_token_count is not None and max_len > max_token_count:
            raise ValueError("max_token_count must cover the longest kept sample")

        kept = [(l, i) for i, l in enumerate(lengths) if min_len <= l <= max_len]
        if not kept:
            raise ValueError("no samples remain after length filtering")
        kept.sort()
        self._lengths = np.asarray([l for l, _ in kept])
        self._indices = np.asarray([i for _, i in kept])
        self.max_token_count = max_token_count
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_buckets = num_buckets
        self.min_len, self.max_len = min_len, max_len

        boundaries = np.linspace(min_len - 1, max_len + 1, num_buckets + 1)
        self._bucket_of = np.digitize(self._lengths, boundaries)
        self._boundaries = boundaries
        self._epoch = 0
        self._rebuild()

    def bucket_upper_len(self, bucket_id: int) -> int:
        """Upper length boundary of a bucket (the bucket_pad target)."""
        return int(math.ceil(self._boundaries[min(bucket_id, self.num_buckets)]))

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        self._rebuild()

    def _rebuild(self) -> None:
        rng = np.random.default_rng(self.seed + self._epoch)
        self.iter_list: List[List[int]] = []
        self.bucket_ids: List[int] = []
        cap = self.max_token_count if self.max_token_count else self.batch_size
        for b in sorted(set(self._bucket_of.tolist())):
            pos = np.nonzero(self._bucket_of == b)[0]
            if self.shuffle:
                pos = pos[rng.permutation(len(pos))]
            batch, total = [], 0
            for p in pos:
                w = int(self._lengths[p]) if self.max_token_count else 1
                if total + w <= cap:
                    batch.append(int(self._indices[p]))
                    total += w
                else:
                    self.iter_list.append(batch)
                    self.bucket_ids.append(b)
                    batch, total = [int(self._indices[p])], w
            if batch and (self.max_token_count or not self.drop_last):
                self.iter_list.append(batch)
                self.bucket_ids.append(b)

    def __iter__(self):
        return iter(self.iter_list)

    def __len__(self):
        return len(self.iter_list)


def shard_batches(batches: List[List[int]], num_replicas: int, rank: int,
                  drop_incomplete: bool = True) -> List[List[int]]:
    """Rank slicing of a batch list (DistributedBatchSampler analogue)."""
    if not 0 <= rank < num_replicas:
        raise ValueError(f"rank {rank} out of range for {num_replicas} replicas")
    n = (len(batches) // num_replicas) * num_replicas if drop_incomplete else len(batches)
    return [batches[i] for i in range(rank, n, num_replicas)]


def _label_window(frame_offset: int, num_frames: int) -> Tuple[int, int]:
    k = _KERNEL_MS * _SAMPLES_PER_MS
    s = _STRIDE_MS * _SAMPLES_PER_MS
    label_offset = max(math.floor((frame_offset - k) / s) + 1, 0)
    num_label = math.floor((num_frames - k) / s) + 1
    return label_offset, num_label


def crop_audio_label(
    waveform: np.ndarray,
    label: Optional[np.ndarray],
    length: int,
    num_frames: int,
    rand_crop: bool,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, Optional[np.ndarray], int]:
    """Synchronous random crop of a waveform and its frame labels."""
    frame_offset = 0
    t = waveform.shape[-1]
    if t > num_frames and rand_crop:
        frame_offset = int(rng.integers(t - num_frames))
    elif t < num_frames:
        num_frames = t
    if label is not None:
        lo, nl = _label_window(frame_offset, num_frames)
        label = label[lo:lo + nl]
    return waveform[..., frame_offset:frame_offset + num_frames], label, num_frames


def _pad_stack(arrs: List[np.ndarray], out_len: int, dtype) -> np.ndarray:
    out = np.zeros((len(arrs), out_len), dtype)
    for i, a in enumerate(arrs):
        out[i, : a.shape[-1]] = a
    return out


@dataclass
class CollateFnHubert:
    """(waveform, label, length) samples -> (waveforms, labels, lengths).

    ``pad=False`` crops to the batch minimum (reference default);
    ``pad=True`` zero-pads to the batch maximum; ``pad_to`` (TPU twist)
    zero-pads to a FIXED length (e.g. the bucket boundary) for stable jit
    shapes.  ``feature_type="mfcc"`` downsamples 10 ms labels to the 20 ms
    transformer rate.
    """

    feature_type: str = "hubert"
    pad: bool = False
    rand_crop: bool = True
    pad_to: Optional[int] = None
    seed: int = 0
    _rng: np.random.Generator = field(init=False, repr=False)

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def __call__(self, batch: List[Tuple[np.ndarray, np.ndarray, int]]) -> Dict:
        num_frames = (max if (self.pad or self.pad_to) else min)(
            s[0].shape[-1] for s in batch
        )
        waveforms, labels, lengths = [], [], []
        for waveform, label, length in batch:
            if self.feature_type == "mfcc":
                label = label[::2]
            waveform, label, length = crop_audio_label(
                waveform, label, length, num_frames, self.rand_crop, self._rng
            )
            waveforms.append(np.asarray(waveform, np.float32))
            labels.append(np.asarray(label, np.int32))
            lengths.append(length)
        out_len = self.pad_to or num_frames
        _, max_label = _label_window(0, out_len)
        return {
            "waveforms": _pad_stack(waveforms, out_len, np.float32),
            "labels": _pad_stack(labels, max_label, np.int32),
            "lengths": np.asarray(lengths, np.int32),
        }


@dataclass
class CollateFnWav2Vec2:
    """(waveform, length) samples -> (waveforms, lengths); crop or pad."""

    pad: bool = False
    rand_crop: bool = True
    pad_to: Optional[int] = None
    seed: int = 0
    _rng: np.random.Generator = field(init=False, repr=False)

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    def __call__(self, batch: List[Tuple[np.ndarray, int]]) -> Dict:
        num_frames = (max if (self.pad or self.pad_to) else min)(
            s[0].shape[-1] for s in batch
        )
        waveforms, lengths = [], []
        for waveform, length in batch:
            waveform, _, length = crop_audio_label(
                waveform, None, length, num_frames, self.rand_crop, self._rng
            )
            waveforms.append(np.asarray(waveform, np.float32))
            lengths.append(length)
        out_len = self.pad_to or num_frames
        return {
            "waveforms": _pad_stack(waveforms, out_len, np.float32),
            "lengths": np.asarray(lengths, np.int32),
        }
