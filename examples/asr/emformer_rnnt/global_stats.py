"""Generate global feature statistics (mean / invstddev) for RNN-T training.

Counterpart of /root/reference/examples/asr/emformer_rnnt/global_stats.py:
streams the training set, computes the running mean and standard deviation
of piecewise-linear-log mel features (the exact transform the pipeline's
``GlobalStatsNormalization`` consumes,
audio_tpu/pipelines/rnnt_pipeline.py:33-86), and writes the
``{"mean": [...], "invstddev": [...]}`` JSON that ``train.py`` /
``RNNTBundle.get_feature_extractor`` load.

The accumulation runs on device: each utterance's mel features reduce to
(sum, sum-of-squares, count) in one jitted call, so only three tiny arrays
cross the host boundary per utterance (the reference iterates sample by
sample in torch on the host, global_stats.py:49-67).

    python global_stats.py --model-type librispeech --dataset-path /data/LibriSpeech
    python global_stats.py --synthetic --output-path global_stats.json
"""

from __future__ import annotations

import argparse
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from audio_tpu.pipelines.rnnt_pipeline import _gain, _piecewise_linear_log
from audio_tpu.transforms import MelSpectrogram

SAMPLE_RATE = 16000
N_MELS = 80

_melspec = MelSpectrogram(sample_rate=SAMPLE_RATE, n_fft=400, hop_length=160,
                          n_mels=N_MELS, power=2.0)


@jax.jit
def _moments(wav):
    mel = jnp.swapaxes(_melspec(wav[None]), 1, 2)[0]  # (T, n_mels)
    scaled = _piecewise_linear_log(mel * _gain)
    return scaled.sum(0), jnp.square(scaled).sum(0), scaled.shape[0]


def generate_statistics(waveforms):
    """Running (mean, stddev) over an iterable of 1-D float32 waveforms."""
    e_x = np.zeros(N_MELS, np.float64)
    e_x2 = np.zeros(N_MELS, np.float64)
    n = 0
    for idx, wav in enumerate(waveforms):
        s, sq, m = _moments(jnp.asarray(wav, jnp.float32))
        s, sq, m = np.asarray(s, np.float64), np.asarray(sq, np.float64), int(m)
        e_x = e_x * (n / (n + m)) + s / (n + m)
        e_x2 = e_x2 * (n / (n + m)) + sq / (n + m)
        n += m
        if idx % 100 == 0:
            print(f"processed {idx}", flush=True)
    return e_x, np.sqrt(np.maximum(e_x2 - e_x**2, 1e-12))


def _dataset_waveforms(args):
    if args.synthetic:
        rng = np.random.default_rng(0)
        for _ in range(args.synthetic_utterances):
            yield rng.standard_normal(int(rng.integers(16000, 64000))).astype(np.float32) * 0.1
        return
    from audio_tpu.datasets import LIBRISPEECH, TEDLIUM

    if args.model_type == "librispeech":
        urls = ["train-clean-100", "train-clean-360", "train-other-500"]
        for url in urls:
            ds = LIBRISPEECH(str(args.dataset_path), url=url, download=False)
            for i in range(len(ds)):
                yield np.asarray(ds[i][0]).reshape(-1)
    elif args.model_type == "tedlium3":
        ds = TEDLIUM(str(args.dataset_path), release="release3", subset="train")
        for i in range(len(ds)):
            yield np.asarray(ds[i][0]).reshape(-1)
    else:
        raise SystemExit(f"unsupported --model-type {args.model_type} without MuST-C assets")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-type", choices=("librispeech", "tedlium3", "mustc"),
                   default="librispeech")
    p.add_argument("--dataset-path", type=pathlib.Path, default=None)
    p.add_argument("--output-path", type=pathlib.Path,
                   default=pathlib.Path("global_stats.json"))
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-utterances", type=int, default=8)
    args = p.parse_args()
    if not args.synthetic and args.dataset_path is None:
        raise SystemExit("--dataset-path is required without --synthetic")

    mean, stddev = generate_statistics(_dataset_waveforms(args))
    blob = {"mean": mean.tolist(), "invstddev": (1.0 / stddev).tolist()}
    args.output_path.write_text(json.dumps(blob, indent=2))
    print(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
