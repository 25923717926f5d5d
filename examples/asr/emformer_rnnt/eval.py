"""Emformer RNN-T WER evaluation (TPU-native).

Counterpart of /root/reference/examples/asr/emformer_rnnt/eval.py: runs
RNNTBeamSearch over a LibriSpeech (or TED-LIUM release-3) split and reports
word error rate via ``audio_tpu.functional.edit_distance``.

With no dataset argument it decodes synthetic utterances with a randomly
initialised tiny model — a smoke path that exercises the full
featurize -> beam-search -> detokenize chain:

    JAX_PLATFORMS=cpu python eval.py --synthetic --tiny --utterances 2
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import audio_tpu.functional as F
from audio_tpu.models import RNNTBeamSearch, emformer_rnnt_base

SAMPLE_RATE = 16000
N_MELS = 80
HOP = 160
LABELS = "_ abcdefghijklmnopqrstuvwxyz'"  # 0 = blank


def load_params(model, path):
    seg_ns = model.transcriber.segment_length * model.transcriber.time_reduction_stride
    rc_ns = model.transcriber.right_context_length * model.transcriber.time_reduction_stride
    t0 = 2 * seg_ns + rc_ns
    feats = jnp.zeros((1, t0, N_MELS), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), feats, jnp.asarray([t0]),
        jnp.zeros((1, 3), jnp.int32), jnp.asarray([3]), deterministic=True,
    )
    if path is None:
        return variables
    from audio_tpu.utils.checkpoint import restore_checkpoint

    state = restore_checkpoint(path)
    return {"params": state["params"]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-dir", default=None, help="orbax dir from train.py")
    p.add_argument("--librispeech-path", default=None)
    p.add_argument("--librispeech-url", default="test-clean")
    p.add_argument("--tedlium-path", default=None)
    p.add_argument("--beam-width", type=int, default=10)
    p.add_argument("--greedy", action="store_true",
                   help="batched jitted greedy decode instead of beam search")
    p.add_argument("--utterances", type=int, default=50)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()

    if args.tiny:
        import importlib.util
        import sys

        spec = importlib.util.spec_from_file_location("_tr", __file__.replace("eval.py", "train.py"))
        _tr = importlib.util.module_from_spec(spec)
        sys.modules["_tr"] = _tr
        spec.loader.exec_module(_tr)
        model = _tr.tiny_model(len(LABELS))
    else:
        model = emformer_rnnt_base(len(LABELS))
    seg = model.transcriber.segment_length
    rc = model.transcriber.right_context_length
    stride = model.transcriber.time_reduction_stride

    params = load_params(model, args.checkpoint_dir)
    decoder = RNNTBeamSearch(model, params, blank=0)

    from audio_tpu.transforms import MelSpectrogram

    melspec = MelSpectrogram(sample_rate=SAMPLE_RATE, n_fft=400, hop_length=HOP, n_mels=N_MELS, power=2.0)

    def featurize(wav):
        mel = jnp.log(jnp.swapaxes(melspec(wav[None]), 1, 2) + 1e-6)
        seg_ns, rc_ns = seg * stride, rc * stride
        t = mel.shape[1]
        n_seg = max(1, -(-(t - rc_ns) // seg_ns))
        t_pad = n_seg * seg_ns + rc_ns
        return jnp.pad(mel, ((0, 0), (0, t_pad - t), (0, 0)))[0], min(t, t_pad)

    if args.synthetic or (args.librispeech_path is None and args.tedlium_path is None):
        rng = np.random.default_rng(0)
        samples = [
            ((0.1 * rng.standard_normal(SAMPLE_RATE)).astype(np.float32), "hello world")
            for _ in range(args.utterances)
        ]
    else:
        if args.tedlium_path:
            from audio_tpu.datasets import TEDLIUM

            ds = TEDLIUM(args.tedlium_path, release="release3", subset="test")
        else:
            from audio_tpu.datasets import LIBRISPEECH

            ds = LIBRISPEECH(args.librispeech_path, url=args.librispeech_url)

        def _iter(ds=ds):
            for i in range(min(len(ds), args.utterances)):
                sample = ds[i]  # one decode per utterance
                yield np.asarray(sample[0]).reshape(-1), sample[2]

        samples = _iter()

    total_err = total_words = 0
    t0 = time.time()
    for i, (wav, transcript) in enumerate(samples):
        feats, length = featurize(jnp.asarray(wav))
        if args.greedy:
            from audio_tpu.models import rnnt_greedy_decode

            toks, counts = rnnt_greedy_decode(
                model, params, feats[None], jnp.asarray([length]), blank=0)
            tokens = [int(t) for t in np.asarray(toks)[0, : int(counts[0])] if t > 0]
        else:
            beam = decoder.forward(feats, jnp.asarray(length), beam_width=args.beam_width)
            best = int(np.argmax(np.asarray(beam.scores)))
            n_tok = int(np.asarray(beam.counts)[best])
            tokens = [int(t) for t in np.asarray(beam.tokens)[best, :n_tok] if t > 0]
        hyp_words = "".join(LABELS[t] for t in tokens).split()
        ref_words = transcript.lower().split()
        err = F.edit_distance(hyp_words, ref_words)
        total_err += err
        total_words += len(ref_words)
        if i < 3:
            print(f"[{i}] ref: {' '.join(ref_words[:12])}")
            print(f"[{i}] hyp: {' '.join(hyp_words[:12])}")
    wer = total_err / max(total_words, 1)
    print(f"WER {wer:.4f} over {total_words} words  ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
