"""AVSR evaluation: batched greedy transducer decode + token error rate.

Counterpart of /root/reference/examples/avsr/eval.py (loads a Lightning
checkpoint, beam-searches each utterance, reports WER).  Decoding here is
the device-resident batched greedy path (``audio_tpu.models
.rnnt_greedy_decode`` — one jitted program for the whole batch, no per-hypo
host sync) over the AV model's ``fuse``/``transcribe``/``predict``/``join``
methods; the error rate is ``audio_tpu.functional.edit_distance`` over
token sequences (synthetic mode has no lexicon, so TER stands in for WER).

    python eval.py --synthetic --tiny --checkpoint-dir ckpts --batches 2
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

import audio_tpu.functional as F
from audio_tpu.models import rnnt_greedy_decode

_HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))
from train import (  # noqa: E402
    BLANK_FIRST_TOKEN,
    AVConformerRNNT,
    LRS3Batches,
    SyntheticBatches,
    tiny_model,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--batches", type=int, default=2)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--num-symbols", type=int, default=1024)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--lrs3-path", default=None,
                   help="preprocessed LRS3 root; evaluates the test subset")
    args = p.parse_args()

    num_symbols = 32 if args.tiny else args.num_symbols
    if args.lrs3_path:
        data = LRS3Batches(args.lrs3_path, args.global_batch, subset="test", seed=7)
        num_symbols = data.num_symbols
    elif args.synthetic:
        data = SyntheticBatches(args.global_batch, num_symbols, seed=7)
    else:
        raise SystemExit("pass --synthetic or --lrs3-path")
    model = tiny_model(num_symbols) if args.tiny else AVConformerRNNT(num_symbols=num_symbols)

    vid0, aud0, vl0, tgt0, tl0 = next(iter(data))
    tgt_in0 = jnp.pad(jnp.asarray(tgt0), ((0, 0), (1, 0)), constant_values=BLANK_FIRST_TOKEN)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(vid0), jnp.asarray(aud0), jnp.asarray(vl0),
        tgt_in0, jnp.asarray(tl0) + 1, deterministic=True,
    )
    if args.checkpoint_dir:
        from audio_tpu.utils import CheckpointManager

        state = CheckpointManager(args.checkpoint_dir).restore(
            args.step, like={"params": variables["params"], "step": 0}
        )
        if state is None:
            raise SystemExit(f"no checkpoint found under {args.checkpoint_dir}")
        variables = {"params": state["params"]}
        print(f"restored step {state['step']}")

    fuse = jax.jit(lambda v, a, vl: model.apply(
        variables, v, a, vl, deterministic=True, method=model.fuse))

    total_err = total_len = 0
    it = iter(data)
    for _ in range(args.batches):
        videos, audios, vid_lens, tgt, tgt_lens = next(it)
        fused, lens = fuse(jnp.asarray(videos), jnp.asarray(audios), jnp.asarray(vid_lens))
        tokens, counts = rnnt_greedy_decode(
            model, variables, fused, lens, blank=BLANK_FIRST_TOKEN, max_tokens=64
        )
        tokens, counts = np.asarray(tokens), np.asarray(counts)
        for i in range(tokens.shape[0]):
            hyp = [int(t) for t in tokens[i, : counts[i]]]
            ref = [int(t) for t in tgt[i, : tgt_lens[i]]]
            total_err += F.edit_distance(hyp, ref)
            total_len += max(len(ref), 1)
    print(f'{{"ter": {total_err / max(total_len, 1):.4f}, '
          f'"tokens": {total_len}, "errors": {total_err}}}')


if __name__ == "__main__":
    main()
