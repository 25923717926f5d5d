"""Multilingual forced alignment (MMS_FA) tutorial.

Counterpart of
/root/reference/examples/tutorials/forced_alignment_for_multilingual_data_tutorial.py:
the MMS_FA bundle aligns romanized text in any language; its model appends a
<star> token for unmodeled frames (reference impl.py:1589-1616).

Offline by default: demonstrates the star-token trellis on a toy emission.
Pass --download to run the real MMS_FA bundle.

    JAX_PLATFORMS=cpu python forced_alignment_for_multilingual_data_tutorial.py
"""

import argparse

import jax.numpy as jnp
import numpy as np

import audio_tpu.functional as F


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--download", action="store_true")
    args = p.parse_args()

    if args.download:
        from audio_tpu import pipelines

        bundle = pipelines.MMS_FA
        model = bundle.get_model(with_star=True)
        tokenizer = bundle.get_tokenizer()
        aligner = bundle.get_aligner()
        wav = jnp.zeros((1, 16000), jnp.float32)
        emission, _ = model(wav)
        tokens = tokenizer("aqui estamos".split())
        spans = aligner(emission[0], tokens)
        print(f"MMS_FA: {len(spans)} word spans")
        return

    # toy star-token demo: vocab = blank, a, b, star. A frame region the
    # transcript doesn't cover gets absorbed by <star>.
    vocab = ["-", "a", "b", "*"]
    rng = np.random.default_rng(0)

    def frame(tok):
        row = np.full((len(vocab),), -8.0)
        row[tok] = -0.05
        return row + 0.01 * rng.standard_normal(len(vocab))

    # audio says: a a  <unmodeled garbage>  b b
    rows = [frame(1), frame(1)] + [
        np.full((len(vocab),), np.log(1.0 / len(vocab))) for _ in range(4)
    ] + [frame(2), frame(2)]
    emission = jnp.asarray(np.stack(rows).astype(np.float32))[None]
    emission = emission - jnp.log(jnp.exp(emission).sum(-1, keepdims=True))

    # align "a * b": the star soaks up the middle frames
    targets = jnp.asarray([[1, 3, 2]], jnp.int32)
    paths, scores = F.forced_align(emission, targets, blank=0)
    print("aligned path:", " ".join(vocab[t] for t in np.asarray(paths[0])))
    spans = F.merge_tokens(paths[0], scores[0], blank=0)
    for s in spans:
        print(f"  {vocab[s.token]!r}: frames [{s.start}, {s.end})")


if __name__ == "__main__":
    main()
