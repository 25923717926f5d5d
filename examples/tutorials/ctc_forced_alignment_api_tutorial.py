"""CTC forced alignment API tutorial.

Counterpart of
/root/reference/examples/tutorials/ctc_forced_alignment_api_tutorial.py:
walks the `functional.forced_align` / `functional.merge_tokens` API on a toy
emission whose frames spell a known token sequence, showing frame-level paths,
token spans, and batched alignment (which the reference's native op cannot do
— its CPU kernel is batch=1 only, forced_align/cpu/compute.cpp:172-177).

    JAX_PLATFORMS=cpu python ctc_forced_alignment_api_tutorial.py
"""

import jax.numpy as jnp
import numpy as np

import audio_tpu.functional as F

TOKENS = ["-", "a", "b", "c", "d"]  # 0 = blank


def peaked_emission(token_ids, frames_per_token=3, vocab=5, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for tok in token_ids:
        for _ in range(frames_per_token):
            row = np.full((vocab,), -8.0)
            row[tok] = -0.05
            rows.append(row + 0.01 * rng.standard_normal(vocab))
        blank = np.full((vocab,), -8.0)
        blank[0] = -0.05
        rows.append(blank)
    e = np.stack(rows).astype(np.float32)
    return e - np.log(np.exp(e).sum(-1, keepdims=True))


def main():
    transcript = [1, 2, 1, 3]  # "a b a c"
    emission = jnp.asarray(peaked_emission(transcript))[None]
    targets = jnp.asarray([transcript], jnp.int32)

    # frame-level alignment: one (token, score) per frame
    paths, scores = F.forced_align(emission, targets, blank=0)
    print("frame path:  ", " ".join(TOKENS[t] for t in np.asarray(paths[0])))
    print("frame scores:", np.round(np.exp(np.asarray(scores[0])), 2))

    # merge repeated frames into TokenSpans
    spans = F.merge_tokens(paths[0], scores[0], blank=0)
    for s in spans:
        print(f"  token {TOKENS[s.token]!r}: frames [{s.start}, {s.end})  score {s.score:.3f}")

    # batched alignment — vmapped Viterbi, no per-utterance loop
    batch = jnp.concatenate([emission, emission], axis=0)
    btargets = jnp.concatenate([targets, targets], axis=0)
    bpaths, _ = F.forced_align(batch, btargets, blank=0)
    assert (np.asarray(bpaths[0]) == np.asarray(bpaths[1])).all()
    print(f"batched: aligned {batch.shape[0]} utterances in one call")


if __name__ == "__main__":
    main()
