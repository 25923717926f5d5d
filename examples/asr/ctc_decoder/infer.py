"""CTC beam-search decoding example (lexicon + LM, and batched prefix search).

Counterpart of the reference examples at
/root/reference/examples/asr/librispeech_ctc_decoder/ (flashlight lexicon
decoder + 4-gram LM; published WERs in its README.md:22-34) and
/root/reference/examples/asr/librispeech_cuda_ctc_decoder/ (GPU batched
prefix beam search).

Two decoders are demonstrated on the same emissions:
  1. `ctc_decoder` — host-side lexicon beam search (native C++ core) with an
     ARPA n-gram LM and trie smearing, the flashlight-text equivalent.
  2. `cuda_ctc_decoder` — the batched, jittable prefix beam search that runs
     the whole batch's lattice on-device (the cuctc equivalent on TPU).

By default emissions come from a tiny synthetic model so the example runs
offline; pass --wav and --bundle to decode real audio with a pretrained
wav2vec2 bundle (downloads the torchaudio checkpoint).

Run:

    JAX_PLATFORMS=cpu python infer.py
"""

from __future__ import annotations

import argparse
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from audio_tpu.models.decoder import ctc_decoder, cuda_ctc_decoder

TOKENS = ["-", "|", "e", "t", "a", "o", "n", "i", "h", "s", "r", "d"]


def synthetic_emissions(transcript_tokens, vocab_size, t_per_token=3, seed=0):
    """Peaked log-prob emissions that spell out `transcript_tokens`."""
    rng = np.random.default_rng(seed)
    frames = []
    for tok in transcript_tokens:
        for _ in range(t_per_token):
            row = np.full((vocab_size,), -8.0)
            row[tok] = -0.05
            frames.append(row + 0.01 * rng.standard_normal(vocab_size))
        blank = np.full((vocab_size,), -8.0)
        blank[0] = -0.05
        frames.append(blank)
    e = np.stack(frames)[None].astype(np.float32)
    return e - np.log(np.exp(e).sum(-1, keepdims=True))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--beam-size", type=int, default=50)
    p.add_argument("--lm-weight", type=float, default=2.0)
    p.add_argument("--word-score", type=float, default=0.0)
    p.add_argument("--wav", default=None, help="decode a real wav with --bundle")
    p.add_argument("--bundle", default="WAV2VEC2_ASR_BASE_960H")
    args = p.parse_args()

    if args.wav:
        import audio_tpu
        from audio_tpu import pipelines

        bundle = getattr(pipelines, args.bundle)
        model = bundle.get_model()
        wav, sr = audio_tpu.load(args.wav)
        if sr != bundle.sample_rate:
            import audio_tpu.functional as F

            wav = F.resample(jnp.asarray(wav), sr, bundle.sample_rate)
        emissions, _ = model(jnp.asarray(wav))
        emissions = np.asarray(jax.nn.log_softmax(emissions, -1))
        tokens = list(bundle.get_labels())
        words = None  # lexicon-free
        lexicon_file = None
    else:
        # spell "the editor" with the toy vocabulary (| = word boundary,
        # which each lexicon spelling ends with)
        text = "the|editor|"
        tok_ids = [TOKENS.index(c) for c in text]
        emissions = synthetic_emissions(tok_ids, len(TOKENS))
        tokens = TOKENS
        words = {"the": "t h e |", "editor": "e d i t o r |"}
        lexicon_file = tempfile.NamedTemporaryFile("w", suffix=".lex", delete=False)
        for w, spelling in words.items():
            lexicon_file.write(f"{w} {spelling}\n")
        lexicon_file.close()

    # 1. host-side lexicon beam search (flashlight-equivalent C++ core)
    decoder = ctc_decoder(
        lexicon=lexicon_file.name if lexicon_file else None,
        tokens=tokens,
        nbest=3,
        beam_size=args.beam_size,
        lm_weight=args.lm_weight,
        word_score=args.word_score,
    )
    results = decoder(emissions)
    best = results[0][0]
    print("lexicon beam search:")
    print(f"  words:  {' '.join(best.words)}")
    print(f"  tokens: {decoder.idxs_to_tokens(best.tokens)}")
    print(f"  score:  {best.score:.3f}")

    # 2. device-resident batched prefix beam search (cuctc-equivalent)
    lengths = jnp.full((emissions.shape[0],), emissions.shape[1], jnp.int32)
    batch_decoder = cuda_ctc_decoder(tokens, nbest=3, beam_size=args.beam_size)
    hypos = batch_decoder(jnp.asarray(emissions), lengths)
    top = hypos[0][0]
    print("batched prefix beam search:")
    print(f"  tokens: {[tokens[i] for i in top.tokens]}")
    print(f"  score:  {top.score:.3f}")


if __name__ == "__main__":
    main()
