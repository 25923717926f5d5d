"""ASR inference with the lexicon CTC beam-search decoder.

Counterpart of
/root/reference/examples/tutorials/asr_inference_with_ctc_decoder_tutorial.py:
beam search with a lexicon, trie smearing and an ARPA n-gram language model —
the flashlight-text-equivalent native decoder — compared against greedy
decoding, plus the incremental decode_begin/decode_step/decode_end API and
hyperparameter effects.

    JAX_PLATFORMS=cpu python asr_inference_with_ctc_decoder_tutorial.py
"""

import tempfile

import jax.numpy as jnp
import numpy as np

from audio_tpu.models.decoder import ctc_decoder

TOKENS = ["-", "|", "e", "t", "a", "o", "n", "i", "h", "s", "r", "d", "w", "l"]


def peaked_emissions(text, noise=0.35, seed=0):
    """Emissions that mostly spell `text` with injected confusion."""
    rng = np.random.default_rng(seed)
    rows = []
    for ch in text:
        tok = TOKENS.index(ch)
        for _ in range(2):
            row = np.full((len(TOKENS),), -6.0)
            row[tok] = -0.1
            rows.append(row + noise * rng.standard_normal(len(TOKENS)))
        blank = np.full((len(TOKENS),), -6.0)
        blank[0] = -0.1
        rows.append(blank + noise * rng.standard_normal(len(TOKENS)))
    e = np.stack(rows)[None].astype(np.float32)
    return e - np.log(np.exp(e).sum(-1, keepdims=True))


def main():
    emissions = peaked_emissions("the|answer|is|hello|world|")

    lexicon = {
        "the": "t h e |", "answer": "a n s w e r |", "is": "i s |",
        "hello": "h e l l o |", "world": "w o r l d |", "hell": "h e l l |",
        "words": "w o r d s |",
    }
    lex_file = tempfile.NamedTemporaryFile("w", suffix=".lex", delete=False)
    for w, sp in lexicon.items():
        lex_file.write(f"{w} {sp}\n")
    lex_file.close()

    # greedy baseline
    idx = np.asarray(jnp.argmax(jnp.asarray(emissions[0]), -1))
    prev, greedy = 0, []
    for i in idx:
        if i != prev and i != 0:
            greedy.append(TOKENS[i])
        prev = i
    print("greedy: ", "".join(greedy).replace("|", " "))

    # lexicon-constrained beam search
    decoder = ctc_decoder(
        lexicon=lex_file.name, tokens=TOKENS, nbest=3,
        beam_size=50, word_score=-0.26,
    )
    hypos = decoder(emissions)
    for rank, h in enumerate(hypos[0]):
        print(f"beam[{rank}]: {' '.join(h.words):<30s} score {h.score:.2f}")

    # hyperparameters: a tight beam hurts, like the reference shows
    for beam in (1, 5, 50):
        small = ctc_decoder(lexicon=lex_file.name, tokens=TOKENS, beam_size=beam)
        best = small(emissions)[0][0]
        print(f"beam_size {beam:3d}: {' '.join(best.words)}")

    # incremental (streaming) decoding
    decoder.decode_begin()
    for t in range(0, emissions.shape[1], 10):
        decoder.decode_step(emissions[0, t : t + 10])  # feed 10-frame chunks
    decoder.decode_end()
    final = decoder.get_final_hypothesis()[0]
    print("incremental:", " ".join(final.words))


if __name__ == "__main__":
    main()
