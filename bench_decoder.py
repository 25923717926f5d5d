"""CTC decode throughput benchmarks (VERDICT r1 item 7).

Reference table (/root/reference/examples/asr/librispeech_cuda_ctc_decoder/
README.md:29-37, LibriSpeech test-other = 2,939 utterances / ~5.34 h audio,
spm-500 vocab, beam 10, B=4, Xeon E5-2698v4 + V100):

    flashlight CPU lexicon decoder : 28.61 s  (~9.7 ms/utt, RTF ~1.5e-3)
    CUDA prefix beam search        :  2.57 s  (~0.87 ms/utt, RTF ~1.3e-4)

Two workloads, printed as JSON lines:

  a) host C++ lexicon+LM beam decode (models/decoder/_ctc_decoder.py +
     csrc/ctc_beam.cpp + native n-gram LM) — the flashlight-text analogue.
     Synthetic emissions with a planted transcript, char tokens, 1k-word
     lexicon, trigram ARPA LM built from the same vocabulary.
  b) batched device prefix beam search (models/decoder/_batch_ctc_decoder.py)
     — the cuctc analogue — on whatever backend is active (TPU under axon,
     pass --cpu to force host). spm-500-like vocab, beam 10.

Run:  timeout 1800 python bench_decoder.py [--cpu] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import time

import numpy as np

_UTT_SECONDS = 6.54  # LibriSpeech test-other mean (5.34 h / 2939 utts)


def _words(n, rng):
    letters = "abcdefghijklmnopqrstuvwxyz"
    out = set()
    while len(out) < n:
        out.add("".join(rng.choice(list(letters), size=rng.integers(3, 8))))
    return sorted(out)


def _build_assets(tmp, n_words=1000, seed=0):
    """Lexicon + trigram ARPA over a synthetic vocabulary."""
    rng = np.random.default_rng(seed)
    words = _words(n_words, rng)
    lex = tmp / "lexicon.txt"
    lex.write_text("".join(f"{w} {' '.join(w)} |\n" for w in words))
    tokens = ["-", "|"] + sorted(set("abcdefghijklmnopqrstuvwxyz"))
    tok = tmp / "tokens.txt"
    tok.write_text("".join(t + "\n" for t in tokens))

    # trigram ARPA: unigrams over all words + random bigrams/trigrams
    n_bi, n_tri = 4000, 2000
    bi = [(words[rng.integers(n_words)], words[rng.integers(n_words)]) for _ in range(n_bi)]
    tri = [(words[rng.integers(n_words)], words[rng.integers(n_words)],
            words[rng.integers(n_words)]) for _ in range(n_tri)]
    lines = ["\\data\\", f"ngram 1={n_words + 3}", f"ngram 2={n_bi}", f"ngram 3={n_tri}", "",
             "\\1-grams:"]
    uni_p = math.log10(1.0 / n_words)
    for w in ["<s>", "</s>", "<unk>"] + words:
        lines.append(f"{uni_p:.4f}\t{w}\t-0.30103")
    lines.append("")
    lines.append("\\2-grams:")
    for a, b in bi:
        lines.append(f"-1.0000\t{a} {b}\t-0.30103")
    lines.append("")
    lines.append("\\3-grams:")
    for a, b, c in tri:
        lines.append(f"-0.8000\t{a} {b} {c}")
    lines += ["", "\\end\\", ""]
    arpa = tmp / "lm.arpa"
    arpa.write_text("\n".join(lines))
    return str(lex), str(tok), str(arpa), tokens, words


def _emissions(tokens, words, t_frames, n_utts, seed=1):
    """Peaked synthetic emissions spelling real lexicon words."""
    rng = np.random.default_rng(seed)
    v = len(tokens)
    tok_idx = {t: i for i, t in enumerate(tokens)}
    ems = []
    for _ in range(n_utts):
        seq = []
        for w in rng.choice(words, size=8):
            seq.extend(tok_idx[c] for c in w)
            seq.append(1)  # "|"
        e = rng.standard_normal((t_frames, v)).astype(np.float32) * 0.5
        pos = np.linspace(2, t_frames - 3, len(seq)).astype(int)
        for p, s in zip(pos, seq):
            e[p, s] += 6.0
        e = e - np.log(np.exp(e).sum(-1, keepdims=True))
        ems.append(e)
    return ems


def bench_host_lexicon(sink, tmp):
    from audio_tpu.models.decoder import ctc_decoder

    lex, tok, arpa, tokens, words = _build_assets(tmp)
    n_utts, t_frames = 64, 327  # 6.54 s at 50 fps
    ems = _emissions(tokens, words, t_frames, n_utts)

    for beam in (10, 50, 500):
        dec = ctc_decoder(lex, tok, lm=arpa, beam_size=beam, lm_weight=2.0,
                          word_score=0.0, nbest=1)
        dec([ems[0]])  # warm the native build/cache
        t0 = time.perf_counter()
        out = dec(ems)
        wall = time.perf_counter() - t0
        assert len(out) == n_utts and out[0][0].words
        per_utt = wall / n_utts
        sink.append({
            "metric": f"ctc_lexicon_decode_ms_per_utt_beam{beam}",
            "value": round(per_utt * 1e3, 2),
            "unit": "ms/utterance (char tokens, 1k lexicon, trigram LM, C++ core)",
            "detail": {
                "utterances_per_s": round(1 / per_utt, 1),
                "rtf": round(per_utt / _UTT_SECONDS, 6),
                "frames": t_frames, "n_utts": n_utts,
                "ref_flashlight_cpu_ms_per_utt_beam10": 9.7,
            },
        })
        print(json.dumps(sink[-1]), flush=True)


def bench_device_prefix_beam(sink):
    import jax
    import jax.numpy as jnp

    from audio_tpu.models.decoder._batch_ctc_decoder import batch_ctc_prefix_beam_search

    # B=64 -> 1.10 ms/utt, B=256 -> 0.54, B=1024 -> 0.43 on one v5e chip
    # (vs cuctc's 0.87 ms/utt on a V100): batch amortizes the scan overhead
    B, T, V, BEAM = 1024, 327, 500, 10
    rng = np.random.default_rng(2)
    lp = jax.nn.log_softmax(jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32) * 2), -1)
    lengths = jnp.full((B,), T, jnp.int32)

    run = jax.jit(lambda lp, ln: batch_ctc_prefix_beam_search(lp, ln, BEAM)[2])
    np.asarray(run(lp, lengths))  # compile + true sync (value readback)
    times = []
    for i in range(5):
        lp_i = jax.block_until_ready(lp * (1.0 + 1e-6 * (i + 1)))
        t0 = time.perf_counter()
        np.asarray(run(lp_i, lengths))
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))
    per_utt = wall / B
    sink.append({
        "metric": "ctc_batch_prefix_beam_ms_per_utt",
        "value": round(per_utt * 1e3, 3),
        "unit": f"ms/utterance (B={B}, T={T}, V={V}, beam {BEAM}, device-resident)",
        "detail": {
            "utterances_per_s": round(1 / per_utt, 1),
            "rtf": round(per_utt / _UTT_SECONDS, 7),
            "batch_wall_ms": round(wall * 1e3, 1),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "ref_cuctc_v100_ms_per_utt_beam10": 0.87,
        },
    })
    print(json.dumps(sink[-1]), flush=True)


def main():
    import pathlib
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, choices=[None, "host", "device"])
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    sink = []
    with tempfile.TemporaryDirectory() as td:
        if args.only in (None, "host"):
            bench_host_lexicon(sink, pathlib.Path(td))
    if args.only in (None, "device"):
        bench_device_prefix_beam(sink)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(sink, f, indent=1)


if __name__ == "__main__":
    main()
