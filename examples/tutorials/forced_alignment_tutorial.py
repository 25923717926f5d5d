"""Forced alignment with a wav2vec2 acoustic model.

Counterpart of
/root/reference/examples/tutorials/forced_alignment_tutorial.py: generate
emissions with a wav2vec2 CTC model, align a transcript, and merge the frame
path into word-level time spans.

Offline by default (tiny random model + synthetic audio shows the full API);
pass --download to use the pretrained WAV2VEC2_ASR_BASE_960H bundle on real
speech.

    JAX_PLATFORMS=cpu python forced_alignment_tutorial.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import audio_tpu.functional as F

SAMPLE_RATE = 16000


def tiny_model(vocab):
    from audio_tpu.models import wav2vec2_model

    return wav2vec2_model(
        extractor_mode="group_norm",
        extractor_conv_layer_config=[(32, 10, 5), (32, 3, 2), (32, 2, 2)],
        extractor_conv_bias=False,
        encoder_embed_dim=64,
        encoder_projection_dropout=0.0,
        encoder_pos_conv_kernel=15,
        encoder_pos_conv_groups=1,
        encoder_num_layers=2,
        encoder_num_heads=4,
        encoder_attention_dropout=0.0,
        encoder_ff_interm_features=128,
        encoder_ff_interm_dropout=0.0,
        encoder_dropout=0.0,
        encoder_layer_norm_first=False,
        encoder_layer_drop=0.0,
        aux_num_out=vocab,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--download", action="store_true",
                   help="use the pretrained WAV2VEC2_ASR_BASE_960H bundle")
    p.add_argument("--wav", default=None, help="align this file (with --download)")
    p.add_argument("--transcript", default="i had that curiosity beside me")
    args = p.parse_args()

    if args.download:
        from audio_tpu import pipelines

        bundle = pipelines.WAV2VEC2_ASR_BASE_960H
        model = bundle.get_model()
        labels = list(bundle.get_labels())
        if args.wav:
            import audio_tpu

            wav, sr = audio_tpu.load(args.wav)
            wav = jnp.asarray(wav)
            if sr != bundle.sample_rate:
                wav = F.resample(wav, sr, bundle.sample_rate)
        else:
            wav = jnp.zeros((1, SAMPLE_RATE), jnp.float32)
        emissions, _ = model(wav)
        emission = jax.nn.log_softmax(emissions, -1)
    else:
        labels = ["-", "|"] + list("abcdefghijklmnopqrstuvwxyz'")
        model = tiny_model(len(labels))
        wav = jnp.asarray(0.1 * np.random.default_rng(0).standard_normal((1, SAMPLE_RATE)),
                          jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), wav, deterministic=True)
        emissions, _ = model.apply(variables, wav, deterministic=True)
        emission = jax.nn.log_softmax(emissions, -1)

    print(f"emission: {emission.shape}  (B, frames, vocab {len(labels)})")

    # tokenize the transcript (| = word separator, as in the bundles)
    text = args.transcript.lower().replace(" ", "|")
    dictionary = {c: i for i, c in enumerate(labels)}
    tokens = [dictionary[c] for c in text if c in dictionary]
    targets = jnp.asarray([tokens], jnp.int32)

    paths, scores = F.forced_align(emission, targets, blank=0)
    spans = F.merge_tokens(paths[0], scores[0], blank=0)

    # group token spans into words at the | separators
    frames_per_sec = emission.shape[1] / (wav.shape[-1] / SAMPLE_RATE)
    words, current = [], []
    for s in spans:
        if labels[s.token] == "|":
            if current:
                words.append(current)
            current = []
        else:
            current.append(s)
    if current:
        words.append(current)

    for word_spans in words[:8]:
        word = "".join(labels[s.token] for s in word_spans)
        t0 = word_spans[0].start / frames_per_sec
        t1 = word_spans[-1].end / frames_per_sec
        print(f"  {word:>12s}: {t0:6.2f}s - {t1:6.2f}s")


if __name__ == "__main__":
    main()
