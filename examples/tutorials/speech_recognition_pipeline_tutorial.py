"""Speech recognition pipeline tutorial.

Counterpart of
/root/reference/examples/tutorials/speech_recognition_pipeline_tutorial.py:
acoustic features -> wav2vec2 CTC emissions -> greedy decoding through a
pipelines bundle.

Offline by default (tiny random model); pass --download to use the
pretrained WAV2VEC2_ASR_BASE_960H checkpoint on a real file via --wav.

    JAX_PLATFORMS=cpu python speech_recognition_pipeline_tutorial.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np


class GreedyCTCDecoder:
    def __init__(self, labels, blank=0):
        self.labels = labels
        self.blank = blank

    def __call__(self, emission: jnp.ndarray) -> str:
        """emission (T, V) -> transcript string."""
        indices = np.asarray(jnp.argmax(emission, axis=-1))
        prev, out = self.blank, []
        for i in indices:
            if i != prev and i != self.blank:
                out.append(self.labels[i])
            prev = i
        return "".join(out).replace("|", " ").strip()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--download", action="store_true")
    p.add_argument("--wav", default=None)
    args = p.parse_args()

    if args.download:
        from audio_tpu import pipelines

        bundle = pipelines.WAV2VEC2_ASR_BASE_960H
        print(f"sample rate: {bundle.sample_rate}, labels: {len(bundle.get_labels())}")
        model = bundle.get_model()
        labels = list(bundle.get_labels())
        if args.wav:
            import audio_tpu
            import audio_tpu.functional as F

            wav, sr = audio_tpu.load(args.wav)
            wav = jnp.asarray(wav)
            if sr != bundle.sample_rate:
                wav = F.resample(wav, sr, bundle.sample_rate)
        else:
            wav = jnp.zeros((1, 16000), jnp.float32)
        emissions, _ = model(wav)
    else:
        from audio_tpu.models import wav2vec2_model

        labels = ["-", "|"] + list("abcdefghijklmnopqrstuvwxyz'")
        model = wav2vec2_model(
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
            aux_num_out=len(labels),
        )
        wav = jnp.asarray(
            0.1 * np.random.default_rng(0).standard_normal((1, 16000)), jnp.float32
        )
        variables = model.init(jax.random.PRNGKey(0), wav, deterministic=True)
        emissions, _ = model.apply(variables, wav, deterministic=True)

    emission = jax.nn.log_softmax(emissions, -1)[0]
    print(f"emission: {emission.shape} (frames, vocab)")

    # intermediate features are also exposed, like extract_features in the
    # reference (models/wav2vec2/model.py:44)
    decoder = GreedyCTCDecoder(labels)
    transcript = decoder(emission)
    print(f"transcript: {transcript!r}")


if __name__ == "__main__":
    main()
