"""AOT-export an ASR transcriber for deployment.

Counterpart of the reference's C++ TorchScript example
(/root/reference/examples/libtorchaudio/speech_recognition/transcribe.cpp,
SURVEY.md §2.1 last row): there, the wav2vec2 transcriber is scripted and run
from libtorch. The TPU-native deployment path is `jax.export`: the jitted
waveform->emissions function is lowered to StableHLO once, serialized, and
can then be executed with no Python model code — from Python via
``jax.export.deserialize`` (below), or from C++ by feeding the same StableHLO
payload to the PJRT C API / XLA runtime.

Usage:

    python export_asr.py --out model.stablehlo          # export (random weights)
    python export_asr.py --out model.stablehlo --check  # export + reload + run
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from audio_tpu.models import wav2vec2_model


def build_transcriber(batch: int, num_samples: int):
    """A tiny wav2vec2 CTC transcriber: (B, T) waveform -> (B, frames, vocab) log-probs."""
    model = wav2vec2_model(
        extractor_mode="group_norm",
        extractor_conv_layer_config=[(32, 10, 5), (32, 3, 2), (32, 2, 2)],
        extractor_conv_bias=False,
        encoder_embed_dim=64,
        encoder_projection_dropout=0.0,
        encoder_pos_conv_kernel=31,
        encoder_pos_conv_groups=1,
        encoder_num_layers=2,
        encoder_num_heads=4,
        encoder_attention_dropout=0.0,
        encoder_ff_interm_features=128,
        encoder_ff_interm_dropout=0.0,
        encoder_dropout=0.0,
        encoder_layer_norm_first=False,
        encoder_layer_drop=0.0,
        aux_num_out=29,
    )
    wav0 = jnp.zeros((batch, num_samples), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), wav0, deterministic=True)

    def transcribe(wav):
        emissions, _ = model.apply(params, wav, deterministic=True)
        return jax.nn.log_softmax(emissions, axis=-1)

    return transcribe, wav0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="asr_transcriber.bin")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--samples", type=int, default=16000)
    p.add_argument("--check", action="store_true", help="reload and execute the artifact")
    args = p.parse_args()

    transcribe, wav0 = build_transcriber(args.batch, args.samples)
    exported = jexport.export(jax.jit(transcribe))(
        jax.ShapeDtypeStruct(wav0.shape, wav0.dtype)
    )
    payload = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(payload)
    print(f"exported {args.out}: {len(payload)/1e6:.2f} MB, "
          f"platforms={exported.platforms}, in={exported.in_avals}")

    if args.check:
        with open(args.out, "rb") as f:
            restored = jexport.deserialize(f.read())
        wav = jnp.asarray(
            0.1 * np.random.default_rng(0).standard_normal((args.batch, args.samples)),
            jnp.float32,
        )
        out = restored.call(wav)
        greedy = jnp.argmax(out, axis=-1)
        print(f"reloaded artifact ran: emissions {out.shape}, "
              f"greedy tokens head {np.asarray(greedy)[0, :8]}")


if __name__ == "__main__":
    main()
