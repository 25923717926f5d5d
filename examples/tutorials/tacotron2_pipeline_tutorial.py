"""Text-to-speech with Tacotron2 tutorial.

Counterpart of
/root/reference/examples/tutorials/tacotron2_pipeline_tutorial.py: text ->
(char/phoneme) processor -> Tacotron2 -> mel spectrogram -> vocoder
(WaveRNN or Griffin-Lim).

Offline by default with a tiny random Tacotron2 + Griffin-Lim (API and
shapes); pass --download to synthesize with the pretrained
TACOTRON2_WAVERNN_CHAR_LJSPEECH bundle.

    JAX_PLATFORMS=cpu python tacotron2_pipeline_tutorial.py
"""

import argparse

import jax
import jax.numpy as jnp

TEXT = "Hello world! Text to speech!"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--download", action="store_true")
    p.add_argument("--vocoder", default="griffinlim", choices=("wavernn", "griffinlim"))
    args = p.parse_args()

    if args.download:
        from audio_tpu import pipelines

        bundle = (pipelines.TACOTRON2_WAVERNN_CHAR_LJSPEECH if args.vocoder == "wavernn"
                  else pipelines.TACOTRON2_GRIFFINLIM_CHAR_LJSPEECH)
        processor = bundle.get_text_processor()
        tacotron2 = bundle.get_tacotron2()
        vocoder = bundle.get_vocoder()

        tokens, lengths = processor(TEXT)
        mel, mel_lengths, _ = tacotron2.infer(tokens, lengths)
        wav, wav_lengths = vocoder(mel, mel_lengths)
        print(f"text {TEXT!r} -> tokens {tokens.shape} -> mel {mel.shape} "
              f"-> waveform {wav.shape} @ {vocoder.sample_rate} Hz")
        return

    # offline path: tiny random model, same call structure
    from audio_tpu.models import Tacotron2
    from audio_tpu.transforms import GriffinLim, InverseMelScale

    symbols = "_-!'(),.:;? abcdefghijklmnopqrstuvwxyz"
    lookup = {c: i for i, c in enumerate(symbols)}
    tokens = jnp.asarray([[lookup[c] for c in TEXT.lower() if c in lookup]], jnp.int32)
    lengths = jnp.asarray([tokens.shape[1]], jnp.int32)
    print(f"text processor: {TEXT!r} -> {tokens.shape}")

    model = Tacotron2(
        n_symbol=len(symbols), symbol_embedding_dim=32,
        encoder_embedding_dim=32, encoder_n_convolution=1, encoder_kernel_size=3,
        n_mels=16, attention_rnn_dim=32, attention_hidden_dim=32,
        attention_location_n_filter=4, attention_location_kernel_size=7,
        decoder_rnn_dim=32, prenet_dim=16, postnet_embedding_dim=32,
        postnet_kernel_size=3, postnet_n_convolution=2,
        decoder_max_step=40, gate_threshold=0.5,
    )
    mel0 = jnp.zeros((1, 16, 8), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), tokens, lengths, mel0,
                           jnp.asarray([8]), prenet_dropout=False)
    mel, mel_lengths, _ = model.apply(variables, tokens, lengths,
                                      prenet_dropout=False, method=model.infer)
    print(f"tacotron2 infer: mel {mel.shape} (B, n_mels, T), lengths {mel_lengths}")

    # Griffin-Lim vocoder: mel -> linear -> phase recovery
    linear = InverseMelScale(n_stft=201, n_mels=16, sample_rate=22050)(jnp.exp(mel))
    wav = GriffinLim(n_fft=400, n_iter=4)(linear)
    print(f"griffinlim vocoder: {linear.shape} -> waveform {wav.shape}")


if __name__ == "__main__":
    main()
