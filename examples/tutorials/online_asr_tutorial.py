"""Online (streaming) ASR with Emformer RNN-T.

Counterpart of
/root/reference/examples/tutorials/online_asr_tutorial.py: segment-by-segment
decoding with `RNNTBeamSearch.infer`, carrying the Emformer layer state and
the hypothesis across segments — the whole streaming step is one jitted
program with fixed shapes, so there is no per-token host sync (the
reference's `rnnt_decoder.py:245` `.cpu()` sync is designed out).

Runs offline with a tiny random model; the decoding loop and state plumbing
are identical for the pretrained EMFORMER_RNNT_BASE_LIBRISPEECH bundle
(pass --download).

    JAX_PLATFORMS=cpu python online_asr_tutorial.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from audio_tpu.models import RNNTBeamSearch, emformer_rnnt_model
from audio_tpu.transforms import MelSpectrogram

SAMPLE_RATE = 16000
N_MELS = 16
HOP = 160


def tiny_rnnt(num_symbols=12):
    return emformer_rnnt_model(
        input_dim=N_MELS, encoding_dim=32, num_symbols=num_symbols,
        segment_length=8, right_context_length=4,
        time_reduction_input_dim=8, time_reduction_stride=4,
        transformer_num_heads=2, transformer_ffn_dim=32, transformer_num_layers=2,
        transformer_dropout=0.0, transformer_activation="gelu",
        transformer_left_context_length=8, transformer_max_memory_size=0,
        transformer_weight_init_scale_strategy="depthwise", transformer_tanh_on_mem=True,
        symbol_embedding_dim=16, num_lstm_layers=1, lstm_layer_norm=True,
        lstm_layer_norm_epsilon=1e-3, lstm_dropout=0.0,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--download", action="store_true",
                   help="use EMFORMER_RNNT_BASE_LIBRISPEECH instead of the tiny model")
    p.add_argument("--seconds", type=float, default=1.0)
    args = p.parse_args()

    if args.download:
        from audio_tpu import pipelines

        bundle = pipelines.EMFORMER_RNNT_BASE_LIBRISPEECH
        decoder = bundle.get_decoder()
        feature_extractor = bundle.get_streaming_feature_extractor()
        token_processor = bundle.get_token_processor()
        seg_samples = bundle.segment_length * bundle.hop_length
        rc_samples = bundle.right_context_length * bundle.hop_length
        model = None
    else:
        model = tiny_rnnt()
        # segment/right-context lengths are in input-feature frames
        # (pre-time-reduction), matching the reference bundle semantics
        seg_frames = model.transcriber.segment_length
        rc_frames = model.transcriber.right_context_length
        seg_samples, rc_samples = seg_frames * HOP, rc_frames * HOP
        melspec = MelSpectrogram(sample_rate=SAMPLE_RATE, n_fft=400, hop_length=HOP,
                                 n_mels=N_MELS, power=2.0, center=False)

        feats0 = jnp.zeros((1, seg_frames + rc_frames, N_MELS), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), feats0,
                            jnp.asarray([seg_frames + rc_frames]),
                            jnp.zeros((1, 2), jnp.int32), jnp.asarray([2]),
                            deterministic=True)
        decoder = RNNTBeamSearch(model, params, blank=0)

        def feature_extractor(chunk):
            mel = jnp.log(jnp.swapaxes(melspec(chunk[None]), 1, 2) + 1e-6)[0]
            want = seg_frames + rc_frames  # infer expects exactly segment+rc frames
            mel = mel[:want]
            mel = jnp.pad(mel, ((0, want - mel.shape[0]), (0, 0)))
            return mel, jnp.asarray(want)

        def token_processor(tokens):
            return " ".join(str(t) for t in tokens)

    wav = jnp.asarray(
        0.1 * np.random.default_rng(0).standard_normal(int(args.seconds * SAMPLE_RATE)),
        jnp.float32,
    )

    state, hypo = None, None
    emitted = []
    n_seg = max(0, (wav.size - rc_samples) // seg_samples)
    print(f"streaming {n_seg} segments of {seg_samples} samples "
          f"(+{rc_samples} right context)")
    for i in range(n_seg):
        chunk = jax.lax.dynamic_slice(wav, (i * seg_samples,), (seg_samples + rc_samples,))
        feats, length = feature_extractor(chunk)
        hypos, state = decoder.infer(feats, length, beam_width=4, state=state, hypothesis=hypo)
        hypo = hypos
        best = int(np.argmax(np.asarray(hypo.scores)))
        n_tok = int(np.asarray(hypo.counts)[best])
        tokens = [int(t) for t in np.asarray(hypo.tokens)[best, :n_tok] if t > 0]
        new = tokens[len(emitted):]
        emitted = tokens
        print(f"  segment {i}: +{len(new)} tokens -> {token_processor(emitted)!r}")

    print(f"final: {token_processor(emitted)!r}")


if __name__ == "__main__":
    main()
