"""Golden-output integration contracts (reference integration_tests/)."""

import jax.numpy as jnp
import numpy as np
import pytest


def test_rnnt_golden_transcript(sample_speech):
    """Exact-match contract of the reference's rnnt_pipeline_test.py:9-20."""
    import audio_tpu
    from audio_tpu.pipelines import EMFORMER_RNNT_BASE_LIBRISPEECH as bundle

    feature_extractor = bundle.get_feature_extractor()
    decoder = bundle.get_decoder()
    token_processor = bundle.get_token_processor()
    waveform, _ = audio_tpu.load(sample_speech)
    features, length = feature_extractor(jnp.asarray(waveform).reshape(-1))
    beam = decoder.forward(features, length, beam_width=10)
    best = int(np.argmax(np.asarray(beam.scores)))
    n_tok = int(np.asarray(beam.counts)[best])
    tokens = [int(t) for t in np.asarray(beam.tokens)[best, :n_tok]]
    tokens = [0] + tokens  # token processor strips the leading blank
    text = token_processor(tokens)
    assert text == "i have that curiosity beside me at this moment"


def test_wav2vec2_asr(sample_speech):
    """Greedy transcript through WAV2VEC2_ASR_BASE_960H (reference
    wav2vec2_pipeline_test.py)."""
    import jax

    import audio_tpu
    from audio_tpu.pipelines import WAV2VEC2_ASR_BASE_960H as bundle

    model = bundle.get_model()
    labels = bundle.get_labels()
    waveform, sr = audio_tpu.load(sample_speech)
    emissions, _ = model(jnp.asarray(waveform))
    best = np.asarray(jnp.argmax(emissions[0], axis=-1))
    prev, out = -1, []
    for i in best:
        if i != prev and labels[i] != "-":
            out.append(labels[i])
        prev = i
    text = "".join(out).replace("|", " ").strip().lower()
    assert "i had that curiosity beside me at this moment" in text


def test_squim_objective_ranges(sample_speech):
    import audio_tpu
    from audio_tpu.pipelines import SQUIM_OBJECTIVE

    model = SQUIM_OBJECTIVE.get_model()
    waveform, _ = audio_tpu.load(sample_speech)
    stoi, pesq, si_sdr = model(jnp.asarray(waveform))
    assert 0.0 <= float(stoi[0]) <= 1.0
    assert 1.0 <= float(pesq[0]) <= 4.5
