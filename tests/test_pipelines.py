"""Pipeline bundle tests: metadata, get_model machinery with injected state
dicts (no network), FA tokenizer/aligner flow."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import audio_tpu.pipelines as P
from audio_tpu.pipelines._wav2vec2.impl import Wav2Vec2ASRBundle, Wav2Vec2FABundle

from .models.test_wav2vec2 import _load_reference_wav2vec2

_TINY_PARAMS = {
    "extractor_mode": "group_norm",
    "extractor_conv_layer_config": [(16, 10, 5), (16, 3, 2)],
    "extractor_conv_bias": False,
    "encoder_embed_dim": 32,
    "encoder_projection_dropout": 0.0,
    "encoder_pos_conv_kernel": 15,
    "encoder_pos_conv_groups": 1,
    "encoder_num_layers": 2,
    "encoder_num_heads": 4,
    "encoder_attention_dropout": 0.0,
    "encoder_ff_interm_features": 64,
    "encoder_ff_interm_dropout": 0.0,
    "encoder_dropout": 0.0,
    "encoder_layer_norm_first": False,
    "encoder_layer_drop": 0.0,
    "aux_num_out": 5,
}


def _tiny_torch_state_dict():
    # the torch checkpoint has 3 extra aux outputs that _remove_aux_axis drops;
    # bundle _params carry the post-removal aux_num_out (reference convention)
    ref = _load_reference_wav2vec2()
    torch.manual_seed(0)
    tmodel = ref.model.wav2vec2_model(**{**_TINY_PARAMS, "aux_num_out": 8})
    tmodel.eval()
    return tmodel, {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}


class TestBundleMetadata:
    def test_instances_exist(self):
        for name in ("WAV2VEC2_BASE", "WAV2VEC2_ASR_BASE_960H", "HUBERT_LARGE", "MMS_FA",
                     "WAVLM_BASE", "EMFORMER_RNNT_BASE_LIBRISPEECH", "SQUIM_OBJECTIVE",
                     "CONVTASNET_BASE_LIBRI2MIX", "TACOTRON2_WAVERNN_CHAR_LJSPEECH"):
            assert hasattr(P, name), name

    def test_asr_labels(self):
        labels = P.WAV2VEC2_ASR_BASE_960H.get_labels()
        assert labels[0] == "-" and labels[1] == "|" and "E" in labels
        assert len(labels) == 29

    def test_sample_rates(self):
        assert P.WAV2VEC2_BASE.sample_rate == 16000
        assert P.EMFORMER_RNNT_BASE_LIBRISPEECH.sample_rate == 16000
        assert P.SQUIM_OBJECTIVE.sample_rate == 16000


class TestGetModel:
    def test_asr_bundle_with_injected_weights(self):
        tmodel, sd = _tiny_torch_state_dict()
        bundle = Wav2Vec2ASRBundle(
            _path="unused.pth",
            _params=_TINY_PARAMS,
            _sample_rate=16000,
            _normalize_waveform=False,
            _model_type="Wav2Vec2",
            _labels=tuple("abcde"),
            _remove_aux_axis=(1, 2, 3),
        )
        model = bundle.get_model(dl_kwargs={"state_dict": sd})
        wav = np.random.default_rng(0).standard_normal((1, 2000)).astype(np.float32) * 0.1
        out, _ = model(wav)
        # aux had 8 outputs; removing axes 1,2,3 leaves 5
        assert out.shape[-1] == 5
        # parity with the torch model on the kept axes
        with torch.no_grad():
            t_out, _ = tmodel(torch.from_numpy(wav))
        keep = [0, 4, 5, 6, 7]
        np.testing.assert_allclose(np.asarray(out), t_out.numpy()[..., keep], atol=2e-4)

    def test_fa_bundle_full_flow(self):
        _, sd = _tiny_torch_state_dict()
        bundle = Wav2Vec2FABundle(
            _path="unused.pth",
            _params=_TINY_PARAMS,
            _sample_rate=16000,
            _normalize_waveform=True,
            _model_type="Wav2Vec2",
            _labels=tuple("abcd"),
            _remove_aux_axis=(1, 2, 3),
        )
        model = bundle.get_model(with_star=True, dl_kwargs={"state_dict": sd})
        wav = np.random.default_rng(1).standard_normal((1, 4000)).astype(np.float32) * 0.1
        emission, _ = model(wav)
        # 8 - 3 removed + star = 6
        assert emission.shape[-1] == 6
        # log-softmax applied before star: probs sum to ~1 on non-star axes
        probs = np.exp(np.asarray(emission)[0, :, :-1])
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)

        tokenizer = bundle.get_tokenizer()
        tokens = tokenizer(["ab", "ba"])
        d = bundle.get_dict()
        assert tokens == [[d["a"], d["b"]], [d["b"], d["a"]]]

        aligner = bundle.get_aligner()
        spans = aligner(emission[0], tokens)
        assert len(spans) == 2
        assert all(len(s) == 2 for s in spans)
        # spans are ordered and within range
        flat = [t for s in spans for t in s]
        for a, b in zip(flat, flat[1:]):
            assert a.end <= b.start or a.start <= b.start
        assert all(0 <= s.start < s.end <= emission.shape[1] for s in flat)


class TestRNNTBundleFeatures:
    def test_feature_extractor_with_local_stats(self, tmp_path, monkeypatch):
        import json

        stats = {"mean": [0.0] * 80, "invstddev": [1.0] * 80}
        p = tmp_path / "stats.json"
        p.write_text(json.dumps(stats))
        monkeypatch.setattr("audio_tpu.pipelines.rnnt_pipeline._download_asset", lambda key: str(p))
        fe = P.EMFORMER_RNNT_BASE_LIBRISPEECH.get_feature_extractor()
        wav = jnp.asarray(np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1)
        feats, length = fe(wav)
        assert feats.shape[-1] == 80
        assert int(length[0]) == feats.shape[0]
        # right padding of 4 frames applied
        sfe = P.EMFORMER_RNNT_BASE_LIBRISPEECH.get_streaming_feature_extractor()
        sfeats, _ = sfe(wav)
        assert feats.shape[0] == sfeats.shape[0] + 4
