"""Offline full-bundle golden contracts against the REFERENCE pipeline classes.

For each bundle family, the reference pipeline classes (loaded from
/root/reference via tests/ref_loader.py with native/network machinery
stubbed) and our bundles run the COMPLETE path — feature extractor → model →
decoder / token processing — from the same random weights, and the outputs
must agree end to end.  This is the offline analogue of the reference's
network-gated integration tier
(/root/reference/test/integration_tests/rnnt_pipeline_test.py:6-20); the
network tier (tests/integration/) still covers real pretrained weights when
the environment allows it.
"""

import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import audio_tpu.pipelines as P
from audio_tpu.pipelines._wav2vec2.impl import Wav2Vec2ASRBundle, Wav2Vec2FABundle

sys.path.insert(0, str(Path(__file__).parent))
from ref_loader import load_reference_torchaudio  # noqa: E402


@pytest.fixture(scope="module")
def ref_ta():
    return load_reference_torchaudio()


def _wave(shape, seed=0, scale=0.1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32) * scale


def _greedy_ids(emission_btv):
    """Greedy CTC collapse (argmax -> dedupe -> drop blank 0) on (T, V)."""
    ids = np.argmax(np.asarray(emission_btv), axis=-1)
    out, prev = [], -1
    for i in ids:
        if i != prev and i != 0:
            out.append(int(i))
        prev = i
    return out


# =========================================================================
# wav2vec2 ASR + FA family
# =========================================================================

_TINY_W2V2 = {
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


@pytest.fixture(scope="module")
def w2v2_shared_sd(ref_ta):
    """Random torch wav2vec2 state dict (pre-aux-removal: 8 outputs)."""
    torch.manual_seed(11)
    tmodel = ref_ta.models.wav2vec2_model(**{**_TINY_W2V2, "aux_num_out": 8})
    tmodel.eval()
    sd_t = tmodel.state_dict()
    sd_np = {k: v.numpy().copy() for k, v in sd_t.items()}
    return sd_t, sd_np


def _patch_ref_w2v2_loader(ref_ta, monkeypatch, sd_t):
    utils_mod = ref_ta.pipelines._wav2vec2.utils
    # fresh copy per call: the reference's _get_state_dict narrows aux axes
    # IN PLACE (pipelines/_wav2vec2/utils.py:79-90)
    monkeypatch.setattr(
        utils_mod, "load_state_dict_from_url",
        lambda url, **kw: {k: v.clone() for k, v in sd_t.items()},
    )


class TestWav2Vec2ASRContract:
    def test_full_asr_path(self, ref_ta, w2v2_shared_sd, monkeypatch):
        sd_t, sd_np = w2v2_shared_sd
        _patch_ref_w2v2_loader(ref_ta, monkeypatch, sd_t)

        common = dict(
            _path="x.pth", _params=_TINY_W2V2, _sample_rate=16000,
            _normalize_waveform=False, _model_type="Wav2Vec2",
            _labels=tuple("abcd"), _remove_aux_axis=(1, 2, 3),
        )
        ref_bundle = ref_ta.pipelines._wav2vec2.impl.Wav2Vec2ASRBundle(**common)
        our_bundle = Wav2Vec2ASRBundle(**common)

        wav = _wave((1, 4000), seed=1)
        with torch.no_grad():
            ref_model = ref_bundle.get_model(dl_kwargs={})
            ref_em, _ = ref_model(torch.from_numpy(wav))
        our_model = our_bundle.get_model(dl_kwargs={"state_dict": sd_np})
        our_em, _ = our_model(wav)

        np.testing.assert_allclose(
            np.asarray(our_em), ref_em.numpy(), atol=2e-4
        )
        assert _greedy_ids(np.asarray(our_em)[0]) == _greedy_ids(ref_em.numpy()[0])
        assert ref_bundle.get_labels() == our_bundle.get_labels()

    def test_normalized_variant(self, ref_ta, w2v2_shared_sd, monkeypatch):
        # _normalize_waveform exercises the reference's _extend_model wrapper
        sd_t, sd_np = w2v2_shared_sd
        _patch_ref_w2v2_loader(ref_ta, monkeypatch, sd_t)
        common = dict(
            _path="x.pth", _params=_TINY_W2V2, _sample_rate=16000,
            _normalize_waveform=True, _model_type="Wav2Vec2",
            _labels=tuple("abcd"), _remove_aux_axis=(1, 2, 3),
        )
        ref_bundle = ref_ta.pipelines._wav2vec2.impl.Wav2Vec2ASRBundle(**common)
        our_bundle = Wav2Vec2ASRBundle(**common)
        wav = _wave((1, 3200), seed=2)
        with torch.no_grad():
            ref_em, _ = ref_bundle.get_model(dl_kwargs={})(torch.from_numpy(wav))
        our_em, _ = our_bundle.get_model(dl_kwargs={"state_dict": sd_np})(wav)
        np.testing.assert_allclose(np.asarray(our_em), ref_em.numpy(), atol=2e-4)


class TestFABundleContract:
    def test_fa_model_tokenizer_and_spans(self, ref_ta, w2v2_shared_sd, monkeypatch):
        sd_t, sd_np = w2v2_shared_sd
        _patch_ref_w2v2_loader(ref_ta, monkeypatch, sd_t)
        common = dict(
            _path="x.pth", _params=_TINY_W2V2, _sample_rate=16000,
            _normalize_waveform=True, _model_type="Wav2Vec2",
            _labels=tuple("abcd"),
        )
        ref_bundle = ref_ta.pipelines._wav2vec2.impl.Wav2Vec2FABundle(**common)
        our_bundle = Wav2Vec2FABundle(**common)

        wav = _wave((1, 4000), seed=3)
        with torch.no_grad():
            ref_em, _ = ref_bundle.get_model(with_star=True, dl_kwargs={})(
                torch.from_numpy(wav)
            )
        our_em, _ = our_bundle.get_model(
            with_star=True, dl_kwargs={"state_dict": sd_np}
        )(wav)
        np.testing.assert_allclose(np.asarray(our_em), ref_em.numpy(), atol=2e-4)

        # tokenizer contract (pure python on both sides)
        ref_tok = ref_bundle.get_tokenizer()
        our_tok = our_bundle.get_tokenizer()
        transcript = ["ab", "ba", "dca"]
        assert ref_tok(transcript) == our_tok(transcript)

        # full aligner path: our spans vs the reference aligner running on
        # OUR alignment output (the reference's forced_align core is native
        # and unavailable; merge_tokens — the span logic — is pure torch)
        import audio_tpu.functional as F

        tokens = our_tok(transcript)
        our_spans = our_bundle.get_aligner()(our_em[0], tokens)

        flat = [t for ts in tokens for t in ts]
        paths, scores = F.forced_align(
            our_em, jnp.asarray([flat], jnp.int32)
        )
        # the reference aligner exponentiates path scores before merging
        # (pipelines/_wav2vec2/aligner.py:41 "convert back to probability")
        ref_token_spans = ref_ta.functional.merge_tokens(
            torch.from_numpy(np.asarray(paths[0])),
            torch.from_numpy(np.exp(np.asarray(scores[0]))),
        )
        flat_ours = [s for word in our_spans for s in word]
        assert len(flat_ours) == len(ref_token_spans)
        for got, exp in zip(flat_ours, ref_token_spans):
            assert (got.token, got.start, got.end) == (exp.token, exp.start, exp.end)
            np.testing.assert_allclose(got.score, exp.score, atol=1e-5)


# =========================================================================
# RNNT family (feature extractor -> transcriber -> beam search)
# =========================================================================

_TINY_RNNT = dict(
    input_dim=16,
    encoding_dim=32,
    num_symbols=10,
    segment_length=8,
    right_context_length=4,
    time_reduction_input_dim=8,
    time_reduction_stride=2,
    transformer_num_heads=2,
    transformer_ffn_dim=32,
    transformer_num_layers=2,
    transformer_dropout=0.0,
    transformer_activation="gelu",
    transformer_left_context_length=6,
    transformer_max_memory_size=0,
    transformer_weight_init_scale_strategy="depthwise",
    transformer_tanh_on_mem=True,
    symbol_embedding_dim=16,
    num_lstm_layers=2,
    lstm_layer_norm=True,
    lstm_layer_norm_epsilon=1e-3,
    lstm_dropout=0.0,
)


class TestRNNTBundleContract:
    def test_full_streaming_asr_path(self, ref_ta, tmp_path, monkeypatch):
        torch.manual_seed(21)
        tmodel = ref_ta.models.emformer_rnnt_model(**_TINY_RNNT)
        tmodel.eval()
        torch.save(tmodel.state_dict(), tmp_path / "rnnt.pt")
        stats = {"mean": [0.1] * 16, "invstddev": [0.9] * 16}
        (tmp_path / "stats.json").write_text(json.dumps(stats))

        def fake_asset(key):
            return str(tmp_path / ("rnnt.pt" if key.endswith(".pt") else "stats.json"))

        monkeypatch.setattr(ref_ta.utils, "_download_asset", fake_asset)
        monkeypatch.setattr("audio_tpu.pipelines.rnnt_pipeline._download_asset", fake_asset)

        fields = dict(
            _rnnt_path="tiny_rnnt.pt",
            _global_stats_path="stats.json",
            _sp_model_path="unused.model",
            _right_padding=4,
            _blank=_TINY_RNNT["num_symbols"] - 1,
            _sample_rate=16000,
            _n_fft=400,
            _n_mels=16,
            _hop_length=160,
            _segment_length=_TINY_RNNT["segment_length"],
            _right_context_length=_TINY_RNNT["right_context_length"],
        )
        ref_bundle = ref_ta.pipelines.rnnt_pipeline.RNNTBundle(
            _rnnt_factory_func=lambda: ref_ta.models.emformer_rnnt_model(**_TINY_RNNT),
            **fields,
        )
        from audio_tpu.models.rnnt import emformer_rnnt_model
        from audio_tpu.pipelines.rnnt_pipeline import RNNTBundle

        our_bundle = RNNTBundle(
            _rnnt_factory_func=lambda: emformer_rnnt_model(**_TINY_RNNT),
            **fields,
        )

        wav = _wave((8000,), seed=4, scale=0.3)

        # feature extractor parity (mel -> piecewise-linear log -> stats norm
        # -> right padding)
        ref_fe = ref_bundle.get_feature_extractor()
        with torch.no_grad():
            ref_feats, ref_len = ref_fe(torch.from_numpy(wav))
        our_fe = our_bundle.get_feature_extractor()
        our_feats, our_len = our_fe(jnp.asarray(wav))
        assert int(our_len[0]) == int(ref_len[0])
        np.testing.assert_allclose(np.asarray(our_feats), ref_feats.numpy(), atol=1e-3)

        # full decode: beam search over the same encoder/predictor/joiner
        sd_np = {k: v.numpy().copy() for k, v in torch.load(tmp_path / "rnnt.pt").items()}
        from audio_tpu.models.rnnt_decoder import RNNTBeamSearch

        ref_dec = ref_bundle.get_decoder()
        with torch.no_grad():
            ref_hypos = ref_dec(ref_feats, ref_len, 4)
        ref_top = list(ref_hypos[0][0][1:])  # drop the priming blank token
        ref_score = ref_hypos[0][3]

        our_dec = our_bundle.get_decoder(dl_kwargs={"state_dict": sd_np})
        beam = our_dec.forward(our_feats, our_len, 4)
        our_top = RNNTBeamSearch.hypo_tokens(beam, 0)
        assert our_top == ref_top, (our_top, ref_top)
        np.testing.assert_allclose(float(beam.scores[0]), ref_score, atol=1e-3)

        # streaming feature extractor drops the right padding
        ref_sfe = ref_bundle.get_streaming_feature_extractor()
        with torch.no_grad():
            ref_sfeats, _ = ref_sfe(torch.from_numpy(wav))
        our_sfeats, _ = our_bundle.get_streaming_feature_extractor()(jnp.asarray(wav))
        np.testing.assert_allclose(np.asarray(our_sfeats), ref_sfeats.numpy(), atol=1e-3)


# =========================================================================
# SQUIM family
# =========================================================================

class TestSquimContract:
    def test_objective_bundle(self, ref_ta, tmp_path, monkeypatch):
        torch.manual_seed(31)
        tmodel = ref_ta.models.squim_objective_base()
        tmodel.eval()
        torch.save(tmodel.state_dict(), tmp_path / "squim.pt")
        monkeypatch.setattr(ref_ta.utils, "_download_asset",
                            lambda key: str(tmp_path / "squim.pt"))

        ref_model = ref_ta.pipelines._squim_pipeline.SQUIM_OBJECTIVE.get_model()
        wav = _wave((1, 8000), seed=5, scale=0.3)
        with torch.no_grad():
            ref_stoi, ref_pesq, ref_sisdr = ref_model(torch.from_numpy(wav))

        sd_np = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}
        our_model = P.SQUIM_OBJECTIVE.get_model(dl_kwargs={"state_dict": sd_np})
        our_stoi, our_pesq, our_sisdr = our_model(wav)
        np.testing.assert_allclose(np.asarray(our_stoi), ref_stoi.numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(our_pesq), ref_pesq.numpy(), atol=2e-3)
        np.testing.assert_allclose(np.asarray(our_sisdr), ref_sisdr.numpy(), atol=2e-2)


# =========================================================================
# Source separation family
# =========================================================================

class TestSourceSeparationContract:
    def test_conv_tasnet_bundle(self, ref_ta, tmp_path, monkeypatch):
        torch.manual_seed(41)
        tmodel = ref_ta.models.conv_tasnet_base(num_sources=2)
        tmodel.eval()
        torch.save(tmodel.state_dict(), tmp_path / "ct.pt")
        monkeypatch.setattr(ref_ta.utils, "_download_asset",
                            lambda key: str(tmp_path / "ct.pt"))

        ref_model = (
            ref_ta.pipelines._source_separation_pipeline.CONVTASNET_BASE_LIBRI2MIX.get_model()
        )
        mix = _wave((1, 1, 8000), seed=6, scale=0.3)
        with torch.no_grad():
            ref_sources = ref_model(torch.from_numpy(mix))

        sd_np = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}
        our_model = P.CONVTASNET_BASE_LIBRI2MIX.get_model(dl_kwargs={"state_dict": sd_np})
        our_sources = our_model(mix)
        np.testing.assert_allclose(
            np.asarray(our_sources), ref_sources.numpy(), atol=5e-3
        )
