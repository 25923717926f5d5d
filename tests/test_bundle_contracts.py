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
# TTS family (text processor -> Tacotron2 -> vocoder)
# =========================================================================

# tiny configs chained so tacotron's n_mels == wavernn's n_freq
_TINY_TACO = dict(
    n_mels=16,
    n_symbol=38,  # the char processor's inventory
    symbol_embedding_dim=16,
    encoder_embedding_dim=16,
    encoder_n_convolution=2,
    encoder_kernel_size=3,
    decoder_rnn_dim=24,
    decoder_max_step=30,
    decoder_dropout=0.0,
    attention_rnn_dim=24,
    attention_hidden_dim=8,
    attention_location_n_filter=4,
    attention_location_kernel_size=5,
    attention_dropout=0.0,
    prenet_dim=8,
    postnet_n_convolution=3,
    postnet_kernel_size=3,
    postnet_embedding_dim=16,
)

_TINY_WRNN = dict(
    upsample_scales=[2, 2, 5],
    n_classes=256,
    hop_length=20,
    n_res_block=2,
    n_rnn=32,
    n_fc=32,
    kernel_size=5,
    n_freq=16,
    n_hidden=16,
    n_output=16,
)


class TestTTSBundleContract:
    """Full TTS chain under shared random weights vs the reference bundles
    (/root/reference/src/torchaudio/pipelines/_tts/impl.py:25-207).

    Determinism shims (both sides, identical semantics): torch dropout -> id
    and ``prenet_dropout=False`` (the reference keeps prenet dropout on at
    inference); greedy sampling in WaveRNN (argmax instead of multinomial /
    categorical); rand_init phases fixed to 1 for Griffin-Lim.
    """

    def _make_shared(self, ref_ta, monkeypatch, taco_cfg):
        torch.manual_seed(61)
        t_taco = ref_ta.models.Tacotron2(**taco_cfg)
        t_taco.eval()
        t_wrnn = ref_ta.models.WaveRNN(**_TINY_WRNN)
        t_wrnn.eval()
        sds = {
            "taco.pth": t_taco.state_dict(),
            "wrnn.pth": t_wrnn.state_dict(),
        }

        def fake_url_load(url, **kw):
            return sds[url.rsplit("/", 1)[-1]]

        monkeypatch.setattr(
            ref_ta.pipelines._tts.impl, "load_state_dict_from_url", fake_url_load
        )
        sd_np = {
            name: {k: v.numpy().copy() for k, v in sd.items()}
            for name, sd in sds.items()
        }
        # determinism: dropout off everywhere, greedy sampling
        monkeypatch.setattr(torch.nn.functional, "dropout", lambda x, *a, **k: x)
        monkeypatch.setattr(
            torch, "multinomial",
            lambda probs, n, **kw: torch.argmax(probs, dim=-1, keepdim=True),
        )
        import jax
        monkeypatch.setattr(
            jax.random, "categorical",
            lambda key, logits, axis=-1, **kw: jnp.argmax(logits, axis=axis),
        )
        return sd_np

    @pytest.fixture()
    def shared(self, ref_ta, monkeypatch):
        return self._make_shared(ref_ta, monkeypatch, _TINY_TACO)

    def _bundles(self, ref_ta, vocoder: str, taco_cfg=None):
        ref_impl = ref_ta.pipelines._tts.impl
        import audio_tpu.pipelines._tts as our_impl

        taco_kw = dict(_tacotron2_path="taco.pth",
                       _tacotron2_params=dict(taco_cfg or _TINY_TACO))
        if vocoder == "wavernn":
            kw = dict(taco_kw, _wavernn_path="wrnn.pth", _wavernn_params=dict(_TINY_WRNN))
            return (
                ref_impl._Tacotron2WaveRNNCharBundle(**kw),
                our_impl._Tacotron2WaveRNNCharBundle(
                    **{**kw, "_wavernn_params": dict(_TINY_WRNN, upsample_scales=(2, 2, 5))}
                ),
            )
        return (
            ref_impl._Tacotron2GriffinLimCharBundle(**taco_kw),
            our_impl._Tacotron2GriffinLimCharBundle(**taco_kw),
        )

    def _run_tacotron(self, ref_b, our_b, sd_np, text):
        ref_proc = ref_b.get_text_processor()
        our_proc = our_b.get_text_processor()
        assert ref_proc.tokens == our_proc.tokens
        t_tok, t_len = ref_proc(text)
        j_tok, j_len = our_proc(text)
        np.testing.assert_array_equal(np.asarray(j_tok), t_tok.numpy())
        np.testing.assert_array_equal(np.asarray(j_len), t_len.numpy())

        ref_taco = ref_b.get_tacotron2(dl_kwargs={})
        with torch.no_grad():
            t_mel, t_mlen, _ = ref_taco.infer(t_tok, t_len)
        our_taco = our_b.get_tacotron2(dl_kwargs={"state_dict": sd_np["taco.pth"]})
        j_mel, j_mlen, _ = our_taco.infer(j_tok, j_len, prenet_dropout=False)
        # XLA static shapes: our mel is padded to decoder_max_step; the valid
        # region (reference truncates at the gate stop) must agree frame for
        # frame, and the gate-stop lengths must match exactly
        t_steps = t_mel.shape[-1]
        np.testing.assert_array_equal(np.asarray(j_mlen), t_mlen.numpy())
        np.testing.assert_allclose(
            np.asarray(j_mel)[..., :t_steps], t_mel.numpy(), atol=2e-3, rtol=1e-2
        )
        return (t_mel, t_mlen), (j_mel, j_mlen)

    def test_wavernn_chain(self, ref_ta, shared):
        ref_b, our_b = self._bundles(ref_ta, "wavernn")
        (t_mel, t_mlen), (j_mel, j_mlen) = self._run_tacotron(
            ref_b, our_b, shared, "hello tpu world"
        )
        ref_voc = ref_b.get_vocoder(dl_kwargs={})
        with torch.no_grad():
            t_wav, t_wlen = ref_voc(t_mel, t_mlen)
        our_voc = our_b.get_vocoder(dl_kwargs={"state_dict": shared["wrnn.pth"]})
        # feed the SAME mel to both vocoders: greedy autoregressive label
        # sequences are discrete, so the ~1e-4 tacotron mel difference
        # (already asserted above) could otherwise flip an argmax and diverge
        j_wav, j_wlen = our_voc(jnp.asarray(t_mel.numpy()), jnp.asarray(t_mlen.numpy()))
        assert ref_voc.sample_rate == our_voc.sample_rate == 22050
        np.testing.assert_array_equal(np.asarray(j_wlen), t_wlen.numpy())
        assert np.asarray(j_wav).shape == tuple(t_wav.shape)
        # greedy autoregressive sampling: identical mu-law label sequences
        np.testing.assert_allclose(np.asarray(j_wav), t_wav.numpy(), atol=1e-5)

    def test_griffinlim_chain(self, ref_ta, monkeypatch):
        import audio_tpu.pipelines._tts as our_impl
        from audio_tpu.transforms import GriffinLim as OurGL

        # the reference InverseMelScale is built with n_mels=80 (impl.py:104);
        # early stopping off: random-weight gates fire after 1 frame, which is
        # shorter than one 1024-point istft window
        taco80 = dict(_TINY_TACO, n_mels=80, decoder_early_stopping=False)
        shared = self._make_shared(ref_ta, monkeypatch, taco80)
        # pin phase init to 1 on both sides (the bundles use rand_init)
        monkeypatch.setattr(
            torch, "rand", lambda *s, **kw: torch.ones(*s, **kw)
        )
        monkeypatch.setattr(
            our_impl, "GriffinLim",
            lambda **kw: OurGL(**{**kw, "rand_init": False}),
        )
        ref_b, our_b = self._bundles(ref_ta, "griffinlim", taco_cfg=taco80)
        (t_mel, t_mlen), (j_mel, j_mlen) = self._run_tacotron(
            ref_b, our_b, shared, "a tpu speaks"
        )
        ref_voc = ref_b.get_vocoder()
        with torch.no_grad():
            t_wav, _ = ref_voc(t_mel, t_mlen)
            t_spec = ref_voc._inv_mel(torch.exp(t_mel.clone()))
        our_voc = our_b.get_vocoder()
        # same mel to both vocoders (our tacotron mel is max-step padded;
        # the valid region was asserted equal in _run_tacotron)
        j_wav, _ = our_voc(jnp.asarray(t_mel.numpy()), jnp.asarray(t_mlen.numpy()))
        assert ref_voc.sample_rate == our_voc.sample_rate == 22050
        assert np.asarray(j_wav).shape == tuple(t_wav.shape)
        # also assert the in-bundle InverseMelScale solves identically
        j_spec = our_voc._inv_mel(jnp.exp(jnp.asarray(t_mel.numpy())))
        np.testing.assert_allclose(np.asarray(j_spec), t_spec.numpy(),
                                   atol=1e-3, rtol=1e-3)
        # Griffin-Lim phase retrieval is multi-stable on these rank-deficient
        # inverse-mel spectra (bins above f_max are exactly zero, and
        # x/(|x|+eps) near zero is sign-chaotic), so bitwise waveform
        # comparison is unsound; the CONTRACT is that both reconstructions
        # explain the target magnitude spectrogram equally well.
        import audio_tpu.transforms as T2

        sp = T2.Spectrogram(n_fft=1024, hop_length=256, win_length=1024, power=1)
        tgt = t_spec.numpy()

        def rel_err(wav):
            m = np.asarray(sp(jnp.asarray(wav)))
            t = tgt[..., : m.shape[-1]]
            return float(np.linalg.norm(m - t) / np.linalg.norm(t))

        e_ref = rel_err(t_wav.numpy())
        e_ours = rel_err(np.asarray(j_wav))
        assert abs(e_ref - e_ours) < 0.02, (e_ref, e_ours)


# =========================================================================
# Source separation family
# =========================================================================

_TINY_HDEMUCS = dict(
    sources=["drums", "bass"],
    audio_channels=1,
    channels=4,
    growth=2,
    nfft=256,
    depth=4,
    freq_emb=0.2,
    emb_scale=10,
    emb_smooth=True,
    kernel_size=8,
    time_stride=2,
    stride=4,
    context=1,
    context_enc=0,
    norm_starts=2,
    norm_groups=2,
    dconv_depth=2,
    dconv_comp=4,
    dconv_attn=2,
    dconv_lstm=3,
    dconv_init=1e-4,
)


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

    def test_hdemucs_bundle(self, ref_ta, tmp_path, monkeypatch):
        """HDemucs separation through the BUNDLE plumbing (mix -> sources),
        tiny factory on both sides with shared torch weights
        (/root/reference/src/torchaudio/pipelines/_source_separation_pipeline.py:81-109)."""
        torch.manual_seed(51)
        tmodel = ref_ta.models.HDemucs(**_TINY_HDEMUCS)
        tmodel.eval()
        torch.save(tmodel.state_dict(), tmp_path / "hd.pt")
        monkeypatch.setattr(ref_ta.utils, "_download_asset",
                            lambda key: str(tmp_path / "hd.pt"))

        ref_bundle = ref_ta.pipelines._source_separation_pipeline.SourceSeparationBundle(
            _model_path="models/hd.pt",
            _model_factory_func=lambda: ref_ta.models.HDemucs(**_TINY_HDEMUCS),
            _sample_rate=44100,
        )
        from audio_tpu.models.hdemucs import HDemucs, import_hdemucs_state_dict
        from audio_tpu.pipelines._source_separation_pipeline import SourceSeparationBundle

        our_bundle = SourceSeparationBundle(
            _model_path="models/hd.pt",
            _model_factory_func=lambda: (
                HDemucs(**{**_TINY_HDEMUCS, "sources": tuple(_TINY_HDEMUCS["sources"])}),
                import_hdemucs_state_dict,
            ),
            _sample_rate=44100,
        )
        assert ref_bundle.sample_rate == our_bundle.sample_rate

        mix = _wave((2, 1, 4000), seed=7, scale=0.3)
        with torch.no_grad():
            ref_sources = ref_bundle.get_model()(torch.from_numpy(mix))
        sd_np = {k: v.numpy().copy() for k, v in tmodel.state_dict().items()}
        our_sources = our_bundle.get_model(dl_kwargs={"state_dict": sd_np})(mix)
        assert np.asarray(our_sources).shape == tuple(ref_sources.shape) == (2, 2, 1, 4000)
        np.testing.assert_allclose(
            np.asarray(our_sources), ref_sources.numpy(), atol=1e-3, rtol=1e-3
        )

    def test_hdemucs_bundle_paths_match_reference(self, ref_ta):
        """Checkpoint keys of the shipped HDemucs bundles match the reference
        (MUSDB -> musdbhq_only, MUSDB_PLUS -> trained)."""
        for name in ("HDEMUCS_HIGH_MUSDB", "HDEMUCS_HIGH_MUSDB_PLUS",
                     "CONVTASNET_BASE_LIBRI2MIX"):
            ref_b = getattr(ref_ta.pipelines._source_separation_pipeline, name)
            our_b = getattr(P, name)
            assert our_b._model_path == ref_b._model_path, name
            assert our_b.sample_rate == ref_b.sample_rate, name
