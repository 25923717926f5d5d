"""HuggingFace / fairseq checkpoint interop importers."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audio_tpu.models.wav2vec2.utils import (
    convert_fairseq_state_dict,
    import_huggingface_model,
    import_torchaudio_state_dict,
)

transformers = pytest.importorskip("transformers")


def _tiny_hf_wav2vec2(vocab_size=32, stable_layer_norm=False):
    cfg = transformers.Wav2Vec2Config(
        vocab_size=vocab_size,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        num_conv_pos_embeddings=15,
        num_conv_pos_embedding_groups=1,
        do_stable_layer_norm=stable_layer_norm,
        feat_extract_norm="layer" if stable_layer_norm else "group",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    torch.manual_seed(0)
    model = transformers.Wav2Vec2ForCTC(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("stable_layer_norm", [False, True])
def test_huggingface_wav2vec2_parity(stable_layer_norm):
    hf = _tiny_hf_wav2vec2(stable_layer_norm=stable_layer_norm)
    model, variables = import_huggingface_model(hf)
    wav = np.random.default_rng(0).standard_normal((2, 2000)).astype(np.float32) * 0.1
    with torch.no_grad():
        expected = hf(torch.from_numpy(wav)).logits.numpy()
    got, _ = model.apply(variables, jnp.asarray(wav), deterministic=True)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), expected, atol=5e-4, rtol=1e-3)


def test_huggingface_backbone_only():
    hf = _tiny_hf_wav2vec2()
    model, variables = import_huggingface_model(hf.wav2vec2)
    wav = np.random.default_rng(1).standard_normal((1, 2000)).astype(np.float32) * 0.1
    with torch.no_grad():
        expected = hf.wav2vec2(torch.from_numpy(wav)).last_hidden_state.numpy()
    got, _ = model.apply(variables, jnp.asarray(wav), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), expected, atol=5e-4, rtol=1e-3)


def test_huggingface_wavlm_parity():
    cfg = transformers.WavLMConfig(
        vocab_size=30, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_conv_pos_embeddings=15, num_conv_pos_embedding_groups=1,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, num_buckets=32, max_bucket_distance=64,
    )
    torch.manual_seed(3)
    # note: WavLMForCTC works here though the reference importer crashes on it
    # (it assumes `.wav2vec2`, import_huggingface.py:62; HF's attribute is `.wavlm`)
    hf = transformers.WavLMForCTC(cfg)
    hf.eval()
    model, variables = import_huggingface_model(hf)
    wav = np.random.default_rng(3).standard_normal((2, 2000)).astype(np.float32) * 0.1
    with torch.no_grad():
        expected = hf(torch.from_numpy(wav)).logits.numpy()
    got, _ = model.apply(variables, jnp.asarray(wav), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), expected, atol=5e-4, rtol=1e-3)


def test_fairseq_key_mapping_roundtrip():
    """Rename a torchaudio-layout state dict into fairseq keys; the converter
    must map it back so the flax import equals the direct import."""
    from .test_wav2vec2 import _load_reference_wav2vec2

    ref = _load_reference_wav2vec2()
    cfg = dict(
        extractor_mode="group_norm",
        extractor_conv_layer_config=[(16, 10, 5), (16, 3, 2)],
        extractor_conv_bias=False,
        encoder_embed_dim=32,
        encoder_projection_dropout=0.0,
        encoder_pos_conv_kernel=15,
        encoder_pos_conv_groups=1,
        encoder_num_layers=2,
        encoder_num_heads=4,
        encoder_attention_dropout=0.0,
        encoder_ff_interm_features=64,
        encoder_ff_interm_dropout=0.0,
        encoder_dropout=0.0,
        encoder_layer_norm_first=False,
        encoder_layer_drop=0.0,
        aux_num_out=8,
    )
    torch.manual_seed(2)
    tmodel = ref.model.wav2vec2_model(**cfg)
    ta_sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    # torchaudio -> fairseq key renames (inverse of the converter)
    def to_fairseq(k):
        k = k.replace("encoder.transformer.pos_conv_embed.conv.", "encoder.pos_conv.0.")
        k = k.replace("encoder.transformer.layer_norm.", "encoder.layer_norm.")
        import re

        m = re.match(r"encoder\.transformer\.layers\.(\d+)\.(.*)", k)
        if m:
            i, rest = m.group(1), m.group(2)
            rest = rest.replace("attention.", "self_attn.")
            rest = rest.replace("self_attn_layer", "layer")  # undo accidental hit
            if rest.startswith("layer_norm."):
                rest = "self_attn_layer_norm." + rest.split(".", 1)[1]
            rest = rest.replace("feed_forward.intermediate_dense.", "fc1.")
            rest = rest.replace("feed_forward.output_dense.", "fc2.")
            return f"encoder.layers.{i}.{rest}"
        k = k.replace("encoder.feature_projection.projection.", "post_extract_proj.")
        k = k.replace("encoder.feature_projection.layer_norm.", "layer_norm.")
        m = re.match(r"feature_extractor\.conv_layers\.(\d+)\.conv\.(weight|bias)", k)
        if m:
            return f"feature_extractor.conv_layers.{m.group(1)}.0.{m.group(2)}"
        m = re.match(r"feature_extractor\.conv_layers\.0\.layer_norm\.(weight|bias)", k)
        if m:
            return f"feature_extractor.conv_layers.0.2.{m.group(1)}"
        k = k.replace("aux.", "proj.")
        return k

    fairseq_sd = {to_fairseq(k): v for k, v in ta_sd.items()}
    back = convert_fairseq_state_dict(fairseq_sd)
    assert set(back.keys()) == set(ta_sd.keys())
    direct = import_torchaudio_state_dict(ta_sd)
    via_fairseq = import_torchaudio_state_dict(back)
    flat_a = {str(p): v for p, v in _flatten(direct)}
    flat_b = {str(p): v for p, v in _flatten(via_fairseq)}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v
