"""WavLM parity vs the reference torch implementation with shared weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audio_tpu.models.wavlm import import_wavlm_state_dict, wavlm_model

from .test_wav2vec2 import _load_reference_wav2vec2

CFG = dict(
    extractor_mode="group_norm",
    extractor_conv_layer_config=[(16, 10, 5), (16, 3, 2)],
    extractor_conv_bias=False,
    encoder_embed_dim=32,
    encoder_projection_dropout=0.0,
    encoder_pos_conv_kernel=15,
    encoder_pos_conv_groups=1,
    encoder_num_layers=3,
    encoder_num_heads=4,
    encoder_num_buckets=32,
    encoder_max_distance=64,
    encoder_attention_dropout=0.0,
    encoder_ff_interm_features=64,
    encoder_ff_interm_dropout=0.0,
    encoder_dropout=0.0,
    encoder_layer_norm_first=False,
    encoder_layer_drop=0.0,
    aux_num_out=None,
)


@pytest.mark.parametrize("layer_norm_first", [False, True])
def test_parity_with_reference(layer_norm_first):
    ref = _load_reference_wav2vec2()
    cfg = {**CFG, "encoder_layer_norm_first": layer_norm_first}
    if layer_norm_first:
        cfg["extractor_mode"] = "layer_norm"
    torch.manual_seed(0)
    tmodel = ref.model.wavlm_model(**cfg)
    tmodel.eval()
    params = {"params": import_wavlm_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})}
    jmodel = wavlm_model(**cfg)
    wav = np.random.default_rng(0).standard_normal((2, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        t_out, _ = tmodel(torch.from_numpy(wav))
    j_out, _ = jmodel.apply(params, jnp.asarray(wav), deterministic=True)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=5e-4, rtol=1e-3)


def test_extract_features():
    ref = _load_reference_wav2vec2()
    torch.manual_seed(1)
    tmodel = ref.model.wavlm_model(**CFG)
    tmodel.eval()
    params = {"params": import_wavlm_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})}
    jmodel = wavlm_model(**CFG)
    wav = np.random.default_rng(1).standard_normal((1, 2000)).astype(np.float32) * 0.1
    with torch.no_grad():
        t_feats, _ = tmodel.extract_features(torch.from_numpy(wav), num_layers=2)
    j_feats, _ = jmodel.apply(
        params, jnp.asarray(wav), None, 2, deterministic=True, method=jmodel.extract_features
    )
    assert len(j_feats) == 2
    for jf, tf in zip(j_feats, t_feats):
        np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=5e-4, rtol=1e-3)
