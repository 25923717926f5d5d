"""SQUIM parity vs reference torch with shared weights."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_tpu.models.squim.objective import (
    SquimObjective,
    import_squim_objective_state_dict,
    squim_objective_model,
)


@pytest.fixture(scope="module")
def ref_obj():
    if "_ref_squim_obj" in sys.modules:
        return sys.modules["_ref_squim_obj"]
    spec = importlib.util.spec_from_file_location(
        "_ref_squim_obj", "/root/reference/src/torchaudio/models/squim/objective.py"
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules["_ref_squim_obj"] = m
    spec.loader.exec_module(m)
    return m


def test_objective_parity(ref_obj):
    torch.manual_seed(0)
    tmodel = ref_obj.squim_objective_model(
        feat_dim=32, win_len=16, d_model=32, nhead=4, hidden_dim=32, num_blocks=2,
        rnn_type="LSTM", chunk_size=13,
    )
    tmodel.eval()
    variables = import_squim_objective_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})
    jmodel = squim_objective_model(
        feat_dim=32, win_len=16, d_model=32, nhead=4, hidden_dim=32, num_blocks=2,
        rnn_type="LSTM", chunk_size=13,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2000)).astype(np.float32) * 0.1
    with torch.no_grad():
        expected = [s.numpy() for s in tmodel(torch.from_numpy(x))]
    got = [np.asarray(s) for s in jmodel.apply(variables, jnp.asarray(x))]
    assert len(got) == 3
    for g, e in zip(got, expected):
        np.testing.assert_allclose(g, e, atol=1e-3, rtol=1e-3)


def test_subjective_forward():
    from audio_tpu.models.squim.subjective import SquimSubjective
    from audio_tpu.models.wav2vec2 import wav2vec2_model

    ssl = wav2vec2_model(
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
        aux_num_out=None,
    )
    model = SquimSubjective(ssl_model=ssl, proj_dim=8, att_dim=5)
    wav = jnp.zeros((2, 2000))
    ref = jnp.zeros((2, 1500))  # shorter reference gets tiled
    v = model.init(jax.random.PRNGKey(0), wav, ref)
    mos = model.apply(v, wav, ref)
    assert mos.shape == (2,)
    assert np.isfinite(np.asarray(mos)).all()
    assert (np.asarray(mos) >= 0).all() and (np.asarray(mos) <= 5.1).all()
