"""Tacotron2 parity vs reference torch with shared weights (dropout disabled
globally for determinism — the reference keeps prenet dropout on in eval)."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_tpu.models.tacotron2 import Tacotron2, import_tacotron2_state_dict

CFG = dict(
    n_mels=12,
    n_symbol=20,
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


@pytest.fixture(scope="module")
def ref():
    if "_ref_taco" in sys.modules:
        return sys.modules["_ref_taco"]
    spec = importlib.util.spec_from_file_location("_ref_taco", "/root/reference/src/torchaudio/models/tacotron2.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["_ref_taco"] = m
    spec.loader.exec_module(m)
    return m


@pytest.fixture
def no_torch_dropout(monkeypatch):
    monkeypatch.setattr(torch.nn.functional, "dropout", lambda x, *a, **k: x)


@pytest.fixture(scope="module")
def models(ref):
    torch.manual_seed(0)
    tmodel = ref.Tacotron2(**CFG)
    tmodel.eval()
    variables = import_tacotron2_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})
    jmodel = Tacotron2(**CFG)
    return tmodel, jmodel, variables


def test_forward_parity(models, no_torch_dropout, ref):
    tmodel, jmodel, variables = models
    rng = np.random.default_rng(0)
    b, l, t = 2, 10, 16
    tokens = rng.integers(0, CFG["n_symbol"], (b, l)).astype(np.int64)
    token_lengths = np.array([l, l], np.int64)
    mel = rng.standard_normal((b, CFG["n_mels"], t)).astype(np.float32)
    mel_lengths = np.array([t, t], np.int64)
    with torch.no_grad():
        t_mel, t_post, t_gate, t_align = tmodel(
            torch.from_numpy(tokens), torch.from_numpy(token_lengths),
            torch.from_numpy(mel), torch.from_numpy(mel_lengths),
        )
    j_mel, j_post, j_gate, j_align = jmodel.apply(
        variables, jnp.asarray(tokens.astype(np.int32)), jnp.asarray(token_lengths),
        jnp.asarray(mel), jnp.asarray(mel_lengths), prenet_dropout=False,
    )
    np.testing.assert_allclose(np.asarray(j_mel), t_mel.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_post), t_post.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_gate), t_gate.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_align), t_align.numpy(), atol=5e-4, rtol=1e-3)


def test_infer_parity(models, no_torch_dropout, ref):
    """With dropout off, autoregressive rollout is deterministic and should
    track torch step for step (until the gate threshold divergence point)."""
    tmodel, jmodel, variables = models
    rng = np.random.default_rng(1)
    b, l = 1, 8
    tokens = rng.integers(0, CFG["n_symbol"], (b, l)).astype(np.int64)
    lengths = np.array([l], np.int64)
    with torch.no_grad():
        t_mel, t_lens, t_align = tmodel.infer(torch.from_numpy(tokens), torch.from_numpy(lengths))
    j_mel, j_lens, j_align = jmodel.apply(
        variables, jnp.asarray(tokens.astype(np.int32)), jnp.asarray(lengths),
        prenet_dropout=False, method=jmodel.infer,
    )
    t_steps = t_mel.shape[-1]
    np.testing.assert_allclose(
        np.asarray(j_mel)[..., :t_steps], t_mel.numpy(), atol=2e-3, rtol=1e-2
    )
    assert int(j_lens[0]) == int(t_lens[0])


def test_masked_padding_forward(models):
    _, jmodel, variables = models
    jmodel_masked = Tacotron2(**{**CFG, "mask_padding": True})
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, CFG["n_symbol"], (2, 6)).astype(np.int32))
    mel = jnp.asarray(rng.standard_normal((2, CFG["n_mels"], 10)).astype(np.float32))
    out = jmodel_masked.apply(
        variables, tokens, jnp.asarray([6, 4]), mel, jnp.asarray([10, 7]), prenet_dropout=False
    )
    mel_out = np.asarray(out[0])
    assert (mel_out[1, :, 7:] == 0).all()


def test_init_params_are_concrete():
    """model.init must not leak scan-body tracers (decoder params are created
    eagerly before the lax.scan; regression for the init-inside-scan bug)."""
    model = Tacotron2(**CFG)
    tok = jnp.ones((2, 6), jnp.int32)
    tl = jnp.full((2,), 6, jnp.int32)
    mel = jnp.zeros((2, CFG["n_mels"], 10))
    ml = jnp.full((2,), 10, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), tok, tl, mel, ml, prenet_dropout=False)
    for leaf in jax.tree_util.tree_leaves(variables):
        np.asarray(leaf)  # raises on tracers
    # and the params must be usable in a fresh apply + grad
    out = model.apply(variables, tok, tl, mel, ml, prenet_dropout=False)
    assert out[0].shape == (2, CFG["n_mels"], 10)
    inf_vars = model.init(jax.random.PRNGKey(0), tok, tl, method=Tacotron2.infer, max_steps=4)
    for leaf in jax.tree_util.tree_leaves(inf_vars):
        np.asarray(leaf)
