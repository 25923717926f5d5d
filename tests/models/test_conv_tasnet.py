"""ConvTasNet parity vs reference torch with shared weights."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_tpu.models.conv_tasnet import ConvTasNet, import_conv_tasnet_state_dict


@pytest.fixture(scope="module")
def ref():
    if "_ref_tasnet" in sys.modules:
        return sys.modules["_ref_tasnet"]
    spec = importlib.util.spec_from_file_location("_ref_tasnet", "/root/reference/src/torchaudio/models/conv_tasnet.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["_ref_tasnet"] = m
    spec.loader.exec_module(m)
    return m


CFG = dict(
    num_sources=2,
    enc_kernel_size=16,
    enc_num_feats=32,
    msk_kernel_size=3,
    msk_num_feats=16,
    msk_num_hidden_feats=32,
    msk_num_layers=3,
    msk_num_stacks=2,
    msk_activate="sigmoid",
)


@pytest.mark.parametrize("activate", ["sigmoid", "relu"])
def test_parity(ref, activate):
    cfg = {**CFG, "msk_activate": activate}
    torch.manual_seed(0)
    tmodel = ref.ConvTasNet(**cfg)
    tmodel.eval()
    variables = import_conv_tasnet_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})
    jmodel = ConvTasNet(**cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 1000)).astype(np.float32) * 0.1
    with torch.no_grad():
        expected = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(jmodel.apply(variables, jnp.asarray(x)))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_unaligned_length_padding(ref):
    torch.manual_seed(1)
    tmodel = ref.ConvTasNet(**CFG)
    tmodel.eval()
    variables = import_conv_tasnet_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})
    jmodel = ConvTasNet(**CFG)
    x = np.random.default_rng(1).standard_normal((1, 1, 777)).astype(np.float32) * 0.1
    with torch.no_grad():
        expected = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(jmodel.apply(variables, jnp.asarray(x)))
    assert got.shape == expected.shape == (1, 2, 777)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_init():
    model = ConvTasNet(**CFG)
    x = jnp.zeros((1, 1, 800))
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out.shape == (1, 2, 800)
