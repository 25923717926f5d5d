"""Conformer parity vs the reference torch implementation with shared weights."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_tpu.models.conformer import Conformer, import_conformer_state_dict


@pytest.fixture(scope="module")
def ref():
    if "_ref_conformer" in sys.modules:
        return sys.modules["_ref_conformer"]
    spec = importlib.util.spec_from_file_location(
        "_ref_conformer", "/root/reference/src/torchaudio/models/conformer.py"
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules["_ref_conformer"] = m
    spec.loader.exec_module(m)
    return m


@pytest.mark.parametrize("use_group_norm,convolution_first", [(False, False), (True, True), (True, False)])
def test_parity_with_reference(ref, use_group_norm, convolution_first):
    torch.manual_seed(0)
    kwargs = dict(
        input_dim=32, num_heads=4, ffn_dim=64, num_layers=2, depthwise_conv_kernel_size=31,
        dropout=0.0, use_group_norm=use_group_norm, convolution_first=convolution_first,
    )
    tmodel = ref.Conformer(**kwargs)
    tmodel.eval()
    variables = import_conformer_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})
    jmodel = Conformer(**kwargs)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 40, 32)).astype(np.float32)
    lengths = np.array([40, 30, 20], np.int64)
    with torch.no_grad():
        t_out, t_lens = tmodel(torch.from_numpy(x), torch.from_numpy(lengths))
    j_out, j_lens = jmodel.apply(variables, jnp.asarray(x), jnp.asarray(lengths), deterministic=True)
    np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())
    for i, l in enumerate(lengths):
        err = np.abs(np.asarray(j_out)[i, :l] - t_out.numpy()[i, :l]).max()
        assert err < 2e-4, err


def test_init_and_shapes():
    model = Conformer(input_dim=16, num_heads=4, ffn_dim=32, num_layers=2, depthwise_conv_kernel_size=7)
    x = jnp.zeros((2, 20, 16))
    lengths = jnp.asarray([20, 10])
    variables = model.init(jax.random.PRNGKey(0), x, lengths, deterministic=True)
    out, out_lengths = model.apply(variables, x, lengths, deterministic=True)
    assert out.shape == (2, 20, 16)
    np.testing.assert_array_equal(np.asarray(out_lengths), [20, 10])
