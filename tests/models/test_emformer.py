"""Emformer parity: forward + streaming infer vs reference torch with shared
weights, plus the reference's own streaming-vs-offline consistency check
(emformer_test_impl.py:21-113 role)."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_tpu.models.emformer import Emformer, import_emformer_state_dict


@pytest.fixture(scope="module")
def ref():
    if "_ref_emformer" in sys.modules:
        return sys.modules["_ref_emformer"]
    spec = importlib.util.spec_from_file_location("_ref_emformer", "/root/reference/src/torchaudio/models/emformer.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["_ref_emformer"] = m
    spec.loader.exec_module(m)
    return m


CFG = dict(
    input_dim=32,
    num_heads=4,
    ffn_dim=64,
    num_layers=2,
    segment_length=4,
    left_context_length=8,
    right_context_length=2,
    max_memory_size=2,
    dropout=0.0,
)


def _models(ref, **overrides):
    cfg = {**CFG, **overrides}
    torch.manual_seed(0)
    tmodel = ref.Emformer(**cfg)
    tmodel.eval()
    params = {"params": import_emformer_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})}
    jmodel = Emformer(**cfg)
    return tmodel, jmodel, params


class TestEmformerForward:
    @pytest.mark.parametrize("max_memory_size", [0, 2])
    def test_forward_parity(self, ref, max_memory_size):
        tmodel, jmodel, params = _models(ref, max_memory_size=max_memory_size)
        rng = np.random.default_rng(0)
        b, t = 3, 16 + CFG["right_context_length"]
        x = rng.standard_normal((b, t, CFG["input_dim"])).astype(np.float32)
        lengths = np.array([16, 16, 16], np.int64)
        with torch.no_grad():
            t_out, t_lens = tmodel(torch.from_numpy(x), torch.from_numpy(lengths))
        j_out, j_lens = jmodel.apply(params, jnp.asarray(x), jnp.asarray(lengths), deterministic=True)
        np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4, rtol=1e-3)

    def test_forward_variable_lengths(self, ref):
        tmodel, jmodel, params = _models(ref)
        rng = np.random.default_rng(1)
        b, t = 2, 16 + CFG["right_context_length"]
        x = rng.standard_normal((b, t, CFG["input_dim"])).astype(np.float32)
        lengths = np.array([16, 10], np.int64)
        with torch.no_grad():
            t_out, _ = tmodel(torch.from_numpy(x), torch.from_numpy(lengths))
        j_out, _ = jmodel.apply(params, jnp.asarray(x), jnp.asarray(lengths), deterministic=True)
        for i, l in enumerate(lengths):
            np.testing.assert_allclose(
                np.asarray(j_out)[i, :l], t_out.numpy()[i, :l], atol=2e-4, rtol=1e-3
            )


class TestEmformerInfer:
    @pytest.mark.parametrize("max_memory_size", [0, 2])
    def test_streaming_parity(self, ref, max_memory_size):
        """Run 4 streaming steps with carried state; outputs must match the
        torch reference step by step."""
        tmodel, jmodel, params = _models(ref, max_memory_size=max_memory_size)
        rng = np.random.default_rng(2)
        b = 2
        seg = CFG["segment_length"] + CFG["right_context_length"]
        t_states = None
        j_states = None
        for step in range(4):
            x = rng.standard_normal((b, seg, CFG["input_dim"])).astype(np.float32)
            lengths = np.full((b,), seg, np.int64)
            with torch.no_grad():
                t_out, t_lens, t_states = tmodel.infer(torch.from_numpy(x), torch.from_numpy(lengths), t_states)
            j_out, j_lens, j_states = jmodel.apply(
                params, jnp.asarray(x), jnp.asarray(lengths), j_states, deterministic=True, method=jmodel.infer
            )
            np.testing.assert_array_equal(np.asarray(j_lens), t_lens.numpy())
            np.testing.assert_allclose(
                np.asarray(j_out), t_out.numpy(), atol=5e-4, rtol=1e-3, err_msg=f"step {step}"
            )

    def test_fused_attention_path_matches_einsum(self, ref, monkeypatch):
        """Module-level gate for the fused Pallas attention: forward + grads
        with AUDIO_TPU_FUSED_ATTENTION=interpret must equal the einsum path
        (the reference math) — incl. variable lengths and the memory bank."""
        tmodel, jmodel, params = _models(ref, max_memory_size=2)
        rng = np.random.default_rng(5)
        b, t = 3, 16 + CFG["right_context_length"]
        x = jnp.asarray(rng.standard_normal((b, t, CFG["input_dim"])).astype(np.float32))
        lengths = jnp.asarray([16, 12, 9], jnp.int32)

        def loss(params, x):
            out, _ = jmodel.apply(params, x, lengths, deterministic=True)
            return jnp.sum(out**2), out

        monkeypatch.setenv("AUDIO_TPU_FUSED_ATTENTION", "0")
        (l0, out0), g0 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(params, x)
        monkeypatch.setenv("AUDIO_TPU_FUSED_ATTENTION", "interpret")
        (l1, out1), g1 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(params, x)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for a, b_ in zip(flat1, flat0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-3)

    def test_infer_is_jittable(self, ref):
        _, jmodel, params = _models(ref)
        seg = CFG["segment_length"] + CFG["right_context_length"]
        b = 2
        x = jnp.zeros((b, seg, CFG["input_dim"]))
        lengths = jnp.full((b,), seg, jnp.int32)

        @jax.jit
        def step(x, lengths, states):
            return jmodel.apply(params, x, lengths, states, deterministic=True, method=jmodel.infer)

        out, lens, states = step(x, lengths, None)
        # second call with concrete states reuses the compiled path
        out2, _, states2 = step(x, lengths, states)
        assert out.shape == (b, CFG["segment_length"], CFG["input_dim"])
        assert np.isfinite(np.asarray(out2)).all()
