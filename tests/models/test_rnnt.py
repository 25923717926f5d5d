"""RNNT model parity vs reference torch implementation with shared weights."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_tpu.models.rnnt import emformer_rnnt_model, import_rnnt_state_dict


@pytest.fixture(scope="module")
def ref():
    if "_ref_rnnt" in sys.modules:
        return sys.modules["_ref_rnnt"]
    # rnnt.py does `from torchaudio.models import Emformer` — provide it from
    # the reference emformer module via a stub package.
    espec = importlib.util.spec_from_file_location("_ref_emf2", "/root/reference/src/torchaudio/models/emformer.py")
    emf = importlib.util.module_from_spec(espec)
    sys.modules["_ref_emf2"] = emf
    espec.loader.exec_module(emf)

    stub_ta = types.ModuleType("torchaudio")
    stub_models = types.ModuleType("torchaudio.models")
    stub_models.Emformer = emf.Emformer
    stub_ta.models = stub_models
    had_ta = sys.modules.get("torchaudio")
    had_models = sys.modules.get("torchaudio.models")
    sys.modules["torchaudio"] = stub_ta
    sys.modules["torchaudio.models"] = stub_models
    try:
        spec = importlib.util.spec_from_file_location("_ref_rnnt", "/root/reference/src/torchaudio/models/rnnt.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules["_ref_rnnt"] = m
        spec.loader.exec_module(m)
    finally:
        for name, had in (("torchaudio", had_ta), ("torchaudio.models", had_models)):
            if had is not None:
                sys.modules[name] = had
            else:
                sys.modules.pop(name, None)
    return m


CFG = dict(
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


@pytest.fixture(scope="module")
def models(ref):
    torch.manual_seed(0)
    tmodel = ref.emformer_rnnt_model(**CFG)
    tmodel.eval()
    params = {"params": import_rnnt_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})}
    jmodel = emformer_rnnt_model(**CFG)
    return tmodel, jmodel, params


class TestRNNT:
    def test_forward_parity(self, models):
        tmodel, jmodel, params = models
        rng = np.random.default_rng(0)
        b, t, u = 2, 20, 5  # t includes right context (16 + 4)
        sources = rng.standard_normal((b, t, CFG["input_dim"])).astype(np.float32)
        source_lengths = np.array([16, 16], np.int64)
        targets = rng.integers(0, CFG["num_symbols"], (b, u)).astype(np.int64)
        target_lengths = np.array([u, u - 2], np.int64)
        with torch.no_grad():
            t_out, t_sl, t_tl, _ = tmodel(
                torch.from_numpy(sources), torch.from_numpy(source_lengths),
                torch.from_numpy(targets), torch.from_numpy(target_lengths),
            )
        j_out, j_sl, j_tl, _ = jmodel.apply(
            params, jnp.asarray(sources), jnp.asarray(source_lengths),
            jnp.asarray(targets.astype(np.int32)), jnp.asarray(target_lengths), deterministic=True,
        )
        np.testing.assert_array_equal(np.asarray(j_sl), t_sl.numpy())
        np.testing.assert_array_equal(np.asarray(j_tl), t_tl.numpy())
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=5e-4, rtol=1e-3)

    def test_streaming_transcribe_parity(self, models):
        tmodel, jmodel, params = models
        rng = np.random.default_rng(1)
        b = 2
        seg = CFG["segment_length"] + CFG["right_context_length"]
        t_state, j_state = None, None
        for step in range(3):
            x = rng.standard_normal((b, seg, CFG["input_dim"])).astype(np.float32)
            lengths = np.full((b,), seg, np.int64)
            with torch.no_grad():
                t_out, t_lens, t_state = tmodel.transcribe_streaming(
                    torch.from_numpy(x), torch.from_numpy(lengths), t_state
                )
            j_out, j_lens, j_state = jmodel.apply(
                params, jnp.asarray(x), jnp.asarray(lengths), j_state,
                deterministic=True, method=jmodel.transcribe_streaming,
            )
            np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=1e-3, rtol=1e-3, err_msg=f"step {step}")

    def test_predictor_with_state(self, models):
        tmodel, jmodel, params = models
        rng = np.random.default_rng(2)
        targets = rng.integers(0, CFG["num_symbols"], (2, 1)).astype(np.int64)
        lengths = np.array([1, 1], np.int64)
        with torch.no_grad():
            t_out1, _, t_state = tmodel.predict(torch.from_numpy(targets), torch.from_numpy(lengths), None)
            t_out2, _, _ = tmodel.predict(torch.from_numpy(targets), torch.from_numpy(lengths), t_state)
        j_out1, _, j_state = jmodel.apply(
            params, jnp.asarray(targets.astype(np.int32)), jnp.asarray(lengths), None,
            deterministic=True, method=jmodel.predict,
        )
        j_out2, _, _ = jmodel.apply(
            params, jnp.asarray(targets.astype(np.int32)), jnp.asarray(lengths), j_state,
            deterministic=True, method=jmodel.predict,
        )
        np.testing.assert_allclose(np.asarray(j_out1), t_out1.numpy(), atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(j_out2), t_out2.numpy(), atol=5e-4, rtol=1e-3)

    def test_trains_with_rnnt_loss(self, models):
        _, jmodel, params = models
        import audio_tpu.functional as F

        rng = np.random.default_rng(3)
        b, t, u = 2, 20, 4
        sources = jnp.asarray(rng.standard_normal((b, t, CFG["input_dim"])).astype(np.float32))
        source_lengths = jnp.asarray([16, 16])
        targets = jnp.asarray(rng.integers(1, CFG["num_symbols"], (b, u)).astype(np.int32))
        target_lengths = jnp.asarray([u, u])
        prepended = jnp.pad(targets, ((0, 0), (1, 0)))  # blank-prepended for predictor

        def loss_fn(p):
            logits, src_l, tgt_l, _ = jmodel.apply(
                p, sources, source_lengths, prepended, target_lengths + 1, deterministic=True
            )
            return F.rnnt_loss(logits, targets, src_l, target_lengths, blank=0, reduction="sum")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
