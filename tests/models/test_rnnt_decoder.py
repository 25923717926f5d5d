"""RNNT beam search: compare decoded sequences with the reference torch
decoder running the same model weights."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_tpu.models.rnnt import emformer_rnnt_model, import_rnnt_state_dict
from audio_tpu.models.rnnt_decoder import RNNTBeamSearch

from .test_rnnt import CFG, ref  # reuse the reference loader fixture


@pytest.fixture(scope="module")
def ref_decoder(ref):
    if "_ref_rnnt_decoder" in sys.modules:
        return sys.modules["_ref_rnnt_decoder"]
    stub_ta = types.ModuleType("torchaudio")
    stub_models = types.ModuleType("torchaudio.models")
    stub_models.RNNT = ref.RNNT
    stub_ta.models = stub_models
    had_ta = sys.modules.get("torchaudio")
    had_models = sys.modules.get("torchaudio.models")
    sys.modules["torchaudio"] = stub_ta
    sys.modules["torchaudio.models"] = stub_models
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_rnnt_decoder", "/root/reference/src/torchaudio/models/rnnt_decoder.py"
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules["_ref_rnnt_decoder"] = m
        spec.loader.exec_module(m)
    finally:
        for name, had in (("torchaudio", had_ta), ("torchaudio.models", had_models)):
            if had is not None:
                sys.modules[name] = had
            else:
                sys.modules.pop(name, None)
    return m


@pytest.fixture(scope="module")
def decoders(ref, ref_decoder):
    torch.manual_seed(3)
    tmodel = ref.emformer_rnnt_model(**CFG)
    tmodel.eval()
    params = {"params": import_rnnt_state_dict({k: v.numpy() for k, v in tmodel.state_dict().items()})}
    jmodel = emformer_rnnt_model(**CFG)
    # blank must be the last vocab index (the reference decoder's scoring
    # assumption, rnnt_decoder.py:62-67)
    blank = CFG["num_symbols"] - 1
    t_dec = ref_decoder.RNNTBeamSearch(tmodel, blank=blank, step_max_tokens=10)
    j_dec = RNNTBeamSearch(jmodel, params, blank=blank, step_max_tokens=10, max_tokens=64)
    return t_dec, j_dec, blank


class TestRNNTBeamSearch:
    @pytest.mark.parametrize("seed", range(3))
    @pytest.mark.parametrize("beam_width", [1, 4])
    def test_top1_matches_reference(self, decoders, seed, beam_width):
        t_dec, j_dec, blank = decoders
        rng = np.random.default_rng(seed)
        t_len = CFG["segment_length"] * 2 + CFG["right_context_length"]
        x = rng.standard_normal((t_len, CFG["input_dim"])).astype(np.float32)
        with torch.no_grad():
            t_hypos = t_dec(torch.from_numpy(x), torch.tensor(t_len), beam_width)
        t_top = t_hypos[0][0][1:]  # drop the initial blank token
        t_score = t_hypos[0][3]

        j_beam = j_dec.forward(jnp.asarray(x), jnp.asarray(t_len), beam_width)
        j_top = RNNTBeamSearch.hypo_tokens(j_beam, 0)
        assert j_top == list(t_top), (j_top, t_top)
        np.testing.assert_allclose(float(j_beam.scores[0]), t_score, atol=1e-3)

    @pytest.mark.parametrize("seed", range(2))
    def test_top1_matches_reference_smt4(self, ref, ref_decoder, seed):
        """step_max_tokens=4 — the serving configuration the streaming bench
        uses — is semantics-exact vs the reference at the same setting."""
        torch.manual_seed(3)
        tmodel = ref.emformer_rnnt_model(**CFG)
        tmodel.eval()
        params = {"params": import_rnnt_state_dict(
            {k: v.numpy() for k, v in tmodel.state_dict().items()})}
        jmodel = emformer_rnnt_model(**CFG)
        blank = CFG["num_symbols"] - 1
        t_dec = ref_decoder.RNNTBeamSearch(tmodel, blank=blank, step_max_tokens=4)
        j_dec = RNNTBeamSearch(jmodel, params, blank=blank, step_max_tokens=4,
                               max_tokens=64)
        rng = np.random.default_rng(100 + seed)
        t_len = CFG["segment_length"] * 2 + CFG["right_context_length"]
        x = rng.standard_normal((t_len, CFG["input_dim"])).astype(np.float32)
        with torch.no_grad():
            t_hypos = t_dec(torch.from_numpy(x), torch.tensor(t_len), 4)
        j_beam = j_dec.forward(jnp.asarray(x), jnp.asarray(t_len), 4)
        assert RNNTBeamSearch.hypo_tokens(j_beam, 0) == list(t_hypos[0][0][1:])
        np.testing.assert_allclose(float(j_beam.scores[0]), t_hypos[0][3], atol=1e-3)

    def test_static_expansion_matches_while_loop(self, decoders):
        """The unrolled inner loop (serving config) is result-identical to
        the early-exit while_loop: an empty a-set contributes no-op merges."""
        _, j_dec, blank = decoders
        rng = np.random.default_rng(11)
        t_len = CFG["segment_length"] * 2 + CFG["right_context_length"]
        x = rng.standard_normal((t_len, CFG["input_dim"])).astype(np.float32)
        beam_dyn = j_dec.forward(jnp.asarray(x), jnp.asarray(t_len), 4)
        j_dec.static_expansion = True
        try:
            beam_sta = j_dec.forward(jnp.asarray(x), jnp.asarray(t_len), 4)
        finally:
            j_dec.static_expansion = False
        for a, b in zip(jax.tree_util.tree_leaves(beam_dyn._replace(pred_state=None)),
                        jax.tree_util.tree_leaves(beam_sta._replace(pred_state=None))):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32), atol=1e-5)

    @pytest.mark.parametrize("path", ["rowstats", "joinfused"])
    def test_fused_topk_selection_matches_pooled(self, decoders, monkeypatch, path):
        """The TPU production paths decode identically to the pooled-top_k
        path — forced on CPU via the interpret-mode kernels.

        ``rowstats``: Pallas one-read lse/blank/top-k over the materialized
        join logits.  ``joinfused``: the joiner matmul fused into the same
        kernel (logits never materialized)."""
        import functools

        from audio_tpu.ops import pallas_rnnt_lps as lps

        _, j_dec, blank = decoders
        rng = np.random.default_rng(21)
        t_len = CFG["segment_length"] * 2 + CFG["right_context_length"]
        x = jnp.asarray(rng.standard_normal((t_len, CFG["input_dim"])).astype(np.float32))
        beam_plain = j_dec.forward(x, jnp.asarray(t_len), 4)
        monkeypatch.setattr(lps, "use_row_stats_kernel", lambda: True)
        monkeypatch.setattr(
            lps, "row_stats_topk",
            functools.partial(lps.row_stats_topk, interpret=True))
        monkeypatch.setattr(
            lps, "join_stats_topk",
            functools.partial(lps.join_stats_topk, interpret=True))
        if path == "rowstats":
            monkeypatch.setattr(type(j_dec), "_can_fuse_join", lambda self: False)
        beam_fused = j_dec.forward(x, jnp.asarray(t_len), 4)
        np.testing.assert_array_equal(np.asarray(beam_fused.tokens),
                                      np.asarray(beam_plain.tokens))
        np.testing.assert_array_equal(np.asarray(beam_fused.counts),
                                      np.asarray(beam_plain.counts))
        np.testing.assert_allclose(np.asarray(beam_fused.scores),
                                   np.asarray(beam_plain.scores),
                                   rtol=1e-5, atol=1e-5)

    def test_fast_predict_matches_flax(self, decoders, monkeypatch):
        """The Pallas LSTM-step predictor path decodes identically (scores
        to tolerance, tokens exactly) to the flax ``model.predict`` path —
        forced on CPU via the interpret-mode kernel."""
        import functools

        from audio_tpu.ops import pallas_lstm as plstm

        _, j_dec, blank = decoders
        rng = np.random.default_rng(23)
        t_len = CFG["segment_length"] * 2 + CFG["right_context_length"]
        x = jnp.asarray(rng.standard_normal((t_len, CFG["input_dim"])).astype(np.float32))
        beam_plain = j_dec.forward(x, jnp.asarray(t_len), 4)
        monkeypatch.setenv("AUDIO_TPU_LSTM_KERNEL", "1")
        monkeypatch.setattr(plstm, "use_lstm_kernel", lambda: True)
        monkeypatch.setattr(
            plstm, "lstm_gate_step",
            functools.partial(plstm.lstm_gate_step, interpret=True))
        beam_fused = j_dec.forward(x, jnp.asarray(t_len), 4)
        np.testing.assert_array_equal(np.asarray(beam_fused.tokens),
                                      np.asarray(beam_plain.tokens))
        np.testing.assert_array_equal(np.asarray(beam_fused.counts),
                                      np.asarray(beam_plain.counts))
        np.testing.assert_allclose(np.asarray(beam_fused.scores),
                                   np.asarray(beam_plain.scores),
                                   rtol=1e-5, atol=1e-5)

    def test_streaming_infer_runs(self, decoders):
        _, j_dec, _ = decoders
        rng = np.random.default_rng(5)
        seg = CFG["segment_length"] + CFG["right_context_length"]
        state, hypo = None, None
        for _ in range(3):
            x = jnp.asarray(rng.standard_normal((seg, CFG["input_dim"])).astype(np.float32))
            hypo, state = j_dec.infer(x, jnp.asarray(seg), 4, state, hypo)
        tokens = RNNTBeamSearch.hypo_tokens(hypo, 0)
        assert isinstance(tokens, list)
        assert np.isfinite(float(hypo.scores[0]))

    def test_forward_batch_matches_per_stream(self, decoders):
        """vmap-batched offline search == S independent forward calls."""
        _, j_dec, _ = decoders
        rng = np.random.default_rng(7)
        t_len = CFG["segment_length"] + CFG["right_context_length"]
        s = 3
        x = jnp.asarray(rng.standard_normal((s, t_len, CFG["input_dim"])).astype(np.float32))
        lens = jnp.full((s,), t_len, jnp.int32)

        batched = jax.jit(lambda inp, ln: j_dec.forward_batch(inp, ln, 4))(x, lens)
        for i in range(s):
            single = j_dec.forward(x[i], jnp.asarray(t_len), 4)
            np.testing.assert_array_equal(np.asarray(batched.tokens[i]), np.asarray(single.tokens))
            np.testing.assert_array_equal(np.asarray(batched.counts[i]), np.asarray(single.counts))
            np.testing.assert_allclose(np.asarray(batched.scores[i]), np.asarray(single.scores),
                                       rtol=1e-5, atol=1e-5)

    def test_forward_batch_ragged_lengths(self, decoders):
        """Padded streams with different valid lengths == per-stream forward
        on the unpadded inputs (the beam freezes at each stream's encoder
        output length)."""
        _, j_dec, _ = decoders
        rng = np.random.default_rng(9)
        seg, rc = CFG["segment_length"], CFG["right_context_length"]
        t_long, t_short = seg * 2 + rc, seg + rc
        d = CFG["input_dim"]
        x_long = rng.standard_normal((t_long, d)).astype(np.float32)
        x_short = rng.standard_normal((t_short, d)).astype(np.float32)
        padded = np.zeros((2, t_long, d), np.float32)
        padded[0] = x_long
        padded[1, :t_short] = x_short
        # the encoder contract: lengths EXCLUDE the trailing right-context
        # frames (the recipe right-pads features, lightning.py:79-118)
        lens = jnp.asarray([t_long - rc, t_short - rc], jnp.int32)

        batched = jax.jit(lambda inp, ln: j_dec.forward_batch(inp, ln, 4))(
            jnp.asarray(padded), lens
        )
        for i, (x, t) in enumerate(((x_long, t_long - rc), (x_short, t_short - rc))):
            single = j_dec.forward(jnp.asarray(x), jnp.asarray(t), 4)
            np.testing.assert_array_equal(np.asarray(batched.tokens[i]), np.asarray(single.tokens))
            np.testing.assert_array_equal(np.asarray(batched.counts[i]), np.asarray(single.counts))
            np.testing.assert_allclose(np.asarray(batched.scores[i]), np.asarray(single.scores),
                                       rtol=1e-5, atol=1e-5)

    def test_infer_batch_matches_per_stream(self, decoders):
        """Batched streaming (carried state+beam) == per-stream infer chains."""
        _, j_dec, _ = decoders
        rng = np.random.default_rng(8)
        seg = CFG["segment_length"] + CFG["right_context_length"]
        s, n_segments = 3, 2
        segs = [jnp.asarray(rng.standard_normal((s, seg, CFG["input_dim"])).astype(np.float32))
                for _ in range(n_segments)]
        lens = jnp.full((s,), seg, jnp.int32)

        step = jax.jit(lambda inp, h, st: j_dec.infer_batch(inp, lens, 4, st, h))
        hypos, state = None, None
        for x in segs:
            hypos, state = step(x, hypos, state)

        for i in range(s):
            h1, st1 = None, None
            for x in segs:
                h1, st1 = j_dec.infer(x[i], jnp.asarray(seg), 4, st1, h1)
            np.testing.assert_array_equal(np.asarray(hypos.tokens[i]), np.asarray(h1.tokens))
            np.testing.assert_array_equal(np.asarray(hypos.counts[i]), np.asarray(h1.counts))
            np.testing.assert_allclose(np.asarray(hypos.scores[i]), np.asarray(h1.scores),
                                       rtol=1e-5, atol=1e-5)

    def test_search_is_jittable(self, decoders):
        _, j_dec, _ = decoders
        rng = np.random.default_rng(6)
        t_len = CFG["segment_length"] + CFG["right_context_length"]
        x = jnp.asarray(rng.standard_normal((t_len, CFG["input_dim"])).astype(np.float32))

        fwd = jax.jit(lambda inp, ln: j_dec.forward(inp, ln, 4))
        beam = fwd(x, jnp.asarray(t_len))
        beam2 = fwd(x, jnp.asarray(t_len))
        np.testing.assert_array_equal(np.asarray(beam.tokens), np.asarray(beam2.tokens))


def test_greedy_decode_matches_per_sample_reference():
    """Batched jitted greedy == a per-sample python greedy on the same model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audio_tpu.models import rnnt_greedy_decode

    model = emformer_rnnt_model(**CFG)
    b, t_in = 3, 20  # matches the forward test's valid segment tiling (t=20)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((b, t_in, CFG["input_dim"])), jnp.float32)
    lens = jnp.asarray([16, 16, 12], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens,
                        jnp.zeros((b, 2), jnp.int32), jnp.asarray([2] * b),
                        deterministic=True)

    tokens, counts = jax.jit(
        lambda f, l: rnnt_greedy_decode(model, params, f, l, blank=0, max_symbols_per_step=4)
    )(feats, lens)
    tokens, counts = np.asarray(tokens), np.asarray(counts)

    # per-sample python reference greedy using the same model methods
    for i in range(b):
        enc, enc_len = model.apply(params, feats[i:i+1], lens[i:i+1],
                                   deterministic=True, method=model.transcribe)
        one = jnp.ones((1,), jnp.int32)
        pred_out, _, state = model.apply(params, jnp.full((1, 1), 0, jnp.int32), one, None,
                                         deterministic=True, method=model.predict)
        out = []
        for t in range(int(enc_len[0])):
            for _ in range(4):
                joined, _, _ = model.apply(params, enc[:, t:t+1], one, pred_out, one,
                                           method=model.join)
                tok = int(jnp.argmax(joined[0, 0, 0]))
                if tok == 0:
                    break
                out.append(tok)
                pred_out, _, state = model.apply(params, jnp.full((1, 1), tok, jnp.int32),
                                                 one, state, deterministic=True,
                                                 method=model.predict)
        assert counts[i] == len(out), (i, counts[i], out)
        assert tokens[i, : len(out)].tolist() == out
