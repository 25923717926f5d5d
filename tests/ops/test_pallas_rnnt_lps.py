"""Lattice row-stats kernel vs the jnp oracle (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from audio_tpu.ops.pallas_rnnt_lps import (
    lattice_row_stats,
    lattice_row_stats_reference,
    row_stats_topk,
    row_stats_topk_reference,
)


def _check(shape, v, blank, dtype, seed=0, tol=1e-5):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape + (v,)).astype(np.float32))
    if dtype == "bf16":
        x = x.astype(jnp.bfloat16)
        tol = 1e-2
    tgt = jnp.asarray(rng.integers(0, v, shape).astype(np.int32))
    got = lattice_row_stats(x, tgt, blank, interpret=True)
    ref = lattice_row_stats_reference(x, tgt, blank)
    for name, a, b in zip(("lse", "blank", "label"), got, ref):
        assert a.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=tol, rtol=tol, err_msg=name)


class TestLatticeRowStats:
    def test_4d_band_lattice(self):
        _check((2, 6, 4), 33, 0, "f32")

    def test_blank_last(self):
        _check((3, 5, 3), 17, 16, "f32")

    def test_bf16(self):
        _check((2, 4, 4), 64, 0, "bf16")

    def test_row_padding(self):
        # N = 2*3*5 = 30, not a multiple of 128 — exercises the pad path
        _check((2, 3, 5), 21, 0, "f32", seed=3)

    def test_3d_full_lattice_rows(self):
        _check((4, 7), 19, 0, "f32", seed=5)


def _check_topk(shape, v, k, dtype="f32", seed=0, tol=1e-5):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape + (v,)).astype(np.float32))
    if dtype == "bf16":
        x = x.astype(jnp.bfloat16)
        tol = 1e-2
    lse, blank, vals, idx = row_stats_topk(x, v - 1, k, interpret=True)
    rlse, rblank, rvals, ridx = row_stats_topk_reference(x, v - 1, k)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse),
                               atol=tol, rtol=tol, err_msg="lse")
    np.testing.assert_allclose(np.asarray(blank), np.asarray(rblank),
                               atol=tol, rtol=tol, err_msg="blank")
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rvals),
                               atol=tol, rtol=tol, err_msg="vals")
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))


class TestRowStatsTopK:
    def test_search_shape(self):
        # (S, K, V) beam-search join layout, blank last
        _check_topk((4, 5), 33, 3)

    def test_bf16_ties(self):
        # bf16 quantization makes in-row ties likely: idx must still match
        # lax.top_k's lowest-index tie order exactly
        _check_topk((3, 4), 64, 6, dtype="bf16", seed=2)

    def test_row_padding(self):
        _check_topk((2, 3, 5), 21, 4, seed=3)

    def test_k_exceeds_nothing(self):
        _check_topk((2, 2), 17, 10, seed=4)


class TestJoinStatsTopK:
    def _check(self, shape, d, v, k, dtype="f32", seed=0, tol=1e-5):
        from audio_tpu.ops.pallas_rnnt_lps import (
            join_stats_topk,
            join_stats_topk_reference,
        )

        rng = np.random.default_rng(seed)
        act = jnp.asarray(rng.standard_normal(shape + (d,)).astype(np.float32))
        w = jnp.asarray((rng.standard_normal((d, v)) * 0.2).astype(np.float32))
        b = jnp.asarray((rng.standard_normal((v,)) * 0.1).astype(np.float32))
        if dtype == "bf16":
            act, w, b = (t.astype(jnp.bfloat16) for t in (act, w, b))
            tol = 2e-2
        got = join_stats_topk(act, w, b, v - 1, k, interpret=True)
        ref = join_stats_topk_reference(act, w, b, v - 1, k)
        for name, a_, b_ in zip(("lse", "blank", "vals"), got[:3], ref[:3]):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       atol=tol, rtol=tol, err_msg=name)
        np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(ref[3]))

    def test_search_shape(self):
        _check = self._check
        _check((6, 4), 32, 65, 3)

    def test_bf16(self):
        self._check((4, 3), 64, 129, 5, dtype="bf16", seed=2)

    def test_row_padding(self):
        self._check((3, 7), 16, 33, 4, seed=3)


class TestLstmGateStep:
    def _check(self, n, hdim, dtype="f32", seed=0, tol=1e-5):
        from audio_tpu.ops.pallas_lstm import (
            lstm_gate_step,
            lstm_gate_step_reference,
        )

        rng = np.random.default_rng(seed)
        mk = lambda *s: jnp.asarray(  # noqa: E731
            rng.standard_normal(s).astype(np.float32) * 0.5)
        gx, h, c = mk(n, 4 * hdim), mk(n, hdim), mk(n, hdim)
        wp = mk(hdim, 4 * hdim) * 0.2
        gs, gb = 1.0 + 0.1 * mk(4 * hdim), 0.1 * mk(4 * hdim)
        cs, cb = 1.0 + 0.1 * mk(hdim), 0.1 * mk(hdim)
        if dtype == "bf16":
            gx, h, c, wp = (t.astype(jnp.bfloat16) for t in (gx, h, c, wp))
            tol = 2e-2
        got = lstm_gate_step(gx, h, c, wp, gs, gb, cs, cb, 1e-3,
                             interpret=True)
        ref = lstm_gate_step_reference(gx, h, c, wp, gs, gb, cs, cb, 1e-3)
        for name, a_, b_ in zip(("h", "c"), got, ref):
            np.testing.assert_allclose(
                np.asarray(a_, np.float32), np.asarray(b_, np.float32),
                atol=tol, rtol=tol, err_msg=name)

    def test_f32(self):
        self._check(48, 64)

    def test_bf16(self):
        self._check(32, 128, dtype="bf16", seed=2)

    def test_row_padding(self):
        self._check(30, 64, seed=3)
