"""Lattice row-stats kernel vs the jnp oracle (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from audio_tpu.ops.pallas_rnnt_lps import (
    lattice_row_stats,
    lattice_row_stats_reference,
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
