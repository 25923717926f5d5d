"""Pallas IIR kernel vs the scan reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_tpu.ops.iir import iir_blocked, iir_scan
from audio_tpu.ops.pallas_iir import iir_pallas


@pytest.mark.parametrize(
    "b,c,t,order",
    [(4, 2, 300, 2), (3, 1, 1000, 4), (2, 3, 129, 1), (1, 1, 500, 6)],
)
def test_matches_scan(b, c, t, order):
    rng = np.random.default_rng(order)
    x = rng.standard_normal((b, c, t)).astype(np.float32)
    a = (0.2 * rng.standard_normal((c, order)) / np.arange(1, order + 1)).astype(np.float32)
    ref = np.asarray(iir_scan(jnp.asarray(x), jnp.asarray(a)))
    got = np.asarray(iir_pallas(jnp.asarray(x), jnp.asarray(a), interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_matches_blocked_long():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 5000)).astype(np.float32)
    a = np.array([[-1.62, 0.729]], np.float32)
    ref = np.asarray(iir_blocked(jnp.asarray(x), jnp.asarray(a)))
    got = np.asarray(iir_pallas(jnp.asarray(x), jnp.asarray(a), interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
