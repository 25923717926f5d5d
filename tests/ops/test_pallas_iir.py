"""Pallas IIR kernel vs the scan reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_tpu.ops.iir import iir_blocked, iir_scan
from audio_tpu.ops.pallas_iir import iir_pallas


@pytest.mark.parametrize(
    "b,c,t,order",
    # order 16 exercises the matmul state fold (> _FOLD_MAX_ORDER), the rest
    # the rank-`order` VPU fold
    [(4, 2, 300, 2), (3, 1, 1000, 4), (2, 3, 129, 1), (1, 1, 500, 6), (2, 1, 400, 16)],
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


def test_lfilter_fused_matches_composed():
    from audio_tpu.ops.iir import iir_apply, lfilter_fused
    from audio_tpu.functional._filtering import _fir_causal
    import jax

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 2, 700)).astype(np.float32) * 0.1)
    a = jnp.asarray(np.array([[1.0, -0.5, 0.2], [1.0, 0.3, -0.1]], np.float32))
    b = jnp.asarray(np.array([[0.3, 0.2, 0.1], [0.5, -0.2, 0.0]], np.float32))
    ref = iir_apply(_fir_causal(x, b), a)
    got = lfilter_fused(x, a, b, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    # gradient parity through the custom VJP
    f_ref = lambda x, a, b: jnp.sum(jnp.sin(iir_apply(_fir_causal(x, b), a)))
    f_fus = lambda x, a, b: jnp.sum(jnp.sin(lfilter_fused(x, a, b, True)))
    for gr, gf in zip(jax.grad(f_ref, (0, 1, 2))(x, a, b), jax.grad(f_fus, (0, 1, 2))(x, a, b)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-5, rtol=1e-4)
