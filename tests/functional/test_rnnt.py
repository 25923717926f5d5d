"""RNN-T loss tests vs a from-scratch numpy transducer oracle (the same
role as the reference's NumPy oracle, rnnt_utils.py:48-191) and finite
differences."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import audio_tpu.functional as F
from audio_tpu.ops.rnnt import rnnt_loss_core


def _np_log_softmax(x):
    m = x.max(axis=-1, keepdims=True)
    s = np.log(np.exp(x - m).sum(axis=-1, keepdims=True))
    return x - m - s


def _np_transducer_cost(logits, targets, t_len, u_len, blank):
    """Direct O(T·U) numpy DP: returns -log P(y|x) for one sequence."""
    lp = _np_log_softmax(logits.astype(np.float64))
    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            if t == 0 and u == 0:
                continue
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + lp[t, u - 1, targets[u - 1]])
            alpha[t, u] = np.logaddexp.reduce(cands)
    return -(alpha[t_len - 1, u_len] + lp[t_len - 1, u_len, blank])


def _rand_case(rng, b, t_max, u_max, v):
    logits = rng.standard_normal((b, t_max, u_max + 1, v)).astype(np.float32)
    targets = rng.integers(1, v, size=(b, u_max)).astype(np.int32)
    t_lens = rng.integers(max(2, u_max), t_max + 1, size=b).astype(np.int32)
    t_lens[0] = t_max
    u_lens = rng.integers(1, u_max + 1, size=b).astype(np.int32)
    u_lens[0] = u_max
    return logits, targets, t_lens, u_lens


class TestRnntLossForward:
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_numpy_oracle(self, seed):
        rng = np.random.default_rng(seed)
        b, t_max, u_max, v = 3, 9, 4, 6
        logits, targets, t_lens, u_lens = _rand_case(rng, b, t_max, u_max, v)
        costs = np.asarray(
            F.rnnt_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(t_lens),
                        jnp.asarray(u_lens), blank=0, reduction="none")
        )
        for i in range(b):
            expected = _np_transducer_cost(logits[i], targets[i], int(t_lens[i]), int(u_lens[i]), 0)
            np.testing.assert_allclose(costs[i], expected, rtol=1e-4, atol=1e-4)

    def test_negative_blank_reinterpreted(self):
        rng = np.random.default_rng(0)
        b, t_max, u_max, v = 2, 6, 3, 5
        logits = rng.standard_normal((b, t_max, u_max + 1, v)).astype(np.float32)
        targets = rng.integers(0, v - 1, size=(b, u_max)).astype(np.int32)
        t_lens = np.full(b, t_max, np.int32)
        u_lens = np.full(b, u_max, np.int32)
        c1 = np.asarray(F.rnnt_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(t_lens),
                                    jnp.asarray(u_lens), blank=-1, reduction="none"))
        for i in range(b):
            expected = _np_transducer_cost(logits[i], targets[i], t_max, u_max, v - 1)
            np.testing.assert_allclose(c1[i], expected, rtol=1e-4, atol=1e-4)

    def test_reductions(self):
        rng = np.random.default_rng(2)
        logits, targets, t_lens, u_lens = _rand_case(rng, 4, 8, 3, 5)
        args = (jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(t_lens), jnp.asarray(u_lens))
        none = np.asarray(F.rnnt_loss(*args, blank=0, reduction="none"))
        np.testing.assert_allclose(float(F.rnnt_loss(*args, blank=0, reduction="mean")), none.mean(), rtol=1e-6)
        np.testing.assert_allclose(float(F.rnnt_loss(*args, blank=0, reduction="sum")), none.sum(), rtol=1e-6)

    def test_fused_log_softmax_off(self):
        """With pre-log-softmaxed inputs, fused off == fused on."""
        rng = np.random.default_rng(3)
        logits, targets, t_lens, u_lens = _rand_case(rng, 2, 7, 3, 5)
        lp = _np_log_softmax(logits).astype(np.float32)
        c_on = np.asarray(F.rnnt_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(t_lens),
                                      jnp.asarray(u_lens), blank=0, reduction="none"))
        c_off = np.asarray(F.rnnt_loss(jnp.asarray(lp), jnp.asarray(targets), jnp.asarray(t_lens),
                                       jnp.asarray(u_lens), blank=0, reduction="none", fused_log_softmax=False))
        np.testing.assert_allclose(c_on, c_off, rtol=1e-4, atol=1e-4)


class TestRnntLossGradients:
    @pytest.mark.parametrize("seed", range(3))
    def test_matches_finite_difference(self, seed):
        rng = np.random.default_rng(seed)
        b, t_max, u_max, v = 2, 5, 2, 4
        logits, targets, t_lens, u_lens = _rand_case(rng, b, t_max, u_max, v)
        logits64 = jnp.asarray(logits, jnp.float64)

        def loss(lg):
            return F.rnnt_loss(lg, jnp.asarray(targets), jnp.asarray(t_lens), jnp.asarray(u_lens),
                               blank=0, reduction="sum")

        g = np.asarray(jax.grad(loss)(logits64))
        eps = 1e-5
        idxs = [tuple(rng.integers(0, d) for d in logits.shape) for _ in range(12)]
        for idx in idxs:
            lp = np.asarray(logits64).copy()
            lm = lp.copy()
            lp[idx] += eps
            lm[idx] -= eps
            num = (float(loss(jnp.asarray(lp))) - float(loss(jnp.asarray(lm)))) / (2 * eps)
            np.testing.assert_allclose(g[idx], num, atol=1e-4, rtol=1e-3)

    def test_grad_zero_outside_valid_region(self):
        rng = np.random.default_rng(1)
        b, t_max, u_max, v = 2, 7, 3, 5
        logits, targets, t_lens, u_lens = _rand_case(rng, b, t_max, u_max, v)
        t_lens = np.array([7, 4], np.int32)
        u_lens = np.array([3, 1], np.int32)
        g = np.asarray(jax.grad(lambda lg: F.rnnt_loss(
            lg, jnp.asarray(targets), jnp.asarray(t_lens), jnp.asarray(u_lens), blank=0, reduction="sum"
        ))(jnp.asarray(logits)))
        assert np.abs(g[1, 4:, :, :]).max() == 0.0
        assert np.abs(g[1, :, 2:, :]).max() == 0.0

    def test_clamp(self):
        rng = np.random.default_rng(4)
        logits, targets, t_lens, u_lens = _rand_case(rng, 2, 6, 3, 5)
        clamp = 1e-3
        g = np.asarray(jax.grad(lambda lg: F.rnnt_loss(
            lg, jnp.asarray(targets), jnp.asarray(t_lens), jnp.asarray(u_lens),
            blank=0, clamp=clamp, reduction="sum"
        ))(jnp.asarray(logits)))
        assert np.abs(g).max() <= clamp + 1e-7

    def test_jit_and_vmap_safe(self):
        rng = np.random.default_rng(5)
        logits, targets, t_lens, u_lens = _rand_case(rng, 2, 6, 3, 5)
        f = jax.jit(lambda lg: F.rnnt_loss(lg, jnp.asarray(targets), jnp.asarray(t_lens),
                                           jnp.asarray(u_lens), blank=0, reduction="none"))
        c = np.asarray(f(jnp.asarray(logits)))
        assert c.shape == (2,)
        assert np.isfinite(c).all()
