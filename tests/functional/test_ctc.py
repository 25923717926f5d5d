"""CTC loss/decode tests vs torch.nn.functional.ctc_loss oracle."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audio_tpu.ops.ctc import ctc_greedy_decode, ctc_loss


def _case(seed, b=3, t=20, c=7, l=6):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, c)).astype(np.float64)
    lp = torch.log_softmax(torch.from_numpy(logits), -1).numpy()
    targets = rng.integers(1, c, (b, l))
    il = rng.integers(l * 2 + 2, t + 1, b)
    il[0] = t
    tl = rng.integers(1, l + 1, b)
    tl[0] = l
    return logits, lp, targets, il, tl


class TestCtcLoss:
    @pytest.mark.parametrize("seed", range(4))
    def test_loss_matches_torch(self, seed):
        _, lp, targets, il, tl = _case(seed)
        expected = torch.nn.functional.ctc_loss(
            torch.from_numpy(lp).transpose(0, 1), torch.from_numpy(targets),
            torch.from_numpy(il), torch.from_numpy(tl), blank=0, reduction="none",
        ).numpy()
        got = np.asarray(
            ctc_loss(jnp.asarray(lp), jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl), blank=0, reduction="none")
        )
        np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-6)

    def test_reductions_match_torch_semantics(self):
        _, lp, targets, il, tl = _case(7)
        for reduction in ("mean", "sum"):
            expected = float(torch.nn.functional.ctc_loss(
                torch.from_numpy(lp).transpose(0, 1), torch.from_numpy(targets),
                torch.from_numpy(il), torch.from_numpy(tl), blank=0, reduction=reduction,
            ))
            got = float(ctc_loss(jnp.asarray(lp), jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl),
                                 blank=0, reduction=reduction))
            np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_end_to_end_gradient_matches_torch(self):
        """Grad wrt raw logits through log_softmax must match torch (torch's
        grad wrt log_probs alone is its documented implicit-logits quirk)."""
        logits, _, targets, il, tl = _case(1)
        g_j = np.asarray(jax.grad(lambda u: ctc_loss(
            jax.nn.log_softmax(u, -1), jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl),
            blank=0, reduction="sum"))(jnp.asarray(logits)))
        u = torch.from_numpy(logits).requires_grad_(True)
        torch.nn.functional.ctc_loss(
            torch.log_softmax(u, -1).transpose(0, 1), torch.from_numpy(targets),
            torch.from_numpy(il), torch.from_numpy(tl), blank=0, reduction="sum",
        ).backward()
        np.testing.assert_allclose(g_j, u.grad.numpy(), atol=1e-5, rtol=1e-5)

    def test_gradient_matches_finite_difference(self):
        logits, lp, targets, il, tl = _case(2, b=1, t=8, c=4, l=2)
        f = lambda x: ctc_loss(x, jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl), blank=0, reduction="sum")
        g = np.asarray(jax.grad(f)(jnp.asarray(lp)))
        eps = 1e-6
        num = np.zeros_like(lp)
        for t in range(lp.shape[1]):
            for c in range(lp.shape[2]):
                p1, p2 = lp.copy(), lp.copy()
                p1[0, t, c] += eps
                p2[0, t, c] -= eps
                num[0, t, c] = (float(f(jnp.asarray(p1))) - float(f(jnp.asarray(p2)))) / (2 * eps)
        np.testing.assert_allclose(g, num, atol=1e-5)


class TestGreedyDecode:
    def test_collapse_and_blank_removal(self):
        # emissions strongly peaked: [1 1 0 2 2 2 0 0 1]
        seq = [1, 1, 0, 2, 2, 2, 0, 0, 1]
        lp = np.full((1, len(seq), 3), -10.0, np.float32)
        for t, s in enumerate(seq):
            lp[0, t, s] = 0.0
        tokens, counts = ctc_greedy_decode(jnp.asarray(lp))
        assert int(counts[0]) == 3
        np.testing.assert_array_equal(np.asarray(tokens)[0, :3], [1, 2, 1])

    def test_respects_lengths(self):
        seq = [1, 1, 2, 2]
        lp = np.full((1, 4, 3), -10.0, np.float32)
        for t, s in enumerate(seq):
            lp[0, t, s] = 0.0
        tokens, counts = ctc_greedy_decode(jnp.asarray(lp), jnp.asarray([2]))
        assert int(counts[0]) == 1
        assert int(tokens[0, 0]) == 1
