"""Parity tests for forced_align vs a numpy replication of the reference
Viterbi loop (forced_align/cpu/compute.cpp:18-139) and torch.ctc oracles."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import audio_tpu.functional as F


def _reference_viterbi(log_probs, targets, blank):
    """Numpy replication of the reference's banded Viterbi (batch=1)."""
    t_max, _ = log_probs.shape
    l_len = len(targets)
    s = 2 * l_len + 1
    neg_inf = -np.inf
    alphas = np.full((2, s), neg_inf)
    back_ptr = np.full((t_max, s), -1, np.int8)
    r = sum(1 for i in range(1, l_len) if targets[i] == targets[i - 1])
    assert t_max >= l_len + r, "targets length is too long for CTC"
    start = 0 if t_max - (l_len + r) > 0 else 1
    end = 1 if s == 1 else 2
    for i in range(start, end):
        label = blank if i % 2 == 0 else targets[i // 2]
        alphas[0, i] = log_probs[0, label]
    for t in range(1, t_max):
        if t_max - t <= l_len + r:
            if start % 2 == 1 and targets[start // 2] != targets[start // 2 + 1]:
                start += 1
            start += 1
        if t <= l_len + r:
            if end % 2 == 0 and end < 2 * l_len and targets[end // 2 - 1] != targets[end // 2]:
                end += 1
            end += 1
        startloop = start
        cur, prev = t % 2, (t - 1) % 2
        alphas[cur, :] = neg_inf
        if start == 0:
            alphas[cur, 0] = alphas[prev, 0] + log_probs[t, blank]
            back_ptr[t, 0] = 0
            startloop += 1
        for i in range(startloop, end):
            x0 = alphas[prev, i]
            x1 = alphas[prev, i - 1]
            x2 = neg_inf
            label = blank if i % 2 == 0 else targets[i // 2]
            if i % 2 != 0 and i != 1 and targets[i // 2] != targets[i // 2 - 1]:
                x2 = alphas[prev, i - 2]
            if x2 > x1 and x2 > x0:
                result, back_ptr[t, i] = x2, 2
            elif x1 > x0 and x1 > x2:
                result, back_ptr[t, i] = x1, 1
            else:
                result, back_ptr[t, i] = x0, 0
            alphas[cur, i] = result + log_probs[t, label]
    idx1 = (t_max - 1) % 2
    ltr = s - 1 if alphas[idx1, s - 1] > alphas[idx1, s - 2] else s - 2
    paths = np.zeros(t_max, np.int64)
    for t in range(t_max - 1, -1, -1):
        label = blank if ltr % 2 == 0 else targets[ltr // 2]
        paths[t] = label
        ltr -= back_ptr[t, ltr]
    return paths


def _rand_problem(rng, t_max, l_len, vocab, blank=0):
    log_probs = np.log(rng.dirichlet(np.ones(vocab), size=t_max)).astype(np.float32)
    targets = rng.integers(1, vocab, size=l_len)
    # ensure feasibility: T >= L + repeats
    return log_probs, targets


class TestForcedAlign:
    @pytest.mark.parametrize("seed", range(8))
    def test_matches_reference_loop(self, seed):
        rng = np.random.default_rng(seed)
        t_max, l_len, vocab = 50, 12, 7
        log_probs, targets = _rand_problem(rng, t_max, l_len, vocab)
        expected = _reference_viterbi(log_probs, targets, 0)
        paths, scores = F.forced_align(jnp.asarray(log_probs)[None], jnp.asarray(targets)[None])
        np.testing.assert_array_equal(np.asarray(paths)[0], expected)
        expected_scores = log_probs[np.arange(t_max), expected]
        np.testing.assert_allclose(np.asarray(scores)[0], expected_scores, atol=1e-6)

    def test_path_is_valid_expansion(self):
        rng = np.random.default_rng(3)
        log_probs, targets = _rand_problem(rng, 60, 15, 10)
        paths, _ = F.forced_align(jnp.asarray(log_probs)[None], jnp.asarray(targets)[None])
        p = np.asarray(paths)[0]
        # collapsing repeats and removing blanks recovers the targets
        collapsed = [k for k, g in __import__("itertools").groupby(p) if k != 0]
        np.testing.assert_array_equal(collapsed, targets)

    def test_batched_matches_individual(self):
        rng = np.random.default_rng(11)
        t_max, vocab = 40, 6
        lens_t = [40, 31, 25]
        lens_l = [8, 5, 3]
        lps, tgts = [], []
        for tl, ll in zip(lens_t, lens_l):
            lp, tg = _rand_problem(rng, t_max, 8, vocab)
            tg[ll:] = 0
            lps.append(lp)
            tgts.append(tg)
        log_probs = jnp.asarray(np.stack(lps))
        targets = jnp.asarray(np.stack(tgts))
        paths_b, scores_b = F.forced_align(
            log_probs, targets, jnp.asarray(lens_t), jnp.asarray(lens_l)
        )
        for i, (tl, ll) in enumerate(zip(lens_t, lens_l)):
            paths_i, scores_i = F.forced_align(
                jnp.asarray(lps[i][:tl])[None], jnp.asarray(tgts[i][:ll])[None]
            )
            np.testing.assert_array_equal(np.asarray(paths_b)[i, :tl], np.asarray(paths_i)[0])
            np.testing.assert_allclose(np.asarray(scores_b)[i, :tl], np.asarray(scores_i)[0], atol=1e-6)
            assert (np.asarray(paths_b)[i, tl:] == 0).all()

    def test_validation(self):
        lp = jnp.zeros((1, 10, 5))
        with pytest.raises(ValueError, match="blank"):
            F.forced_align(lp, jnp.asarray([[0, 1]]))
        with pytest.raises(ValueError, match="less than"):
            F.forced_align(lp, jnp.asarray([[1, 7]]))

    def test_nonzero_blank(self):
        rng = np.random.default_rng(5)
        log_probs = np.log(rng.dirichlet(np.ones(6), size=30)).astype(np.float32)
        targets = np.array([0, 2, 3, 0])
        blank = 5
        expected = _reference_viterbi(log_probs, targets, blank)
        paths, _ = F.forced_align(jnp.asarray(log_probs)[None], jnp.asarray(targets)[None], blank=blank)
        np.testing.assert_array_equal(np.asarray(paths)[0], expected)


class TestMergeTokens:
    def test_merge(self):
        tokens = np.array([0, 0, 1, 1, 0, 2, 2, 2, 0, 1, 0])
        scores = np.arange(11, dtype=np.float32)
        spans = F.merge_tokens(tokens, scores)
        assert [(s.token, s.start, s.end) for s in spans] == [(1, 2, 4), (2, 5, 8), (1, 9, 10)]
        np.testing.assert_allclose(spans[0].score, (2 + 3) / 2)
        assert len(spans[0]) == 2

    def test_validation(self):
        with pytest.raises(ValueError, match="1D"):
            F.merge_tokens(np.zeros((2, 3)), np.zeros((2, 3)))
        with pytest.raises(ValueError, match="same length"):
            F.merge_tokens(np.zeros(3), np.zeros(4))
