"""Pallas Viterbi kernel vs the lax.scan formulation (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_tpu.ops.viterbi import _state_labels, viterbi_align
from audio_tpu.ops.pallas_viterbi import viterbi_pallas_core


def _run_pallas(lp, tgt, il, tl, blank=0):
    b, _, v = lp.shape
    l_max = tgt.shape[1]
    s = 2 * l_max + 1
    labels = _state_labels(tgt, blank, s)
    sidx = jnp.arange(s)
    state_valid = sidx[None, :] < (2 * tl[:, None] + 1)
    same = jnp.concatenate([jnp.ones((b, 1), bool), tgt[:, 1:] == tgt[:, :-1]], axis=1)
    can_skip = (
        (sidx % 2 == 1)[None, :]
        & (sidx[None, :] >= 3)
        & ~same[:, jnp.clip(sidx // 2, 0, l_max - 1)]
        & state_valid
    )
    emits = jnp.take_along_axis(lp, labels[:, None, :], axis=2)
    return viterbi_pallas_core(
        emits, can_skip, state_valid, il, labels, 2 * tl, blank=blank, interpret=True
    )


@pytest.mark.parametrize("seed,t,l", [(0, 37, 7), (1, 130, 9), (2, 64, 3)])
def test_matches_scan(seed, t, l):
    rng = np.random.default_rng(seed)
    b, v = 5, 12
    lp = jax.nn.log_softmax(jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32)), -1)
    tgt = jnp.asarray(rng.integers(1, v, (b, l)).astype(np.int32))
    il = jnp.asarray(rng.integers(2 * l + 2, t + 1, (b,)).astype(np.int32))
    tl = jnp.asarray(rng.integers(1, l + 1, (b,)).astype(np.int32))
    ref, _ = viterbi_align(lp, tgt, il, tl, blank=0)
    got = _run_pallas(lp, tgt, il, tl)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_repeated_tokens_no_skip():
    rng = np.random.default_rng(3)
    b, t, v, l = 2, 50, 8, 5
    lp = jax.nn.log_softmax(jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32)), -1)
    tgt = jnp.asarray([[2, 2, 3, 3, 2]] * b, jnp.int32)
    il = jnp.full((b,), t, jnp.int32)
    tl = jnp.full((b,), l, jnp.int32)
    ref, _ = viterbi_align(lp, tgt, il, tl, blank=0)
    got = _run_pallas(lp, tgt, il, tl)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
