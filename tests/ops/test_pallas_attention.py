"""Fused Emformer attention kernel vs the einsum oracle (interpret mode).

The oracle is ``emformer_attention_reference`` — the exact einsum math of
``_EmformerAttention._attend`` (reference semantics:
/root/reference/src/torchaudio/models/emformer.py:160-260).  Mosaic
compilation parity runs on the chip via tools/verify_tpu_parity.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_tpu.ops.pallas_attention import (
    emformer_attention,
    emformer_attention_reference,
    fused_attention_supported,
)


def _emformer_like_mask(tq, tk, n_segs, rc, seg, lc, neg=-1e8):
    """Segment/right-context band mask like Emformer's _gen_attention_mask."""
    rng = np.random.default_rng(0)
    mask = np.full((tq, tk), neg, np.float32)
    utt_cols = n_segs * rc
    for s in range(n_segs):
        cols = list(range(s * rc, (s + 1) * rc))  # own right-context block
        lo = max(s * seg - lc, 0)
        hi = min((s + 1) * seg, tk - utt_cols)
        cols += [utt_cols + c for c in range(lo, hi)]
        rows = list(range(s * rc, (s + 1) * rc)) + [
            n_segs * rc + r for r in range(s * seg, min((s + 1) * seg, tq - n_segs * rc))
        ]
        for r in rows:
            for c in cols:
                mask[r, c] = 0.0
    assert (mask == 0).any() and (mask == neg).any()
    return mask, rng


def _case(b=3, h=4, tq=20, tk=20, dh=16, dtype=np.float32, seed=1):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, h, tq, dh)).astype(dtype)
    k = rng.standard_normal((b, h, tk, dh)).astype(dtype)
    v = rng.standard_normal((b, h, tk, dh)).astype(dtype)
    mask, _ = _emformer_like_mask(tq, tk, n_segs=4, rc=1, seg=4, lc=6)
    # per-batch key padding: last few keys invalid on some rows
    kb = np.zeros((b, tk), np.float32)
    kb[0, -3:] = -1e8
    kb[b - 1, -1:] = -1e8
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask), jnp.asarray(kb)


class TestFusedAttentionForward:
    def test_matches_einsum_f32(self):
        q, k, v, mask, kb = _case()
        got = emformer_attention(q, k, v, mask, kb, True)
        ref = emformer_attention_reference(q, k, v, mask, kb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_matches_einsum_rect(self):
        # Tq != Tk (summary rows / memory+left-context keys)
        q, k, v, mask, kb = _case(tq=12, tk=28)
        got = emformer_attention(q, k, v, mask[:12, :28] * 0, kb, True)
        ref = emformer_attention_reference(q, k, v, mask[:12, :28] * 0, kb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_bf16_values(self):
        q, k, v, mask, kb = _case()
        qb, kb16, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        got = emformer_attention(qb, kb16, vb, mask, kb, True)
        assert got.dtype == jnp.bfloat16
        ref = emformer_attention_reference(q, k, v, mask, kb)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref), atol=0.05, rtol=0.05)

    def test_fully_masked_row_matches(self):
        # a row with every key masked must agree with the einsum softmax
        q, k, v, _, kb = _case()
        mask = jnp.full((q.shape[2], k.shape[2]), -1e8, jnp.float32)
        got = emformer_attention(q, k, v, mask, kb, True)
        ref = emformer_attention_reference(q, k, v, mask, kb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_supported_gate(self):
        assert fused_attention_supported(64, 8, 160, 160, 64)
        assert not fused_attention_supported(1, 1, 4096, 4096, 64)  # tile too big
        assert not fused_attention_supported(1, 1, 16, 16, 5)  # ragged head dim


class TestFusedAttentionGrad:
    def test_grads_match_autodiff_of_einsum(self):
        q, k, v, mask, kb = _case(b=2, h=2, tq=20, tk=20, dh=16)
        w = jnp.asarray(np.random.default_rng(3).standard_normal(q.shape), jnp.float32)

        def loss_fused(q, k, v):
            return jnp.sum(emformer_attention(q, k, v, mask, kb, True) * w)

        def loss_ref(q, k, v):
            return jnp.sum(emformer_attention_reference(q, k, v, mask, kb) * w)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5, rtol=2e-4)

    def test_grad_through_mask_is_zero(self):
        q, k, v, mask, kb = _case(b=2, h=2)

        def loss(mask, kb):
            return jnp.sum(emformer_attention(q, k, v, mask, kb, True))

        gm, gk = jax.grad(loss, argnums=(0, 1))(mask, kb)
        assert float(jnp.abs(gm).max()) == 0.0
        assert float(jnp.abs(gk).max()) == 0.0
