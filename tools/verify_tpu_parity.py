"""On-TPU Pallas kernel parity harness.

Compiles every Pallas kernel (Mosaic, NOT interpret mode) on the real chip
and compares against the jnp fallback formulations running on the same
chip.  Interpret-mode tests (tests/ops/) prove the kernel math; this proves
the Mosaic compilation — layouts, VMEM windows, precision modes — which is
where TPU kernels actually break.

Run before any BENCH submission:

    timeout 1800 python tools/verify_tpu_parity.py

Prints one JSON line per check and a final summary line; exits nonzero on
any failure.  Budget ~5-15 min: each kernel is a fresh Mosaic compile
through the remote relay.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

RESULTS = []


def check(name, max_abs, max_rel, tol_abs, tol_rel, seconds, extra=None):
    ok = bool(max_abs <= tol_abs or max_rel <= tol_rel)
    rec = {
        "check": name,
        "ok": ok,
        "max_abs": float(max_abs),
        "max_rel": float(max_rel),
        "tol_abs": tol_abs,
        "tol_rel": tol_rel,
        "seconds": round(seconds, 1),
    }
    if extra:
        rec.update(extra)
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)


def rel_err(got, ref):
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    denom = np.maximum(np.abs(ref), 1e-3 * np.abs(ref).max() + 1e-30)
    return float(np.abs(got - ref).max()), float((np.abs(got - ref) / denom).max())


def verify_iir():
    from audio_tpu.ops.iir import iir_blocked
    from audio_tpu.ops.pallas_iir import iir_pallas

    rng = np.random.default_rng(0)
    for order in (2, 16):  # 2 = VPU tail fold, 16 = MXU matmul fold
        t0 = time.time()
        x = jnp.asarray(rng.standard_normal((512, 2, 8192)).astype(np.float32) * 0.1)
        a = jnp.asarray(
            (0.2 * rng.standard_normal((2, order)) / np.arange(1, order + 1)).astype(np.float32)
        )
        got = jax.block_until_ready(iir_pallas(x, a))
        ref = jax.block_until_ready(jax.jit(iir_blocked)(x, a))
        ma, mr = rel_err(got, ref)
        check(f"pallas_iir_order{order}", ma, mr, 5e-4, 5e-4, time.time() - t0)


def verify_lfilter_fused():
    # reference = scipy float64 on the host: on TPU every jnp formulation of
    # lfilter itself dispatches Pallas / bf16 convs, so it cannot be the oracle
    from scipy.signal import lfilter as sp_lfilter

    from audio_tpu.ops.pallas_iir import lfilter_pallas

    t0 = time.time()
    rng = np.random.default_rng(1)
    xh = rng.standard_normal((256, 2, 8192)).astype(np.float32) * 0.1
    a = np.array([[1.0, -1.62, 0.729], [1.0, 0.3, -0.1]], np.float32)
    b = np.array([[0.3, 0.2, 0.1], [0.5, -0.2, 0.1]], np.float32)
    got = jax.block_until_ready(lfilter_pallas(jnp.asarray(xh), jnp.asarray(a), jnp.asarray(b)))
    ref = np.stack(
        [sp_lfilter(b[c].astype(np.float64), a[c].astype(np.float64), xh[:, c, :], axis=-1)
         for c in range(2)], axis=1,
    )
    ma, mr = rel_err(got, ref)
    check("pallas_lfilter_fused", ma, mr, 5e-4, 5e-4, time.time() - t0)


def verify_viterbi():
    import audio_tpu.ops.viterbi as vit

    t0 = time.time()
    rng = np.random.default_rng(2)
    b, t, l, v = 96, 128, 16, 32
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32)), -1
    )
    tgt = jnp.asarray(rng.integers(1, v, (b, l)).astype(np.int32))
    il = jnp.asarray(rng.integers(2 * l + 2, t + 1, (b,)).astype(np.int32))
    tl = jnp.asarray(rng.integers(1, l + 1, (b,)).astype(np.int32))
    paths_pallas, _ = jax.block_until_ready(vit.viterbi_align(lp, tgt, il, tl, blank=0))
    orig = vit._use_pallas
    vit._use_pallas = lambda: False  # same chip, lax.scan formulation
    try:
        paths_scan, _ = jax.block_until_ready(vit.viterbi_align(lp, tgt, il, tl, blank=0))
    finally:
        vit._use_pallas = orig
    mismatch = int((np.asarray(paths_pallas) != np.asarray(paths_scan)).sum())
    check(
        "pallas_viterbi_paths",
        float(mismatch),
        0.0 if mismatch == 0 else 1.0,
        0.0,
        0.0,
        time.time() - t0,
        extra={"mismatched_frames": mismatch, "total_frames": int(np.prod(paths_pallas.shape))},
    )


def verify_spectrogram():
    from audio_tpu.functional._spectral import _power_spec_conv, _power_spec_ref_tm
    from audio_tpu.ops.pallas_spectrogram import (
        power_spectrogram_pallas,
        spectrogram_pallas_supported,
    )

    rng = np.random.default_rng(3)
    n_fft, hop = 400, 160
    assert spectrogram_pallas_supported(n_fft, hop, 2.0)
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    x = jnp.asarray(rng.standard_normal((64, 16000)).astype(np.float32) * 0.1)

    # oracle: the rfft formulation (true f32 on-chip FFT)
    ref = jax.block_until_ready(
        jax.jit(lambda x, w: _power_spec_ref_tm(x, w, None, n_fft, hop, 2.0))(x, window)
    )
    scale = float(jnp.max(ref))

    # criterion matches the interpret-mode suite (tests/ops/
    # test_pallas_spectrogram.py): abs error <= tol * max(ref) — cancellation
    # makes small bins relatively noisy in ANY 3-pass-bf16 DFT, including the
    # production conv-DFT path measured alongside for context.
    t0 = time.time()
    got = jax.block_until_ready(power_spectrogram_pallas(x, window, n_fft, hop, 2.0))
    ma, mr = rel_err(got, ref)
    check("pallas_spectrogram_power", ma / scale, mr, 1e-3, 0.0, time.time() - t0,
          extra={"criterion": "abs/max(ref)", "max_ref": scale})

    t0 = time.time()
    gotc = jax.block_until_ready(
        jax.jit(lambda x, w: jnp.swapaxes(
            _power_spec_conv(x, w, n_fft, hop, n_fft, False, "reflect", 2.0, False), -1, -2
        ))(x, window)
    )
    ma, mr = rel_err(gotc, ref)
    check("xla_conv_dft_power (production path)", ma / scale, mr, 1e-3, 0.0,
          time.time() - t0, extra={"criterion": "abs/max(ref)", "max_ref": scale})

    t0 = time.time()
    from audio_tpu.functional import melscale_fbanks

    fb = melscale_fbanks(n_fft // 2 + 1, 0.0, 8000.0, 80, 16000)
    got = jax.block_until_ready(power_spectrogram_pallas(x, window, n_fft, hop, 2.0, fb=fb))
    # oracle GEMM at HIGHEST: the kernel's mel GEMM is exact-f32, so a
    # default-precision (1-pass bf16) einsum would be the noisier side
    ref2 = jax.block_until_ready(jax.jit(lambda p, fb: jnp.einsum(
        "btf,fm->btm", p, fb, precision=jax.lax.Precision.HIGHEST))(ref, fb))
    scale2 = float(jnp.max(ref2))
    ma, mr = rel_err(got, ref2)
    check("pallas_spectrogram_mel_fused", ma / scale2, mr, 1e-3, 0.0, time.time() - t0,
          extra={"criterion": "abs/max(ref)", "max_ref": scale2})


def verify_attention():
    """Fused Emformer attention (Mosaic) vs the einsum oracle on-chip —
    forward and all three input gradients, bf16 serving dtype at the
    flagship train shape."""
    from audio_tpu.ops.pallas_attention import (
        emformer_attention,
        emformer_attention_reference,
    )

    t0 = time.time()
    B, H, TQ, TK, DH = 64, 8, 160, 160, 64
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32) * 0.3).astype(jnp.bfloat16)
    q, k, v, w = mk(B, H, TQ, DH), mk(B, H, TK, DH), mk(B, H, TK, DH), mk(B, H, TQ, DH)
    # emformer-band-like mask (segments + left context) + sparse key padding
    mask = np.full((TQ, TK), -1e8, np.float32)
    nseg, rc, seg, lc = 32, 1, 4, 30
    for s in range(nseg):
        cols = list(range(s * rc, (s + 1) * rc)) + [
            nseg * rc + c for c in range(max(s * seg - lc, 0), min((s + 1) * seg, 128))]
        rows = list(range(s * rc, (s + 1) * rc)) + [
            nseg * rc + r for r in range(s * seg, min((s + 1) * seg, 128))]
        for r in rows:
            for c in cols:
                mask[r, c] = 0.0
    mask = jnp.asarray(mask)
    kb = jnp.asarray(np.where(rng.random((B, TK)) < 0.05, -1e8, 0.0).astype(np.float32))

    out = jax.block_until_ready(emformer_attention(q, k, v, mask, kb, False))
    ref = jax.block_until_ready(jax.jit(emformer_attention_reference)(q, k, v, mask, kb))
    scale = float(np.abs(np.asarray(ref, np.float32)).max())
    ma, mr = rel_err(np.asarray(out, np.float32), np.asarray(ref, np.float32))
    check("pallas_attention_fwd", ma / scale, mr, 1e-2, 0.0, time.time() - t0,
          extra={"criterion": "abs/max(ref) (bf16 dtype)", "max_ref": scale})

    t0 = time.time()
    lf = lambda q, k, v: jnp.sum(  # noqa: E731
        (emformer_attention(q, k, v, mask, kb, False) * w).astype(jnp.float32))
    lr = lambda q, k, v: jnp.sum(  # noqa: E731
        (emformer_attention_reference(q, k, v, mask, kb) * w).astype(jnp.float32))
    gf = jax.block_until_ready(jax.jit(jax.grad(lf, argnums=(0, 1, 2)))(q, k, v))
    gr = jax.block_until_ready(jax.jit(jax.grad(lr, argnums=(0, 1, 2)))(q, k, v))
    for name, a, b in zip(("dq", "dk", "dv"), gf, gr):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        gs = float(np.abs(b).max())
        ma, mr = rel_err(a, b)
        check(f"pallas_attention_{name}", ma / gs, mr, 2e-2, 0.0,
              time.time() - t0 if name == "dq" else 0.0,
              extra={"criterion": "abs/max(ref) (bf16 dtype)", "max_ref": gs})


def verify_rnnt_lps():
    """Lattice row-stats kernel (Mosaic) vs XLA lse/slice/gather on-chip,
    at a real band-lattice shape in bf16."""
    from audio_tpu.ops.pallas_rnnt_lps import (
        lattice_row_stats,
        lattice_row_stats_reference,
    )

    t0 = time.time()
    rng = np.random.default_rng(5)
    B, T, S, V = 16, 32, 16, 4097
    x = jnp.asarray((rng.standard_normal((B, T, S, V)) * 2.0).astype(np.float32)).astype(jnp.bfloat16)
    tgt = jnp.asarray(rng.integers(0, V, (B, T, S)).astype(np.int32))
    got = jax.block_until_ready(lattice_row_stats(x, tgt, 0))
    ref = jax.block_until_ready(jax.jit(
        lambda x, t: lattice_row_stats_reference(x, t, 0))(x, tgt))
    for name, a, b in zip(("lse", "blank", "label"), got, ref):
        ma, mr = rel_err(np.asarray(a), np.asarray(b))
        check(f"pallas_rnnt_lps_{name}", ma, mr, 5e-3, 5e-3,
              time.time() - t0 if name == "lse" else 0.0)


def verify_rowstats_topk():
    """Fused lse/blank/top-k lattice read (Mosaic) vs XLA logsumexp + slice
    + lax.top_k on-chip, at the beam search's (S, K, V) join shape in bf16.
    Indices must match EXACTLY (same lowest-index tie order as lax.top_k)."""
    from audio_tpu.ops.pallas_rnnt_lps import (
        row_stats_topk,
        row_stats_topk_reference,
    )

    t0 = time.time()
    rng = np.random.default_rng(9)
    S, K, V, BEAM = 256, 10, 4097, 10
    x = jnp.asarray((rng.standard_normal((S, K, V)) * 2.0).astype(np.float32)).astype(jnp.bfloat16)
    got = jax.block_until_ready(row_stats_topk(x, V - 1, BEAM))
    ref = jax.block_until_ready(jax.jit(
        lambda x: row_stats_topk_reference(x, V - 1, BEAM))(x))
    for name, a, b in zip(("lse", "blank", "vals"), got[:3], ref[:3]):
        ma, mr = rel_err(np.asarray(a), np.asarray(b))
        check(f"pallas_rowstats_topk_{name}", ma, mr, 5e-3, 5e-3,
              time.time() - t0 if name == "lse" else 0.0)
    idx_mismatch = int(np.sum(np.asarray(got[3]) != np.asarray(ref[3])))
    check("pallas_rowstats_topk_idx", float(idx_mismatch), 0.0, 0.0, 0.0, 0.0,
          extra={"mismatched_indices": idx_mismatch,
                 "total": int(np.prod(np.asarray(ref[3]).shape))})


def verify_join_stats_topk():
    """Joiner-matmul-fused stats/top-k kernel (MXU dot inside Mosaic) vs
    the XLA dot + logsumexp + lax.top_k oracle on-chip, bf16 serving dtype
    at the search's (S*K, D) x (D, V) shape.  The kernel accumulates the
    dot in f32 while the XLA oracle rounds logits to bf16 — compare
    against an f32-accumulating oracle and allow bf16-scale tolerance on
    values; indices may legitimately differ only where two logits are
    within accumulation noise, so gate on a tiny mismatch rate instead of
    exact equality."""
    from audio_tpu.ops.pallas_rnnt_lps import (
        join_stats_topk,
        join_stats_topk_reference,
    )

    t0 = time.time()
    rng = np.random.default_rng(11)
    S, K, D, V, BEAM = 256, 10, 1024, 4097, 10
    act = jnp.asarray(np.maximum(
        rng.standard_normal((S, K, D)), 0.0).astype(np.float32) * 0.5
    ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((D, V)) * 0.05).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray((rng.standard_normal((V,)) * 0.1).astype(np.float32)).astype(jnp.bfloat16)
    got = jax.block_until_ready(join_stats_topk(act, w, b, V - 1, BEAM))
    ref = jax.block_until_ready(jax.jit(
        lambda a, w, b: join_stats_topk_reference(a, w, b, V - 1, BEAM))(act, w, b))
    for name, a_, b_ in zip(("lse", "blank", "vals"), got[:3], ref[:3]):
        ma, mr = rel_err(np.asarray(a_), np.asarray(b_))
        check(f"pallas_join_stats_topk_{name}", ma, mr, 2e-2, 2e-2,
              time.time() - t0 if name == "lse" else 0.0)
    idx_mismatch = int(np.sum(np.asarray(got[3]) != np.asarray(ref[3])))
    total = int(np.prod(np.asarray(ref[3]).shape))
    check("pallas_join_stats_topk_idx", idx_mismatch / total, 0.0, 5e-3, 0.0,
          0.0, extra={"mismatched_indices": idx_mismatch, "total": total,
                      "criterion": "mismatch rate (f32-accum kernel vs "
                                   "f32-accum XLA oracle; near-tie swaps only)"})


def verify_approx_expansion():
    """On-chip quality bound for ``RNNTBeamSearch(expansion="approx")``.

    The streaming headline ships an approx-mode number whose quality rests
    on ``lax.approx_max_k``'s hardware-binned selection — exact on CPU, so
    only an on-chip check can measure it.  Runs exact and approx beam
    search over the SAME multi-tick emissions (serving config: 76.7M
    Emformer-RNNT, bf16, beam 10, smt 4) and records:

    * per-step candidate recall of approx_max_k vs top_k on the REAL
      (S, K*(V-1)) candidate tensors of the decoded trajectory;
    * final top-1 hypothesis agreement across streams;
    * top-1 score deltas.

    Gate: recall >= 0.90 and agreement >= 0.95 (the reference search is
    exact, /root/reference/src/torchaudio/models/rnnt_decoder.py:251-258 —
    approx mode is a documented serving knob and must stay near it).
    """
    from audio_tpu.models.rnnt import emformer_rnnt_base
    from audio_tpu.models.rnnt_decoder import RNNTBeamSearch, _NEG_INF
    from audio_tpu.utils import cast_floating

    t0 = time.time()
    V, S, BEAM, SEG_T, SMT, TICKS = 4097, 64, 10, 20, 4, 6
    model = emformer_rnnt_base(num_symbols=V)
    rng = np.random.default_rng(11)
    lengths = jnp.full((S,), SEG_T, jnp.int32)
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), jnp.zeros((1, SEG_T, 80), jnp.float32),
        lengths[:1], jnp.zeros((1, 1), jnp.int32), jnp.ones((1,), jnp.int32),
        deterministic=True,
    )
    jb = params["params"]["joiner"]["linear"]["bias"]
    # +2 blank tilt: tokens DO emit (a +4 tilt emits almost nothing on random
    # features, which would make agreement trivially 1.0)
    params["params"]["joiner"]["linear"]["bias"] = jb.at[-1].add(2.0)
    params = cast_floating(params, jnp.bfloat16)
    ticks = [jnp.asarray(rng.standard_normal((S, SEG_T, 80)).astype(np.float32)).astype(jnp.bfloat16)
             for _ in range(TICKS)]

    def run(expansion):
        dec = RNNTBeamSearch(model, params, blank=V - 1, step_max_tokens=SMT,
                             max_tokens=100, expansion=expansion)
        tick = jax.jit(lambda f, h, s: dec.infer_batch(f, lengths, BEAM,
                                                       state=s, hypotheses=h))
        hyp = state = None
        for f in ticks:
            hyp, state = tick(f, hyp, state)
        return jax.block_until_ready(hyp), dec, state

    hyp_e, dec_e, state_e = run("exact")
    hyp_a, _, _ = run("approx")

    # --- final-hypothesis agreement + score deltas -----------------------
    tok_e, cnt_e = np.asarray(hyp_e.tokens), np.asarray(hyp_e.counts)
    tok_a, cnt_a = np.asarray(hyp_a.tokens), np.asarray(hyp_a.counts)
    sc_e, sc_a = np.asarray(hyp_e.scores), np.asarray(hyp_a.scores)
    agree = 0
    for i in range(S):
        seq_e = tok_e[i, 0, : max(cnt_e[i, 0], 0)].tolist()
        seq_a = tok_a[i, 0, : max(cnt_a[i, 0], 0)].tolist()
        agree += int(seq_e == seq_a)
    agreement = agree / S
    mean_tokens = float(np.maximum(cnt_e[:, 0], 0).mean())
    score_delta = float(np.abs(sc_e[:, 0] - sc_a[:, 0]).mean())

    # --- per-step candidate recall on the real decode tensors ------------
    # one more segment through the exact trajectory: build the (S, K*(V-1))
    # candidate pool the expansion actually ranks, then compare selections
    enc_out, _, _ = jax.jit(lambda f, s: model.apply(
        params, f, lengths, s, deterministic=True,
        method=model.transcribe_streaming))(ticks[-1], state_e)
    raw = jax.jit(dec_e._join)(enc_out[:, 0], hyp_e.pred_out)
    lse = jax.nn.logsumexp(raw, axis=-1)
    base = jnp.where(hyp_e.counts >= 0, hyp_e.scores - lse, _NEG_INF)
    cand = (base[:, :, None] + raw[:, :, :-1]).reshape(S, -1)
    _, idx_exact = jax.lax.top_k(cand, BEAM)
    _, idx_approx = jax.lax.approx_max_k(cand, BEAM, recall_target=0.95)
    ie, ia = np.asarray(idx_exact), np.asarray(idx_approx)
    recall = float(np.mean([
        len(set(ie[i]) & set(ia[i])) / BEAM for i in range(S)
    ]))

    headline_quality = (recall >= 0.90) and (agreement >= 0.95)
    ok_extra = {
        "per_step_candidate_recall": round(recall, 4),
        "top1_agreement": round(agreement, 4),
        "mean_top1_score_abs_delta": round(score_delta, 4),
        "mean_emitted_tokens": round(mean_tokens, 2),
        "streams": S, "ticks": TICKS, "beam": BEAM, "smt": SMT,
        "headline_bar": "recall>=0.90 and agreement>=0.95",
        "verdict": (
            "approx meets the headline bar" if headline_quality else
            "approx DEMOTED from headline benches: lax.approx_max_k's binned "
            "selection collapses on the search's block-contiguous candidate "
            "layout (each hypothesis contributes V-1 consecutive entries; "
            "top candidates cluster within bins). First measured 2026-08-21: "
            "recall 0.56, agreement 0.0 — the r4 '~95% per-step recall' "
            "claim was wrong on real decode tensors. Exact expansion is the "
            "shipped configuration; expansion='approx' remains an opt-in "
            "knob carrying this measured bound."
        ),
    }
    # the CHECK passes when the measurement ran on meaningful decodes (it
    # is the quality RECORD the headline bench cites); the headline bar
    # outcome is in the verdict field
    failed = mean_tokens < 1.0
    check("approx_expansion_quality_measured", 0.0 if not failed else 1.0,
          0.0 if not failed else 1.0, 0.5, 0.5, time.time() - t0,
          extra=ok_extra)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    choices=[None, "iir", "lfilter", "viterbi", "spectrogram",
                             "attention", "rnnt_lps", "rowstats_topk", "joinfused", "approx"])
    args = ap.parse_args()
    backend = jax.default_backend()
    print(json.dumps({"backend": backend, "devices": [str(d) for d in jax.devices()]}), flush=True)
    if backend in ("cpu", "gpu", "cuda", "rocm"):
        print(json.dumps({"error": "run on the TPU (axon) backend"}))
        return 2
    if args.only in (None, "iir"):
        verify_iir()
    if args.only in (None, "lfilter"):
        verify_lfilter_fused()
    if args.only in (None, "viterbi"):
        verify_viterbi()
    if args.only in (None, "spectrogram"):
        verify_spectrogram()
    if args.only in (None, "attention"):
        verify_attention()
    if args.only in (None, "rnnt_lps"):
        verify_rnnt_lps()
    if args.only in (None, "rowstats_topk"):
        verify_rowstats_topk()
    if args.only in (None, "joinfused"):
        verify_join_stats_topk()
    if args.only in (None, "approx"):
        verify_approx_expansion()
    n_fail = sum(not r["ok"] for r in RESULTS)
    print(json.dumps({"summary": "tpu_pallas_parity", "checks": len(RESULTS), "failures": n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
