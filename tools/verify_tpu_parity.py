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


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    choices=[None, "iir", "lfilter", "viterbi", "spectrogram"])
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
    n_fail = sum(not r["ok"] for r in RESULTS)
    print(json.dumps({"summary": "tpu_pallas_parity", "checks": len(RESULTS), "failures": n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
