"""North-star benchmark: concurrent 16 kHz streams/chip at RTF<0.1.

Chain per BASELINE.json configs 1+4: biquad lfilter (sox-style IIR rollout)
→ MelSpectrogram (n_fft=400, hop=160, 80 mel) → projection to CTC emissions
→ forced_align Viterbi DP.  B streams of 1 s audio are processed per step;
with wall time W the chip sustains ``0.1 · B · D / W`` concurrent streams at
RTF<0.1 (each second of audio must be processed in <0.1 s).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 1000 streams/chip (BASELINE.json north_star).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import audio_tpu.functional as F
    from audio_tpu._internal.windows import hann_window

    B = 8192  # concurrent streams (4096 -> 8192 measured +6%: 27.3k -> 28.9k)
    SR = 16000
    D = 1.0  # seconds per chunk
    T = int(SR * D)
    L = 50  # target tokens per stream
    V = 32  # vocab

    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
    targets = jnp.asarray(rng.integers(1, V, size=(B, L)).astype(np.int32))
    proj = jnp.asarray(rng.standard_normal((80, V)).astype(np.float32) * 0.1)
    window = hann_window(400)
    fb = F.melscale_fbanks(201, 0.0, 8000.0, 80, SR)

    @jax.jit
    def chain(wav, targets):
        filtered = F.lowpass_biquad(wav, SR, 4000.0)
        # Fused Pallas spectrogram+mel (framing, windowed DFT, |.|^2 and the
        # mel filterbank GEMM in one kernel, kernel-native time-major layout).
        mel = F.mel_spectrogram(
            filtered, fb=fb, window=window, n_fft=400, hop_length=160,
            win_length=400, power=2.0, normalized=False, time_major=True,
        )
        emissions = jax.nn.log_softmax(
            jnp.einsum("btm,mv->btv", jnp.log1p(mel), proj), axis=-1
        )
        paths, scores = F.forced_align(emissions, targets)
        return paths, scores

    # compile (excluded from timing; first axon compile is slow but cached)
    paths, scores = jax.block_until_ready(chain(wav, targets))
    assert bool(jnp.isfinite(scores).all())

    # Steady-state throughput: run K batches back-to-back inside ONE compiled
    # program (each iteration's input depends on the previous scores, so XLA
    # cannot elide or overlap the work), then divide.  A single dispatch has a
    # fixed host<->device sync floor (~25 ms over the axon tunnel) that would
    # otherwise swamp the per-batch time.
    K = 16

    @jax.jit
    def chain_k(wav, targets):
        def body(_, carry):
            wav_i, acc = carry
            paths, scores = chain(wav_i, targets)
            bump = (jnp.mean(scores) * 1e-12).astype(wav_i.dtype)
            return (wav_i + bump, acc + jnp.sum(paths[:, 0]))
        _, acc = jax.lax.fori_loop(0, K, body, (wav, jnp.int32(0)))
        return acc

    np.asarray(chain_k(wav, targets))  # compile + true sync via readback
    times = []
    for i in range(5):
        # vary the operand per rep: the axon relay memoizes identical
        # (executable, operands) dispatches and replays the ready result
        # (multiplicative so it survives f32 rounding at any signal scale),
        # and force completion by reading the scalar VALUE back — the
        # relay's readiness signal can fire for a previous dispatch.
        wav_i = jax.block_until_ready(wav * jnp.float32(1.0 + 1e-6 * (i + 1)))
        t0 = time.perf_counter()
        np.asarray(chain_k(wav_i, targets))
        times.append(time.perf_counter() - t0)
    w = float(np.median(times)) / K

    streams_at_rtf01 = 0.1 * B * D / w
    result = {
        "metric": "concurrent_streams_per_chip_rtf0.1",
        "value": round(streams_at_rtf01, 1),
        "unit": "streams (16kHz, STFT+mel+lfilter+forced_align)",
        "vs_baseline": round(streams_at_rtf01 / 1000.0, 3),
        "detail": {
            "batch": B,
            "wall_s_per_batch_s_audio": round(w, 4),
            "audio_seconds_per_second": round(B * D / w, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
