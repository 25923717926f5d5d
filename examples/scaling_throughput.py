"""Multi-device / multi-host scaling harness for the north-star chain.

SURVEY.md §7 step 9: measure how the lfilter → mel → forced_align fleet
workload scales with device count — 1 chip → full host → N hosts. The
per-stream work is embarrassingly parallel (BASELINE north star); the only
cross-device communication is the metrics reduction (`psum` of scores), so
scaling efficiency should be ~100% and anything lower exposes dispatch or
collective overhead.

On real hardware run it as-is (devices = all chips; multi-host after
`audio_tpu.parallel.init_distributed()`). In CI it runs on a virtual CPU
mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scaling_throughput.py --per-device-batch 32

Prints one JSON line per device count with throughput and scaling efficiency
relative to 1 device.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_tpu.parallel import create_mesh


def build_chain(sr: int):
    import audio_tpu.functional as F
    from audio_tpu._internal.windows import hann_window

    window = hann_window(400)
    fb = F.melscale_fbanks(201, 0.0, 8000.0, 80, sr)
    rng = np.random.default_rng(1)
    proj = jnp.asarray(rng.standard_normal((80, 32)).astype(np.float32) * 0.1)

    def chain(wav, targets):
        filtered = F.lowpass_biquad(wav, sr, 4000.0)
        spec = F.spectrogram(filtered, window=window, n_fft=400, hop_length=160,
                             win_length=400, power=2.0, normalized=False)
        mel = jnp.einsum("bft,fm->btm", spec, fb)
        emissions = jax.nn.log_softmax(
            jnp.einsum("btm,mv->btv", jnp.log1p(mel), proj), axis=-1)
        paths, scores = F.forced_align(emissions, targets)
        # fleet metric reduction: mean alignment score across every stream on
        # every device — the one collective in the workload
        return paths, jnp.mean(scores)

    return chain


def measure(n_devices: int, per_device_batch: int, iters: int, sr: int, seconds: float):
    devices = jax.devices()[:n_devices]
    mesh = create_mesh(dp=n_devices, tp=1, devices=devices)
    data_sh = NamedSharding(mesh, P("dp", None))

    b = per_device_batch * n_devices
    t = int(sr * seconds)
    rng = np.random.default_rng(0)
    wav = jax.device_put(
        jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.1), data_sh)
    targets = jax.device_put(
        jnp.asarray(rng.integers(1, 32, size=(b, 50)).astype(np.int32)), data_sh)

    chain = build_chain(sr)

    @jax.jit
    def chain_k(wav, targets):
        def body(_, carry):
            wav_i, acc = carry
            _, score = chain(wav_i, targets)
            return (wav_i + (score * 1e-12).astype(wav_i.dtype), acc + score)
        _, acc = jax.lax.fori_loop(0, iters, body, (wav, jnp.float32(0)))
        return acc

    jax.block_until_ready(chain_k(wav, targets))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain_k(wav, targets))
        times.append(time.perf_counter() - t0)
    w = float(np.median(times)) / iters
    return b * seconds / w  # audio seconds per wall second


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--seconds", type=float, default=1.0)
    args = p.parse_args()

    n_total = len(jax.devices())
    counts = sorted({1, 2, n_total // 2, n_total} - {0})
    counts = [c for c in counts if c <= n_total]

    platform = jax.devices()[0].platform
    if platform == "cpu":
        # virtual devices share the host's physical cores: efficiency here
        # measures XLA dispatch/collective overhead, not real chip scaling
        print(json.dumps({"note": "cpu mesh — virtual devices share physical "
                                  "cores; efficiency is not chip scaling"}))

    base = None
    for n in counts:
        tput = measure(n, args.per_device_batch, args.iters, 16000, args.seconds)
        if base is None:
            base = tput
        eff = tput / (base * n)
        print(json.dumps({
            "devices": n,
            "platform": platform,
            "audio_seconds_per_second": round(tput, 1),
            "per_device": round(tput / n, 1),
            "scaling_efficiency_vs_1dev": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
