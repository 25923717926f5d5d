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

``--two-host`` additionally simulates the BASELINE.json two-host clause
(>=85% scaling to 2 hosts): it spawns TWO ``jax.distributed`` processes of 4
virtual CPU devices each (cross-process collectives ride Gloo — the DCN
stand-in), runs the same 8-device dp workload across the process boundary,
and reports the throughput fraction vs the same 8 devices in one process.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # an installed sitecustomize may pin another platform after env parsing;
    # re-assert the documented CLI contract
    jax.config.update("jax_platforms", "cpu")

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


def measure(n_devices: int, per_device_batch: int, iters: int, sr: int, seconds: float,
            workload: str = "dsp"):
    devices = jax.devices()[:n_devices]
    mesh = create_mesh(dp=n_devices, tp=1, devices=devices)
    data_sh = NamedSharding(mesh, P("dp", None))

    b = per_device_batch * n_devices
    rng = np.random.default_rng(0)

    def gput(x, sharding):
        # works both single-process (like device_put) and multi-process,
        # where each process materializes only its addressable shards
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    if workload == "decode":
        return _measure_decode(mesh, gput, b, iters)
    if workload == "train":
        return _measure_train(mesh, gput, b, iters)

    t = int(sr * seconds)
    wav = gput(rng.standard_normal((b, t)).astype(np.float32) * 0.1, data_sh)
    targets = gput(rng.integers(1, 32, size=(b, 50)).astype(np.int32), data_sh)

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


def _tiny_rnnt():
    from audio_tpu.models.rnnt import emformer_rnnt_model

    return emformer_rnnt_model(
        input_dim=16, encoding_dim=32, num_symbols=64, segment_length=8,
        right_context_length=2, time_reduction_input_dim=16,
        time_reduction_stride=2, transformer_num_heads=2, transformer_ffn_dim=64,
        transformer_num_layers=2, transformer_dropout=0.0,
        transformer_activation="gelu", transformer_left_context_length=8,
        transformer_max_memory_size=0,
        transformer_weight_init_scale_strategy="depthwise",
        transformer_tanh_on_mem=True, symbol_embedding_dim=16, num_lstm_layers=2,
        lstm_layer_norm=True, lstm_layer_norm_epsilon=1e-3, lstm_dropout=0.0)


def _measure_decode(mesh, gput, n_streams, iters):
    """Streaming beam-search ticks with the stream axis over dp — BASELINE
    config 5's workload (the reference's decode loop is single-utterance and
    host-synced, /root/reference/src/torchaudio/models/rnnt_decoder.py:226-265).
    Returns decoded audio seconds per wall second (0.16 s per segment tick).
    """
    from jax.sharding import PartitionSpec as P2

    from audio_tpu.models.rnnt_decoder import RNNTBeamSearch

    SEG_SECONDS, SEG, BEAM = 0.16, 10, 4
    model = _tiny_rnnt()
    rng = np.random.default_rng(3)
    feats_np = rng.standard_normal((n_streams, SEG, 16)).astype(np.float32)
    data_sh = NamedSharding(mesh, P2("dp", None, None))
    feats = gput(feats_np, data_sh)
    lengths = gput(np.full((n_streams,), SEG, np.int32), NamedSharding(mesh, P2("dp")))
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), jnp.zeros((1, SEG, 16), jnp.float32),
        jnp.full((1,), SEG, jnp.int32), jnp.zeros((1, 1), jnp.int32),
        jnp.ones((1,), jnp.int32), deterministic=True)
    dec = RNNTBeamSearch(model, params, blank=63, step_max_tokens=4, max_tokens=64)
    # Across HOSTS the early-exit while_loop is the wrong tool: its "any
    # stream still expanding" predicate is a cross-process scalar collective
    # EVERY inner iteration (cheap on ICI, ruinous over DCN/Gloo).  The
    # static unrolled expansion is result-identical (an empty a-set
    # contributes only no-op merges) and makes multi-host decode
    # embarrassingly parallel — zero per-iteration collectives.  Used for
    # BOTH the baseline and the two-host run so the scaling fraction
    # compares identical programs (it is the multi-host serving config).
    dec.static_expansion = True

    # every mesh-sharded array enters jit as an ARGUMENT (multi-process jax
    # forbids closing over arrays spanning non-addressable devices)
    def lead_spec(ndim):
        return NamedSharding(mesh, P2(*(("dp",) + (None,) * (ndim - 1))))

    hypos = jax.tree.map(
        lambda x: gput(np.asarray(x), lead_spec(x.ndim)),
        dec.init_beams(BEAM, n_streams))
    tick = jax.jit(lambda f, le, h, s: dec.infer_batch(f, le, BEAM, state=s,
                                                       hypotheses=h))
    hypos, state = jax.block_until_ready(tick(feats, lengths, hypos, None))

    @jax.jit
    def chain_k(feats, lengths, hypos, state):
        def body(carry, _):
            f, h, s = carry
            h, s = dec.infer_batch(f, lengths, BEAM, state=s, hypotheses=h)
            bump = (jnp.sum(h.scores) * 1e-12).astype(f.dtype)
            return (f + bump, h, s), None
        (f, h, s), _ = jax.lax.scan(body, (feats, hypos, state), None, length=iters)
        return jnp.sum(h.scores)

    jax.block_until_ready(chain_k(feats, lengths, hypos, state))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain_k(feats, lengths, hypos, state))
        times.append(time.perf_counter() - t0)
    w = float(np.median(times)) / iters
    return n_streams * SEG_SECONDS / w  # decoded audio seconds / wall second


def _measure_train(mesh, gput, batch, iters):
    """Emformer-RNNT train step with dp gradient all-reduce — the workload
    that actually stresses the cross-host (DCN) link, unlike the
    embarrassingly-parallel DSP chain.  Returns audio seconds per wall
    second (t_len frames at 10 ms hop per sample)."""
    import optax
    from jax.sharding import PartitionSpec as P2

    from audio_tpu.functional import rnnt_loss

    model = _tiny_rnnt()
    # enough frames per step that the gradient allreduce competes with real
    # compute (at t=24 the tiny model's step is all collective, which would
    # measure Gloo latency rather than scaling)
    t_len, u_len, rc = 96, 12, 2
    rng = np.random.default_rng(0)
    data_sh = NamedSharding(mesh, P2("dp", None, None))
    tok_sh = NamedSharding(mesh, P2("dp", None))
    vec_sh = NamedSharding(mesh, P2("dp"))
    src = gput(rng.standard_normal((batch, t_len + rc, 16)).astype(np.float32), data_sh)
    src_lengths = gput(np.full((batch,), t_len, np.int32), vec_sh)
    targets = gput(rng.integers(1, 64, (batch, u_len)).astype(np.int32), tok_sh)
    targets_in = gput(np.pad(np.asarray(rng.integers(1, 64, (batch, u_len)), np.int32),
                             ((0, 0), (1, 0))), tok_sh)
    target_lengths = gput(np.full((batch,), u_len, np.int32), vec_sh)
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), jnp.zeros((1, t_len + rc, 16), jnp.float32),
        jnp.full((1,), t_len, jnp.int32), jnp.zeros((1, 1), jnp.int32),
        jnp.ones((1,), jnp.int32), deterministic=True)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    def loss_fn(params, src, src_lengths, targets, targets_in, target_lengths):
        logits, out_lengths, _, _ = model.apply(
            params, src, src_lengths, targets_in, target_lengths, deterministic=True)
        return rnnt_loss(logits, targets, out_lengths, target_lengths, blank=0,
                         reduction="mean")

    # all sharded operands are jit ARGUMENTS (multi-process jax forbids
    # closing over arrays spanning non-addressable devices)
    @jax.jit
    def chain_k(params, opt_state, src, src_lengths, targets, targets_in,
                target_lengths):
        def body(carry, _):
            p, o, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                p, s, src_lengths, targets, targets_in, target_lengths)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o, s * (1 + loss * 1e-12)), None
        (p, o, s), _ = jax.lax.scan(body, (params, opt_state, src), None, length=iters)
        return jax.tree_util.tree_leaves(p)[0].ravel()[0]

    args = (params, opt_state, src, src_lengths, targets, targets_in, target_lengths)
    jax.block_until_ready(chain_k(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain_k(*args))
        times.append(time.perf_counter() - t0)
    w = float(np.median(times)) / iters
    return batch * t_len * 0.01 / w  # audio seconds / wall second


def _worker(args):
    """One of the two simulated hosts (see --two-host)."""
    from audio_tpu.parallel import init_distributed

    init_distributed(f"localhost:{args.port}", num_processes=args.nproc,
                     process_id=args.worker)
    assert jax.process_count() == args.nproc
    tput = measure(jax.device_count(), args.per_device_batch, args.iters,
                   16000, args.seconds, workload=args.workload)
    if args.worker == 0:
        print(json.dumps({
            "processes": args.nproc,
            "devices": jax.device_count(),
            "audio_seconds_per_second": round(tput, 1),
        }), flush=True)


def _two_host(args):
    """Spawn baseline (1 process x 8 dev) and 2-process (2 x 4 dev) runs and
    report the cross-process (DCN-analog) scaling fraction."""
    def spawn(argv, n_local):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local}",
        )
        return subprocess.Popen([sys.executable, os.path.abspath(__file__)] + argv,
                                env=env, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)

    common = ["--per-device-batch", str(args.per_device_batch),
              "--iters", str(args.iters), "--seconds", str(args.seconds),
              "--workload", args.workload]
    base_proc = spawn(common + ["--only-devices", "8"], 8)
    out, _ = base_proc.communicate(timeout=900)
    if base_proc.returncode != 0:
        raise RuntimeError(f"baseline run failed:\n{out[-2000:]}")
    base = [json.loads(line) for line in out.splitlines() if '"devices"' in line][-1]

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    workers = [
        spawn(common + ["--worker", str(i), "--nproc", "2", "--port", str(port)], 4)
        for i in range(2)
    ]
    outs = [w.communicate(timeout=900)[0] for w in workers]
    for w, o in zip(workers, outs):
        if w.returncode != 0:
            raise RuntimeError(f"worker failed:\n{o[-2000:]}")
    two = [json.loads(line) for line in outs[0].splitlines() if '"processes"' in line][-1]

    fraction = two["audio_seconds_per_second"] / base["audio_seconds_per_second"]
    print(json.dumps({
        "metric": f"two_host_scaling_fraction_{args.workload}"
                  if args.workload != "dsp" else "two_host_scaling_fraction",
        "value": round(fraction, 3),
        "unit": "2-process(4+4 dev, Gloo) / 1-process(8 dev) throughput",
        "baseline_audio_s_per_s": base["audio_seconds_per_second"],
        "two_host_audio_s_per_s": two["audio_seconds_per_second"],
        "target": ">=0.85 (BASELINE.json two-host clause)",
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--per-device-batch", type=int, default=32)
    p.add_argument("--workload", default="dsp", choices=("dsp", "decode", "train"),
                   help="dsp: lfilter->mel->forced_align fleet chain; decode: "
                        "dp-sharded streaming beam-search ticks (BASELINE "
                        "config 5); train: Emformer-RNNT step with dp "
                        "gradient all-reduce (the DCN-stressing workload)")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--seconds", type=float, default=1.0)
    p.add_argument("--only-devices", type=int, default=None,
                   help="measure a single device count instead of the sweep")
    p.add_argument("--two-host", action="store_true",
                   help="simulate 2 hosts (2 jax.distributed processes)")
    p.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    p.add_argument("--nproc", type=int, default=2, help=argparse.SUPPRESS)
    p.add_argument("--port", type=int, default=None, help=argparse.SUPPRESS)
    args = p.parse_args()

    if args.two_host:
        _two_host(args)
        return
    if args.worker is not None:
        _worker(args)
        return

    n_total = len(jax.devices())
    if args.only_devices:
        counts = [args.only_devices]
    else:
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
        tput = measure(n, args.per_device_batch, args.iters, 16000, args.seconds,
                       workload=args.workload)
        if base is None:
            base = tput
        eff = tput / (base * n)
        print(json.dumps({
            "devices": n,
            "platform": platform,
            "workload": args.workload,
            "audio_seconds_per_second": round(tput, 1),
            "per_device": round(tput / n, 1),
            "scaling_efficiency_vs_1dev": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
