"""Model-zoo TPU benchmarks with MFU accounting.

Three workloads on the real chip (VERDICT r1 item 1):

  a) wav2vec2-BASE inference      — streams/chip at RTF<0.1, MFU
  b) Emformer-RNNT streaming      — segments/s + per-segment compute latency
                                    with carried encoder state and the
                                    device-resident beam (the reference syncs
                                    ``next_token_probs.cpu()`` per expansion,
                                    /root/reference/src/torchaudio/models/rnnt_decoder.py:245 —
                                    here the whole segment is ONE device program)
  c) Emformer-RNNT train step     — tokens/s, audio s/s, MFU at a realistic
                                    (B, T, U, V) with the fused log-semiring
                                    rnnt_loss (no (B,T,U,V) softmax residual)

Timing: K iterations inside one jitted ``lax.scan``/``fori_loop`` with a data
dependency between iterations (the ~25 ms axon dispatch floor would otherwise
swamp per-step time; see bench.py).  FLOPs come from XLA's compiled cost
analysis of the SINGLE-step program; MFU = flops / wall / peak where peak is
the chip's dense bf16 rate (TPU v5e: 197 TFLOP/s).

Usage:  timeout 3600 python bench_models.py [--out BENCH_models.json]
Prints one JSON line per workload.  NOTE: the default (no ``--only``) run
executes SEVEN benchmarks — f32 and bf16 variants of wav2vec2 inference and
the RNN-T train step (the bf16 train step additionally at B=32), plus
single-stream and 128-stream-batched streaming — roughly ~30 min of
exclusive TPU time; use ``--only`` to run a single workload.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

PEAKS = {  # dense bf16 TFLOP/s per chip
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAKS.items():
        if kind.startswith(k):
            return v
    return 197e12


def flops_of(jitted, *args) -> float:
    """XLA cost-analysis FLOPs of one compiled call (0.0 if unavailable)."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def flops_of_reference(step_fn, *args) -> float:
    """Cost-analysis FLOPs of the kernel-free twin of ``step_fn``.

    Pallas custom calls are opaque to XLA's cost analysis, so a step using
    the fused attention / lattice row-stats kernels under-counts its FLOPs
    (and would overstate a speedup as an MFU drop).  This compiles the SAME
    math with the kernels disabled (einsum attention, XLA lse/gathers) and
    returns that program's FLOPs — the identical accounting basis used for
    the r3/r4 numbers, which predate the kernels.
    """
    import os

    import audio_tpu.ops.pallas_rnnt_lps as _PL

    old_env = os.environ.get("AUDIO_TPU_FUSED_ATTENTION")
    old_fn = _PL.use_row_stats_kernel
    os.environ["AUDIO_TPU_FUSED_ATTENTION"] = "0"
    _PL.use_row_stats_kernel = lambda: False
    try:
        return flops_of(jax.jit(step_fn), *args)
    finally:
        _PL.use_row_stats_kernel = old_fn
        if old_env is None:
            os.environ.pop("AUDIO_TPU_FUSED_ATTENTION", None)
        else:
            os.environ["AUDIO_TPU_FUSED_ATTENTION"] = old_env


def timed(fn, argmaker, reps: int = 5) -> float:
    """Median wall of ``fn(*argmaker(i))``.

    ``fn`` must return a SMALL array: completion is forced by READING THE
    VALUE BACK (np.asarray), not block_until_ready — the axon relay's
    readiness signal can fire early/for a previous dispatch, and identical
    (executable, operands) pairs are memoized and replayed.  Value readback
    is the only timing this environment cannot fake.  ``argmaker`` must
    still return different operand contents per call (multiplicative
    perturbation — additive 1e-9 rounds away in f32); args are materialized
    before the clock starts.
    """
    np.asarray(fn(*argmaker(-1)))  # compile + true sync
    times = []
    for i in range(reps):
        args = jax.block_until_ready(argmaker(i))
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def emit(rec, sink):
    print(json.dumps(rec), flush=True)
    sink.append(rec)


# --------------------------------------------------------------------------
def bench_wav2vec2(sink, dtype="f32"):
    """wav2vec2-BASE (94.4M params) batched inference on 1 s chunks.

    ``dtype="bf16"`` runs the whole network in bfloat16 (f32 norm stats via
    flax, f32 log-softmax at the output boundary) — the intended TPU serving
    configuration (`audio_tpu.utils.cast_floating`).
    """
    import audio_tpu.models as M
    from audio_tpu.utils import cast_floating

    B, SR, D = 128, 16000, 1.0
    model = M.wav2vec2_base(aux_num_out=29)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, SR)).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), SR, jnp.int32)
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), wav[:1], lengths[:1], deterministic=True
    )
    if dtype == "bf16":
        params = cast_floating(params, jnp.bfloat16)

    def step(params, wav, lengths):
        if dtype == "bf16":
            wav = wav.astype(jnp.bfloat16)
        logits, out_lens = model.apply(params, wav, lengths, deterministic=True)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), out_lens

    single = jax.jit(step)
    fl = flops_of(single, params, wav, lengths)

    K = 32

    @jax.jit
    def chain(params, wav, lengths):
        def body(_, carry):
            w, acc = carry
            logp, _ = step(params, w, lengths)
            bump = (jnp.mean(logp) * 1e-12).astype(w.dtype)
            return (w + bump, acc + logp[0, 0, 0])
        _, acc = jax.lax.fori_loop(0, K, body, (wav, jnp.float32(0.0)))
        return acc

    w = timed(chain, lambda i: (params, wav * (1.0 + 1e-6 * (i + 2)), lengths)) / K
    streams = 0.1 * B * D / w
    mfu = fl / w / peak_flops() if fl else None
    suffix = "_bf16" if dtype == "bf16" else ""
    emit({
        "metric": f"wav2vec2_base_inference_streams_rtf0.1{suffix}",
        "value": round(streams, 1),
        "unit": "streams/chip (16kHz, 94.4M params, log-softmax emissions)",
        "detail": {
            "batch": B, "wall_ms_per_batch_s_audio": round(w * 1e3, 2),
            "audio_seconds_per_second": round(B * D / w, 1),
            "flops_per_step": fl, "tflops_sustained": round(fl / w / 1e12, 1) if fl else None,
            "mfu": round(mfu, 4) if mfu else None,
            "device": str(jax.devices()[0]),
        },
    }, sink)


# --------------------------------------------------------------------------
def _rnnt_base(num_symbols=4097):
    from audio_tpu.models.rnnt import emformer_rnnt_base

    return emformer_rnnt_base(num_symbols=num_symbols)


def bench_rnnt_streaming(sink):
    """Emformer-RNNT base (76.7M) streaming: segment -> encoder(state) -> beam.

    One segment = 16 mel frames + 4 right-context (the bundle's streaming
    contract, /root/reference/src/torchaudio/pipelines/rnnt_pipeline.py:336-344)
    = 0.16 s of audio at hop 10 ms; time reduction 4 leaves 4+1 encoder
    frames.  Beam width 10.  The joiner bias is tilted toward blank (+4) to
    mimic a trained model's expansion behavior (untrained random logits
    would expand pathologically, which no trained RNN-T does).
    """
    from audio_tpu.models.rnnt_decoder import RNNTBeamSearch

    V = 4097
    model = _rnnt_base(V)
    rng = np.random.default_rng(1)
    SEG_T, D_IN, SEG_SECONDS = 20, 80, 0.16
    feats = jnp.asarray(rng.standard_normal((1, SEG_T, D_IN)).astype(np.float32))
    lengths = jnp.full((1,), SEG_T, jnp.int32)
    tgt = jnp.zeros((1, 1), jnp.int32)

    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), feats, lengths, tgt, jnp.ones((1,), jnp.int32),
        deterministic=True,
    )
    # tilt joiner toward blank (last index) like a trained model
    jb = params["params"]["joiner"]["linear"]["bias"]
    params["params"]["joiner"]["linear"]["bias"] = jb.at[-1].add(4.0)

    BEAM = 10

    def _decoder(params):
        # constructed INSIDE the traced function so params are a program
        # argument, not 307 MB of embedded HLO constants
        return RNNTBeamSearch(model, params, blank=V - 1, step_max_tokens=10,
                              max_tokens=200)

    def seg_step(params, feats, hypo, state):
        return _decoder(params).infer(feats, lengths, BEAM, state=state,
                                      hypothesis=hypo)

    jitted = jax.jit(seg_step)
    # prime: build initial state/hypo with one real segment
    hypo_init = jax.jit(lambda p: _decoder(p)._init_beam(BEAM))(params)
    hypo0, state0 = jax.block_until_ready(jitted(params, feats, hypo_init, None))
    jitted2 = jax.jit(seg_step)
    fl = flops_of(jitted2, params, feats, hypo0, state0)

    # single-dispatch latency (includes the axon tunnel floor, ~25 ms);
    # returns only the beam scores so readback is a few bytes
    disp = jax.jit(lambda p, f, h, s: seg_step(p, f, h, s)[0].scores)
    w_dispatch = timed(disp,
                       lambda i: (params, feats * (1.0 + 1e-6 * (i + 2)), hypo0, state0),
                       reps=10)

    # in-chain compute latency: K segments back to back, carried state+beam
    K = 32

    @jax.jit
    def chain(params, feats, hypo, state):
        dec = _decoder(params)

        def body(carry, _):
            f, h, s = carry
            h, s = dec.infer(f, lengths, BEAM, state=s, hypothesis=h)
            bump = (jnp.sum(h.scores) * 1e-12).astype(f.dtype)
            return (f + bump, h, s), None
        (f, h, s), _ = jax.lax.scan(body, (feats, hypo, state), None, length=K)
        return h.scores

    w = timed(chain, lambda i: (params, feats * (1.0 + 1e-6 * (i + 2)), hypo0, state0)) / K
    mfu = fl / w / peak_flops() if fl else None
    emit({
        "metric": "emformer_rnnt_streaming_latency_ms",
        "value": round(w * 1e3, 2),
        "unit": f"ms compute per {SEG_SECONDS} s segment (beam 10, device-resident)",
        "detail": {
            "segments_per_second": round(1.0 / w, 1),
            "rtf": round(w / SEG_SECONDS, 4),
            "concurrent_streams_rtf1": round(SEG_SECONDS / w, 1),
            "single_dispatch_ms_incl_tunnel": round(w_dispatch * 1e3, 1),
            "flops_per_segment": fl,
            "mfu": round(mfu, 4) if mfu else None,
            "params_m": 76.7, "beam_width": BEAM,
            "device": str(jax.devices()[0]),
        },
    }, sink)


def bench_rnnt_streaming_batch(sink, n_streams=128, smt=10, expansion="exact"):
    """N concurrent streaming sessions per chip, ONE program per segment tick.

    ``RNNTBeamSearch.infer_batch`` vmaps the whole per-frame beam expansion
    over a leading stream axis, so serving N live streams costs one batched
    encoder step + one batched search per 0.16 s segment interval — versus
    the reference decoder, which is architecturally single-stream and syncs
    to host per expansion (/root/reference/src/torchaudio/models/rnnt_decoder.py:226-265).
    Reported: streams/chip at RTF<=0.1 (chip busy <=10% of real time per
    stream), i.e. ``n_streams * seg_seconds * 0.1 / wall_per_tick``.
    """
    from audio_tpu.models.rnnt_decoder import RNNTBeamSearch

    from audio_tpu.utils import cast_floating

    V = 4097
    model = _rnnt_base(V)
    rng = np.random.default_rng(7)
    S, SEG_T, D_IN, SEG_SECONDS = n_streams, 20, 80, 0.16
    feats = jnp.asarray(rng.standard_normal((S, SEG_T, D_IN)).astype(np.float32))
    lengths = jnp.full((S,), SEG_T, jnp.int32)
    tgt = jnp.zeros((1, 1), jnp.int32)
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), feats[:1], lengths[:1], tgt, jnp.ones((1,), jnp.int32),
        deterministic=True,
    )
    jb = params["params"]["joiner"]["linear"]["bias"]
    params["params"]["joiner"]["linear"]["bias"] = jb.at[-1].add(4.0)
    # bf16 serving: encoder/predictor/joiner matmuls in bf16, all beam score
    # math in f32 (the decoder's _join casts log-probs to f32)
    params = cast_floating(params, jnp.bfloat16)
    feats = feats.astype(jnp.bfloat16)

    BEAM = 10

    def _decoder(params):
        return RNNTBeamSearch(model, params, blank=V - 1, step_max_tokens=smt,
                              max_tokens=200, expansion=expansion)

    def tick(params, feats, hypos, state):
        return _decoder(params).infer_batch(feats, lengths, BEAM, state=state,
                                            hypotheses=hypos)

    jitted = jax.jit(tick)
    hypos0 = jax.jit(lambda p: _decoder(p).init_beams(BEAM, S))(params)
    hypos0, state0 = jax.block_until_ready(jitted(params, feats, hypos0, None))
    fl = flops_of(jax.jit(tick), params, feats, hypos0, state0)

    K = 8

    @jax.jit
    def chain(params, feats, hypos, state):
        dec = _decoder(params)

        def body(carry, _):
            f, h, s = carry
            h, s = dec.infer_batch(f, lengths, BEAM, state=s, hypotheses=h)
            bump = (jnp.sum(h.scores) * 1e-12).astype(f.dtype)
            return (f + bump, h, s), None
        (f, h, s), _ = jax.lax.scan(body, (feats, hypos, state), None, length=K)
        return h.scores

    w = timed(chain, lambda i: (params, feats * (1.0 + 1e-6 * (i + 2)), hypos0, state0)) / K
    mfu = fl / w / peak_flops() if fl else None
    streams_rtf01 = S * SEG_SECONDS * 0.1 / w
    suffix = ("" if smt == 10 else f"_smt{smt}") + ("" if expansion == "exact" else "_approx")
    emit({
        "metric": f"streaming_streams_per_chip_rtf0.1{suffix}",
        "value": round(streams_rtf01, 1),
        "unit": f"concurrent streaming beam-10 sessions at RTF<=0.1 ({S} batched)",
        "detail": {
            "batched_streams": S,
            "wall_ms_per_segment_tick": round(w * 1e3, 2),
            "rtf_per_stream": round(w / (S * SEG_SECONDS), 5),
            "streams_rtf1": round(S * SEG_SECONDS / w, 1),
            "ms_per_stream_segment": round(w * 1e3 / S, 3),
            "flops_per_tick": fl,
            "mfu": round(mfu, 4) if mfu else None,
            "params_m": 76.7, "beam_width": BEAM,
            "device": str(jax.devices()[0]),
        },
    }, sink)


def bench_rnnt_train(sink, dtype="f32", batch=8):
    """Emformer-RNNT base train step at realistic (B, T, U, V).

    ``dtype="bf16"`` keeps f32 master weights + adamw state and runs the
    forward/backward in bfloat16 (`audio_tpu.utils.cast_floating` inside the
    loss, so `jax.grad` yields f32 master grads); the (B,T,U,V) joiner
    lattice stays bf16 in HBM (rnnt_loss cast-computes its DP in f32),
    which is what makes ``batch`` ≥ 32 fit on one chip.
    """
    import optax

    import audio_tpu.functional as F
    from audio_tpu.utils import cast_floating

    V = 4097
    B, T, U = batch, 512, 64  # 5.12 s audio, 64 sentencepiece targets
    RC = 4  # the encoder contract: input carries right_context_length extra
    # padded frames beyond the stated valid length (the reference recipe
    # right-pads features by 4 frames, emformer_rnnt/lightning.py:79-118)
    model = _rnnt_base(V)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((B, T + RC, 80)).astype(np.float32))
    feat_lens = jnp.full((B,), T, jnp.int32)
    targets = jnp.asarray(rng.integers(1, V - 1, (B, U)).astype(np.int32))
    tgt_lens = jnp.full((B,), U, jnp.int32)

    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), feats[:1], feat_lens[:1], targets[:1, :1],
        jnp.ones((1,), jnp.int32), deterministic=True,
    )["params"]
    # flatten: one fused flat-vector adam update instead of ~300 per-tensor
    # kernels (the per-tensor update chain measured 7.1 ms standalone at
    # B=32 — mostly launch overhead; tools/profile_full_step.py)
    tx = optax.flatten(optax.adamw(1e-3, weight_decay=1e-6))
    opt_state = tx.init(params)

    def loss_fn(params, key):
        tgt_in = jnp.pad(targets, ((0, 0), (1, 0)))  # blank-prepended
        f = feats
        if dtype == "bf16":
            params = cast_floating(params, jnp.bfloat16)
            f = feats.astype(jnp.bfloat16)
        logits, src_lens, _, _ = model.apply(
            {"params": params}, f, feat_lens, tgt_in, tgt_lens + 1,
            deterministic=False, rngs={"dropout": key},
        )
        # rnnt_loss cast-computes its DP in f32 for bf16 logits (ops/rnnt.py)
        return F.rnnt_loss(logits, targets, src_lens, tgt_lens, blank=0,
                           reduction="mean")

    def train_step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # rbg dropout keys: the TPU-native generator (threefry dropout mask
    # generation measured +43 ms/step at B=64 — tools/profile_pruned_parts.py)
    key = jax.random.key(3, impl="rbg")
    # FLOPs from the kernel-free twin (Pallas custom calls are invisible to
    # cost analysis — see flops_of_reference)
    fl = flops_of_reference(train_step, params, opt_state, key)

    K = 4

    @jax.jit
    def chain(params, opt_state, key):
        def body(carry, _):
            p, o, k = carry
            k, sub = jax.random.split(k)
            p, o, loss = train_step(p, o, sub)
            return (p, o, k), loss
        (_, _, _), losses = jax.lax.scan(body, (params, opt_state, key), None, length=K)
        return losses

    losses = jax.block_until_ready(jax.jit(chain)(params, opt_state, key))
    assert bool(jnp.isfinite(losses).all()), losses
    w = timed(chain, lambda i: (params, opt_state, jax.random.key(10 + i, impl="rbg"))) / K
    mfu = fl / w / peak_flops() if fl else None
    suffix = ("_bf16" if dtype == "bf16" else "") + (f"_b{B}" if B != 8 else "")
    emit({
        "metric": f"emformer_rnnt_train_step_tokens_per_s{suffix}",
        "value": round(B * U / w, 1),
        "unit": f"target tokens/s (B={B}, T=512 mel, U=64, V=4097, adamw"
                + (", bf16 compute / f32 masters)" if dtype == "bf16" else ")"),
        "detail": {
            "step_ms": round(w * 1e3, 1),
            "audio_seconds_per_second": round(B * T * 0.01 / w, 1),
            "flops_per_step": fl,
            "tflops_sustained": round(fl / w / 1e12, 1) if fl else None,
            "mfu": round(mfu, 4) if mfu else None,
            "loss_finite": True,
            "device": str(jax.devices()[0]),
        },
    }, sink)


def bench_rnnt_train_pruned(sink, dtype="bf16", batch=64, band=16):
    """Emformer-RNNT train step with the pruned transducer loss.

    Same model/shapes as :func:`bench_rnnt_train` plus two simple-head
    projections (1024 -> V each), but the joiner runs only on a ``band``-wide
    slice of target positions per frame (audio_tpu.ops.rnnt_pruned,
    arXiv:2206.13236): peak lattice HBM drops from (B, T', U+1, V) to
    (B, T', band, V) — (U+1)/band ~ 4x at U=64, band=16 — which is what
    breaks the full-lattice loss's B=32 single-chip ceiling
    (docs/performance.md).  Loss = 0.5 * simple + pruned (the k2 recipe).
    """
    import optax

    import audio_tpu.functional as F
    from audio_tpu.utils import cast_floating

    V = 4097
    B, T, U = batch, 512, 64
    RC = 4
    model = _rnnt_base(V)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((B, T + RC, 80)).astype(np.float32))
    feat_lens = jnp.full((B,), T, jnp.int32)
    targets = jnp.asarray(rng.integers(1, V - 1, (B, U)).astype(np.int32))
    tgt_lens = jnp.full((B,), U, jnp.int32)

    model_params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), feats[:1], feat_lens[:1], targets[:1, :1],
        jnp.ones((1,), jnp.int32), deterministic=True,
    )["params"]
    D = 1024  # encoding_dim == predictor output_dim
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    params = {
        "model": model_params,
        "am": jax.random.normal(k1, (D, V), jnp.float32) * (D ** -0.5),
        "lm": jax.random.normal(k2, (D, V), jnp.float32) * (D ** -0.5),
    }
    tx = optax.flatten(optax.adamw(1e-3, weight_decay=1e-6))  # fused flat update
    opt_state = tx.init(params)

    def loss_fn(params, key):
        tgt_in = jnp.pad(targets, ((0, 0), (1, 0)))
        f = feats
        if dtype == "bf16":
            params = cast_floating(params, jnp.bfloat16)
            f = feats.astype(jnp.bfloat16)
        mp = {"params": params["model"]}
        enc, src_lens = model.apply(
            mp, f, feat_lens, deterministic=False, rngs={"dropout": key},
            method=model.transcribe,
        )
        pred, _, _ = model.apply(
            mp, tgt_in, tgt_lens + 1, None, deterministic=False,
            rngs={"dropout": key}, method=model.predict,
        )
        simple, post = F.rnnt_loss_simple(
            enc @ params["am"], pred @ params["lm"], targets, src_lens, tgt_lens,
            blank=0, reduction="mean",
        )
        ranges = F.get_rnnt_prune_ranges(post, src_lens, tgt_lens, band)
        pred_band = F.prune_target_encodings(pred, ranges)  # (B, T', band, D)
        bt = enc.shape[0] * enc.shape[1]
        ones = jnp.ones((bt,), jnp.int32)
        logits, _, _ = model.apply(
            mp, enc.reshape(bt, 1, D), ones, pred_band.reshape(bt, band, D), ones,
            method=model.join,
        )
        logits = logits.reshape(enc.shape[0], enc.shape[1], band, V)
        pruned = F.rnnt_loss_pruned(logits, targets, ranges, src_lens, tgt_lens,
                                    blank=0, reduction="mean")
        return 0.5 * simple + pruned

    def train_step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(3, impl="rbg")
    # FLOPs from the kernel-free twin (Pallas custom calls are invisible to
    # cost analysis — see flops_of_reference); rbg dropout keys as above
    fl = flops_of_reference(train_step, params, opt_state, key)

    K = 4

    @jax.jit
    def chain(params, opt_state, key):
        def body(carry, _):
            p, o, k = carry
            k, sub = jax.random.split(k)
            p, o, loss = train_step(p, o, sub)
            return (p, o, k), loss
        (_, _, _), losses = jax.lax.scan(body, (params, opt_state, key), None, length=K)
        return losses

    losses = jax.block_until_ready(jax.jit(chain)(params, opt_state, key))
    assert bool(jnp.isfinite(losses).all()), losses
    w = timed(chain, lambda i: (params, opt_state, jax.random.key(10 + i, impl="rbg"))) / K
    mfu = fl / w / peak_flops() if fl else None
    suffix = ("_bf16" if dtype == "bf16" else "") + f"_b{B}"
    emit({
        "metric": f"emformer_rnnt_train_pruned_tokens_per_s{suffix}",
        "value": round(B * U / w, 1),
        "unit": f"target tokens/s (B={B}, T=512 mel, U=64, V=4097, band={band}, "
                "pruned loss = 0.5*simple + banded-exact, adamw"
                + (", bf16 compute / f32 masters)" if dtype == "bf16" else ")"),
        "detail": {
            "step_ms": round(w * 1e3, 1),
            "audio_seconds_per_second": round(B * T * 0.01 / w, 1),
            "flops_per_step": fl,
            "tflops_sustained": round(fl / w / 1e12, 1) if fl else None,
            "mfu": round(mfu, 4) if mfu else None,
            "band": band,
            "loss_finite": True,
            "device": str(jax.devices()[0]),
        },
    }, sink)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--band", type=int, default=16)
    ap.add_argument("--streams", type=int, default=128)
    ap.add_argument("--expansion", default="exact", choices=("exact", "approx"),
                    help="'approx' is demoted from headline numbers: measured "
                         "per-step candidate recall 0.56 / top-1 agreement "
                         "0.0 vs exact on identical emissions "
                         "(tools/verify_tpu_parity.py --only approx)")
    ap.add_argument("--smt", type=int, default=10,
                    help="streaming bench step_max_tokens (serving knob: 4 "
                         "allows 100 emitted tokens/s per stream, far above "
                         "real speech; reference default is 100)")
    ap.add_argument("--only", default=None,
                    choices=[None, "wav2vec2", "streaming", "streaming_batch",
                             "train", "wav2vec2_bf16", "train_bf16",
                             "train_bf16_b32", "train_bf16_custom",
                             "train_pruned_bf16_custom",
                             "train_pruned_bf16_b64",
                             "train_pruned_bf16_b128", "train_pruned_bf16_b32"])
    ap.add_argument("--batch", type=int, default=32,
                    help="batch for the *_custom train variants")
    args = ap.parse_args()
    sink = []
    print(json.dumps({"device": str(jax.devices()[0]),
                      "backend": jax.default_backend(),
                      "peak_tflops_bf16": peak_flops() / 1e12}), flush=True)
    if args.only in (None, "wav2vec2"):
        bench_wav2vec2(sink)
    if args.only in (None, "wav2vec2_bf16"):
        bench_wav2vec2(sink, dtype="bf16")
    if args.only in (None, "streaming"):
        bench_rnnt_streaming(sink)
    if args.only in (None, "streaming_batch"):
        bench_rnnt_streaming_batch(sink, n_streams=args.streams, smt=args.smt,
                                   expansion=args.expansion)
    if args.only in (None, "train"):
        bench_rnnt_train(sink)
    if args.only in (None, "train_bf16"):
        bench_rnnt_train(sink, dtype="bf16")
    if args.only in (None, "train_bf16_b32"):
        bench_rnnt_train(sink, dtype="bf16", batch=32)
    if args.only == "train_bf16_custom":
        bench_rnnt_train(sink, dtype="bf16", batch=args.batch)
    if args.only == "train_pruned_bf16_custom":
        bench_rnnt_train_pruned(sink, dtype="bf16", batch=args.batch,
                                band=args.band)
    if args.only == "train_pruned_bf16_b32":
        bench_rnnt_train_pruned(sink, dtype="bf16", batch=32, band=args.band)
    if args.only in (None, "train_pruned_bf16_b64"):
        bench_rnnt_train_pruned(sink, dtype="bf16", batch=64, band=args.band)
    if args.only in (None, "train_pruned_bf16_b128"):
        bench_rnnt_train_pruned(sink, dtype="bf16", batch=128, band=args.band)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(sink, f, indent=1)


if __name__ == "__main__":
    main()
