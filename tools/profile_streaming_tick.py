"""Isolate the batched streaming tick's cost structure (one v5e).

Times RNNTBeamSearch.infer_batch variants at S streams on synthetic encoder
segments, bypassing nothing else:

  full        the real tick (encoder + search)
  search      search only (transcriber replaced by precomputed enc_out)
  noarena     search with the arena writes disabled (winner states are WRONG
              — same shapes/flow minus the scatter; timing isolation only)
  noexpand    search with argmax expansion instead of the (K*V) top_k
              (semantics differ; isolates the top_k + gather cost)

Usage: timeout 3000 python tools/profile_streaming_tick.py [--streams 128]
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, argmaker, reps=3):
    np.asarray(fn(*argmaker(-1)))
    ts = []
    for i in range(reps):
        args = jax.block_until_ready(argmaker(i))
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=128)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--smt", type=int, default=10)
    ap.add_argument("--parts", default="search,noarena,noexpand")
    args = ap.parse_args()
    parts = args.parts.split(",")

    from audio_tpu.models.rnnt import emformer_rnnt_base
    from audio_tpu.models import rnnt_decoder as RD

    V, S, BEAM = 4097, args.streams, args.beam
    model = emformer_rnnt_base(num_symbols=V)
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.standard_normal((S, 20, 80)).astype(np.float32))
    lengths = jnp.full((S,), 20, jnp.int32)
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), feats[:1], lengths[:1], jnp.zeros((1, 1), jnp.int32),
        jnp.ones((1,), jnp.int32), deterministic=True,
    )
    jb = params["params"]["joiner"]["linear"]["bias"]
    params["params"]["joiner"]["linear"]["bias"] = jb.at[-1].add(4.0)

    def decoder(params):
        return RD.RNNTBeamSearch(model, params, blank=V - 1, step_max_tokens=args.smt,
                                 max_tokens=200)

    # precompute a 5-frame encoder segment output per stream
    enc_out, enc_lens, _ = jax.jit(
        lambda p, f: model.apply(p, f, lengths, None, deterministic=True,
                                 method=model.transcribe_streaming)
    )(params, feats)
    print(json.dumps({"enc_frames": int(enc_out.shape[1])}), flush=True)

    hypos0 = jax.jit(lambda p: decoder(p).init_beams(BEAM, S))(params)
    K = 8
    out = {}

    def bench_search(tag):
        def tick(params, enc, hypos):
            dec = decoder(params)
            return dec._search(enc, hypos, BEAM, n_valid=enc_lens)

        @jax.jit
        def chain(params, enc, hypos):
            def body(carry, _):
                e, h = carry
                h = tick(params, e, h)
                bump = (jnp.sum(h.scores) * 1e-12).astype(e.dtype)
                return (e + bump, h), None
            (e, h), _ = jax.lax.scan(body, (enc, hypos), None, length=K)
            return h.scores
        w = timed(chain, lambda i: (params, enc_out * (1 + 1e-6 * (i + 2)), hypos0)) / K
        out[tag + "_ms_per_tick"] = round(w * 1e3, 2)
        out[tag + "_ms_per_stream"] = round(w * 1e3 / S, 3)
        print(json.dumps({tag: out[tag + "_ms_per_tick"]}), flush=True)

    if "search" in parts:
        bench_search("search")

    if "noarena" in parts:
        orig = jax.lax.dynamic_update_index_in_dim
        try:
            jax.lax.dynamic_update_index_in_dim = lambda arr, x, i, axis: arr
            bench_search("noarena")
        finally:
            jax.lax.dynamic_update_index_in_dim = orig

    if "noexpand" in parts:
        orig_topk = jax.lax.top_k

        def fake_topk(x, k):
            if x.ndim == 1 and x.shape[0] > 5000:  # the (K*V) expand pool
                # argmax-based stand-in: k copies of the argmax (wrong but
                # shape/flow compatible; no large sort network)
                idx = jnp.argmax(x)
                return jnp.broadcast_to(x[idx], (k,)), jnp.broadcast_to(idx, (k,)).astype(jnp.int32)
            return orig_topk(x, k)
        try:
            jax.lax.top_k = fake_topk
            bench_search("noexpand")
        finally:
            jax.lax.top_k = orig_topk

    print(json.dumps({"profile": out, "streams": S}), flush=True)


if __name__ == "__main__":
    main()
