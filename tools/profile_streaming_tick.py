"""Isolate the batched streaming tick's cost structure (one v5e).

Times RNNTBeamSearch._search variants at S streams on a precomputed encoder
segment (bf16 params, matching bench_models.py's serving config):

  search      the real search (encoder excluded; its cost = bench tick - this)
  noarena     arena writes disabled (winner states are WRONG — same shapes
              minus the slice updates; timing isolation only)
  noexpand    candidate selection (top_k / approx_max_k over the (S, K*(V-1))
              pool) replaced by an argmax broadcast (semantics differ;
              isolates the selection cost)
  nopredict   predictor stubbed to reuse the previous pred_out/state with a
              data-dependent perturbation (isolates the LSTM cost)
  nojoin      joiner stubbed to a rank-1 outer product depending on pred_out
              (isolates the (S*K, D)x(D, V) join matmul + bias)
  nomerge     _merge_blank_into_b replaced by a score-only shift register
              (isolates the (S, Ka, C) match/logsumexp/top_k merge)

Usage: timeout 3000 python tools/profile_streaming_tick.py \
    [--streams 384] [--smt 4] [--expansion approx] [--f32]
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
    ap.add_argument("--streams", type=int, default=384)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--smt", type=int, default=4)
    ap.add_argument("--expansion", default="approx", choices=("exact", "approx"))
    ap.add_argument("--f32", action="store_true", help="skip the bf16 param cast")
    ap.add_argument("--static", action="store_true",
                    help="fixed smt+1 inner iterations for every variant: "
                         "absolute numbers are pessimistic vs the early-exit "
                         "while_loop, but part deltas become trustworthy "
                         "(stand-ins perturb scores and hence trip counts)")
    ap.add_argument("--parts",
                    default="encoder,search,noarena,noexpand,nopredict,nojoin,nomerge")
    args = ap.parse_args()
    parts = args.parts.split(",")

    from audio_tpu.models.rnnt import emformer_rnnt_base
    from audio_tpu.models import rnnt_decoder as RD
    from audio_tpu.utils import cast_floating

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
    if not args.f32:
        params = cast_floating(params, jnp.bfloat16)
        feats = feats.astype(jnp.bfloat16)

    def decoder(params):
        dec = RD.RNNTBeamSearch(model, params, blank=V - 1, step_max_tokens=args.smt,
                                max_tokens=200, expansion=args.expansion)
        dec.static_expansion = args.static
        return dec

    # precompute the encoder segment output per stream
    enc_out, enc_lens, _ = jax.jit(
        lambda p, f: model.apply(p, f, lengths, None, deterministic=True,
                                 method=model.transcribe_streaming)
    )(params, feats)
    print(json.dumps({"enc_frames": int(enc_out.shape[1])}), flush=True)

    hypos0 = jax.jit(lambda p: decoder(p).init_beams(BEAM, S))(params)
    K = 8
    out = {}

    def bench_search(tag, dec_factory=None):
        def tick(params, enc, hypos):
            dec = (dec_factory or decoder)(params)
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

    if "encoder" in parts:
        # encoder-only segment step (transcribe_streaming with state carry) —
        # the tick's other half; bench tick ≈ this + "search"
        state0 = jax.jit(
            lambda p, f: model.apply(p, f, lengths, None, deterministic=True,
                                     method=model.transcribe_streaming)
        )(params, feats)[2]

        @jax.jit
        def enc_chain(params, f, state):
            def body(carry, _):
                f, st = carry
                enc, _, st = model.apply(params, f, lengths, st,
                                         deterministic=True,
                                         method=model.transcribe_streaming)
                bump = (jnp.sum(enc.astype(jnp.float32)) * 1e-12).astype(f.dtype)
                return (f + bump, st), None
            (f, st), _ = jax.lax.scan(body, (f, state), None, length=K)
            return jnp.sum(f.astype(jnp.float32))
        w = timed(enc_chain, lambda i: (params, feats * (1 + 1e-6 * (i + 2)), state0)) / K
        out["encoder_ms_per_tick"] = round(w * 1e3, 2)
        out["encoder_ms_per_stream"] = round(w * 1e3 / S, 3)
        print(json.dumps({"encoder": out["encoder_ms_per_tick"]}), flush=True)

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
        def fake_sel(x, k, **kw):
            # argmax-based stand-in over the (S, K*(V-1)) pool: k copies of
            # the per-stream argmax (wrong but shape/flow compatible; no
            # selection network)
            idx = jnp.argmax(x, axis=1)
            val = jnp.take_along_axis(x, idx[:, None], axis=1)
            return (jnp.broadcast_to(val, (x.shape[0], k)),
                    jnp.broadcast_to(idx[:, None], (x.shape[0], k)).astype(jnp.int32))

        orig_topk, orig_approx = jax.lax.top_k, jax.lax.approx_max_k

        def route_topk(x, k):
            if x.ndim == 2 and x.shape[1] > 5000:
                return fake_sel(x, k)
            return orig_topk(x, k)
        try:
            jax.lax.top_k = route_topk
            jax.lax.approx_max_k = lambda x, k, **kw: fake_sel(x, k)
            bench_search("noexpand")
        finally:
            jax.lax.top_k, jax.lax.approx_max_k = orig_topk, orig_approx

    if "nopredict" in parts:
        orig_predict = RD.RNNTBeamSearch._predict
        D_PRED = int(hypos0.pred_out.shape[-1])

        def fake_predict(self, tokens, state):
            # synthesize pred_out from the carried state with a token-
            # dependent bump (data-dependent, nothing constant-folds);
            # skips the LSTM stack entirely
            bump = (jnp.sum(tokens) * 1e-12).astype(jnp.float32)
            leaf = jax.tree_util.tree_leaves(state)[0]
            s, k = tokens.shape[:2]
            base = jnp.sum(leaf, axis=tuple(range(2, leaf.ndim))) * 1e-6  # (S, K)
            pred = jnp.broadcast_to(
                (base.astype(jnp.float32) + bump)[:, :, None, None],
                (s, k, 1, D_PRED),
            ).astype(leaf.dtype)
            return pred, state

        try:
            RD.RNNTBeamSearch._predict = fake_predict
            bench_search("nopredict")
        finally:
            RD.RNNTBeamSearch._predict = orig_predict

    if "nojoin" in parts:
        orig_join = RD.RNNTBeamSearch._join

        def fake_join(self, enc_t, pred_out):
            s, k = pred_out.shape[:2]
            # rank-1 stand-in: (S, K) row scores x fixed (V,) direction —
            # data-dependent on both inputs, no (D, V) matmul
            row = (jnp.sum(pred_out, axis=(2, 3)).astype(jnp.float32)
                   + jnp.sum(enc_t, axis=-1).astype(jnp.float32)[:, None]) * 1e-3
            vvec = jnp.linspace(-1.0, 1.0, V, dtype=jnp.float32)
            return row[:, :, None] * vvec[None, None, :] / self.temperature

        orig_join_stats = RD.RNNTBeamSearch._join_stats

        def fake_join_stats(self, enc_t, pred_out, beam_width):
            # stand-in for the fused joiner+stats kernel: derive all four
            # outputs from cheap reductions (data-dependent, no (D, V)
            # matmul, no lattice pass)
            s, k = pred_out.shape[:2]
            row = (jnp.sum(pred_out, axis=(2, 3)).astype(jnp.float32)
                   + jnp.sum(enc_t, axis=-1).astype(jnp.float32)[:, None]) * 1e-3
            lse = row + 8.0
            blank_raw = row + 4.0
            vals = row[:, :, None] - jnp.arange(
                1, beam_width + 1, dtype=jnp.float32)[None, None, :]
            idx = jnp.broadcast_to(
                jnp.arange(beam_width, dtype=jnp.int32)[None, None, :],
                (s, k, beam_width))
            return lse, blank_raw, (vals, idx)

        try:
            RD.RNNTBeamSearch._join = fake_join
            RD.RNNTBeamSearch._join_stats = fake_join_stats
            bench_search("nojoin")
        finally:
            RD.RNNTBeamSearch._join = orig_join
            RD.RNNTBeamSearch._join_stats = orig_join_stats

    if "nomerge" in parts:
        orig_merge = RD.RNNTBeamSearch._merge_blank_into_b

        def fake_merge(self, b, a, blank_scores, iter_idx):
            # score-only shift register: writes a's blank scores into the
            # first Ka slots (no match matrix, no logsumexp, no top_k)
            ka = a.counts.shape[1]
            counts = b.counts.at[:, :ka].set(a.counts)
            scores = b.scores.at[:, :ka].max(blank_scores)
            ptr = b.ptr.at[:, :ka].set(iter_idx * ka
                                       + jnp.arange(ka, dtype=jnp.int32)[None])
            return RD._BSet(counts, scores, b.sig, b.sig2, ptr)

        try:
            RD.RNNTBeamSearch._merge_blank_into_b = fake_merge
            bench_search("nomerge")
        finally:
            RD.RNNTBeamSearch._merge_blank_into_b = orig_merge

    print(json.dumps({"profile": out, "streams": S,
                      "smt": args.smt, "expansion": args.expansion}), flush=True)


if __name__ == "__main__":
    main()
