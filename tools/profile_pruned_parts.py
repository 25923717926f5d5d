"""Second-level profiling: encoder dropout cost + head sub-part costs (v5e).

Usage: timeout 3000 python tools/profile_pruned_parts.py [--batch 64] [--band 16]
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


def chainify(step_fn, k=4):
    @jax.jit
    def chain(*xs):
        def body(carry, _):
            return step_fn(*carry), None
        out, _ = jax.lax.scan(body, xs, None, length=k)
        return jnp.ravel(out[0])[0]  # first carry leaf only (keys aren't numpy-able)
    return chain, k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--band", type=int, default=16)
    ap.add_argument("--parts", default="enc_det,enc_rbg,simple,joiner,pruned")
    args = ap.parse_args()
    parts = args.parts.split(",")

    import audio_tpu.functional as F
    from audio_tpu.models.rnnt import emformer_rnnt_base
    from audio_tpu.utils import cast_floating

    V, B, T, U, RC, D, S = 4097, args.batch, 512, 64, 4, 1024, args.band
    T2 = T // 4
    model = emformer_rnnt_base(num_symbols=V)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((B, T + RC, 80)).astype(np.float32))
    feat_lens = jnp.full((B,), T, jnp.int32)
    targets = jnp.asarray(rng.integers(1, V - 1, (B, U)).astype(np.int32))
    tgt_lens = jnp.full((B,), U, jnp.int32)
    t2_lens = jnp.full((B,), T2, jnp.int32)

    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), feats[:1], feat_lens[:1], targets[:1, :1],
        jnp.ones((1,), jnp.int32), deterministic=True,
    )["params"]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    am_w = jax.random.normal(k1, (D, V), jnp.float32) * D ** -0.5
    lm_w = jax.random.normal(k2, (D, V), jnp.float32) * D ** -0.5

    enc0 = jnp.asarray(rng.standard_normal((B, T2, D)).astype(np.float32))
    pred0 = jnp.asarray(rng.standard_normal((B, U + 1, D)).astype(np.float32))

    out = {}

    if "enc_det" in parts:
        def enc_step(f):
            def loss(p):
                pb = cast_floating(p, jnp.bfloat16)
                enc, _ = model.apply({"params": pb}, f.astype(jnp.bfloat16), feat_lens,
                                     deterministic=True, method=model.transcribe)
                return jnp.sum(enc.astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(params)
            gn = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
            return (f * (1 + 1e-12 * gn.astype(f.dtype)),)
        ch, K = chainify(enc_step)
        w = timed(ch, lambda i: (feats * (1 + 1e-6 * (i + 2)),)) / K
        out["encoder_grad_deterministic_ms"] = round(w * 1e3, 1)
        print(json.dumps(out), flush=True)

    if "enc_rbg" in parts:
        def enc_step_r(f, k):
            def loss(p):
                pb = cast_floating(p, jnp.bfloat16)
                enc, _ = model.apply({"params": pb}, f.astype(jnp.bfloat16), feat_lens,
                                     deterministic=False, rngs={"dropout": k},
                                     method=model.transcribe)
                return jnp.sum(enc.astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(params)
            gn = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
            return f * (1 + 1e-12 * gn.astype(f.dtype)), jax.random.fold_in(k, 0)
        ch, K = chainify(enc_step_r)
        w = timed(ch, lambda i: (feats * (1 + 1e-6 * (i + 2)),
                                 jax.random.key(i + 5, impl="rbg"))) / K
        out["encoder_grad_rbg_dropout_ms"] = round(w * 1e3, 1)
        print(json.dumps(out), flush=True)

    if "simple" in parts:
        def simple_step(enc, pred):
            def loss(ws, enc, pred):
                enc = enc.astype(jnp.bfloat16)
                pred = pred.astype(jnp.bfloat16)
                wa, wl = jax.tree.map(lambda x: x.astype(jnp.bfloat16), ws)
                s, post = F.rnnt_loss_simple(enc @ wa, pred @ wl, targets, t2_lens,
                                             tgt_lens, blank=0, reduction="mean")
                ranges = F.get_rnnt_prune_ranges(post, t2_lens, tgt_lens, S)
                return s + 1e-9 * jnp.sum(ranges)
            l, g = jax.value_and_grad(loss, argnums=(1, 2))((am_w, lm_w), enc, pred)
            return enc + 1e-12 * jnp.sum(g[0]).astype(enc.dtype), pred
        ch, K = chainify(simple_step)
        w = timed(ch, lambda i: (enc0 * (1 + 1e-6 * (i + 2)), pred0)) / K
        out["simple_plus_ranges_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps(out), flush=True)

    if "joiner" in parts:
        ranges0 = jnp.minimum(
            jnp.arange(T2, dtype=jnp.int32)[None, :, None] // 2, U - S + 1
        ) + jnp.arange(S, dtype=jnp.int32)[None, None, :]
        ranges0 = jnp.broadcast_to(ranges0, (B, T2, S))

        def joiner_step(enc, pred):
            def loss(jp, enc, pred):
                jp = cast_floating(jp, jnp.bfloat16)
                enc = enc.astype(jnp.bfloat16)
                pred = pred.astype(jnp.bfloat16)
                pred_band = F.prune_target_encodings(pred, ranges0)
                bt = B * T2
                ones = jnp.ones((bt,), jnp.int32)
                logits, _, _ = model.apply(
                    {"params": {"joiner": jp}}, enc.reshape(bt, 1, D), ones,
                    pred_band.reshape(bt, S, D), ones, method=model.join)
                return jnp.sum(logits.astype(jnp.float32) ** 2) * 1e-9
            l, g = jax.value_and_grad(loss, argnums=(1, 2))(params["joiner"], enc, pred)
            return enc + 1e-12 * jnp.sum(g[0]).astype(enc.dtype), pred + 1e-12 * jnp.sum(g[1]).astype(pred.dtype)
        ch, K = chainify(joiner_step)
        w = timed(ch, lambda i: (enc0 * (1 + 1e-6 * (i + 2)), pred0)) / K
        out["banded_joiner_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps(out), flush=True)

    if "pruned" in parts:
        ranges0 = jnp.minimum(
            jnp.arange(T2, dtype=jnp.int32)[None, :, None] // 2, U - S + 1
        ) + jnp.arange(S, dtype=jnp.int32)[None, None, :]
        ranges0 = jnp.broadcast_to(ranges0, (B, T2, S))
        logits0 = jnp.asarray(rng.standard_normal((B, T2, S, V)).astype(np.float32) * 0.1).astype(jnp.bfloat16)

        def pruned_step(lg):
            def loss(lg):
                return F.rnnt_loss_pruned(lg, targets, ranges0, t2_lens, tgt_lens,
                                          blank=0, reduction="mean")
            l, g = jax.value_and_grad(loss)(lg)
            return (lg + (1e-12 * l).astype(lg.dtype) + 0 * g,)
        ch, K = chainify(pruned_step)
        w = timed(ch, lambda i: (logits0 * (1 + 1e-3 * (i + 2)),)) / K
        out["pruned_loss_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps(out), flush=True)

    print(json.dumps({"parts": out, "batch": B, "band": S}), flush=True)


if __name__ == "__main__":
    main()
