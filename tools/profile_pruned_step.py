"""Component timing of the pruned-loss train step at B=64 bf16 (one v5e).

Times, with the fori-chain pattern (see bench.py), value_and_grad of:
  encoder      transcribe only
  predictor    predict only
  head         simple loss + ranges + banded joiner + pruned loss, taking
               precomputed (enc, pred) as program inputs
  optimizer    adamw update on cached grads
against the full step for a closing-the-books check.

Usage: timeout 3600 python tools/profile_pruned_step.py [--batch 64] [--band 16]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--band", type=int, default=16)
    ap.add_argument("--only", default=None,
                    choices=[None, "encoder", "predictor", "head", "optimizer"])
    args = ap.parse_args()

    import optax

    import audio_tpu.functional as F
    from audio_tpu.models.rnnt import emformer_rnnt_base
    from audio_tpu.utils import cast_floating

    V, B, T, U, RC, D, S = 4097, args.batch, 512, 64, 4, 1024, args.band
    model = emformer_rnnt_base(num_symbols=V)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((B, T + RC, 80)).astype(np.float32))
    feat_lens = jnp.full((B,), T, jnp.int32)
    targets = jnp.asarray(rng.integers(1, V - 1, (B, U)).astype(np.int32))
    tgt_lens = jnp.full((B,), U, jnp.int32)
    tgt_in = jnp.pad(targets, ((0, 0), (1, 0)))

    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), feats[:1], feat_lens[:1], targets[:1, :1],
        jnp.ones((1,), jnp.int32), deterministic=True,
    )["params"]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    am_w = jax.random.normal(k1, (D, V), jnp.float32) * D ** -0.5
    lm_w = jax.random.normal(k2, (D, V), jnp.float32) * D ** -0.5
    key = jax.random.PRNGKey(3)

    K = 4
    results = {}

    def chainify(step_fn, *xs):
        @jax.jit
        def chain(*xs):
            def body(carry, _):
                out = step_fn(*carry)
                return out, None
            out, _ = jax.lax.scan(body, xs, None, length=K)
            return jax.tree.map(lambda a: jnp.ravel(a)[0], out)
        return chain

    if args.only in (None, "encoder"):
        def enc_step(f, k):
            def loss(p):
                pb = cast_floating(p, jnp.bfloat16)
                enc, _ = model.apply({"params": pb}, f.astype(jnp.bfloat16), feat_lens,
                                     deterministic=False, rngs={"dropout": k},
                                     method=model.transcribe)
                return jnp.sum(enc.astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(params)
            gn = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
            return f * (1 + 1e-12 * gn.astype(f.dtype)), jax.random.fold_in(k, 0)
        ch = chainify(enc_step, feats, key)
        w = timed(ch, lambda i: (feats * (1 + 1e-6 * (i + 2)), jax.random.PRNGKey(i + 5))) / K
        results["encoder_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps({"encoder_grad_ms": results["encoder_grad_ms"]}), flush=True)

    if args.only in (None, "predictor"):
        def pred_step(t_in, k):
            def loss(p):
                pb = cast_floating(p, jnp.bfloat16)
                pred, _, _ = model.apply({"params": pb}, t_in, tgt_lens + 1, None,
                                         deterministic=False, rngs={"dropout": k},
                                         method=model.predict)
                return jnp.sum(pred.astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(params)
            gn = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
            return jnp.where(gn > -1, t_in, t_in), jax.random.fold_in(k, 0)
        ch = chainify(pred_step, tgt_in, key)
        w = timed(ch, lambda i: (tgt_in, jax.random.PRNGKey(i + 7))) / K
        results["predictor_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps({"predictor_grad_ms": results["predictor_grad_ms"]}), flush=True)

    if args.only in (None, "head"):
        T2 = T // 4
        enc0 = jnp.asarray(rng.standard_normal((B, T2, D)).astype(np.float32))
        pred0 = jnp.asarray(rng.standard_normal((B, U + 1, D)).astype(np.float32))
        jparams = {"joiner": params["joiner"], "am": am_w, "lm": lm_w}

        def head_step(enc, pred):
            def loss(jp, enc, pred):
                jp = cast_floating(jp, jnp.bfloat16)
                enc = enc.astype(jnp.bfloat16)
                pred = pred.astype(jnp.bfloat16)
                simple, post = F.rnnt_loss_simple(
                    enc @ jp["am"], pred @ jp["lm"], targets,
                    jnp.full((B,), T2, jnp.int32), tgt_lens, blank=0, reduction="mean")
                ranges = F.get_rnnt_prune_ranges(post, jnp.full((B,), T2, jnp.int32), tgt_lens, S)
                pred_band = F.prune_target_encodings(pred, ranges)
                bt = B * T2
                ones = jnp.ones((bt,), jnp.int32)
                logits, _, _ = model.apply(
                    {"params": {"joiner": jp["joiner"]}}, enc.reshape(bt, 1, D), ones,
                    pred_band.reshape(bt, S, D), ones, method=model.join)
                logits = logits.reshape(B, T2, S, V)
                pruned = F.rnnt_loss_pruned(logits, targets, ranges,
                                            jnp.full((B,), T2, jnp.int32), tgt_lens,
                                            blank=0, reduction="mean")
                return 0.5 * simple + pruned
            l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(jparams, enc, pred)
            gn = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g[0]))
            return (enc + 1e-12 * (gn + jnp.sum(g[1])).astype(enc.dtype),
                    pred + 1e-12 * jnp.sum(g[2]).astype(pred.dtype))
        ch = chainify(head_step, enc0, pred0)
        w = timed(ch, lambda i: (enc0 * (1 + 1e-6 * (i + 2)), pred0)) / K
        results["head_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps({"head_grad_ms": results["head_grad_ms"]}), flush=True)

    if args.only in (None, "optimizer"):
        tx = optax.adamw(1e-3, weight_decay=1e-6)
        opt_state = tx.init(params)
        grads = jax.tree.map(lambda x: x * 1e-3, params)

        def opt_step(p, o):
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o
        ch = chainify(opt_step, params, opt_state)
        w = timed(ch, lambda i: (jax.tree.map(lambda x: x * (1 + 1e-6 * (i + 2)), params),
                                 opt_state)) / K
        results["optimizer_ms"] = round(w * 1e3, 1)
        print(json.dumps({"optimizer_ms": results["optimizer_ms"]}), flush=True)

    print(json.dumps({"profile": results, "batch": B, "band": S}), flush=True)


if __name__ == "__main__":
    main()
