"""Component timing of the FULL-lattice train step at B=32 bf16 (one v5e).

Same method as profile_pruned_step.py: value_and_grad of each component in
a fori-chain, against the bench's whole-step number for a closing check.

  encoder        transcribe only (dropout, rbg keys)
  predictor      predict only
  head           full joiner + rnnt_loss on precomputed (enc, pred) inputs
  joiner         joiner matmul alone on precomputed (enc, pred) inputs
  loss           rnnt_loss alone on a precomputed logits lattice
  optimizer      per-tensor adamw update on cached grads
  optimizer_flat optax.flatten(adamw) — the fused flat-vector update the
                 bench actually runs (bench_models.py)

Usage: timeout 3600 python tools/profile_full_step.py [--batch 32]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--parts", default="encoder,predictor,head,optimizer")
    args = ap.parse_args()
    parts = args.parts.split(",")

    import optax

    import audio_tpu.functional as F
    from audio_tpu.models.rnnt import emformer_rnnt_base
    from audio_tpu.utils import cast_floating

    V, B, T, U, RC, D = 4097, args.batch, 512, 64, 4, 1024
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

    out = {}

    def chainify(step_fn, k=4):
        @jax.jit
        def chain(*xs):
            def body(carry, _):
                return step_fn(*carry), None
            o, _ = jax.lax.scan(body, xs, None, length=k)
            return jnp.ravel(jax.tree_util.tree_leaves(o[0])[0])[0]
        return chain, k

    if "encoder" in parts:
        def enc_step(f, k):
            def loss(p):
                pb = cast_floating(p, jnp.bfloat16)
                enc, _ = model.apply({"params": pb}, f.astype(jnp.bfloat16),
                                     feat_lens, deterministic=False,
                                     rngs={"dropout": k}, method=model.transcribe)
                return jnp.sum(enc.astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(params)
            gn = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
            return f * (1 + 1e-12 * gn.astype(f.dtype)), jax.random.fold_in(k, 0)
        ch, K = chainify(enc_step)
        w = timed(ch, lambda i: (feats * (1 + 1e-6 * (i + 2)),
                                 jax.random.key(i + 5, impl="rbg"))) / K
        out["encoder_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps({"encoder_grad_ms": out["encoder_grad_ms"]}), flush=True)

    if "predictor" in parts:
        tgt_in = jnp.pad(targets, ((0, 0), (1, 0)))

        def pred_step(t_in, k):
            def loss(p):
                pb = cast_floating(p, jnp.bfloat16)
                pred, _, _ = model.apply({"params": pb}, t_in, tgt_lens + 1, None,
                                         deterministic=False, rngs={"dropout": k},
                                         method=model.predict)
                return jnp.sum(pred.astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(params)
            gn = sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(g))
            return t_in + (gn < -1).astype(t_in.dtype), jax.random.fold_in(k, 0)
        ch, K = chainify(pred_step)
        w = timed(ch, lambda i: (tgt_in, jax.random.key(i + 9, impl="rbg"))) / K
        out["predictor_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps({"predictor_grad_ms": out["predictor_grad_ms"]}), flush=True)

    if "head" in parts:
        enc0 = jnp.asarray(rng.standard_normal((B, T2, D)).astype(np.float32) * 0.1)
        pred0 = jnp.asarray(rng.standard_normal((B, U + 1, D)).astype(np.float32) * 0.1)

        def head_step(enc, pred):
            def loss(xs):
                e, pr = xs
                logits, _, _ = model.apply(
                    {"params": cast_floating(params, jnp.bfloat16)},
                    e.astype(jnp.bfloat16), t2_lens, pr.astype(jnp.bfloat16),
                    tgt_lens + 1, method=model.join)
                return F.rnnt_loss(logits, targets, t2_lens, tgt_lens, blank=0,
                                   reduction="mean")
            g = jax.grad(loss)((enc, pred))
            bump = 1e-12 * (jnp.sum(jnp.abs(g[0])) + jnp.sum(jnp.abs(g[1])))
            return enc * (1 + bump.astype(enc.dtype)), pred
        ch, K = chainify(head_step)
        w = timed(ch, lambda i: (enc0 * (1 + 1e-6 * (i + 2)), pred0)) / K
        out["head_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps({"head_grad_ms": out["head_grad_ms"]}), flush=True)

    if "joiner" in parts:
        enc0 = jnp.asarray(rng.standard_normal((B, T2, D)).astype(np.float32) * 0.1)
        pred0 = jnp.asarray(rng.standard_normal((B, U + 1, D)).astype(np.float32) * 0.1)

        def joiner_step(enc, pred):
            def loss(xs):
                e, pr = xs
                logits, _, _ = model.apply(
                    {"params": cast_floating(params, jnp.bfloat16)},
                    e.astype(jnp.bfloat16), t2_lens, pr.astype(jnp.bfloat16),
                    tgt_lens + 1, method=model.join)
                return jnp.sum(logits.astype(jnp.float32) ** 2) * 1e-9
            g = jax.grad(loss)((enc, pred))
            bump = 1e-12 * (jnp.sum(jnp.abs(g[0])) + jnp.sum(jnp.abs(g[1])))
            return enc * (1 + bump.astype(enc.dtype)), pred
        ch, K = chainify(joiner_step)
        w = timed(ch, lambda i: (enc0 * (1 + 1e-6 * (i + 2)), pred0)) / K
        out["joiner_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps({"joiner_grad_ms": out["joiner_grad_ms"]}), flush=True)

    if "loss" in parts:
        logits0 = jnp.asarray(
            rng.standard_normal((B, T2, U + 1, V)).astype(np.float32) * 0.1
        ).astype(jnp.bfloat16)

        def loss_step(logits):
            def loss(lg):
                return F.rnnt_loss(lg, targets, t2_lens, tgt_lens, blank=0,
                                   reduction="mean")
            g = jax.grad(loss)(logits)
            bump = (1e-12 * jnp.sum(jnp.abs(g.astype(jnp.float32)))).astype(logits.dtype)
            return (logits * (1 + bump),)
        ch, K = chainify(loss_step)
        w = timed(ch, lambda i: (logits0 * (1 + 1e-6 * (i + 2)),)) / K
        out["loss_grad_ms"] = round(w * 1e3, 1)
        print(json.dumps({"loss_grad_ms": out["loss_grad_ms"]}), flush=True)

    for part, make_tx in (
        ("optimizer", lambda: optax.adamw(1e-3, weight_decay=1e-6)),
        # the fused flat-vector update bench_models.py actually runs
        ("optimizer_flat", lambda: optax.flatten(optax.adamw(1e-3, weight_decay=1e-6))),
    ):
        if part not in parts:
            continue
        tx = make_tx()
        opt_state = tx.init(params)
        g0 = jax.tree.map(lambda x: x * 1e-3, params)

        def opt_step(params, opt_state):
            upd, opt_state = tx.update(g0, opt_state, params)
            return optax.apply_updates(params, upd), opt_state
        ch, K = chainify(opt_step)
        w = timed(ch, lambda i: (jax.tree.map(lambda x: x * (1 + 1e-6 * (i + 2)), params),
                                 opt_state)) / K
        out[f"{part}_ms"] = round(w * 1e3, 1)
        print(json.dumps({f"{part}_ms": out[f"{part}_ms"]}), flush=True)

    print(json.dumps({"profile": out, "batch": B}), flush=True)


if __name__ == "__main__":
    main()
