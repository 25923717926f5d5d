"""Split wav2vec2-BASE bf16 inference time: conv extractor vs transformer.

Usage: timeout 2400 python tools/profile_wav2vec2.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, argmaker, reps=3, k=16):
    np.asarray(fn(*argmaker(-1)))
    ts = []
    for i in range(reps):
        args = jax.block_until_ready(argmaker(i))
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / k


def main():
    import audio_tpu.models as M
    from audio_tpu.utils import cast_floating

    B, SR = 128, 16000
    K = 16
    model = M.wav2vec2_base(aux_num_out=29)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((B, SR)).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), SR, jnp.int32)
    params = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), wav[:1], lengths[:1], deterministic=True
    )
    params = cast_floating(params, jnp.bfloat16)

    # extractor-only: run just the conv stack through extract_features with
    # num_layers=0 transformer? extract_features returns intermediate
    # transformer layers; instead call the extractor submodule directly.
    from audio_tpu.models.wav2vec2.components import FeatureExtractor

    fe_params = {"params": params["params"]["feature_extractor"]}
    fe = FeatureExtractor(
        conv_layer_config=tuple([(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2),
        conv_bias=False, norm_mode="group_norm",
    )

    @jax.jit
    def fe_chain(fe_params, wav):
        def body(_, carry):
            w, acc = carry
            feats, _ = fe.apply(fe_params, w.astype(jnp.bfloat16), None)
            bump = (jnp.mean(feats.astype(jnp.float32)) * 1e-12).astype(w.dtype)
            return (w + bump, acc + feats.astype(jnp.float32)[0, 0, 0])
        _, acc = jax.lax.fori_loop(0, K, body, (wav, jnp.float32(0)))
        return acc

    w_fe = timed(fe_chain, lambda i: (fe_params, wav * (1 + 1e-6 * (i + 2))), k=K)
    print(json.dumps({"extractor_ms": round(w_fe * 1e3, 2)}), flush=True)

    @jax.jit
    def full_chain(params, wav):
        def body(_, carry):
            w, acc = carry
            logits, _ = model.apply(params, w.astype(jnp.bfloat16), lengths,
                                    deterministic=True)
            bump = (jnp.mean(logits.astype(jnp.float32)) * 1e-12).astype(w.dtype)
            return (w + bump, acc + logits.astype(jnp.float32)[0, 0, 0])
        _, acc = jax.lax.fori_loop(0, K, body, (wav, jnp.float32(0)))
        return acc

    w_full = timed(full_chain, lambda i: (params, wav * (1 + 1e-6 * (i + 2))), k=K)
    print(json.dumps({
        "extractor_ms": round(w_fe * 1e3, 2),
        "full_ms": round(w_full * 1e3, 2),
        "transformer_plus_aux_ms": round((w_full - w_fe) * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
