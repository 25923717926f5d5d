"""Mixed-precision helpers (utils.precision): bf16 compute, f32 masters.

Checks the three contracts the helpers promise:
 1. ``cast_floating`` casts only floating leaves (ints/bools untouched) and
    honors ``exclude`` path filters;
 2. bf16 inference on a real model (tiny wav2vec2) stays close to the f32
    path — flax norm statistics still accumulate in f32;
 3. ``mixed_precision``-wrapped losses produce FP32 master gradients whose
    values track the f32 gradients (no loss scaling needed with bf16).
"""

import numpy as np

import jax
import jax.numpy as jnp

import audio_tpu.models as M
from audio_tpu.utils import cast_floating, mixed_precision


def _tiny_w2v2(aux_num_out=None):
    return M.wav2vec2_model(
        extractor_mode="group_norm",
        extractor_conv_layer_config=[(16, 10, 5), (16, 3, 2)],
        extractor_conv_bias=False,
        encoder_embed_dim=32,
        encoder_projection_dropout=0.0,
        encoder_pos_conv_kernel=15,
        encoder_pos_conv_groups=1,
        encoder_num_layers=2,
        encoder_num_heads=4,
        encoder_attention_dropout=0.0,
        encoder_ff_interm_features=64,
        encoder_ff_interm_dropout=0.0,
        encoder_dropout=0.0,
        encoder_layer_norm_first=False,
        encoder_layer_drop=0.0,
        aux_num_out=aux_num_out,
    )


class TestCastFloating:
    def test_casts_floats_keeps_ints(self):
        tree = {"w": jnp.ones((2, 2), jnp.float32),
                "step": jnp.asarray(3, jnp.int32),
                "flag": jnp.asarray(True)}
        out = cast_floating(tree, jnp.bfloat16)
        assert out["w"].dtype == jnp.bfloat16
        assert out["step"].dtype == jnp.int32
        assert out["flag"].dtype == jnp.bool_

    def test_exclude_by_path_substring(self):
        tree = {"dense": {"kernel": jnp.ones(2, jnp.float32)},
                "norm": {"scale": jnp.ones(2, jnp.float32)}}
        out = cast_floating(tree, jnp.bfloat16, exclude=("norm",))
        assert out["dense"]["kernel"].dtype == jnp.bfloat16
        assert out["norm"]["scale"].dtype == jnp.float32


class TestBf16Inference:
    def test_wav2vec2_bf16_close_to_f32(self):
        model = _tiny_w2v2(aux_num_out=8)
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32) * 0.1)
        params = model.init(jax.random.PRNGKey(0), wav, deterministic=True)

        ref, _ = model.apply(params, wav, deterministic=True)
        p16 = cast_floating(params, jnp.bfloat16)
        out16, _ = model.apply(p16, wav.astype(jnp.bfloat16), deterministic=True)
        assert out16.dtype == jnp.bfloat16

        ref = np.asarray(ref)
        got = np.asarray(out16.astype(jnp.float32))
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() <= 0.08 * scale


class TestRnntLossCastCompute:
    """bf16 logits run the DP in f32 (ops/rnnt.py _gather_lps_lazy) and return
    bf16 gradients; costs must track the f32 path closely because the
    log-semiring scans never see bf16."""

    def test_bf16_logits_f32_dp(self):
        import audio_tpu.functional as F

        rng = np.random.default_rng(7)
        B, T, U, V = 3, 12, 5, 17
        logits = jnp.asarray(rng.standard_normal((B, T, U + 1, V)).astype(np.float32))
        targets = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
        lt = jnp.asarray([12, 9, 7], jnp.int32)
        lu = jnp.asarray([5, 3, 2], jnp.int32)

        def mean_loss(lg):
            return F.rnnt_loss(lg, targets, lt, lu, blank=0, reduction="mean")

        l32, g32 = jax.value_and_grad(mean_loss)(logits)
        l16, g16 = jax.value_and_grad(mean_loss)(logits.astype(jnp.bfloat16))
        assert g16.dtype == jnp.bfloat16
        # costs differ only through the bf16 rounding of the logits
        np.testing.assert_allclose(float(l16), float(l32), rtol=0.02, atol=0.05)
        np.testing.assert_allclose(
            np.asarray(g16.astype(jnp.float32)), np.asarray(g32), atol=0.02
        )


class TestMixedPrecisionGrads:
    def test_master_grads_stay_f32_and_track(self):
        model = _tiny_w2v2(aux_num_out=4)
        rng = np.random.default_rng(1)
        wav = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32) * 0.1)
        tgt = jnp.asarray(rng.integers(0, 4, (2, 100)).astype(np.int32))
        params = model.init(jax.random.PRNGKey(1), wav, deterministic=True)

        def loss_fn(p, w):
            logits, _ = model.apply(p, w, deterministic=True)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            n = min(logp.shape[1], tgt.shape[1])
            return -jnp.mean(
                jnp.take_along_axis(logp[:, :n], tgt[:, :n, None], axis=-1)
            )

        loss32, g32 = jax.value_and_grad(loss_fn)(params, wav)
        loss16, g16 = jax.value_and_grad(mixed_precision(loss_fn))(params, wav)

        assert all(g.dtype == jnp.float32 for g in jax.tree_util.tree_leaves(g16))
        assert np.isfinite(float(loss16))
        np.testing.assert_allclose(float(loss16), float(loss32), rtol=0.05)

        flat32 = jnp.concatenate([g.ravel() for g in jax.tree_util.tree_leaves(g32)])
        flat16 = jnp.concatenate([g.ravel() for g in jax.tree_util.tree_leaves(g16)])
        cos = jnp.vdot(flat32, flat16) / (
            jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12
        )
        assert float(cos) > 0.98
