"""wav2vec2 model tests: shape/length contracts + numerical parity against
the reference torch implementation run with identical weights.

The torch oracle is built by importing the reference's standalone component
modules from /root/reference (read-only, used as a test oracle, never
shipped), then loading OUR randomly-initialized weights into it through the
state-dict importer — so this exercises both the architecture and the
checkpoint-import path.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import audio_tpu.models as M
from audio_tpu.models.wav2vec2.utils import import_torchaudio_state_dict


def _load_reference_wav2vec2():
    """Dynamically import the reference's wav2vec2 components/model modules."""
    pkg_name = "_ref_w2v2"
    if pkg_name in sys.modules:
        return sys.modules[pkg_name]
    base = "/root/reference/src/torchaudio/models/wav2vec2"
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [base]
    sys.modules[pkg_name] = pkg
    for mod in ("wavlm_attention", "components", "model"):
        spec = importlib.util.spec_from_file_location(f"{pkg_name}.{mod}", f"{base}/{mod}.py")
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{mod}"] = m
        spec.loader.exec_module(m)
        setattr(pkg, mod, m)
    return pkg


def _flax_to_state_dict(tmodel, params):
    """Export our flax params into the torch model via the importer's inverse:
    we instead randomize the TORCH model and import its state_dict into flax,
    which tests the real production direction."""
    raise NotImplementedError


@pytest.fixture(scope="module")
def ref():
    return _load_reference_wav2vec2()


def _compare(variant_t, variant_j, atol, b=2, t_len=4000):
    torch.manual_seed(0)
    tmodel = variant_t(aux_num_out=None)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = {"params": import_torchaudio_state_dict(sd)}

    jmodel = variant_j()
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((b, t_len)).astype(np.float32) * 0.1
    lengths = np.array([t_len, t_len - 700], np.int64)

    with torch.no_grad():
        t_out, t_len_out = tmodel(torch.from_numpy(wav), torch.from_numpy(lengths))
    j_out, j_len_out = jmodel.apply(params, jnp.asarray(wav), jnp.asarray(lengths), deterministic=True)

    np.testing.assert_array_equal(np.asarray(j_len_out), t_len_out.numpy())
    # compare only valid frames
    for i, l in enumerate(t_len_out.numpy()):
        got = np.asarray(j_out)[i, :l]
        expected = t_out.numpy()[i, :l]
        err = np.abs(got - expected).max()
        assert err < atol, f"max abs err {err}"


class TestWav2Vec2Parity:
    def test_base_matches_reference_torch(self, ref):
        _compare(ref.model.wav2vec2_base, M.wav2vec2_base, atol=2e-4)

    def test_large_lv60k_layernorm_path(self, ref):
        # smaller custom config with layer_norm extractor + layer_norm_first
        def t_factory(aux_num_out=None):
            return ref.model.wav2vec2_model(
                extractor_mode="layer_norm",
                extractor_conv_layer_config=[(64, 10, 5), (64, 3, 2)],
                extractor_conv_bias=True,
                encoder_embed_dim=128,
                encoder_projection_dropout=0.0,
                encoder_pos_conv_kernel=31,
                encoder_pos_conv_groups=4,
                encoder_num_layers=2,
                encoder_num_heads=4,
                encoder_attention_dropout=0.0,
                encoder_ff_interm_features=256,
                encoder_ff_interm_dropout=0.0,
                encoder_dropout=0.0,
                encoder_layer_norm_first=True,
                encoder_layer_drop=0.0,
                aux_num_out=aux_num_out,
            )

        def j_factory():
            return M.wav2vec2_model(
                extractor_mode="layer_norm",
                extractor_conv_layer_config=[(64, 10, 5), (64, 3, 2)],
                extractor_conv_bias=True,
                encoder_embed_dim=128,
                encoder_projection_dropout=0.0,
                encoder_pos_conv_kernel=31,
                encoder_pos_conv_groups=4,
                encoder_num_layers=2,
                encoder_num_heads=4,
                encoder_attention_dropout=0.0,
                encoder_ff_interm_features=256,
                encoder_ff_interm_dropout=0.0,
                encoder_dropout=0.0,
                encoder_layer_norm_first=True,
                encoder_layer_drop=0.0,
                aux_num_out=None,
            )

        _compare(t_factory, j_factory, atol=2e-4, t_len=3200)

    def test_aux_head_and_extract_features(self, ref):
        torch.manual_seed(1)
        tmodel = ref.model.wav2vec2_model(
            extractor_mode="group_norm",
            extractor_conv_layer_config=[(32, 10, 5), (32, 3, 2)],
            extractor_conv_bias=False,
            encoder_embed_dim=64,
            encoder_projection_dropout=0.0,
            encoder_pos_conv_kernel=15,
            encoder_pos_conv_groups=1,
            encoder_num_layers=3,
            encoder_num_heads=4,
            encoder_attention_dropout=0.0,
            encoder_ff_interm_features=128,
            encoder_ff_interm_dropout=0.0,
            encoder_dropout=0.0,
            encoder_layer_norm_first=False,
            encoder_layer_drop=0.0,
            aux_num_out=29,
        )
        tmodel.eval()
        sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
        params = {"params": import_torchaudio_state_dict(sd)}
        jmodel = M.wav2vec2_model(
            extractor_mode="group_norm",
            extractor_conv_layer_config=[(32, 10, 5), (32, 3, 2)],
            extractor_conv_bias=False,
            encoder_embed_dim=64,
            encoder_projection_dropout=0.0,
            encoder_pos_conv_kernel=15,
            encoder_pos_conv_groups=1,
            encoder_num_layers=3,
            encoder_num_heads=4,
            encoder_attention_dropout=0.0,
            encoder_ff_interm_features=128,
            encoder_ff_interm_dropout=0.0,
            encoder_dropout=0.0,
            encoder_layer_norm_first=False,
            encoder_layer_drop=0.0,
            aux_num_out=29,
        )
        wav = np.random.default_rng(1).standard_normal((1, 2000)).astype(np.float32) * 0.1
        with torch.no_grad():
            t_out, _ = tmodel(torch.from_numpy(wav))
            t_feats, _ = tmodel.extract_features(torch.from_numpy(wav), num_layers=2)
        j_out, _ = jmodel.apply(params, jnp.asarray(wav), deterministic=True)
        j_feats, _ = jmodel.apply(
            params, jnp.asarray(wav), num_layers=2, deterministic=True, method=jmodel.extract_features
        )
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4)
        assert len(j_feats) == len(t_feats) == 2
        for jf, tf in zip(j_feats, t_feats):
            np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=2e-4)


class TestWav2Vec2Contracts:
    def test_init_and_forward_shapes(self):
        model = M.wav2vec2_model(
            extractor_mode="group_norm",
            extractor_conv_layer_config=[(16, 10, 5), (16, 3, 2)],
            extractor_conv_bias=False,
            encoder_embed_dim=32,
            encoder_projection_dropout=0.1,
            encoder_pos_conv_kernel=15,
            encoder_pos_conv_groups=1,
            encoder_num_layers=2,
            encoder_num_heads=4,
            encoder_attention_dropout=0.1,
            encoder_ff_interm_features=64,
            encoder_ff_interm_dropout=0.1,
            encoder_dropout=0.1,
            encoder_layer_norm_first=False,
            encoder_layer_drop=0.1,
            aux_num_out=None,
        )
        wav = jnp.zeros((3, 1600))
        params = model.init(jax.random.PRNGKey(0), wav, deterministic=True)
        out, lengths = model.apply(params, wav, jnp.asarray([1600, 800, 400]), deterministic=True)
        assert out.shape[0] == 3 and out.shape[2] == 32
        assert np.isfinite(np.asarray(out)).all()

    def test_training_mode_with_dropout_rngs(self):
        model = M.wav2vec2_model(
            extractor_mode="group_norm",
            extractor_conv_layer_config=[(16, 10, 5), (16, 3, 2)],
            extractor_conv_bias=False,
            encoder_embed_dim=32,
            encoder_projection_dropout=0.1,
            encoder_pos_conv_kernel=15,
            encoder_pos_conv_groups=1,
            encoder_num_layers=2,
            encoder_num_heads=4,
            encoder_attention_dropout=0.0,
            encoder_ff_interm_features=64,
            encoder_ff_interm_dropout=0.1,
            encoder_dropout=0.1,
            encoder_layer_norm_first=False,
            encoder_layer_drop=0.5,
            aux_num_out=None,
        )
        wav = jnp.zeros((2, 1600))
        params = model.init(jax.random.PRNGKey(0), wav, deterministic=True)
        out, _ = model.apply(
            params, wav, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1), "layer_drop": jax.random.PRNGKey(2)},
        )
        assert out.shape[0] == 2


class TestHuBERTPretrain:
    def test_pretrain_forward(self):
        model = M.hubert_pretrain_model(
            "group_norm", [(16, 10, 5), (16, 3, 2)], False, 32, 0.0, 15, 1, 2, 4, 0.0, 64, 0.0, 0.0, False, 0.0,
            num_classes=10, final_dim=16,
        )
        wav = jnp.zeros((2, 3200))
        labels = jnp.zeros((2, 100), jnp.int32)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            wav, labels, deterministic=True,
        )
        logit_m, logit_u, mask_m, mask_u, feature_penalty = model.apply(
            params, wav, labels, jnp.asarray([3200, 1600]),
            rngs={"mask": jax.random.PRNGKey(2)}, deterministic=True,
        )
        assert logit_m.shape[-1] == 10
        assert mask_m.dtype == bool
        assert feature_penalty.shape == ()
