"""SQUIM subjective model: MOS with non-matching reference (flax.linen).

Architecture parity with
/root/reference/src/torchaudio/models/squim/subjective.py: AttPool (:8-38),
Predictor (:40-67), SquimSubjective with reference tiling (:69-120),
squim_subjective_model/base (:122-150).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..wav2vec2 import Wav2Vec2Model, wav2vec2_base, wav2vec2_large

__all__ = ["SquimSubjective", "squim_subjective_model", "squim_subjective_base", "import_squim_subjective_state_dict"]


class AttPool(nn.Module):
    att_dim: int

    @nn.compact
    def __call__(self, x):
        att = nn.Dense(1, name="linear1")(x)  # (B, T, 1)
        att = jax.nn.softmax(jnp.swapaxes(att, 2, 1), axis=2)  # (B, 1, T)
        x = jnp.matmul(att, x)[:, 0]  # (B, D)
        return nn.Dense(self.att_dim, name="linear2")(x)


class Predictor(nn.Module):
    att_dim: int

    @nn.compact
    def __call__(self, x):
        x = AttPool(self.att_dim, name="att_pool_layer")(x)
        x = jax.nn.softmax(x, axis=1)
        b = jnp.linspace(0, 4, self.att_dim)
        return jnp.sum(x * b, axis=1)


class SquimSubjective(nn.Module):
    ssl_model: Wav2Vec2Model
    proj_dim: int
    att_dim: int

    def _align_shapes(self, waveform, reference):
        t_wav = waveform.shape[-1]
        t_ref = reference.shape[-1]
        if t_ref < t_wav:
            reps = t_wav // t_ref + 1
            reference = jnp.tile(reference, (1, reps))
        return waveform, reference[:, :t_wav]

    @nn.compact
    def __call__(self, waveform: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
        """(B, T), (B, T_ref) -> MOS (B,)."""
        waveform, reference = self._align_shapes(waveform, reference)
        projector = nn.Dense(self.proj_dim, name="projector")
        feats_w, _ = self.ssl_model.extract_features(waveform, deterministic=True)
        feats_r, _ = self.ssl_model.extract_features(reference, deterministic=True)
        w = projector(feats_w[-1])
        r = projector(feats_r[-1])
        concat = jnp.concatenate([r, w], axis=2)
        score_diff = Predictor(self.att_dim, name="predictor")(concat)
        return 5 - score_diff


def squim_subjective_model(ssl_type: str, feat_dim: int, proj_dim: int, att_dim: int) -> SquimSubjective:
    ssl = {"wav2vec2_base": wav2vec2_base, "wav2vec2_large": wav2vec2_large}[ssl_type]()
    return SquimSubjective(ssl_model=ssl, proj_dim=proj_dim, att_dim=att_dim)


def squim_subjective_base() -> SquimSubjective:
    return squim_subjective_model("wav2vec2_base", feat_dim=768, proj_dim=32, att_dim=5)


def import_squim_subjective_state_dict(state_dict) -> dict:
    from ..wav2vec2.utils import import_torchaudio_state_dict

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    ssl_sd = {k[len("ssl_model."):]: v for k, v in sd.items() if k.startswith("ssl_model.")}
    params = {"ssl_model": import_torchaudio_state_dict(ssl_sd)}
    params["projector"] = {"kernel": sd["projector.weight"].T, "bias": sd["projector.bias"]}
    params["predictor"] = {
        "att_pool_layer": {
            "linear1": {"kernel": sd["predictor.att_pool_layer.linear1.weight"].T,
                        "bias": sd["predictor.att_pool_layer.linear1.bias"]},
            "linear2": {"kernel": sd["predictor.att_pool_layer.linear2.weight"].T,
                        "bias": sd["predictor.att_pool_layer.linear2.bias"]},
        }
    }
    return {"params": params}
