"""Wav2Vec2Model / HuBERTPretrainModel and factory functions (flax.linen).

API parity with /root/reference/src/torchaudio/models/wav2vec2/model.py:
Wav2Vec2Model (:11-121, forward + extract_features), HuBERTPretrainModel
(:123-223), and the factory functions (:226-1581): wav2vec2_model,
wav2vec2_base/large/large_lv60k, hubert_base/large/xlarge,
hubert_pretrain_model + base/large/xlarge, wav2vec2_xlsr_300m/1b/2b.
(wavlm variants live in ``wavlm_attention.py`` integration — see factories.)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .components import Encoder, FeatureExtractor, LogitGenerator, MaskGenerator

_DEFAULT_CONV_CONFIG = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2


class Wav2Vec2Model(nn.Module):
    """Acoustic model from *wav2vec 2.0* — feature extractor + transformer
    encoder, with optional aux linear head for CTC ASR."""

    extractor_mode: str
    extractor_conv_layer_config: Tuple[Tuple[int, int, int], ...]
    extractor_conv_bias: bool
    encoder_embed_dim: int
    encoder_projection_dropout: float
    encoder_pos_conv_kernel: int
    encoder_pos_conv_groups: int
    encoder_num_layers: int
    encoder_num_heads: int
    encoder_attention_dropout: float
    encoder_ff_interm_features: int
    encoder_ff_interm_dropout: float
    encoder_dropout: float
    encoder_layer_norm_first: bool
    encoder_layer_drop: float
    aux_num_out: Optional[int] = None

    def setup(self):
        self.feature_extractor = FeatureExtractor(
            self.extractor_conv_layer_config, self.extractor_conv_bias, self.extractor_mode, name="feature_extractor"
        )
        self.encoder = Encoder(
            self.encoder_embed_dim,
            self.encoder_projection_dropout,
            self.encoder_num_layers,
            self.encoder_num_heads,
            self.encoder_attention_dropout,
            self.encoder_dropout,
            self.encoder_layer_norm_first,
            self.encoder_layer_drop,
            self.encoder_ff_interm_features,
            self.encoder_ff_interm_dropout,
            self.encoder_pos_conv_kernel,
            self.encoder_pos_conv_groups,
            name="encoder",
        )
        if self.aux_num_out is not None:
            self.aux = nn.Dense(self.aux_num_out, name="aux")

    def __call__(
        self,
        waveforms: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Returns (output (B, frames, embed_dim or aux_num_out), lengths)."""
        x, lengths = self.feature_extractor(waveforms, lengths)
        x = self.encoder(x, lengths, deterministic=deterministic)
        if self.aux_num_out is not None:
            x = self.aux(x)
        return x, lengths

    def extract_features(
        self,
        waveforms: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        num_layers: Optional[int] = None,
        deterministic: bool = True,
    ) -> Tuple[List[jnp.ndarray], Optional[jnp.ndarray]]:
        x, lengths = self.feature_extractor(waveforms, lengths)
        feats = self.encoder.extract_features(x, lengths, num_layers, deterministic=deterministic)
        return feats, lengths


class HuBERTPretrainModel(nn.Module):
    """HuBERT pretraining: wav2vec2 backbone + span masking + cosine logits."""

    wav2vec2: Wav2Vec2Model
    mask_prob: float = 0.8
    mask_length: int = 10
    num_classes: int = 100
    final_dim: int = 256
    skip_masked: bool = False
    skip_nomask: bool = False

    def setup(self):
        self.mask_generator = MaskGenerator(
            self.wav2vec2.encoder_embed_dim, self.mask_prob, self.mask_length, name="mask_generator"
        )
        self.logit_generator = LogitGenerator(
            self.wav2vec2.encoder_embed_dim,
            self.num_classes,
            self.final_dim,
            self.skip_masked,
            self.skip_nomask,
            name="logit_generator",
        )

    def __call__(
        self,
        waveforms: jnp.ndarray,
        labels: jnp.ndarray,
        audio_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
    ):
        x, lengths = self.wav2vec2.feature_extractor(waveforms, audio_lengths)
        # feature penalty, as the reference returns (wav2vec2/model.py:123
        # `features_pen = x.float().pow(2).mean()`)
        feature_penalty = jnp.square(x.astype(jnp.float32)).mean()
        if lengths is not None:
            padding_mask = jnp.arange(x.shape[1])[None, :] >= lengths[:, None]
        else:
            padding_mask = None
        x, attn_mask = self.wav2vec2.encoder._preprocess(x, lengths, deterministic)
        x, mask = self.mask_generator(x, padding_mask, self.make_rng("mask"))
        x = self.wav2vec2.encoder.transformer(x, attention_mask=attn_mask, deterministic=deterministic)
        if padding_mask is not None:
            mask_m = jnp.logical_and(~padding_mask, mask)
            mask_u = jnp.logical_and(~padding_mask, ~mask_m)
        else:
            mask_m = mask
            mask_u = ~mask_m
        logit_m, logit_u = self.logit_generator(x, labels, mask_m, mask_u)
        return logit_m, logit_u, mask_m, mask_u, feature_penalty


def wav2vec2_model(
    extractor_mode: str,
    extractor_conv_layer_config: Optional[List[Tuple[int, int, int]]],
    extractor_conv_bias: bool,
    encoder_embed_dim: int,
    encoder_projection_dropout: float,
    encoder_pos_conv_kernel: int,
    encoder_pos_conv_groups: int,
    encoder_num_layers: int,
    encoder_num_heads: int,
    encoder_attention_dropout: float,
    encoder_ff_interm_features: int,
    encoder_ff_interm_dropout: float,
    encoder_dropout: float,
    encoder_layer_norm_first: bool,
    encoder_layer_drop: float,
    aux_num_out: Optional[int] = None,
) -> Wav2Vec2Model:
    if extractor_conv_layer_config is None:
        extractor_conv_layer_config = _DEFAULT_CONV_CONFIG
    return Wav2Vec2Model(
        extractor_mode=extractor_mode,
        extractor_conv_layer_config=tuple(tuple(c) for c in extractor_conv_layer_config),
        extractor_conv_bias=extractor_conv_bias,
        encoder_embed_dim=encoder_embed_dim,
        encoder_projection_dropout=encoder_projection_dropout,
        encoder_pos_conv_kernel=encoder_pos_conv_kernel,
        encoder_pos_conv_groups=encoder_pos_conv_groups,
        encoder_num_layers=encoder_num_layers,
        encoder_num_heads=encoder_num_heads,
        encoder_attention_dropout=encoder_attention_dropout,
        encoder_ff_interm_features=encoder_ff_interm_features,
        encoder_ff_interm_dropout=encoder_ff_interm_dropout,
        encoder_dropout=encoder_dropout,
        encoder_layer_norm_first=encoder_layer_norm_first,
        encoder_layer_drop=encoder_layer_drop,
        aux_num_out=aux_num_out,
    )


def _make(variant: str, dropouts, aux_num_out):
    (proj_do, attn_do, ff_do, do, drop) = dropouts
    cfg = {
        "base": ("group_norm", False, 768, 12, 12, 3072, False),
        "large": ("group_norm", False, 1024, 24, 16, 4096, False),
        "large_lv60k": ("layer_norm", True, 1024, 24, 16, 4096, True),
        "hubert_base": ("group_norm", False, 768, 12, 12, 3072, False),
        "hubert_large": ("layer_norm", False, 1024, 24, 16, 4096, True),
        "hubert_xlarge": ("layer_norm", False, 1280, 48, 16, 5120, True),
        "xlsr_300m": ("layer_norm", True, 1024, 24, 16, 4096, True),
        "xlsr_1b": ("layer_norm", True, 1280, 48, 16, 5120, True),
        "xlsr_2b": ("layer_norm", True, 1920, 48, 16, 7680, True),
    }[variant]
    mode, conv_bias, dim, layers, heads, ff, lnf = cfg
    return wav2vec2_model(
        extractor_mode=mode,
        extractor_conv_layer_config=None,
        extractor_conv_bias=conv_bias,
        encoder_embed_dim=dim,
        encoder_projection_dropout=proj_do,
        encoder_pos_conv_kernel=128,
        encoder_pos_conv_groups=16,
        encoder_num_layers=layers,
        encoder_num_heads=heads,
        encoder_attention_dropout=attn_do,
        encoder_ff_interm_features=ff,
        encoder_ff_interm_dropout=ff_do,
        encoder_dropout=do,
        encoder_layer_norm_first=lnf,
        encoder_layer_drop=drop,
        aux_num_out=aux_num_out,
    )


def wav2vec2_base(
    encoder_projection_dropout: float = 0.1,
    encoder_attention_dropout: float = 0.1,
    encoder_ff_interm_dropout: float = 0.1,
    encoder_dropout: float = 0.1,
    encoder_layer_drop: float = 0.1,
    aux_num_out: Optional[int] = None,
) -> Wav2Vec2Model:
    return _make("base", (encoder_projection_dropout, encoder_attention_dropout, encoder_ff_interm_dropout,
                          encoder_dropout, encoder_layer_drop), aux_num_out)


def wav2vec2_large(
    encoder_projection_dropout: float = 0.1,
    encoder_attention_dropout: float = 0.1,
    encoder_ff_interm_dropout: float = 0.1,
    encoder_dropout: float = 0.1,
    encoder_layer_drop: float = 0.1,
    aux_num_out: Optional[int] = None,
) -> Wav2Vec2Model:
    return _make("large", (encoder_projection_dropout, encoder_attention_dropout, encoder_ff_interm_dropout,
                           encoder_dropout, encoder_layer_drop), aux_num_out)


def wav2vec2_large_lv60k(
    encoder_projection_dropout: float = 0.1,
    encoder_attention_dropout: float = 0.0,
    encoder_ff_interm_dropout: float = 0.1,
    encoder_dropout: float = 0.0,
    encoder_layer_drop: float = 0.1,
    aux_num_out: Optional[int] = None,
) -> Wav2Vec2Model:
    return _make("large_lv60k", (encoder_projection_dropout, encoder_attention_dropout, encoder_ff_interm_dropout,
                                 encoder_dropout, encoder_layer_drop), aux_num_out)


def hubert_base(
    encoder_projection_dropout: float = 0.1,
    encoder_attention_dropout: float = 0.1,
    encoder_ff_interm_dropout: float = 0.0,
    encoder_dropout: float = 0.1,
    encoder_layer_drop: float = 0.05,
    aux_num_out: Optional[int] = None,
) -> Wav2Vec2Model:
    return _make("hubert_base", (encoder_projection_dropout, encoder_attention_dropout, encoder_ff_interm_dropout,
                                 encoder_dropout, encoder_layer_drop), aux_num_out)


def hubert_large(
    encoder_projection_dropout: float = 0.0,
    encoder_attention_dropout: float = 0.0,
    encoder_ff_interm_dropout: float = 0.0,
    encoder_dropout: float = 0.0,
    encoder_layer_drop: float = 0.0,
    aux_num_out: Optional[int] = None,
) -> Wav2Vec2Model:
    return _make("hubert_large", (encoder_projection_dropout, encoder_attention_dropout, encoder_ff_interm_dropout,
                                  encoder_dropout, encoder_layer_drop), aux_num_out)


def hubert_xlarge(
    encoder_projection_dropout: float = 0.0,
    encoder_attention_dropout: float = 0.0,
    encoder_ff_interm_dropout: float = 0.0,
    encoder_dropout: float = 0.0,
    encoder_layer_drop: float = 0.0,
    aux_num_out: Optional[int] = None,
) -> Wav2Vec2Model:
    return _make("hubert_xlarge", (encoder_projection_dropout, encoder_attention_dropout, encoder_ff_interm_dropout,
                                   encoder_dropout, encoder_layer_drop), aux_num_out)


def wav2vec2_xlsr_300m(
    encoder_projection_dropout: float = 0.0,
    encoder_attention_dropout: float = 0.0,
    encoder_ff_interm_dropout: float = 0.0,
    encoder_dropout: float = 0.0,
    encoder_layer_drop: float = 0.0,
    aux_num_out: Optional[int] = None,
) -> Wav2Vec2Model:
    return _make("xlsr_300m", (encoder_projection_dropout, encoder_attention_dropout, encoder_ff_interm_dropout,
                               encoder_dropout, encoder_layer_drop), aux_num_out)


def wav2vec2_xlsr_1b(
    encoder_projection_dropout: float = 0.0,
    encoder_attention_dropout: float = 0.0,
    encoder_ff_interm_dropout: float = 0.0,
    encoder_dropout: float = 0.0,
    encoder_layer_drop: float = 0.0,
    aux_num_out: Optional[int] = None,
) -> Wav2Vec2Model:
    return _make("xlsr_1b", (encoder_projection_dropout, encoder_attention_dropout, encoder_ff_interm_dropout,
                             encoder_dropout, encoder_layer_drop), aux_num_out)


def wav2vec2_xlsr_2b(
    encoder_projection_dropout: float = 0.0,
    encoder_attention_dropout: float = 0.0,
    encoder_ff_interm_dropout: float = 0.0,
    encoder_dropout: float = 0.0,
    encoder_layer_drop: float = 0.0,
    aux_num_out: Optional[int] = None,
) -> Wav2Vec2Model:
    return _make("xlsr_2b", (encoder_projection_dropout, encoder_attention_dropout, encoder_ff_interm_dropout,
                             encoder_dropout, encoder_layer_drop), aux_num_out)


def hubert_pretrain_model(
    extractor_mode: str,
    extractor_conv_layer_config: Optional[List[Tuple[int, int, int]]],
    extractor_conv_bias: bool,
    encoder_embed_dim: int,
    encoder_projection_dropout: float,
    encoder_pos_conv_kernel: int,
    encoder_pos_conv_groups: int,
    encoder_num_layers: int,
    encoder_num_heads: int,
    encoder_attention_dropout: float,
    encoder_ff_interm_features: int,
    encoder_ff_interm_dropout: float,
    encoder_dropout: float,
    encoder_layer_norm_first: bool,
    encoder_layer_drop: float,
    mask_prob: float = 0.8,
    mask_length: int = 10,
    num_classes: int = 100,
    final_dim: int = 256,
    skip_masked: bool = False,
    skip_nomask: bool = False,
    **_ignored,
) -> HuBERTPretrainModel:
    backbone = wav2vec2_model(
        extractor_mode,
        extractor_conv_layer_config,
        extractor_conv_bias,
        encoder_embed_dim,
        encoder_projection_dropout,
        encoder_pos_conv_kernel,
        encoder_pos_conv_groups,
        encoder_num_layers,
        encoder_num_heads,
        encoder_attention_dropout,
        encoder_ff_interm_features,
        encoder_ff_interm_dropout,
        encoder_dropout,
        encoder_layer_norm_first,
        encoder_layer_drop,
        aux_num_out=None,
    )
    return HuBERTPretrainModel(
        wav2vec2=backbone,
        mask_prob=mask_prob,
        mask_length=mask_length,
        num_classes=num_classes,
        final_dim=final_dim,
        skip_masked=skip_masked,
        skip_nomask=skip_nomask,
    )


def hubert_pretrain_base(num_classes: int = 100, **kw) -> HuBERTPretrainModel:
    return hubert_pretrain_model(
        "group_norm", None, False, 768, 0.1, 128, 16, 12, 12, 0.1, 3072, 0.0, 0.1, False, 0.05,
        num_classes=num_classes, final_dim=256, **kw,
    )


def hubert_pretrain_large(num_classes: int = 500, **kw) -> HuBERTPretrainModel:
    return hubert_pretrain_model(
        "layer_norm", None, False, 1024, 0.0, 128, 16, 24, 16, 0.0, 4096, 0.0, 0.0, True, 0.0,
        num_classes=num_classes, final_dim=768, **kw,
    )


def hubert_pretrain_xlarge(num_classes: int = 500, **kw) -> HuBERTPretrainModel:
    return hubert_pretrain_model(
        "layer_norm", None, False, 1280, 0.0, 128, 16, 48, 16, 0.0, 5120, 0.0, 0.0, True, 0.0,
        num_classes=num_classes, final_dim=1024, **kw,
    )
