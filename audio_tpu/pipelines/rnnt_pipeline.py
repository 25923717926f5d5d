"""Emformer RNN-T ASR pipeline bundle.

Behavioral parity with /root/reference/src/torchaudio/pipelines/rnnt_pipeline.py:
the feature-extractor / decoder / token-processor triple (:152-370) with the
same featurization (MelSpectrogram n_fft=400 hop=160 80 mel →
piecewise-linear-log(x·gain) → global-stats normalization → right padding)
and the EMFORMER_RNNT_BASE_LIBRISPEECH instance (same asset keys).
"""

from __future__ import annotations

import json
import math
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Callable, List, Tuple

import numpy as np

import jax.numpy as jnp

from .. import transforms
from ..models import RNNT, RNNTBeamSearch, emformer_rnnt_base
from ..models.rnnt import import_rnnt_state_dict
from ..utils import _download_asset

__all__ = ["RNNTBundle", "EMFORMER_RNNT_BASE_LIBRISPEECH"]

_decibel = 2 * 20 * math.log10(32767)
_gain = pow(10, 0.05 * _decibel)


def _piecewise_linear_log(x):
    return jnp.where(x > math.e, jnp.log(jnp.maximum(x, 1e-20)), x / math.e)


class _FeatureExtractor(ABC):
    @abstractmethod
    def __call__(self, input) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ...


class _TokenProcessor(ABC):
    @abstractmethod
    def __call__(self, tokens: List[int], **kwargs) -> str:
        ...


class _SentencePieceTokenProcessor(_TokenProcessor):
    def __init__(self, sp_model_path: str) -> None:
        try:
            import sentencepiece as spm
        except ImportError as err:
            raise RuntimeError("SentencePiece is not available. Please install it.") from err
        self.sp_model = spm.SentencePieceProcessor(model_file=sp_model_path)
        self.post_process_remove_list = {
            self.sp_model.unk_id(),
            self.sp_model.eos_id(),
            self.sp_model.pad_id(),
        }

    def __call__(self, tokens: List[int], lstrip: bool = True) -> str:
        filtered = [t for t in tokens[1:] if t not in self.post_process_remove_list]
        output = "".join(self.sp_model.id_to_piece(filtered)).replace("▁", " ")
        return output.lstrip() if lstrip else output


class _MelFeatureExtractor(_FeatureExtractor):
    def __init__(self, bundle: "RNNTBundle", global_stats_path: str, streaming: bool):
        self._mel = transforms.MelSpectrogram(
            sample_rate=bundle.sample_rate, n_fft=bundle.n_fft, n_mels=bundle.n_mels,
            hop_length=bundle.hop_length,
        )
        with open(global_stats_path) as f:
            blob = json.loads(f.read())
        self._mean = jnp.asarray(blob["mean"])
        self._invstddev = jnp.asarray(blob["invstddev"])
        self._right_padding = bundle._right_padding
        self._streaming = streaming

    def __call__(self, input) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """input: 1D waveform → (features (T, n_mels), length (1,))."""
        mel = self._mel(jnp.asarray(input))  # (n_mels, T)
        feats = jnp.swapaxes(mel, 0, 1)  # (T, n_mels)
        feats = _piecewise_linear_log(feats * _gain)
        feats = (feats - self._mean) * self._invstddev
        if not self._streaming and self._right_padding:
            feats = jnp.pad(feats, ((0, self._right_padding), (0, 0)))
        return feats, jnp.asarray([feats.shape[0]])


@dataclass
class RNNTBundle:
    """End-to-end RNN-T ASR pipeline (feature extractor + decoder + detok)."""

    _rnnt_path: str
    _rnnt_factory_func: Callable[[], RNNT]
    _global_stats_path: str
    _sp_model_path: str
    _right_padding: int
    _blank: int
    _sample_rate: int
    _n_fft: int
    _n_mels: int
    _hop_length: int
    _segment_length: int
    _right_context_length: int

    FeatureExtractor = _FeatureExtractor
    TokenProcessor = _TokenProcessor

    @property
    def sample_rate(self) -> int:
        return self._sample_rate

    @property
    def n_fft(self) -> int:
        return self._n_fft

    @property
    def n_mels(self) -> int:
        return self._n_mels

    @property
    def hop_length(self) -> int:
        return self._hop_length

    @property
    def segment_length(self) -> int:
        return self._segment_length

    @property
    def right_context_length(self) -> int:
        return self._right_context_length

    def _get_model(self, dl_kwargs=None):
        model = self._rnnt_factory_func()
        dl_kwargs = dl_kwargs or {}
        if "state_dict" in dl_kwargs:
            sd = dl_kwargs["state_dict"]
        else:
            import torch

            path = _download_asset(self._rnnt_path)
            sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu", weights_only=True).items()}
        params = {"params": import_rnnt_state_dict(sd)}
        return model, params

    def get_decoder(self, *, dl_kwargs=None) -> RNNTBeamSearch:
        model, params = self._get_model(dl_kwargs)
        return RNNTBeamSearch(model, params, self._blank)

    def get_feature_extractor(self, *, dl_kwargs=None) -> _FeatureExtractor:
        local_path = _download_asset(self._global_stats_path)
        return _MelFeatureExtractor(self, local_path, streaming=False)

    def get_streaming_feature_extractor(self, *, dl_kwargs=None) -> _FeatureExtractor:
        local_path = _download_asset(self._global_stats_path)
        return _MelFeatureExtractor(self, local_path, streaming=True)

    def get_token_processor(self, *, dl_kwargs=None) -> _TokenProcessor:
        local_path = _download_asset(self._sp_model_path)
        return _SentencePieceTokenProcessor(local_path)


EMFORMER_RNNT_BASE_LIBRISPEECH = RNNTBundle(
    _rnnt_path="models/emformer_rnnt_base_librispeech.pt",
    _rnnt_factory_func=lambda: emformer_rnnt_base(num_symbols=4097),
    _global_stats_path="pipeline-assets/global_stats_rnnt_librispeech.json",
    _sp_model_path="pipeline-assets/spm_bpe_4096_librispeech.model",
    _right_padding=4,
    _blank=4096,
    _sample_rate=16000,
    _n_fft=400,
    _n_mels=80,
    _hop_length=160,
    _segment_length=16,
    _right_context_length=4,
)
EMFORMER_RNNT_BASE_LIBRISPEECH.__doc__ = (
    "Emformer RNN-T pipeline pretrained on LibriSpeech (the reference's "
    "emformer_rnnt_base_librispeech checkpoint)."
)
