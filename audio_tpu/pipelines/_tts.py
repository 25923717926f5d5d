"""Tacotron2 TTS pipeline bundles.

Behavioral parity with /root/reference/src/torchaudio/pipelines/_tts/
(impl.py:25-207, interface.py, utils.py): English char/phone text processors
× WaveRNN / Griffin-Lim vocoders, with the same token inventories, Tacotron2
and WaveRNN hyperparameters, and checkpoint keys.
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..functional import mu_law_decoding
from ..models.tacotron2 import Tacotron2, import_tacotron2_state_dict
from ..models.wavernn import WaveRNN, import_wavernn_state_dict
from ..transforms import GriffinLim, InverseMelScale
from ..utils import _download_asset

__all__ = [
    "Tacotron2TTSBundle",
    "TACOTRON2_GRIFFINLIM_CHAR_LJSPEECH",
    "TACOTRON2_GRIFFINLIM_PHONE_LJSPEECH",
    "TACOTRON2_WAVERNN_CHAR_LJSPEECH",
    "TACOTRON2_WAVERNN_PHONE_LJSPEECH",
]

_CHARS = (
    "_", "-", "!", "'", "(", ")", ",", ".", ":", ";", "?", " ",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
)

_PHONES = (
    "_", "-", "!", "'", "(", ")", ",", ".", ":", ";", "?", " ",
    "AA", "AA0", "AA1", "AA2", "AE", "AE0", "AE1", "AE2", "AH", "AH0", "AH1", "AH2",
    "AO", "AO0", "AO1", "AO2", "AW", "AW0", "AW1", "AW2", "AY", "AY0", "AY1", "AY2",
    "B", "CH", "D", "DH", "EH", "EH0", "EH1", "EH2", "ER", "ER0", "ER1", "ER2",
    "EY", "EY0", "EY1", "EY2", "F", "G", "HH", "IH", "IH0", "IH1", "IH2",
    "IY", "IY0", "IY1", "IY2", "JH", "K", "L", "M", "N", "NG",
    "OW", "OW0", "OW1", "OW2", "OY", "OY0", "OY1", "OY2", "P", "R", "S", "SH",
    "T", "TH", "UH", "UH0", "UH1", "UH2", "UW", "UW0", "UW1", "UW2",
    "V", "W", "Y", "Z", "ZH",
)


def _get_taco_params(n_symbols: int) -> Dict[str, Any]:
    return {
        "mask_padding": False,
        "n_mels": 80,
        "n_frames_per_step": 1,
        "symbol_embedding_dim": 512,
        "encoder_embedding_dim": 512,
        "encoder_n_convolution": 3,
        "encoder_kernel_size": 5,
        "decoder_rnn_dim": 1024,
        "decoder_max_step": 2000,
        "decoder_dropout": 0.1,
        "decoder_early_stopping": True,
        "attention_rnn_dim": 1024,
        "attention_hidden_dim": 128,
        "attention_location_n_filter": 32,
        "attention_location_kernel_size": 31,
        "attention_dropout": 0.1,
        "prenet_dim": 256,
        "postnet_n_convolution": 5,
        "postnet_kernel_size": 5,
        "postnet_embedding_dim": 512,
        "gate_threshold": 0.5,
        "n_symbol": n_symbols,
    }


def _get_wrnn_params() -> Dict[str, Any]:
    return {
        "upsample_scales": (5, 5, 11),
        "n_classes": 2**8,
        "hop_length": 275,
        "n_res_block": 10,
        "n_rnn": 512,
        "n_fc": 512,
        "kernel_size": 5,
        "n_freq": 80,
        "n_hidden": 128,
        "n_output": 128,
    }


def _to_arrays(indices: List[List[int]]):
    lengths = np.asarray([len(i) for i in indices], np.int32)
    max_len = max(lengths) if len(lengths) else 0
    values = np.zeros((len(indices), max_len), np.int32)
    for i, idx in enumerate(indices):
        values[i, : len(idx)] = idx
    return jnp.asarray(values), jnp.asarray(lengths)


def _load_sd(path_key, dl_kwargs):
    dl_kwargs = dl_kwargs or {}
    if "state_dict" in dl_kwargs:
        return dl_kwargs["state_dict"]
    import torch

    path = _download_asset(f"models/{path_key}")
    return {k: v.numpy() for k, v in torch.load(path, map_location="cpu", weights_only=True).items()}


class _TextProcessor(ABC):
    @property
    @abstractmethod
    def tokens(self):
        ...

    @abstractmethod
    def __call__(self, texts: Union[str, List[str]]):
        ...


class _Vocoder(ABC):
    @property
    @abstractmethod
    def sample_rate(self):
        ...

    @abstractmethod
    def __call__(self, specgrams, lengths=None):
        ...


class _EnglishCharProcessor(_TextProcessor):
    def __init__(self):
        self._tokens = _CHARS
        self._mapping = {s: i for i, s in enumerate(self._tokens)}

    @property
    def tokens(self):
        return self._tokens

    def __call__(self, texts):
        if isinstance(texts, str):
            texts = [texts]
        indices = [[self._mapping[c] for c in t.lower() if c in self._mapping] for t in texts]
        return _to_arrays(indices)


class _EnglishPhoneProcessor(_TextProcessor):
    def __init__(self, *, dl_kwargs=None):
        self._tokens = _PHONES
        self._mapping = {p: i for i, p in enumerate(self._tokens)}
        try:
            from dp.phonemizer import Phonemizer  # noqa: F401
        except ImportError as err:
            raise RuntimeError("DeepPhonemizer is not installed. Please install it.") from err
        raise RuntimeError("DeepPhonemizer checkpoints are not available in this environment.")

    @property
    def tokens(self):
        return self._tokens

    def __call__(self, texts):
        raise NotImplementedError


class _BoundTacotron2:
    def __init__(self, model: Tacotron2, variables):
        self.model = model
        self.variables = variables

    def __call__(self, *args, **kwargs):
        return self.model.apply(self.variables, *args, **kwargs)

    def infer(self, tokens, lengths=None, **kwargs):
        return self.model.apply(self.variables, tokens, lengths, method=self.model.infer, **kwargs)


class _WaveRNNVocoder(_Vocoder):
    def __init__(self, model: WaveRNN, variables, min_level_db: Optional[float] = -100):
        self._sample_rate = 22050
        self._model = model
        self._variables = variables
        self._min_level_db = min_level_db

    @property
    def sample_rate(self):
        return self._sample_rate

    def __call__(self, mel_spec, lengths=None, key=None):
        mel_spec = jnp.exp(jnp.asarray(mel_spec))
        mel_spec = 20 * jnp.log10(jnp.maximum(mel_spec, 1e-5))
        if self._min_level_db is not None:
            mel_spec = jnp.clip((self._min_level_db - mel_spec) / self._min_level_db, 0, 1)
        waveform, lengths = self._model.apply(
            self._variables, mel_spec, lengths, key or jax.random.PRNGKey(0),
            method=self._model.infer,
        )
        # [-1, 1] -> labels -> mu-law decode
        bits = self._model.n_bits if hasattr(self._model, "n_bits") else 8
        labels = jnp.clip((jnp.clip(waveform, -1, 1) + 1.0) * (2**bits - 1) / 2, 0, 2**bits - 1).astype(jnp.int32)
        waveform = mu_law_decoding(labels, 2**bits)
        return waveform[:, 0], lengths


class _GriffinLimVocoder(_Vocoder):
    def __init__(self):
        self._sample_rate = 22050
        self._inv_mel = InverseMelScale(
            n_stft=(1024 // 2 + 1), n_mels=80, sample_rate=self._sample_rate,
            f_min=0.0, f_max=8000.0, mel_scale="slaney", norm="slaney",
        )
        self._griffin_lim = GriffinLim(n_fft=1024, power=1, hop_length=256, win_length=1024)

    @property
    def sample_rate(self):
        return self._sample_rate

    def __call__(self, mel_spec, lengths=None):
        spec = self._inv_mel(jnp.exp(jnp.asarray(mel_spec)))
        return self._griffin_lim(spec), lengths


class Tacotron2TTSBundle(ABC):
    """TTS bundle: text processor + Tacotron2 + vocoder."""

    TextProcessor = _TextProcessor
    Vocoder = _Vocoder


@dataclass
class _Tacotron2Mixin:
    _tacotron2_path: str
    _tacotron2_params: Dict[str, Any]

    def get_tacotron2(self, *, dl_kwargs=None) -> _BoundTacotron2:
        model = Tacotron2(**self._tacotron2_params)
        sd = _load_sd(self._tacotron2_path, dl_kwargs)
        return _BoundTacotron2(model, import_tacotron2_state_dict(sd))


@dataclass
class _WaveRNNMixin:
    _wavernn_path: Optional[str] = None
    _wavernn_params: Optional[Dict[str, Any]] = None

    def get_vocoder(self, *, dl_kwargs=None):
        model = WaveRNN(**self._wavernn_params)
        sd = _load_sd(self._wavernn_path, dl_kwargs)
        return _WaveRNNVocoder(model, import_wavernn_state_dict(sd))


class _GriffinLimMixin:
    def get_vocoder(self, **_):
        return _GriffinLimVocoder()


class _CharMixin:
    def get_text_processor(self, *, dl_kwargs=None) -> _TextProcessor:
        return _EnglishCharProcessor()


class _PhoneMixin:
    def get_text_processor(self, *, dl_kwargs=None) -> _TextProcessor:
        return _EnglishPhoneProcessor(dl_kwargs=dl_kwargs)


@dataclass
class _Tacotron2WaveRNNCharBundle(_WaveRNNMixin, _Tacotron2Mixin, _CharMixin, Tacotron2TTSBundle):
    pass


@dataclass
class _Tacotron2WaveRNNPhoneBundle(_WaveRNNMixin, _Tacotron2Mixin, _PhoneMixin, Tacotron2TTSBundle):
    pass


@dataclass
class _Tacotron2GriffinLimCharBundle(_GriffinLimMixin, _Tacotron2Mixin, _CharMixin, Tacotron2TTSBundle):
    pass


@dataclass
class _Tacotron2GriffinLimPhoneBundle(_GriffinLimMixin, _Tacotron2Mixin, _PhoneMixin, Tacotron2TTSBundle):
    pass


TACOTRON2_GRIFFINLIM_CHAR_LJSPEECH = _Tacotron2GriffinLimCharBundle(
    _tacotron2_path="tacotron2_english_characters_1500_epochs_ljspeech.pth",
    _tacotron2_params=_get_taco_params(n_symbols=38),
)

TACOTRON2_GRIFFINLIM_PHONE_LJSPEECH = _Tacotron2GriffinLimPhoneBundle(
    _tacotron2_path="tacotron2_english_phonemes_1500_epochs_ljspeech.pth",
    _tacotron2_params=_get_taco_params(n_symbols=96),
)

TACOTRON2_WAVERNN_CHAR_LJSPEECH = _Tacotron2WaveRNNCharBundle(
    _tacotron2_path="tacotron2_english_characters_1500_epochs_wavernn_ljspeech.pth",
    _tacotron2_params=_get_taco_params(n_symbols=38),
    _wavernn_path="wavernn_10k_epochs_8bits_ljspeech.pth",
    _wavernn_params=_get_wrnn_params(),
)

TACOTRON2_WAVERNN_PHONE_LJSPEECH = _Tacotron2WaveRNNPhoneBundle(
    _tacotron2_path="tacotron2_english_phonemes_1500_epochs_wavernn_ljspeech.pth",
    _tacotron2_params=_get_taco_params(n_symbols=96),
    _wavernn_path="wavernn_10k_epochs_8bits_ljspeech.pth",
    _wavernn_params=_get_wrnn_params(),
)
