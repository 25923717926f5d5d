"""wav2vec2 / HuBERT / WavLM pipeline bundles.

Behavioral parity with
/root/reference/src/torchaudio/pipelines/_wav2vec2/impl.py: frozen bundle
dataclasses exposing ``get_model`` (checkpoint download + weight import +
optional input layer-norm / log-softmax / star-token extensions,
:62-98 and utils.py:21-66), ``get_labels`` for ASR bundles, and the
forced-alignment bundle's tokenizer/aligner accessors (:1589-1653).

``get_model`` returns a bound :class:`PretrainedModel` wrapper (flax model +
imported params) so ``model(waveform)`` works like the reference's eager
module.  The reference's published ``.pth`` checkpoints load directly (the
state dict is converted through the wav2vec2 importer).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ... import functional as F
from ...models import wav2vec2_model
from ...models.wav2vec2.utils import import_torchaudio_state_dict
from ...utils import _download_asset
from ._bundle_data import BUNDLE_DATA

__all__ = ["Wav2Vec2Bundle", "Wav2Vec2ASRBundle", "Wav2Vec2FABundle", "PretrainedModel"]


def _load_torch_state_dict(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def _remove_aux_axes(sd: Dict[str, np.ndarray], axes):
    for key in ("aux.weight", "aux.bias"):
        mat = sd[key]
        sd[key] = np.stack([mat[i] for i in range(mat.shape[0]) if i not in axes])


class PretrainedModel:
    """A flax model bound to imported pretrained params, with the reference's
    call conventions (optional input layer-norm, log-softmax, star token)."""

    def __init__(self, model, params, normalize_waveform=False, apply_log_softmax=False, append_star=False):
        self.model = model
        self.params = params
        self.normalize_waveform = normalize_waveform
        self.apply_log_softmax = apply_log_softmax
        self.append_star = append_star

    def _pre(self, waveforms):
        if self.normalize_waveform:
            mean = waveforms.mean()
            var = waveforms.var()
            waveforms = (waveforms - mean) * jax.lax.rsqrt(var + 1e-5)
        return waveforms

    def __call__(self, waveforms, lengths=None):
        waveforms = self._pre(jnp.asarray(waveforms))
        output, out_lengths = self.model.apply(self.params, waveforms, lengths, deterministic=True)
        if self.apply_log_softmax:
            output = jax.nn.log_softmax(output, axis=-1)
        if self.append_star:
            star = jnp.zeros(output.shape[:-1] + (1,), output.dtype)
            output = jnp.concatenate([output, star], axis=-1)
        return output, out_lengths

    def extract_features(self, waveforms, lengths=None, num_layers=None):
        waveforms = self._pre(jnp.asarray(waveforms))
        return self.model.apply(
            self.params, waveforms, lengths, num_layers, deterministic=True,
            method=self.model.extract_features,
        )


@dataclass
class Wav2Vec2Bundle:
    """Pretrained wav2vec2-family bundle; use ``get_model()``."""

    _path: str
    _params: Dict[str, Any]
    _sample_rate: float
    _normalize_waveform: bool
    _model_type: str

    @property
    def sample_rate(self) -> float:
        return self._sample_rate

    def _build_model(self):
        if self._model_type == "Wav2Vec2":
            return wav2vec2_model(**self._params)
        if self._model_type == "WavLM":
            from ...models.wavlm import wavlm_model

            return wavlm_model(**self._params)
        raise ValueError(f"Unsupported model type: {self._model_type}")

    def _get_state_dict(self, dl_kwargs):
        dl_kwargs = dl_kwargs or {}
        if "state_dict" in dl_kwargs:
            return dl_kwargs["state_dict"]
        path = _download_asset(f"models/{self._path}")
        return _load_torch_state_dict(path)

    def get_model(self, *, dl_kwargs=None) -> PretrainedModel:
        model = self._build_model()
        sd = self._get_state_dict(dl_kwargs)
        params = {"params": import_torchaudio_state_dict(sd)}
        return PretrainedModel(model, params, normalize_waveform=self._normalize_waveform)


@dataclass
class Wav2Vec2ASRBundle(Wav2Vec2Bundle):
    _labels: Tuple[str, ...] = ()
    _remove_aux_axis: Tuple[int, ...] = (1, 2, 3)

    def get_labels(self, *, blank: str = "-") -> Tuple[str, ...]:
        return (blank, *self._labels)

    def _get_state_dict(self, dl_kwargs):
        sd = super()._get_state_dict(dl_kwargs)
        if self._remove_aux_axis:
            sd = dict(sd)  # don't mutate a caller-injected state dict
            _remove_aux_axes(sd, self._remove_aux_axis)
        return sd


class ITokenizer(ABC):
    @abstractmethod
    def __call__(self, transcript: List[str]) -> List[List[int]]:
        ...


class Tokenizer(ITokenizer):
    def __init__(self, dictionary: Dict[str, int]):
        self.dictionary = dictionary

    def __call__(self, transcript: List[str]) -> List[List[int]]:
        return [[self.dictionary[c] for c in word] for word in transcript]


def _unflatten(list_, lengths):
    assert len(list_) == sum(lengths)
    i, ret = 0, []
    for l in lengths:
        ret.append(list_[i : i + l])
        i += l
    return ret


class IAligner(ABC):
    @abstractmethod
    def __call__(self, emission, tokens):
        ...


class Aligner(IAligner):
    def __init__(self, blank: int):
        self.blank = blank

    def __call__(self, emission, tokens: List[List[int]]):
        emission = jnp.asarray(emission)
        if emission.ndim != 2:
            raise ValueError(f"The input emission must be 2D. Found: {emission.shape}")
        flat = [t for ts in tokens for t in ts]
        targets = jnp.asarray([flat], jnp.int32)
        aligned, scores = F.forced_align(emission[None], targets, blank=self.blank)
        scores = np.exp(np.asarray(scores))[0]
        spans = F.merge_tokens(np.asarray(aligned)[0], scores, blank=self.blank)
        return _unflatten(spans, [len(ts) for ts in tokens])


@dataclass
class Wav2Vec2FABundle(Wav2Vec2ASRBundle):
    """Forced-alignment bundle (MMS_FA): model + tokenizer + aligner."""

    def get_labels(self, star: Optional[str] = "*", blank: str = "-") -> Tuple[str, ...]:
        labels = super().get_labels(blank=blank)
        return labels if star is None else (*labels, star)

    def get_dict(self, star: Optional[str] = "*", blank: str = "-") -> Dict[str, int]:
        return {k: i for i, k in enumerate(self.get_labels(star=star, blank=blank))}

    def get_model(self, with_star: bool = True, *, dl_kwargs=None) -> PretrainedModel:
        model = self._build_model()
        sd = self._get_state_dict(dl_kwargs)
        params = {"params": import_torchaudio_state_dict(sd)}
        return PretrainedModel(
            model, params, normalize_waveform=self._normalize_waveform,
            apply_log_softmax=True, append_star=with_star,
        )

    def get_tokenizer(self) -> Tokenizer:
        return Tokenizer(self.get_dict())

    def get_aligner(self) -> Aligner:
        return Aligner(blank=0)


_KINDS = {
    "Wav2Vec2Bundle": Wav2Vec2Bundle,
    "Wav2Vec2ASRBundle": Wav2Vec2ASRBundle,
    "Wav2Vec2FABundle": Wav2Vec2FABundle,
}


def _make_bundle(spec: dict):
    cls = _KINDS[spec["kind"]]
    kwargs = dict(
        _path=spec["path"],
        _params=spec["params"],
        _sample_rate=spec["sample_rate"],
        _normalize_waveform=spec["normalize_waveform"],
        _model_type=spec["model_type"],
    )
    if cls is not Wav2Vec2Bundle:
        kwargs["_labels"] = tuple(spec.get("labels", ()))
        kwargs["_remove_aux_axis"] = tuple(spec.get("remove_aux_axis", ()))
    return cls(**kwargs)


# instantiate all 30 bundles (WAV2VEC2_BASE ... MMS_FA) from the metadata table
globals().update({name: _make_bundle(spec) for name, spec in BUNDLE_DATA.items()})
__all__ += sorted(BUNDLE_DATA)
