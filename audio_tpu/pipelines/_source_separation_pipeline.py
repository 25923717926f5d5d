"""Source separation pipeline bundles.

Behavioral parity with
/root/reference/src/torchaudio/pipelines/_source_separation_pipeline.py:12-109:
CONVTASNET_BASE_LIBRI2MIX, HDEMUCS_HIGH_MUSDB(+).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..models.conv_tasnet import conv_tasnet_base, import_conv_tasnet_state_dict
from ..utils import _download_asset

__all__ = [
    "SourceSeparationBundle",
    "CONVTASNET_BASE_LIBRI2MIX",
    "HDEMUCS_HIGH_MUSDB",
    "HDEMUCS_HIGH_MUSDB_PLUS",
]


class BoundModel:
    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

    def __call__(self, *args, **kwargs):
        return self.model.apply(self.variables, *args, **kwargs)


@dataclass
class SourceSeparationBundle:
    """Pretrained source-separation bundle; ``get_model()`` returns a bound model."""

    _model_path: str
    _model_factory_func: Callable[[], tuple]
    _sample_rate: int

    @property
    def sample_rate(self) -> int:
        return self._sample_rate

    def get_model(self, *, dl_kwargs=None) -> BoundModel:
        model, importer = self._model_factory_func()
        dl_kwargs = dl_kwargs or {}
        if "state_dict" in dl_kwargs:
            sd = dl_kwargs["state_dict"]
        else:
            import torch

            path = _download_asset(self._model_path)
            sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu", weights_only=True).items()}
        return BoundModel(model, importer(sd))


def _hdemucs_high(sources=("drums", "bass", "other", "vocals")):
    from ..models.hdemucs import hdemucs_high, import_hdemucs_state_dict

    return hdemucs_high(sources=list(sources)), import_hdemucs_state_dict


CONVTASNET_BASE_LIBRI2MIX = SourceSeparationBundle(
    _model_path="models/conv_tasnet_base_libri2mix.pt",
    _model_factory_func=lambda: (conv_tasnet_base(num_sources=2), import_conv_tasnet_state_dict),
    _sample_rate=8000,
)
CONVTASNET_BASE_LIBRI2MIX.__doc__ = "ConvTasNet trained on Libri2Mix (reference checkpoint)."

HDEMUCS_HIGH_MUSDB = SourceSeparationBundle(
    _model_path="models/hdemucs_high_musdbhq_only.pt",
    _model_factory_func=_hdemucs_high,
    _sample_rate=44100,
)
HDEMUCS_HIGH_MUSDB.__doc__ = "HDemucs (high band) trained on MUSDB-HQ (reference checkpoint)."

HDEMUCS_HIGH_MUSDB_PLUS = SourceSeparationBundle(
    _model_path="models/hdemucs_high_trained.pt",
    _model_factory_func=_hdemucs_high,
    _sample_rate=44100,
)
HDEMUCS_HIGH_MUSDB_PLUS.__doc__ = (
    "HDemucs (high band) trained on MUSDB-HQ plus internal extra data (reference checkpoint)."
)
