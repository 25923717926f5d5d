"""SQUIM pipeline bundles (objective + subjective).

Behavioral parity with /root/reference/src/torchaudio/pipelines/_squim_pipeline.py:10-156.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..models.squim import squim_objective_base, squim_subjective_base
from ..models.squim.objective import import_squim_objective_state_dict
from ..models.squim.subjective import import_squim_subjective_state_dict
from ..utils import _download_asset

__all__ = ["SquimObjectiveBundle", "SquimSubjectiveBundle", "SQUIM_OBJECTIVE", "SQUIM_SUBJECTIVE"]


def _load_sd(path_key, dl_kwargs):
    dl_kwargs = dl_kwargs or {}
    if "state_dict" in dl_kwargs:
        return dl_kwargs["state_dict"]
    import torch

    path = _download_asset(f"models/{path_key}")
    return {k: v.numpy() for k, v in torch.load(path, map_location="cpu", weights_only=True).items()}


class BoundModel:
    """A flax module bound to pretrained variables: call like the torch model."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables

    def __call__(self, *args, **kwargs):
        return self.model.apply(self.variables, *args, **kwargs)


@dataclass
class SquimObjectiveBundle:
    _path: str
    _sample_rate: float

    def get_model(self, *, dl_kwargs=None) -> BoundModel:
        model = squim_objective_base()
        sd = _load_sd(self._path, dl_kwargs)
        return BoundModel(model, import_squim_objective_state_dict(sd))

    @property
    def sample_rate(self):
        return self._sample_rate


@dataclass
class SquimSubjectiveBundle:
    _path: str
    _sample_rate: float

    def get_model(self, *, dl_kwargs=None) -> BoundModel:
        model = squim_subjective_base()
        sd = _load_sd(self._path, dl_kwargs)
        return BoundModel(model, import_squim_subjective_state_dict(sd))

    @property
    def sample_rate(self):
        return self._sample_rate


SQUIM_OBJECTIVE = SquimObjectiveBundle("squim_objective_dns2020.pth", _sample_rate=16000)
SQUIM_OBJECTIVE.__doc__ = "SquimObjective pipeline trained on DNS 2020 (reference checkpoint)."
SQUIM_SUBJECTIVE = SquimSubjectiveBundle("squim_subjective_bvcc_daps.pth", _sample_rate=16000)
SQUIM_SUBJECTIVE.__doc__ = "SquimSubjective pipeline trained on BVCC/DAPS (reference checkpoint)."
