"""audio_tpu — a TPU-native audio ML framework (JAX/XLA/Pallas/pjit).

Built from scratch with the capabilities of pytorch/audio (torchaudio 2.11):
functional DSP, transforms, Kaldi-compliance features, alignment/losses and
decoding, the model zoo, pipelines, and datasets — designed TPU-first.
See SURVEY.md at the repo root for the blueprint.
"""

__version__ = "0.2.0"

from . import compliance  # noqa: F401
from . import datasets  # noqa: F401
from . import functional  # noqa: F401
from . import io  # noqa: F401
from . import models  # noqa: F401
from . import ops  # noqa: F401
from . import pipelines  # noqa: F401
from . import transforms  # noqa: F401
from . import utils  # noqa: F401
from .io import AudioMetaData, info, load, load_with_torchcodec, save, save_with_torchcodec  # noqa: F401

__all__ = [
    "AudioMetaData",
    "compliance",
    "datasets",
    "functional",
    "info",
    "io",
    "load",
    "load_with_torchcodec",
    "models",
    "ops",
    "pipelines",
    "save",
    "save_with_torchcodec",
    "transforms",
    "utils",
    "__version__",
]
