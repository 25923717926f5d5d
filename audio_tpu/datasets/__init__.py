"""Datasets layer (torchaudio.datasets parity).

All 22 map-style datasets from
/root/reference/src/torchaudio/datasets/__init__.py:24-46, built on the
framework's own WAV I/O.  Each follows the reference pattern:
download+checksum → extract → glob walker → ``get_metadata(n)`` (path-only)
and ``__getitem__`` (waveform-loading).
"""

from ._large import (
    LIBRITTS,
    LibriMix,
    MUSDB_HQ,
    QUESST14,
    TEDLIUM,
    VoxCeleb1Identification,
    VoxCeleb1Verification,
)
from ._small import (
    CMUARCTIC,
    CMUDict,
    COMMONVOICE,
    DR_VCTK,
    FluentSpeechCommands,
    GTZAN,
    IEMOCAP,
    LJSPEECH,
    SPEECHCOMMANDS,
    Snips,
    VCTK_092,
    YESNO,
)
from .librispeech import LIBRISPEECH, LibriLightLimited, LibriSpeechBiasing

__all__ = [
    "CMUARCTIC",
    "CMUDict",
    "COMMONVOICE",
    "DR_VCTK",
    "FluentSpeechCommands",
    "GTZAN",
    "IEMOCAP",
    "LIBRISPEECH",
    "LIBRITTS",
    "LJSPEECH",
    "LibriLightLimited",
    "LibriMix",
    "LibriSpeechBiasing",
    "MUSDB_HQ",
    "QUESST14",
    "SPEECHCOMMANDS",
    "Snips",
    "TEDLIUM",
    "VCTK_092",
    "VoxCeleb1Identification",
    "VoxCeleb1Verification",
    "YESNO",
]
