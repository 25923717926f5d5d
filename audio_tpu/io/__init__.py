"""Audio I/O layer.

Role parity with the reference's I/O delegation
(/root/reference/src/torchaudio/__init__.py:18-204, which forwards to the
external torchcodec/FFmpeg package).  This environment has no FFmpeg, so the
built-in codecs handle:

- WAV (PCM 8/16/24/32-bit int, 32/64-bit float, EXTENSIBLE) — pure numpy
- FLAC — native C++ decoder (``csrc/flac.cpp``, built on demand) + numpy
  encoder (``save("x.flac", ...)``); covers LibriSpeech/Libri-Light corpora
- NIST SPHERE (.sph, PCM/ulaw) — TED-LIUM corpora
- Sun AU (.au/.snd) — GTZAN corpus

Containers are detected by magic bytes, not extension.  Other formats
(mp3/ogg) route through ``soundfile`` when available (the reference needs
FFmpeg for those too).  ``load``/``save`` keep the torchaudio argument
contract (frame_offset/num_frames/normalize/channels_first).
"""

from ._codec_shims import load_with_torchcodec, save_with_torchcodec
from ._wav import AudioMetaData, info, load, save

__all__ = ["AudioMetaData", "info", "load", "load_with_torchcodec", "save", "save_with_torchcodec"]
