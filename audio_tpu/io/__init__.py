"""Audio I/O layer.

Role parity with the reference's I/O delegation
(/root/reference/src/torchaudio/__init__.py:18-204, which forwards to the
external torchcodec/FFmpeg package).  This environment has no FFmpeg, so the
built-in codec handles WAV (PCM 8/16/24/32-bit int and 32/64-bit float)
natively in numpy, and other formats route through ``scipy.io`` or
``soundfile`` when available.  ``load``/``save`` keep the torchaudio
argument contract (frame_offset/num_frames/normalize/channels_first).
"""

from ._wav import AudioMetaData, info, load, save

__all__ = ["AudioMetaData", "info", "load", "save"]
