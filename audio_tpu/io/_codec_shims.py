"""torchcodec-named convenience shims.

API parity with the reference's ``torchaudio.load_with_torchcodec`` /
``save_with_torchcodec`` (/root/reference/src/torchaudio/_torchcodec.py:9-340):
same signatures, same warnings for ``normalize``/``buffer_size``/``backend``.
Intentional divergence: the reference ALSO ignores (and warns on) ``format``
in load and ``format``/``encoding``/``bits_per_sample`` in save because
torchcodec cannot honor them; audio_tpu's own codecs CAN, so these parameters
are honored here and no warning is emitted.  In audio_tpu the shims delegate
to :func:`audio_tpu.load` / :func:`audio_tpu.save` — the built-in codecs plus
the ffmpeg-CLI fallback play torchcodec's role.
"""

from __future__ import annotations

import os
import warnings
from typing import BinaryIO, Optional, Tuple, Union

import numpy as np

from ._wav import load as _load
from ._wav import save as _save

__all__ = ["load_with_torchcodec", "save_with_torchcodec"]


def load_with_torchcodec(
    uri: Union[BinaryIO, str, os.PathLike],
    frame_offset: int = 0,
    num_frames: int = -1,
    normalize: bool = True,
    channels_first: bool = True,
    format: Optional[str] = None,
    buffer_size: int = 4096,
    backend: Optional[str] = None,
) -> Tuple[np.ndarray, int]:
    """torchaudio.load_with_torchcodec parity: always-normalized float32 load.

    Mirrors the reference's warnings for parameters torchcodec ignores
    (_torchcodec.py:92-113): ``normalize=False``, non-default
    ``buffer_size``, and ``backend`` are accepted but have no effect.
    """
    if not normalize:
        warnings.warn(
            "load_with_torchcodec always returns normalized float32 samples. "
            "The 'normalize=False' parameter is ignored.",
            UserWarning,
            stacklevel=2,
        )
    if buffer_size != 4096:
        warnings.warn("The 'buffer_size' parameter is not used.", UserWarning, stacklevel=2)
    if backend is not None:
        warnings.warn("The 'backend' parameter is not used.", UserWarning, stacklevel=2)
    return _load(
        uri,
        frame_offset=frame_offset,
        num_frames=num_frames,
        normalize=True,
        channels_first=channels_first,
        format=format,
    )


def save_with_torchcodec(
    uri: Union[str, os.PathLike],
    src,
    sample_rate: int,
    channels_first: bool = True,
    format: Optional[str] = None,
    encoding: Optional[str] = None,
    bits_per_sample: Optional[int] = None,
    buffer_size: int = 4096,
    backend: Optional[str] = None,
    compression: Optional[Union[float, int]] = None,
) -> None:
    """torchaudio.save_with_torchcodec parity (reference _torchcodec.py:157-340)."""
    if buffer_size != 4096:
        warnings.warn("The 'buffer_size' parameter is not used.", UserWarning, stacklevel=2)
    if backend is not None:
        warnings.warn("The 'backend' parameter is not used.", UserWarning, stacklevel=2)
    _save(
        uri,
        src,
        sample_rate,
        channels_first=channels_first,
        format=format,
        encoding=encoding,
        bits_per_sample=bits_per_sample,
        compression=compression,
    )
