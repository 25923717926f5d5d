"""URL download with SHA256 prefix validation.

Role parity with the reference's ``torchaudio._internal.download_url_to_file``
re-export (torch.hub's implementation): streaming download to a temp file,
optional sha256 prefix check, atomic rename.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import urllib.request
from typing import Optional

__all__ = ["download_url_to_file"]


def download_url_to_file(
    url: str, dst: str, hash_prefix: Optional[str] = None, progress: bool = True
) -> None:
    dst = os.path.expanduser(dst)
    dst_dir = os.path.dirname(os.path.abspath(dst))
    os.makedirs(dst_dir, exist_ok=True)
    sha256 = hashlib.sha256() if hash_prefix is not None else None
    req = urllib.request.Request(url, headers={"User-Agent": "audio_tpu"})
    with urllib.request.urlopen(req) as src, tempfile.NamedTemporaryFile(delete=False, dir=dst_dir) as f:
        try:
            while True:
                chunk = src.read(1 << 16)
                if not chunk:
                    break
                f.write(chunk)
                if sha256 is not None:
                    sha256.update(chunk)
            f.close()
            if sha256 is not None:
                digest = sha256.hexdigest()
                if digest[: len(hash_prefix)] != hash_prefix:
                    raise RuntimeError(
                        f'invalid hash value (expected "{hash_prefix}", got "{digest}")'
                    )
            shutil.move(f.name, dst)
        finally:
            if os.path.exists(f.name):
                os.remove(f.name)
