"""Download-path tests against a local HTTP server (no network).

Mirror of the reference's HttpServerMixin strategy
(/root/reference/test/torchaudio_unittest/common_utils/case_utils.py:58-82):
a stdlib http.server serves a temp directory so download_url_to_file and
_download_asset (cache + SHA256 validation) are exercised end-to-end
without internet access.
"""

import hashlib
import http.server
import threading

import pytest

from audio_tpu._internal.download import download_url_to_file
from audio_tpu.utils.download import _download_asset


@pytest.fixture()
def http_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("served")
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(*a, directory=str(root), **kw)
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield root, f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_download_url_to_file(http_root, tmp_path):
    root, base = http_root
    payload = b"audio_tpu test asset \x00\x01" * 100
    (root / "blob.bin").write_bytes(payload)
    dst = tmp_path / "blob.bin"
    download_url_to_file(f"{base}/blob.bin", str(dst), progress=False)
    assert dst.read_bytes() == payload


def test_download_asset_checksum_and_cache(http_root, tmp_path, monkeypatch):
    root, base = http_root
    payload = b"checkpoint-bytes" * 50
    (root / "model.pt").write_bytes(payload)
    good = hashlib.sha256(payload).hexdigest()
    monkeypatch.setenv("AUDIO_TPU_HOME", str(tmp_path / "cache"))

    p = _download_asset(f"{base}/model.pt", hash=good, path=tmp_path / "m.pt", progress=False)
    assert open(p, "rb").read() == payload

    # cache hit: corrupt the server copy; the local file must be reused
    (root / "model.pt").write_bytes(b"corrupted")
    p2 = _download_asset(f"{base}/model.pt", hash=good, path=tmp_path / "m.pt", progress=False)
    assert p2 == p and open(p2, "rb").read() == payload


def test_download_asset_bad_checksum(http_root, tmp_path):
    root, base = http_root
    (root / "x.bin").write_bytes(b"something")
    with pytest.raises(ValueError, match="hash value"):
        _download_asset(f"{base}/x.bin", hash="0" * 64, path=tmp_path / "x.bin", progress=False)
