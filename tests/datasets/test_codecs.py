"""Codec tests: FLAC (native C++ decoder + numpy encoder), SPHERE, AU.

Round-trip matrix over every subframe type / stereo mode / bit depth the
encoder can emit, plus container dispatch through the public load/save/info.
"""

import os
import struct

import numpy as np
import pytest

import audio_tpu
from audio_tpu.io._flac import decode_flac, encode_flac, probe_flac
from audio_tpu.io._formats import MULAW_TABLE


def _signal(n, nch, bits, seed=0):
    rng = np.random.default_rng(seed)
    amp = 2 ** (bits - 1) - 1
    t = np.arange(n)
    x = np.clip((np.sin(2 * np.pi * t / 50) * 0.4 + 0.05 * rng.standard_normal(n)) * amp,
                -amp, amp).astype(np.int64)
    x = np.stack([np.roll(x, 3 * i) // (i + 1) for i in range(nch)], 1)
    x[:64] = 1 if bits <= 8 else 42  # constant-subframe region
    return x


@pytest.mark.parametrize(
    "n,nch,bits,kwargs",
    [
        (10000, 1, 16, {}),
        (10000, 2, 16, {"use_lpc": True}),
        (10000, 2, 16, {"stereo_mode": "left_side", "use_lpc": True}),
        (10000, 2, 16, {"stereo_mode": "mid_side", "use_lpc": True}),
        (4096, 1, 24, {"use_lpc": True}),
        (777, 2, 8, {}),
        (50, 1, 16, {}),
        (8192, 1, 16, {"partition_order": 3}),
        (4096, 2, 16, {"force_verbatim": True}),
        (9000, 1, 12, {}),
        (6000, 1, 20, {"partition_order": 2, "use_lpc": True}),
        (12000, 4, 16, {}),
    ],
)
def test_flac_roundtrip(n, nch, bits, kwargs):
    x = _signal(n, nch, bits)
    enc = encode_flac(x, 16000, bits_per_sample=bits, **kwargs)
    rate, ch, b, total = probe_flac(enc)
    assert (rate, ch, b, total) == (16000, nch, bits, n)
    dec, drate, dbits = decode_flac(enc)
    assert (drate, dbits) == (16000, bits)
    np.testing.assert_array_equal(dec.astype(np.int64), x)


def test_flac_wasted_bits():
    x = (_signal(8000, 1, 16) >> 4) << 4
    enc = encode_flac(x, 16000, bits_per_sample=16)
    dec, _, _ = decode_flac(enc)
    np.testing.assert_array_equal(dec.astype(np.int64), x)


def test_flac_through_public_api(tmp_path):
    path = str(tmp_path / "x.flac")
    wav = np.sin(2 * np.pi * 440 * np.arange(8000) / 16000).astype(np.float32)[None] * 0.5
    audio_tpu.save(path, wav, 16000)
    meta = audio_tpu.info(path)
    assert meta.encoding == "FLAC" and meta.sample_rate == 16000 and meta.num_frames == 8000
    out, sr = audio_tpu.load(path)
    assert sr == 16000 and out.shape == wav.shape
    # 16-bit quantization error bound
    assert np.abs(out - wav).max() < 1.0 / 32768 + 1e-7
    # frame_offset / num_frames contract
    seg, _ = audio_tpu.load(path, frame_offset=100, num_frames=50)
    np.testing.assert_allclose(seg, out[:, 100:150], rtol=0, atol=0)


def _write_sph(path, pcm16, rate, nch):
    header = (
        f"NIST_1A\n   1024\nsample_rate -i {rate}\nchannel_count -i {nch}\n"
        f"sample_n_bytes -i 2\nsample_byte_format -s2 01\nsample_coding -s3 pcm\n"
        f"sample_count -i {pcm16.size}\nend_head\n"
    ).encode()
    with open(path, "wb") as f:
        f.write(header + b" " * (1024 - len(header)) + pcm16.astype("<i2").tobytes())


def test_sphere(tmp_path):
    path = str(tmp_path / "x.sph")
    pcm = (np.sin(2 * np.pi * 300 * np.arange(4000) / 16000) * 20000).astype(np.int16)
    _write_sph(path, pcm, 16000, 1)
    out, sr = audio_tpu.load(path)
    assert sr == 16000 and out.shape == (1, 4000)
    np.testing.assert_allclose(out[0], pcm.astype(np.float32) / 32768.0)
    meta = audio_tpu.info(path)
    assert meta.num_frames == 4000 and meta.num_channels == 1


def test_au(tmp_path):
    path = str(tmp_path / "x.au")
    pcm = (np.sin(2 * np.pi * 300 * np.arange(4000) / 22050) * 20000).astype(np.int16)
    with open(path, "wb") as f:
        f.write(b".snd" + struct.pack(">IIIII", 24, pcm.nbytes, 3, 22050, 1))
        f.write(pcm.astype(">i2").tobytes())
    out, sr = audio_tpu.load(path)
    assert sr == 22050 and out.shape == (1, 4000)
    np.testing.assert_allclose(out[0], pcm.astype(np.float32) / 32768.0)


def test_mulaw_table_g711_anchors():
    """G.711 mu-law wire-format anchors (CCITT table values)."""
    assert MULAW_TABLE[0x00] == -32124
    assert MULAW_TABLE[0x80] == 32124
    assert MULAW_TABLE[0xFF] == 0
    assert MULAW_TABLE[0x7F] == 0
    # strictly decreasing magnitude within the negative half
    neg = MULAW_TABLE[:128].astype(np.int64)
    assert (np.diff(neg) > 0).all()
    # sign symmetry: code ^ 0x80 flips the sign
    np.testing.assert_array_equal(MULAW_TABLE[128:], -MULAW_TABLE[:128])


def test_librispeech_real_flac(tmp_path):
    """LIBRISPEECH loads a mock corpus written as genuine FLAC files."""
    from audio_tpu.datasets import LIBRISPEECH

    root = tmp_path / "LibriSpeech"
    d = root / "dev-clean" / "84" / "121123"
    os.makedirs(d)
    rng = np.random.default_rng(0)
    wavs = {}
    with open(d / "84-121123.trans.txt", "w") as trans:
        for i in range(2):
            fileid = f"84-121123-{i:04d}"
            wav = (0.3 * np.sin(2 * np.pi * (200 + 100 * i) * np.arange(1600) / 16000)
                   + 0.01 * rng.standard_normal(1600)).astype(np.float32)[None]
            audio_tpu.save(str(d / f"{fileid}.flac"), wav, 16000)
            wavs[fileid] = wav
            trans.write(f"{fileid} HELLO NUMBER {i}\n")
    ds = LIBRISPEECH(str(tmp_path), url="dev-clean", folder_in_archive="LibriSpeech")
    assert len(ds) == 2
    wav, sr, transcript, spk, chap, utt = ds[0]
    assert sr == 16000 and transcript == "HELLO NUMBER 0"
    ref = wavs["84-121123-0000"]
    assert np.abs(np.asarray(wav) - ref).max() < 1.0 / 32768 + 1e-7


def test_tedlium_real_sph(tmp_path):
    """TEDLIUM release3 loads a mock corpus of genuine NIST SPHERE files."""
    from audio_tpu.datasets import TEDLIUM

    base = tmp_path / "TEDLIUM_release-3" / "data"
    (base / "stm").mkdir(parents=True)
    (base / "sph").mkdir()
    rate = 16000
    pcm = (np.sin(2 * np.pi * 250 * np.arange(3 * rate) / rate) * 15000).astype(np.int16)
    _write_sph(str(base / "sph" / "TalkA.sph"), pcm, rate, 1)
    with open(base / "stm" / "TalkA.stm", "w") as f:
        f.write("TalkA 1 speaker_a 0.5 1.5 <o,f0,male> hello ted talk\n")
        f.write("TalkA 1 speaker_a 1.5 2.5 <o,f0,male> second segment\n")
    ds = TEDLIUM(str(tmp_path), release="release3", subset="train")
    assert len(ds) == 2
    wav, sr, transcript, talk_id, speaker_id, identifier = ds[0]
    assert sr == rate and talk_id == "TalkA" and transcript.strip() == "hello ted talk"
    wav = np.asarray(wav).reshape(-1)
    assert wav.size == rate  # 1 s segment [0.5, 1.5)
    np.testing.assert_allclose(
        wav, pcm[rate // 2 : rate // 2 + rate].astype(np.float32) / 32768.0)


def test_gtzan_real_au(tmp_path):
    """GTZAN loads a mock corpus of genuine Sun AU files."""
    from audio_tpu.datasets import GTZAN

    d = tmp_path / "genres" / "jazz"
    d.mkdir(parents=True)
    pcm = (np.sin(2 * np.pi * 440 * np.arange(2000) / 22050) * 12000).astype(np.int16)
    with open(d / "jazz.00000.au", "wb") as f:
        f.write(b".snd" + struct.pack(">IIIII", 24, pcm.nbytes, 3, 22050, 1))
        f.write(pcm.astype(">i2").tobytes())
    ds = GTZAN(str(tmp_path))
    assert len(ds) == 1
    wav, sr, genre = ds[0]
    assert sr == 22050 and genre == "jazz"
    np.testing.assert_allclose(np.asarray(wav).reshape(-1), pcm.astype(np.float32) / 32768.0)


# ---------------------------------------------------------------------------
# ffmpeg-CLI fallback (compressed containers) and *_with_torchcodec shims


def _make_stub_ffmpeg(tmp_path, pcm: np.ndarray, rate: int, nch: int):
    """A fake ffmpeg binary: ignores its input, emits known f32le PCM (or a
    WAV header for the probe form).  Exercises the full subprocess plumbing."""
    raw = tmp_path / "pcm.bin"
    pcm.astype("<f4").tofile(raw)
    stub = tmp_path / "ffmpeg"
    stub.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, struct\n"
        "sys.stdin.buffer.read()\n"
        "args = sys.argv[1:]\n"
        f"data = open({str(raw)!r}, 'rb').read()\n"
        "if '-f' in args and args[args.index('-f') + 1] == 'wav':\n"
        "    hdr = b'RIFF' + struct.pack('<I', 36) + b'WAVE'\n"
        f"    hdr += b'fmt ' + struct.pack('<IHHIIHH', 16, 3, {nch}, {rate}, {rate * nch * 4}, {nch * 4}, 32)\n"
        "    hdr += b'data' + struct.pack('<I', 0)\n"
        "    sys.stdout.buffer.write(hdr)\n"
        "else:\n"
        "    sys.stdout.buffer.write(data)\n"
    )
    stub.chmod(0o755)
    return stub


def test_ffmpeg_cli_fallback(tmp_path, monkeypatch):
    rate, nch = 22050, 2
    t = np.arange(2000)
    pcm = np.stack([np.sin(2 * np.pi * t / 64), np.cos(2 * np.pi * t / 64)], 1).astype(np.float32) * 0.5
    stub = _make_stub_ffmpeg(tmp_path, pcm, rate, nch)
    monkeypatch.setenv("AUDIO_TPU_FFMPEG", str(stub))

    fake_mp3 = tmp_path / "x.mp3"
    fake_mp3.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)  # mp3-ish magic, content unused by stub

    wav, sr = audio_tpu.load(fake_mp3)
    assert sr == rate and wav.shape == (nch, 2000)
    np.testing.assert_allclose(wav, pcm.T, atol=1e-7)

    meta = audio_tpu.info(fake_mp3)  # no ffprobe next to the stub -> WAV-header probe path
    assert meta.sample_rate == rate and meta.num_channels == nch

    wav2, sr2 = audio_tpu.load(fake_mp3, frame_offset=100, num_frames=50, channels_first=False)
    assert wav2.shape == (50, nch)
    np.testing.assert_allclose(wav2, pcm[100:150], atol=1e-7)


def test_with_torchcodec_shims(tmp_path):
    x = (np.sin(2 * np.pi * np.arange(800) / 40) * 0.3).astype(np.float32)[None]
    p = tmp_path / "shim.wav"
    audio_tpu.save_with_torchcodec(p, x, 8000)
    wav, sr = audio_tpu.load_with_torchcodec(p)
    assert sr == 8000
    np.testing.assert_allclose(wav, x, atol=1e-4)
    with pytest.warns(UserWarning, match="normalize=False"):
        audio_tpu.load_with_torchcodec(p, normalize=False)
    with pytest.warns(UserWarning, match="backend"):
        audio_tpu.load_with_torchcodec(p, backend="ffmpeg")
