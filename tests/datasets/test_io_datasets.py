"""I/O codec tests (vs scipy.io.wavfile oracle) and mock-corpus dataset tests
(the reference's no-network test pattern, datasets/librispeech_test_impl.py)."""

import os

import numpy as np
import pytest
import scipy.io.wavfile

import audio_tpu.io as aio
from audio_tpu.datasets import (
    GTZAN,
    LIBRISPEECH,
    LJSPEECH,
    SPEECHCOMMANDS,
    YESNO,
)
from audio_tpu.datasets._small import _expand_gtzan_split


class TestWavIO:
    @pytest.mark.parametrize("bits,encoding", [(16, None), (32, None), (32, "PCM_F"), (8, None)])
    def test_roundtrip(self, tmp_path, bits, encoding):
        rng = np.random.default_rng(0)
        x = np.clip(rng.standard_normal((2, 4000)) * 0.3, -0.99, 0.99).astype(np.float32)
        path = tmp_path / "test.wav"
        aio.save(path, x, 16000, bits_per_sample=bits, encoding=encoding)
        y, sr = aio.load(path)
        assert sr == 16000
        assert y.shape == x.shape
        tol = {8: 1e-2, 16: 1e-4, 32: 1e-6}[bits]
        np.testing.assert_allclose(y, x, atol=tol)

    def test_load_matches_scipy(self, tmp_path):
        rng = np.random.default_rng(1)
        data = (rng.standard_normal(3000) * 10000).astype(np.int16)
        path = tmp_path / "scipy.wav"
        scipy.io.wavfile.write(path, 8000, data)
        y, sr = aio.load(path)
        assert sr == 8000
        np.testing.assert_allclose(y[0], data.astype(np.float32) / 32768.0, atol=1e-7)

    def test_save_readable_by_scipy(self, tmp_path):
        x = np.sin(np.linspace(0, 50, 2000)).astype(np.float32)[None] * 0.5
        path = tmp_path / "out.wav"
        aio.save(path, x, 16000)
        sr, data = scipy.io.wavfile.read(path)
        assert sr == 16000
        np.testing.assert_allclose(data.astype(np.float32) / 32767.0, x[0], atol=1e-4)

    def test_frame_offset_num_frames(self, tmp_path):
        x = np.arange(100, dtype=np.float32)[None] / 200.0
        path = tmp_path / "t.wav"
        aio.save(path, x, 8000, bits_per_sample=32, encoding="PCM_F")
        y, _ = aio.load(path, frame_offset=10, num_frames=20)
        np.testing.assert_allclose(y[0], x[0, 10:30], atol=1e-7)

    def test_24bit(self, tmp_path):
        # hand-build a 24-bit wav
        import struct

        samples = np.asarray([0, 1 << 22, -(1 << 22), (1 << 23) - 1], np.int64)
        frames = b"".join(struct.pack("<i", int(s))[0:3] for s in samples)
        header = b"RIFF" + struct.pack("<I", 36 + len(frames)) + b"WAVE"
        header += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000 * 3, 3, 24)
        header += b"data" + struct.pack("<I", len(frames))
        path = tmp_path / "t24.wav"
        path.write_bytes(header + frames)
        y, sr = aio.load(path)
        np.testing.assert_allclose(y[0], samples / (1 << 23), atol=1e-6)

    def test_info(self, tmp_path):
        x = np.zeros((2, 500), np.float32)
        path = tmp_path / "i.wav"
        aio.save(path, x, 22050, bits_per_sample=16)
        m = aio.info(path)
        assert (m.sample_rate, m.num_frames, m.num_channels) == (22050, 500, 2)
        assert m.bits_per_sample == 16 and m.encoding == "PCM_S"
        aio.save(path, x, 8000, bits_per_sample=32, encoding="PCM_F")
        m = aio.info(path)
        assert m.encoding == "PCM_F" and m.bits_per_sample == 32

    def test_info_header_only_for_large_files(self, tmp_path, monkeypatch):
        """info() on an on-disk WAV/FLAC larger than the 64 KiB probe prefix
        must not read the sample payload (metadata passes over big corpora
        stay I/O-cheap)."""
        import builtins

        rng = np.random.default_rng(5)
        x = (rng.standard_normal((1, 300_000)) * 0.1).astype(np.float32)
        for ext, kw in (("wav", {"bits_per_sample": 16}), ("flac", {})):
            path = tmp_path / f"big.{ext}"
            aio.save(path, x, 16000, **kw)
            assert path.stat().st_size > 65536

            aio.info(path)  # warm the on-demand native codec build first

            reads = []
            real_open = builtins.open

            class _Counting:
                def __init__(self, f):
                    self._f = f

                def read(self, n=-1):
                    reads.append(n)
                    return self._f.read(n)

                def __getattr__(self, a):
                    return getattr(self._f, a)

                def __enter__(self):
                    return self

                def __exit__(self, *a):
                    return self._f.__exit__(*a)

            def counting_open(f, *a, **k):
                h = real_open(f, *a, **k)
                # count only reads of the audio file itself (the on-demand
                # native-codec build may open its own source/cache files)
                return _Counting(h) if str(f) == str(path) else h

            monkeypatch.setattr(builtins, "open", counting_open)
            m = aio.info(path)
            monkeypatch.undo()
            assert m.num_frames == 300_000 and m.sample_rate == 16000, ext
            assert all(n != -1 and n <= 65536 for n in reads), (ext, reads)

    def test_load_normalize_false(self, tmp_path):
        x = np.asarray([[0.0, 0.5, -0.5, 1.0]], np.float32)
        path = tmp_path / "n.wav"
        aio.save(path, x, 8000, bits_per_sample=16)
        raw, _ = aio.load(path, normalize=False)
        assert raw.dtype == np.int16
        np.testing.assert_array_equal(raw[0], [0, 16383, -16383, 32767])
        # float encodings ignore normalize (torchaudio contract)
        aio.save(path, x, 8000, bits_per_sample=32, encoding="PCM_F")
        f, _ = aio.load(path, normalize=False)
        assert f.dtype == np.float32


def _save_wav(path, data, sr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    aio.save(path, data, sr)


class TestLibriSpeechMock:
    def _build(self, root):
        rng = np.random.default_rng(0)
        base = os.path.join(root, "LibriSpeech", "dev-clean")
        samples = []
        for spk, chap, utts in [(84, 121123, 2), (174, 50561, 1)]:
            d = os.path.join(base, str(spk), str(chap))
            os.makedirs(d, exist_ok=True)
            lines = []
            for u in range(utts):
                fileid = f"{spk}-{chap}-{u:04d}"
                wav = (rng.standard_normal((1, 800)) * 0.1).astype(np.float32)
                # the loader sniffs RIFF magic, so WAV data in .flac-named files works
                aio.save(os.path.join(d, fileid + ".flac"), wav, 16000)
                trans = f"MOCK TRANSCRIPT {spk} {chap} {u}"
                lines.append(f"{fileid} {trans}")
                samples.append((fileid, wav, trans, spk, chap, u))
            with open(os.path.join(d, f"{spk}-{chap}.trans.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")
        return samples

    def test_roundtrip(self, tmp_path):
        samples = self._build(str(tmp_path))
        ds = LIBRISPEECH(str(tmp_path), url="dev-clean")
        assert len(ds) == len(samples)
        for i, (fileid, wav, trans, spk, chap, u) in enumerate(sorted(samples)):
            waveform, sr, transcript, spk_id, chap_id, utt_id = ds[i]
            assert sr == 16000
            np.testing.assert_allclose(waveform, wav, atol=1e-4)
            assert transcript == trans
            assert (spk_id, chap_id, utt_id) == (spk, chap, u)
        meta = ds.get_metadata(0)
        assert meta[0].endswith(".flac")

    def test_missing_raises(self, tmp_path):
        with pytest.raises(RuntimeError, match="download=True"):
            LIBRISPEECH(str(tmp_path), url="dev-clean")


class TestYesNoMock:
    def test_roundtrip(self, tmp_path):
        d = tmp_path / "waves_yesno"
        d.mkdir()
        rng = np.random.default_rng(0)
        labels = [[0, 1, 0, 1, 0, 1, 1, 0], [1, 1, 1, 0, 0, 0, 1, 0]]
        for lab in labels:
            name = "_".join(str(x) for x in lab)
            aio.save(str(d / f"{name}.wav"), rng.standard_normal((1, 400)).astype(np.float32) * 0.1, 8000)
        ds = YESNO(str(tmp_path))
        assert len(ds) == 2
        wav, sr, lab = ds[0]
        assert sr == 8000 and len(lab) == 8


class TestSpeechCommandsMock:
    def test_subsets(self, tmp_path):
        base = tmp_path / "SpeechCommands" / "speech_commands_v0.02"
        rng = np.random.default_rng(0)
        files = {}
        for label in ("yes", "no"):
            d = base / label
            d.mkdir(parents=True)
            for i in range(3):
                name = f"speaker{i:02d}_nohash_0.wav"
                aio.save(str(d / name), rng.standard_normal((1, 300)).astype(np.float32) * 0.1, 16000)
                files.setdefault(label, []).append(f"{label}/{name}")
        (base / "validation_list.txt").write_text(files["yes"][0] + "\n")
        (base / "testing_list.txt").write_text(files["no"][0] + "\n")

        full = SPEECHCOMMANDS(str(tmp_path))
        assert len(full) == 6
        train = SPEECHCOMMANDS(str(tmp_path), subset="training")
        assert len(train) == 4
        val = SPEECHCOMMANDS(str(tmp_path), subset="validation")
        assert len(val) == 1
        wav, sr, label, speaker_id, utt = val[0]
        assert label == "yes" and utt == 0


class TestLJSpeechMock:
    def test_roundtrip(self, tmp_path):
        base = tmp_path / "LJSpeech-1.1"
        (base / "wavs").mkdir(parents=True)
        rng = np.random.default_rng(0)
        rows = []
        for i in range(3):
            fileid = f"LJ001-{i:04d}"
            aio.save(str(base / "wavs" / f"{fileid}.wav"), rng.standard_normal((1, 500)).astype(np.float32) * 0.1, 22050)
            rows.append(f"{fileid}|Transcript {i}|Normalized {i}")
        (base / "metadata.csv").write_text("\n".join(rows) + "\n")
        ds = LJSPEECH(str(tmp_path))
        assert len(ds) == 3
        wav, sr, trans, norm = ds[1]
        assert sr == 22050 and trans == "Transcript 1" and norm == "Normalized 1"


class TestGTZAN:
    def test_split_sizes_match_reference(self):
        # the reference's filtered splits have 443/197/290 tracks
        assert len(_expand_gtzan_split("training")) == 443
        assert len(_expand_gtzan_split("validation")) == 197
        assert len(_expand_gtzan_split("testing")) == 290
        # disjoint
        all_ids = (
            set(_expand_gtzan_split("training"))
            | set(_expand_gtzan_split("validation"))
            | set(_expand_gtzan_split("testing"))
        )
        assert len(all_ids) == 443 + 197 + 290

    def test_mock_corpus(self, tmp_path):
        d = tmp_path / "genres" / "blues"
        d.mkdir(parents=True)
        aio.save(str(d / "blues.00000.wav"), np.zeros((1, 200), np.float32), 22050)
        ds = GTZAN(str(tmp_path))
        assert len(ds) == 1
        wav, sr, genre = ds[0]
        assert genre == "blues"
