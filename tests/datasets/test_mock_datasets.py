"""Mock-corpus round-trip tests for every remaining dataset class.

Same strategy as the reference's dataset tests
(/root/reference/test/torchaudio_unittest/datasets/*_test_impl.py): fabricate
a tiny on-disk corpus in a temp dir, then assert exact sample round-trip —
no network.  (LIBRISPEECH, YESNO, SPEECHCOMMANDS, LJSPEECH, GTZAN and
TEDLIUM items are covered in test_io_datasets.py / test_codecs.py.)
"""

import os
from pathlib import Path

import numpy as np
import pytest

import audio_tpu.io as aio
from audio_tpu.datasets import (
    CMUARCTIC,
    CMUDict,
    COMMONVOICE,
    DR_VCTK,
    FluentSpeechCommands,
    IEMOCAP,
    LIBRITTS,
    LibriLightLimited,
    LibriMix,
    LibriSpeechBiasing,
    MUSDB_HQ,
    QUESST14,
    Snips,
    TEDLIUM,
    VCTK_092,
    VoxCeleb1Identification,
    VoxCeleb1Verification,
)

_RNG = np.random.default_rng(7)


def _save(path, sr=16000, t=400, ch=1):
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    wav = (_RNG.standard_normal((ch, t)) * 0.1).astype(np.float32)
    aio.save(str(path), wav, sr)
    return wav


def test_cmuarctic(tmp_path):
    base = tmp_path / "ARCTIC" / "cmu_us_aew_arctic"
    wav = _save(base / "wav" / "arctic_a0001.wav")
    (base / "etc").mkdir(parents=True, exist_ok=True)
    (base / "etc" / "txt.done.data").write_text(
        '( arctic_a0001 "Author of the danger trail." )\n'
    )
    ds = CMUARCTIC(str(tmp_path), url="aew")
    waveform, sr, transcript, utt = ds[0]
    assert len(ds) == 1 and sr == 16000
    np.testing.assert_allclose(waveform, wav, atol=1e-4)
    assert transcript == "Author of the danger trail."
    assert utt == "a0001"


def test_cmudict(tmp_path):
    (tmp_path / "cmudict-0.7b").write_text(
        ";;; comment\n"
        "!EXCLAMATION-POINT  EH2 K S K L AH0 M EY1 SH AH0 N P OY2 N T\n"
        "HELLO  HH AH0 L OW1\n"
        "WORLD(1)  W ER1 L D\n",
        encoding="latin-1",
    )
    (tmp_path / "cmudict-0.7b.symbols").write_text("AH0\nEH2\nHH\n")
    ds = CMUDict(str(tmp_path))
    assert len(ds) == 2  # punctuation excluded by default
    assert ds[0] == ("HELLO", ["HH", "AH0", "L", "OW1"])
    assert ds[1] == ("WORLD", ["W", "ER1", "L", "D"])
    assert ds.symbols == ["AH0", "EH2", "HH"]
    ds_all = CMUDict(str(tmp_path), exclude_punctuations=False)
    assert len(ds_all) == 3 and ds_all[0][0] == "!"


def test_vctk_092(tmp_path):
    base = tmp_path / "VCTK-Corpus-0.92"
    (base / "txt" / "p225").mkdir(parents=True)
    (base / "txt" / "p225" / "p225_001.txt").write_text("Please call Stella.\n")
    wav = _save(base / "wav48_silence_trimmed" / "p225" / "p225_001_mic2.flac", sr=48000)
    ds = VCTK_092(str(tmp_path))
    waveform, sr, transcript, spk, utt = ds[0]
    assert len(ds) == 1 and sr == 48000 and (spk, utt) == ("p225", "001")
    # trailing newline kept, as in the reference's _load_text (vctk.py:96-98)
    assert transcript == "Please call Stella.\n"
    np.testing.assert_allclose(waveform, wav, atol=1e-4)


def test_dr_vctk(tmp_path):
    base = tmp_path / "DR-VCTK" / "DR-VCTK"
    clean = _save(base / "clean_trainset_wav_16k" / "p226_001.wav")
    noisy = _save(base / "device-recorded_trainset_wav_16k" / "p226_001.wav")
    (base / "configurations").mkdir(parents=True, exist_ok=True)
    (base / "configurations" / "train_ch_log.txt").write_text(
        "header row\nsecond skip row\np226_001.wav\tofficedevice\t3\n"
    )
    ds = DR_VCTK(str(tmp_path), subset="train")
    wc, src, wn, srn, spk, utt, source, ch = ds[0]
    assert len(ds) == 1 and src == 16000 and srn == 16000
    assert (spk, utt, source, ch) == ("p226", "001", "officedevice", 3)
    np.testing.assert_allclose(wc, clean, atol=1e-4)
    np.testing.assert_allclose(wn, noisy, atol=1e-4)


def test_commonvoice(tmp_path):
    # WAV data in a .mp3-named file: the loader sniffs the RIFF magic
    wav = _save(tmp_path / "clips" / "sample1.mp3", sr=48000)
    (tmp_path / "train.tsv").write_text(
        "client_id\tpath\tsentence\tup_votes\n"
        "abc\tsample1.mp3\thello world\t2\n"
    )
    ds = COMMONVOICE(str(tmp_path))
    waveform, sr, meta = ds[0]
    assert len(ds) == 1 and sr == 48000
    assert meta["sentence"] == "hello world" and meta["client_id"] == "abc"
    np.testing.assert_allclose(waveform, wav, atol=1e-4)


def test_fluent_speech_commands(tmp_path):
    base = tmp_path / "fluent_speech_commands_dataset"
    wav = _save(base / "wavs" / "speakers" / "spk1" / "utt0.wav")
    (base / "data").mkdir(parents=True, exist_ok=True)
    (base / "data" / "train_data.csv").write_text(
        ",path,speakerId,transcription,action,object,location\n"
        "0,wavs/speakers/spk1/utt0.wav,spk1,turn on the lights,activate,lights,none\n"
    )
    ds = FluentSpeechCommands(str(tmp_path), subset="train")
    waveform, sr, fname, spk, trans, action, obj, loc = ds[0]
    assert len(ds) == 1 and sr == 16000
    assert (fname, spk, trans, action, obj, loc) == (
        "utt0", "spk1", "turn on the lights", "activate", "lights", "none"
    )
    np.testing.assert_allclose(waveform, wav, atol=1e-4)


def test_snips(tmp_path):
    base = tmp_path / "SNIPS"
    wav = _save(base / "train" / "Aditi-snips-train-0.wav")
    (base / "all.iob.snips.txt").write_text(
        "Aditi-snips-train-0 BOS hello world EOS\tO O O greeting\n"
        "Aditi-snips-test-0 BOS bye EOS\tO O farewell\n"
    )
    ds = Snips(str(tmp_path), subset="train", audio_format="wav")
    waveform, sr, fname, trans, iob, intent = ds[0]
    assert len(ds) == 1 and sr == 16000
    assert (fname, trans, iob, intent) == ("Aditi-snips-train-0", "hello world", "O O", "greeting")
    np.testing.assert_allclose(waveform, wav, atol=1e-4)


def test_iemocap(tmp_path):
    base = tmp_path / "IEMOCAP" / "Session1"
    wav = _save(base / "sentences" / "wav" / "Ses01F_impro01" / "Ses01F_impro01_F000.wav")
    _save(base / "sentences" / "wav" / "Ses01F_impro01" / "Ses01F_impro01_F001.wav")
    lab = base / "dialog" / "EmoEvaluation"
    lab.mkdir(parents=True, exist_ok=True)
    (lab / "Ses01F_impro01.txt").write_text(
        "% header\n"
        "[6.2901 - 8.2357]\tSes01F_impro01_F000\tneu\t[2.5, 2.5, 2.5]\n"
        "[9.0000 - 9.5000]\tSes01F_impro01_F001\txxx\t[2.5, 2.5, 2.5]\n"
    )
    ds = IEMOCAP(str(tmp_path), sessions=(1,))
    assert len(ds) == 1  # the 'xxx' label is filtered out
    waveform, sr, stem, label, speaker = ds[0]
    assert sr == 16000 and stem == "Ses01F_impro01_F000"
    assert label == "neu" and speaker == "Ses01F"
    np.testing.assert_allclose(waveform, wav, atol=1e-4)
    ds_scripted = IEMOCAP(str(tmp_path), sessions=(1,), utterance_type="scripted")
    assert len(ds_scripted) == 0


def test_libritts(tmp_path):
    base = tmp_path / "LibriTTS" / "dev-clean" / "84" / "121123"
    fileid = "84_121123_000007_000001"
    wav = _save(base / f"{fileid}.wav", sr=24000)
    (base / f"{fileid}.original.txt").write_text("Original text!")
    (base / f"{fileid}.normalized.txt").write_text("normalized text!")
    ds = LIBRITTS(str(tmp_path), url="dev-clean")
    waveform, sr, orig, norm, spk, chap, utt = ds[0]
    assert len(ds) == 1 and sr == 24000
    assert (orig, norm, spk, chap, utt) == ("Original text!", "normalized text!", 84, 121123, fileid)
    np.testing.assert_allclose(waveform, wav, atol=1e-4)


def test_musdb_hq(tmp_path):
    base = tmp_path / "musdb18hq" / "train" / "Artist - Song"
    wavs = {s: _save(base / f"{s}.wav", sr=44100, t=1000, ch=2)
            for s in ("bass", "drums", "other", "vocals")}
    ds = MUSDB_HQ(str(tmp_path), subset="train")
    stacked, sr, num_frames, name = ds[0]
    assert len(ds) == 1 and sr == 44100 and num_frames == 1000
    assert name == "Artist - Song" and stacked.shape == (4, 2, 1000)
    np.testing.assert_allclose(stacked[0], wavs["bass"], atol=1e-4)
    # validation split excludes non-listed songs
    ds_train = MUSDB_HQ(str(tmp_path), subset="train", split="train")
    assert len(ds_train) == 1


def test_librimix(tmp_path):
    base = tmp_path / "Libri2Mix" / "wav8k" / "min" / "train-360"
    mix = _save(base / "mix_clean" / "both.wav", sr=8000)
    s1 = _save(base / "s1" / "both.wav", sr=8000)
    s2 = _save(base / "s2" / "both.wav", sr=8000)
    ds = LibriMix(str(tmp_path), subset="train-360", num_speakers=2, sample_rate=8000)
    sr, mixed, srcs = ds[0]
    assert len(ds) == 1 and sr == 8000 and len(srcs) == 2
    np.testing.assert_allclose(mixed, mix, atol=1e-4)
    np.testing.assert_allclose(srcs[0], s1, atol=1e-4)
    np.testing.assert_allclose(srcs[1], s2, atol=1e-4)


def test_quesst14(tmp_path):
    base = tmp_path / "quesst14Database"
    wav = _save(base / "Audio" / "quesst14_00001.wav", sr=8000)
    _save(base / "Audio" / "quesst14_00002.wav", sr=8000)
    (base / "scoring").mkdir(parents=True, exist_ok=True)
    (base / "scoring" / "language_key_utterances.lst").write_text(
        "quesst14Database/Audio/quesst14_00001.wav nnenglish\n"
        "quesst14Database/Audio/quesst14_00002.wav czech\n"
    )
    ds = QUESST14(str(tmp_path), subset="docs", language="nnenglish")
    waveform, sr, name = ds[0]
    assert len(ds) == 1 and sr == 8000 and name == "quesst14_00001"
    np.testing.assert_allclose(waveform, wav, atol=1e-4)
    ds_all = QUESST14(str(tmp_path), subset="docs", language=None)
    assert len(ds_all) == 2


def test_voxceleb1_identification(tmp_path):
    wav = _save(tmp_path / "wav" / "id10001" / "clipA" / "00001.wav")
    _save(tmp_path / "wav" / "id10002" / "clipB" / "00001.wav")
    (tmp_path / "iden_split.txt").write_text(
        "1 id10001/clipA/00001.wav\n3 id10002/clipB/00001.wav\n"
    )
    ds = VoxCeleb1Identification(str(tmp_path), subset="train")
    waveform, sr, spk, file_id = ds[0]
    # int("id10001"[3:]) == 1: the reference parses the speaker id the same
    # way (voxceleb1.py:185-186)
    assert len(ds) == 1 and sr == 16000 and spk == 1
    assert file_id == "id10001-clipA-00001"
    np.testing.assert_allclose(waveform, wav, atol=1e-4)
    assert len(VoxCeleb1Identification(str(tmp_path), subset="test")) == 1


def test_voxceleb1_verification(tmp_path):
    w1 = _save(tmp_path / "wav" / "id10001" / "clipA" / "00001.wav")
    w2 = _save(tmp_path / "wav" / "id10002" / "clipB" / "00001.wav")
    (tmp_path / "veri_test.txt").write_text(
        "1 id10001/clipA/00001.wav id10002/clipB/00001.wav\n"
    )
    ds = VoxCeleb1Verification(str(tmp_path))
    wf1, wf2, sr, label, id1, id2 = ds[0]
    assert len(ds) == 1 and sr == 16000 and label == 1
    assert (id1, id2) == ("id10001-clipA-00001", "id10002-clipB-00001")
    np.testing.assert_allclose(wf1, w1, atol=1e-4)
    np.testing.assert_allclose(wf2, w2, atol=1e-4)


def _build_librispeech_like(root, top, spk=84, chap=121123, trans="HELLO BIAS WORLD"):
    d = Path(root) / top / str(spk) / str(chap)
    fileid = f"{spk}-{chap}-0000"
    wav = _save(d / f"{fileid}.flac")
    (d / f"{spk}-{chap}.trans.txt").write_text(f"{fileid} {trans}\n")
    return fileid, wav


def test_librispeech_biasing(tmp_path):
    _, wav = _build_librispeech_like(tmp_path / "LibriSpeech", "dev-clean")
    ds = LibriSpeechBiasing(str(tmp_path), url="dev-clean", blist=["BIAS", "MISSING"])
    waveform, sr, transcript, spk, chap, utt, uttblist = ds[0]
    assert len(ds) == 1 and sr == 16000
    assert transcript == "HELLO BIAS WORLD" and uttblist == ["BIAS"]
    np.testing.assert_allclose(waveform, wav, atol=1e-4)


def test_librilight_limited(tmp_path):
    root = tmp_path / "librispeech_finetuning"
    _, wav = _build_librispeech_like(root, os.path.join("1h", "0", "clean"))
    ds = LibriLightLimited(str(tmp_path), subset="10min")
    waveform, sr, transcript, spk, chap, utt = ds[0]
    assert len(ds) == 1 and sr == 16000 and (spk, chap, utt) == (84, 121123, 0)
    assert transcript == "HELLO BIAS WORLD"
    np.testing.assert_allclose(waveform, wav, atol=1e-4)
    # 10h subset also picks up the 1h folder
    assert len(LibriLightLimited(str(tmp_path), subset="1h")) == 1


def test_tedlium_phoneme_dict(tmp_path):
    base = tmp_path / "TEDLIUM_release1"
    (base / "train" / "stm").mkdir(parents=True, exist_ok=True)
    (base / "train" / "stm" / "talk1.stm").write_text(
        "talk1 1 spk1 0.00 0.02 <o,f0,female> hello world\n"
    )
    _save(base / "train" / "sph" / "talk1.sph", sr=16000, t=500)
    (base / "TEDLIUM.150K.dic").write_text("hello HH AH L OW\nworld W ER L D\n")
    ds = TEDLIUM(str(tmp_path), release="release1", subset="train")
    assert len(ds) == 1
    waveform, sr, transcript, talk_id, spk, ident = ds[0]
    assert sr == 16000 and talk_id == "talk1" and spk == "spk1"
    assert transcript.strip() == "hello world"
    assert waveform.shape[-1] == int(0.02 * 16000)
    assert ds.phoneme_dict["hello"] == ("HH", "AH", "L", "OW")
