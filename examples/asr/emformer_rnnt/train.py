"""Emformer RNN-T training recipe (TPU-native).

Counterpart of the reference Lightning recipe at
/root/reference/examples/asr/emformer_rnnt/ (train.py:36-45 DDP over 4x8 GPUs):
here the data-parallel axis is a `jax.sharding.Mesh` "dp" axis, gradients are
averaged by XLA-inserted psum over ICI, and the whole train step (features ->
Emformer transcriber -> predictor -> joiner -> rnnt_loss -> adamw update) is
one jit'd program.

Run a quick synthetic smoke (works on a CPU mesh):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python train.py --synthetic --tiny --steps 2

Real data: point --librispeech-path at an extracted LibriSpeech root.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import audio_tpu.functional as F
from audio_tpu.models import emformer_rnnt_base, emformer_rnnt_model
from audio_tpu.parallel import batch_sharding, create_mesh, replicate
from audio_tpu.transforms import MelSpectrogram
from audio_tpu.utils import cast_floating

SAMPLE_RATE = 16000
N_MELS = 80
HOP = 160
BLANK_FIRST_TOKEN = 0  # predictor SOS = blank, matching the reference recipe


def tiny_model(num_symbols: int):
    return emformer_rnnt_model(
        input_dim=N_MELS,
        encoding_dim=64,
        num_symbols=num_symbols,
        segment_length=8,
        right_context_length=2,
        time_reduction_input_dim=32,
        time_reduction_stride=4,
        transformer_num_heads=2,
        transformer_ffn_dim=64,
        transformer_num_layers=2,
        transformer_dropout=0.1,
        transformer_activation="gelu",
        transformer_left_context_length=8,
        transformer_max_memory_size=0,
        transformer_weight_init_scale_strategy="depthwise",
        transformer_tanh_on_mem=True,
        symbol_embedding_dim=32,
        num_lstm_layers=1,
        lstm_layer_norm=True,
        lstm_layer_norm_epsilon=1e-3,
        lstm_dropout=0.1,
    )


def pad_frames_for_segments(n_frames: int, segment: int, right_context: int, stride: int) -> int:
    """Frames after time-reduction must tile into full segments + right context."""
    seg_ns = segment * stride
    rc_ns = right_context * stride
    n_seg = max(1, -(-(n_frames - rc_ns) // seg_ns))
    return n_seg * seg_ns + rc_ns


class SyntheticBatches:
    """Random waveform/transcript batches with realistic length variation."""

    def __init__(self, batch_size, num_symbols, audio_seconds=1.0, seed=0):
        self.batch_size = batch_size
        self.num_symbols = num_symbols
        self.audio_len = int(audio_seconds * SAMPLE_RATE)
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        while True:
            b = self.batch_size
            wav = (0.1 * self.rng.standard_normal((b, self.audio_len))).astype(np.float32)
            wav_lens = self.rng.integers(self.audio_len // 2, self.audio_len + 1, b)
            tgt_len = self.rng.integers(4, 12, b)
            tgt = self.rng.integers(1, self.num_symbols, (b, int(tgt_len.max())))
            tgt = tgt * (np.arange(tgt.shape[1])[None] < tgt_len[:, None])
            yield wav, wav_lens.astype(np.int32), tgt.astype(np.int32), tgt_len.astype(np.int32)


class LibriSpeechBatches:
    """Char-level LibriSpeech batches via audio_tpu.datasets.LIBRISPEECH."""

    LABELS = "_ abcdefghijklmnopqrstuvwxyz'"  # 0 = blank

    def __init__(self, root, url, batch_size, max_seconds=8.0):
        from audio_tpu.datasets import LIBRISPEECH

        self.ds = LIBRISPEECH(root, url=url, download=False)
        self.batch_size = batch_size
        self.max_len = int(max_seconds * SAMPLE_RATE)
        self.vocab = {c: i for i, c in enumerate(self.LABELS)}

    @property
    def num_symbols(self):
        return len(self.LABELS)

    def _clean_text(self, text: str) -> str:
        return text.lower()

    def __iter__(self):
        """Endless epochs (reshuffled each pass), like the reference's Lightning loop."""
        epoch = 0
        while True:
            order = np.random.default_rng(epoch).permutation(len(self.ds))
            batch = []
            for i in order:
                wav, sr, text, *_ = self.ds[int(i)]
                wav = np.asarray(wav).reshape(-1)[: self.max_len]
                tokens = [self.vocab[c] for c in self._clean_text(text) if c in self.vocab]
                if tokens:
                    batch.append((wav, tokens))
                if len(batch) == self.batch_size:
                    yield self._collate(batch)
                    batch = []
            epoch += 1

    def _collate(self, batch):
        wav_lens = np.array([len(w) for w, _ in batch], np.int32)
        tgt_lens = np.array([len(t) for _, t in batch], np.int32)
        wav = np.zeros((len(batch), self.max_len), np.float32)
        tgt = np.zeros((len(batch), int(tgt_lens.max())), np.int32)
        for k, (w, t) in enumerate(batch):
            wav[k, : len(w)] = w
            tgt[k, : len(t)] = t
        return wav, wav_lens, tgt, tgt_lens


class TedliumBatches(LibriSpeechBatches):
    """Char-level TED-LIUM release-3 batches (reference tedlium3 sub-recipe,
    /root/reference/examples/asr/emformer_rnnt/tedlium3/lightning.py:82)."""

    def __init__(self, root, batch_size, subset="train", max_seconds=8.0):
        from audio_tpu.datasets import TEDLIUM

        self.ds = TEDLIUM(root, release="release3", subset=subset)
        self.batch_size = batch_size
        self.max_len = int(max_seconds * SAMPLE_RATE)
        self.vocab = {c: i for i, c in enumerate(self.LABELS)}

    def _clean_text(self, text: str) -> str:
        return text.lower().replace("<unk>", "").strip()


class MuSTCBatches(LibriSpeechBatches):
    """Char-level MuST-C segment batches (reference mustc sub-recipe,
    /root/reference/examples/asr/emformer_rnnt/mustc/dataset.py:13-51):
    long-talk wavs under ``<root>/<folder>/data/<subset>/wav`` sliced by the
    (offset, duration) entries of ``txt/<subset>.yaml``, transcripts read
    line-aligned from ``txt/<subset>.<language>``."""

    def __init__(self, root, batch_size, subset="train", language="en",
                 folder_in_archive="en-de", max_seconds=8.0):
        import os

        import yaml

        data_dir = os.path.join(root, folder_in_archive, "data", subset)
        with open(os.path.join(data_dir, "txt", f"{subset}.yaml")) as f:
            file_list = yaml.safe_load(f)
        with open(os.path.join(data_dir, "txt", f"{subset}.{language}")) as f:
            trans = f.read().splitlines()
        if len(file_list) != len(trans):
            raise RuntimeError(
                f"MuST-C segment/transcript mismatch: {len(file_list)} yaml entries "
                f"vs {len(trans)} transcript lines"
            )
        self.segments = [
            (os.path.join(data_dir, "wav", item["wav"]),
             int(item["offset"] * SAMPLE_RATE), int(item["duration"] * SAMPLE_RATE), t)
            for item, t in zip(file_list, trans)
        ]
        self.batch_size = batch_size
        self.max_len = int(max_seconds * SAMPLE_RATE)
        self.vocab = {c: i for i, c in enumerate(self.LABELS)}

    def __iter__(self):
        import audio_tpu

        epoch = 0
        while True:
            order = np.random.default_rng(epoch).permutation(len(self.segments))
            batch = []
            for i in order:
                path, off, dur, text = self.segments[int(i)]
                wav, _sr = audio_tpu.load(path, frame_offset=off, num_frames=dur)
                wav = np.asarray(wav, np.float32).reshape(-1)[: self.max_len]
                tokens = [self.vocab[c] for c in self._clean_text(text) if c in self.vocab]
                if tokens and wav.size:
                    batch.append((wav, tokens))
                if len(batch) == self.batch_size:
                    yield self._collate(batch)
                    batch = []
            epoch += 1


# Reference sub-recipe vocab sizes: librispeech 4097-piece sentencepiece
# (librispeech/lightning.py:74), tedlium3 / mustc 501
# (tedlium3/lightning.py:82, mustc/lightning.py:52). Char-level fallback (29)
# is used when no sentencepiece model is supplied.
MODEL_TYPE_NUM_SYMBOLS = {"librispeech": 4097, "tedlium3": 501, "mustc": 501}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=8e-4)
    p.add_argument("--warmup-steps", type=int, default=40)
    p.add_argument("--tiny", action="store_true", help="2-layer debug model")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 forward/backward with f32 master weights")
    p.add_argument("--overfit", action="store_true",
                   help="memorization gate: train on ONE fixed batch with "
                        "dropout off, then assert greedy decode reproduces "
                        "the training transcripts exactly (offline-provable "
                        "learning evidence; the reference's analog is its "
                        "published WER tables, emformer_rnnt/README.md:40-47)")
    p.add_argument("--pruned-loss", action="store_true",
                   help="pruned transducer loss (0.5*simple + banded-exact, "
                        "arXiv:2206.13236): the joiner runs only on a "
                        "--prune-band-wide slice of target positions per "
                        "frame, so the lattice never materializes at (U+1) "
                        "width — this is what unlocks batch >= 64 on one chip")
    p.add_argument("--prune-band", type=int, default=16,
                   help="band width s; must satisfy (s-1)*(T'-1) >= U-s+1")
    p.add_argument("--synthetic", action="store_true", help="random data, no dataset needed")
    p.add_argument("--model-type", default="librispeech",
                   choices=("librispeech", "tedlium3", "mustc"),
                   help="reference sub-recipe to mirror (sets vocab size / dataset)")
    p.add_argument("--librispeech-path", default=None)
    p.add_argument("--librispeech-url", default="train-clean-100")
    p.add_argument("--tedlium-path", default=None, help="TED-LIUM release3 root")
    p.add_argument("--mustc-path", default=None,
                   help="MuST-C root (contains <folder>/data/<subset>/{wav,txt})")
    p.add_argument("--mustc-language", default="en")
    p.add_argument("--mustc-folder", default="en-de")
    p.add_argument("--num-symbols", type=int, default=None,
                   help="default: 29 (char) with a dataset, else the reference "
                        "sub-recipe vocab (librispeech 4097, tedlium3/mustc 501)")
    p.add_argument("--checkpoint", default=None, help="path to save final params (npz)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="orbax checkpoint dir; auto-resumes from the latest step")
    p.add_argument("--checkpoint-every", type=int, default=50)
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    print(f"mesh: {mesh.shape}, devices: {len(jax.devices())}")

    if args.mustc_path and not args.synthetic:
        data = MuSTCBatches(args.mustc_path, args.global_batch,
                            language=args.mustc_language, folder_in_archive=args.mustc_folder)
        num_symbols = data.num_symbols
    elif args.tedlium_path and not args.synthetic:
        data = TedliumBatches(args.tedlium_path, args.global_batch)
        num_symbols = data.num_symbols
    elif args.librispeech_path and not args.synthetic:
        data = LibriSpeechBatches(args.librispeech_path, args.librispeech_url, args.global_batch)
        num_symbols = data.num_symbols
    else:
        num_symbols = args.num_symbols or (29 if args.tiny else MODEL_TYPE_NUM_SYMBOLS[args.model_type])
        data = SyntheticBatches(args.global_batch, num_symbols)

    model = tiny_model(num_symbols) if args.tiny else emformer_rnnt_base(num_symbols)
    seg = model.transcriber.segment_length
    rc = model.transcriber.right_context_length
    stride = model.transcriber.time_reduction_stride

    melspec = MelSpectrogram(
        sample_rate=SAMPLE_RATE, n_fft=400, hop_length=HOP, n_mels=N_MELS, power=2.0
    )

    def featurize(wav, wav_lens):
        mel = jnp.log(jnp.swapaxes(melspec(wav), 1, 2) + 1e-6)  # (B, T, n_mels)
        feat_lens = wav_lens // HOP + 1
        t_pad = pad_frames_for_segments(mel.shape[1], seg, rc, stride)
        mel = jnp.pad(mel, ((0, 0), (0, t_pad - mel.shape[1]), (0, 0)))
        return mel, jnp.minimum(feat_lens, t_pad)

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.learning_rate, args.warmup_steps, max(args.steps, args.warmup_steps + 1)
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(schedule, weight_decay=1e-6))

    wav0, wl0, tgt0, tl0 = next(iter(data))
    feats0, fl0 = featurize(jnp.asarray(wav0), jnp.asarray(wl0))
    tgt_in0 = jnp.pad(jnp.asarray(tgt0), ((0, 0), (1, 0)), constant_values=BLANK_FIRST_TOKEN)
    params = model.init(
        jax.random.PRNGKey(0), feats0, fl0, tgt_in0, jnp.asarray(tl0) + 1, deterministic=True
    )["params"]
    if args.pruned_loss:
        # simple-head projections live next to the model params so optax /
        # orbax / bf16 casting treat them uniformly
        enc_dim = model.transcriber.output_dim
        hk1, hk2 = jax.random.split(jax.random.PRNGKey(2))
        params = {
            "model": params,
            "simple_am": jax.random.normal(hk1, (enc_dim, num_symbols), jnp.float32) * enc_dim ** -0.5,
            "simple_lm": jax.random.normal(hk2, (enc_dim, num_symbols), jnp.float32) * enc_dim ** -0.5,
        }
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f}M")

    opt_state = tx.init(params)
    start_step = 0
    ckpt_mgr = None
    if args.checkpoint_dir:
        from audio_tpu.utils import CheckpointManager

        ckpt_mgr = CheckpointManager(args.checkpoint_dir, max_to_keep=3)
        restored = ckpt_mgr.restore(like={"params": params, "opt_state": opt_state, "step": 0})
        if restored is not None:
            params, opt_state, start_step = restored["params"], restored["opt_state"], restored["step"] + 1
            print(f"resumed from step {restored['step']}")
    rep = replicate(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    deterministic = bool(args.overfit)  # memorization gate trains dropout-off

    def loss_fn(params, feats, feat_lens, targets, target_lengths, key):
        if args.bf16:
            # bf16 compute / f32 masters: cast inside the loss so jax.grad
            # still differentiates the f32 params; rnnt_loss cast-computes
            # its DP in f32 for bf16 logits (audio_tpu/ops/rnnt.py).
            params = cast_floating(params, jnp.bfloat16)
            feats = feats.astype(jnp.bfloat16)
        tgt_in = jnp.pad(targets, ((0, 0), (1, 0)), constant_values=BLANK_FIRST_TOKEN)
        if args.pruned_loss:
            mp = {"params": params["model"]}
            band = args.prune_band
            enc, src_lens = model.apply(
                mp, feats, feat_lens, deterministic=deterministic, rngs={"dropout": key},
                method=model.transcribe,
            )
            pred, _, _ = model.apply(
                mp, tgt_in, target_lengths + 1, None, deterministic=deterministic,
                rngs={"dropout": key}, method=model.predict,
            )
            simple, post = F.rnnt_loss_simple(
                enc @ params["simple_am"], pred @ params["simple_lm"],
                targets, src_lens, target_lengths, blank=BLANK_FIRST_TOKEN,
                reduction="mean",
            )
            ranges = F.get_rnnt_prune_ranges(post, src_lens, target_lengths, band)
            pred_band = F.prune_target_encodings(pred, ranges)
            bt = enc.shape[0] * enc.shape[1]
            ones = jnp.ones((bt,), jnp.int32)
            logits, _, _ = model.apply(
                mp, enc.reshape(bt, 1, enc.shape[-1]), ones,
                pred_band.reshape(bt, band, pred_band.shape[-1]), ones,
                method=model.join,
            )
            logits = logits.reshape(enc.shape[0], enc.shape[1], band, -1)
            pruned = F.rnnt_loss_pruned(
                logits, targets, ranges, src_lens, target_lengths,
                blank=BLANK_FIRST_TOKEN, reduction="mean",
            )
            return 0.5 * simple + pruned
        logits, src_lens, _, _ = model.apply(
            {"params": params}, feats, feat_lens, tgt_in, target_lengths + 1,
            deterministic=deterministic, rngs={"dropout": key},
        )
        return F.rnnt_loss(
            logits, targets, src_lens, target_lengths, blank=BLANK_FIRST_TOKEN, reduction="mean"
        )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, feats, feat_lens, targets, target_lengths, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, feats, feat_lens, targets, target_lengths, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bsh2 = batch_sharding(mesh, 2)
    key = jax.random.PRNGKey(1)
    it = iter(data)
    if args.overfit:
        fixed = next(it)
        it = iter(lambda: fixed, None)  # the same batch forever
    t0 = time.time()
    for step in range(start_step, args.steps):
        wav, wav_lens, tgt, tgt_lens = next(it)
        feats, feat_lens = featurize(jnp.asarray(wav), jnp.asarray(wav_lens))
        feats = jax.device_put(feats, batch_sharding(mesh, 3))
        feat_lens = jax.device_put(feat_lens, batch_sharding(mesh, 1))
        tgt = jax.device_put(jnp.asarray(tgt), bsh2)
        tgt_lens = jax.device_put(jnp.asarray(tgt_lens), batch_sharding(mesh, 1))
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(
            params, opt_state, feats, feat_lens, tgt, tgt_lens, sub
        )
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f}  ({time.time()-t0:.1f}s)")
        if ckpt_mgr is not None and (step % args.checkpoint_every == 0 or step == args.steps - 1):
            ckpt_mgr.save(step, {"params": params, "opt_state": opt_state, "step": step})

    if args.overfit:
        # memorization gate: greedy decode of the training batch must
        # reproduce every training transcript exactly
        from audio_tpu.models.rnnt_decoder import rnnt_greedy_decode

        wav, wav_lens, tgt, tgt_lens = fixed
        feats, feat_lens = featurize(jnp.asarray(wav), jnp.asarray(wav_lens))
        mp = params["model"] if args.pruned_loss else params
        tokens, counts = jax.jit(
            lambda p, f, fl: rnnt_greedy_decode(model, {"params": p}, f, fl,
                                                blank=BLANK_FIRST_TOKEN)
        )(mp, feats, feat_lens)
        tokens, counts = np.asarray(tokens), np.asarray(counts)
        n_exact = 0
        for i in range(len(tgt_lens)):
            hyp = tokens[i, : counts[i]].tolist()
            ref_t = tgt[i, : tgt_lens[i]].tolist()
            n_exact += int(hyp == ref_t)
        print(f"overfit_gate: exact {n_exact}/{len(tgt_lens)}  final_loss {float(loss):.4f}")
        if n_exact != len(tgt_lens):
            raise AssertionError(
                f"memorization gate failed: {n_exact}/{len(tgt_lens)} exact "
                f"transcript matches after {args.steps} steps (loss {float(loss):.4f})"
            )

    if ckpt_mgr is not None:
        ckpt_mgr.close()
    if args.checkpoint:
        flat = {"/".join(map(str, k)): np.asarray(v)
                for k, v in jax.tree_util.tree_leaves_with_path(params)}
        np.savez(args.checkpoint, **{k.replace("['", "").replace("']", ""): v for k, v in flat.items()})
        print(f"saved {args.checkpoint}")


if __name__ == "__main__":
    main()
