"""Audio-Visual Speech Recognition (AVSR) training recipe (TPU-native).

Counterpart of /root/reference/examples/avsr/ (lightning_av.py:48-105:
video ResNet frontend + audio ResNet1D frontend at the 25 fps video rate,
concat -> FFN fusion (models/fusion.py:35) -> conformer/emformer RNN-T,
RNNTLoss, AdamW; trained on LRS3). The frontends (frontends.py) are
shape-faithful flax ResNet-18 / ResNet1D trunks with a GroupNorm-for-
BatchNorm substitution (stateless under jit; see frontends.py docstring),
and the transducer is the Conformer RNN-T assembled from
`audio_tpu.models.rnnt` components. The whole step is one jit'd program
over the "dp" mesh axis. `eval.py` runs greedy-decode WER; checkpoints can
be merged with `average_checkpoints.py` (the reference averages the last
10 epochs, avsr/average_checkpoints.py).

Quick synthetic smoke on a CPU mesh (no LRS3 required):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python train.py --synthetic --tiny --steps 2
"""

from __future__ import annotations

import argparse
import functools
import itertools
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

import audio_tpu.functional as F
from audio_tpu.models import Conformer
from audio_tpu.models.rnnt import _Joiner, _Predictor
from audio_tpu.parallel import batch_sharding, create_mesh, replicate

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent))
from frontends import AudioResNetFrontend, FusionModule, VideoResNetFrontend  # noqa: E402

SAMPLE_RATE = 16000
VIDEO_FPS = 25
SAMPLES_PER_FRAME = SAMPLE_RATE // VIDEO_FPS  # 640
BLANK_FIRST_TOKEN = 0


class AVConformerRNNT(nn.Module):
    """Fused A/V features -> Conformer transcriber -> RNN-T."""

    num_symbols: int
    frontend_width: int = 64  # ResNet stage-1 width; frontends emit 8*width
    fusion_hidden: int = 3072
    encoding_dim: int = 256
    conformer_layers: int = 16
    conformer_heads: int = 4
    conformer_ffn_dim: int = 1024
    conformer_kernel_size: int = 31
    dropout: float = 0.1
    symbol_embedding_dim: int = 256
    lstm_hidden_dim: int = 512
    joiner_dim: int = 256

    def setup(self):
        self.video_frontend = VideoResNetFrontend(self.frontend_width, name="video_frontend")
        self.audio_frontend = AudioResNetFrontend(self.frontend_width, name="audio_frontend")
        self.fusion = FusionModule(self.fusion_hidden, self.encoding_dim, self.dropout,
                                   name="fusion")
        self.conformer = Conformer(
            input_dim=self.encoding_dim,
            num_heads=self.conformer_heads,
            ffn_dim=self.conformer_ffn_dim,
            num_layers=self.conformer_layers,
            depthwise_conv_kernel_size=self.conformer_kernel_size,
            dropout=self.dropout,
            use_group_norm=True,
            name="conformer",
        )
        self.output_linear = nn.Dense(self.joiner_dim, name="output_linear")
        self.predictor = _Predictor(
            num_symbols=self.num_symbols,
            output_dim=self.joiner_dim,
            symbol_embedding_dim=self.symbol_embedding_dim,
            num_lstm_layers=1,
            lstm_hidden_dim=self.lstm_hidden_dim,
            lstm_layer_norm=True,
            lstm_layer_norm_epsilon=1e-3,
            lstm_dropout=self.dropout,
            name="predictor",
        )
        self.joiner = _Joiner(output_dim=self.num_symbols, name="joiner")

    def fuse(self, videos, audios, video_lengths, deterministic: bool = True):
        """A/V frontends + FFN fusion -> (features (B, T, D), lengths)."""
        v = self.video_frontend(videos, deterministic)
        a = self.audio_frontend(audios, deterministic)
        t = min(v.shape[1], a.shape[1])
        fused = self.fusion(jnp.concatenate([v[:, :t], a[:, :t]], axis=-1), deterministic)
        return fused, jnp.minimum(video_lengths, t)

    def transcribe(self, sources, source_lengths, deterministic: bool = True):
        enc, lens = self.conformer(sources, source_lengths, deterministic=deterministic)
        return self.output_linear(enc), lens

    def predict(self, targets, target_lengths, state=None, deterministic: bool = True):
        return self.predictor(targets, target_lengths, state, deterministic=deterministic)

    def join(self, source_encodings, source_lengths, target_encodings, target_lengths):
        return self.joiner(source_encodings, source_lengths, target_encodings, target_lengths)

    def __call__(self, videos, audios, video_lengths, targets, target_lengths,
                 deterministic: bool = True):
        fused, fused_lens = self.fuse(videos, audios, video_lengths, deterministic)
        src_enc, src_lens = self.transcribe(fused, fused_lens, deterministic)
        tgt_enc, tgt_lens, _ = self.predictor(targets, target_lengths,
                                              deterministic=deterministic)
        logits, src_lens, tgt_lens = self.joiner(src_enc, src_lens, tgt_enc, tgt_lens)
        return logits, src_lens, tgt_lens


def tiny_model(num_symbols):
    return AVConformerRNNT(
        num_symbols=num_symbols, frontend_width=8, fusion_hidden=32, encoding_dim=16,
        conformer_layers=2, conformer_heads=2, conformer_ffn_dim=32,
        conformer_kernel_size=7, symbol_embedding_dim=8, lstm_hidden_dim=16,
        joiner_dim=16,
    )


class SyntheticBatches:
    """Random lip-crop videos + aligned audio + token targets."""

    def __init__(self, batch_size, num_symbols, frames=16, size=48, seed=0):
        self.batch_size, self.num_symbols = batch_size, num_symbols
        self.frames, self.size = frames, size
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        while True:
            b, t = self.batch_size, self.frames
            videos = self.rng.standard_normal((b, t, self.size, self.size)).astype(np.float32)
            audios = (0.1 * self.rng.standard_normal((b, t * SAMPLES_PER_FRAME))).astype(np.float32)
            vid_lens = self.rng.integers(t // 2, t + 1, b).astype(np.int32)
            tgt_len = self.rng.integers(2, 6, b)
            tgt = self.rng.integers(1, self.num_symbols, (b, int(tgt_len.max())))
            tgt = tgt * (np.arange(tgt.shape[1])[None] < tgt_len[:, None])
            yield videos, audios, vid_lens, tgt.astype(np.int32), tgt_len.astype(np.int32)


# blank + the reference SentencePiece-style char inventory; a real spm model
# drops in via --sp-model (the reference trains unigram-1023, train_spm.py)
CHAR_VOCAB = ["<blank>", "<unk>", " ", "'"] + [chr(c) for c in range(ord("A"), ord("Z") + 1)]


class LRS3Batches:
    """Preprocessed-LRS3 batches: bucket by video frames (the reference
    batches by token count over CustomBucketDataset, data_module.py:66-99),
    pad each batch to its own max length, char-tokenize transcripts."""

    def __init__(self, root, batch_size, max_frames=1600, subset="train", seed=0,
                 n_dp=1):
        import pathlib
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
        from lrs3 import LRS3, batch_by_token_count

        self.ds = LRS3(root, subset=subset, modality="audiovisual")
        self.batches = batch_by_token_count(
            self.ds.lengths, max_frames=max_frames, batch_size=batch_size,
            num_buckets=min(50, len(self.ds)), shuffle=True, seed=seed,
        )
        self.n_dp = n_dp
        self.char2id = {c: i for i, c in enumerate(CHAR_VOCAB)}
        self.num_symbols = len(CHAR_VOCAB)

    def tokenize(self, text):
        return [self.char2id.get(c, 1) for c in text.upper()]

    @staticmethod
    def _round8(n):
        return (n + 7) // 8 * 8  # pad shape buckets: fewer XLA retraces

    def __iter__(self):
        while True:
            for batch_idx in self.batches:
                # dp sharding needs the batch divisible by the mesh size
                rem = (-len(batch_idx)) % self.n_dp
                batch_idx = list(batch_idx) + [
                    batch_idx[i % len(batch_idx)] for i in range(rem)
                ]
                items = [self.ds[i] for i in batch_idx]
                t_max = self._round8(max(v.shape[0] for _, v, _ in items))
                tokens = [self.tokenize(txt) for _, _, txt in items]
                u_max = self._round8(max(len(t) for t in tokens))
                b = len(items)
                videos = np.zeros((b, t_max) + items[0][1].shape[1:], np.float32)
                audios = np.zeros((b, t_max * SAMPLES_PER_FRAME), np.float32)
                vid_lens = np.zeros((b,), np.int32)
                tgt = np.zeros((b, max(u_max, 1)), np.int32)
                tgt_lens = np.zeros((b,), np.int32)
                for i, ((a, v, _), toks) in enumerate(zip(items, tokens)):
                    videos[i, : v.shape[0]] = v
                    n = min(a.shape[0], audios.shape[1])
                    audios[i, :n] = a[:n]
                    vid_lens[i] = v.shape[0]
                    tgt[i, : len(toks)] = toks
                    tgt_lens[i] = len(toks)
                yield videos, audios, vid_lens, tgt, tgt_lens


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=8e-4)
    p.add_argument("--weight-decay", type=float, default=0.06)
    p.add_argument("--warmup-steps", type=int, default=40)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--lrs3-path", default=None,
                   help="preprocessed LRS3 root (see data_prep/preprocess_lrs3.py)")
    p.add_argument("--max-frames", type=int, default=1600,
                   help="token-count batching budget in video frames")
    p.add_argument("--num-symbols", type=int, default=1024)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--save-every", type=int, default=50)
    p.add_argument("--overfit", action="store_true",
                   help="learning gate: train on ONE fixed batch (dropout "
                        "off) and assert greedy transducer decode reproduces "
                        "every training transcript exactly")
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    n_dp = int(np.prod(list(mesh.shape.values())))
    print(f"mesh: {mesh.shape}, devices: {len(jax.devices())}")

    num_symbols = 32 if args.tiny else args.num_symbols
    if args.lrs3_path:
        data = LRS3Batches(args.lrs3_path, args.global_batch,
                           max_frames=args.max_frames, n_dp=n_dp)
        num_symbols = data.num_symbols
        print(f"LRS3: {len(data.ds)} segments, {len(data.batches)} batches, "
              f"vocab {num_symbols} (char)")
    elif args.synthetic:
        data = SyntheticBatches(args.global_batch, num_symbols)
    else:
        raise SystemExit("pass --synthetic or --lrs3-path")
    model = tiny_model(num_symbols) if args.tiny else AVConformerRNNT(num_symbols=num_symbols)

    vid0, aud0, vl0, tgt0, tl0 = next(iter(data))
    tgt_in0 = jnp.pad(jnp.asarray(tgt0), ((0, 0), (1, 0)), constant_values=BLANK_FIRST_TOKEN)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(vid0), jnp.asarray(aud0), jnp.asarray(vl0),
        tgt_in0, jnp.asarray(tl0) + 1, deterministic=True,
    )["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f}M")

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.learning_rate, args.warmup_steps, max(args.steps, args.warmup_steps + 1)
    )
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(schedule, b1=0.9, b2=0.98, weight_decay=args.weight_decay),
    )
    opt_state = tx.init(params)
    rep = replicate(mesh)
    params, opt_state = jax.device_put((params, opt_state), rep)

    deterministic = bool(args.overfit)  # memorization gate trains dropout-off

    def loss_fn(params, videos, audios, vid_lens, targets, target_lengths, key):
        tgt_in = jnp.pad(targets, ((0, 0), (1, 0)), constant_values=BLANK_FIRST_TOKEN)
        logits, src_lens, _ = model.apply(
            {"params": params}, videos, audios, vid_lens, tgt_in, target_lengths + 1,
            deterministic=deterministic, rngs={"dropout": key},
        )
        return F.rnnt_loss(logits, targets, src_lens, target_lengths,
                           blank=BLANK_FIRST_TOKEN, reduction="mean")

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, videos, audios, vid_lens, targets, target_lengths, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, videos, audios, vid_lens, targets, target_lengths, key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    ckpt_mgr = None
    if args.checkpoint_dir:
        from audio_tpu.utils import CheckpointManager

        ckpt_mgr = CheckpointManager(args.checkpoint_dir, max_to_keep=12)

    key = jax.random.PRNGKey(1)
    it = iter(data)
    if args.overfit:
        fixed = next(it)
        it = itertools.repeat(fixed)  # the same batch forever
    t0 = time.time()
    for step in range(args.steps):
        videos, audios, vid_lens, tgt, tgt_lens = next(it)
        videos = jax.device_put(jnp.asarray(videos), batch_sharding(mesh, 4))
        audios = jax.device_put(jnp.asarray(audios), batch_sharding(mesh, 2))
        vid_lens = jax.device_put(jnp.asarray(vid_lens), batch_sharding(mesh, 1))
        tgt_d = jax.device_put(jnp.asarray(tgt), batch_sharding(mesh, 2))
        tgt_lens_d = jax.device_put(jnp.asarray(tgt_lens), batch_sharding(mesh, 1))
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(
            params, opt_state, videos, audios, vid_lens, tgt_d, tgt_lens_d, sub
        )
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f}  ({time.time()-t0:.1f}s)")
        if ckpt_mgr and (step % args.save_every == args.save_every - 1 or step == args.steps - 1):
            ckpt_mgr.save(step, {"params": params, "step": step})

    if args.overfit:
        from audio_tpu.models import rnnt_greedy_decode

        videos, audios, vid_lens, tgt, tgt_lens = fixed
        fused, lens = jax.jit(lambda p, v, a, vl: model.apply(
            {"params": p}, v, a, vl, deterministic=True, method=model.fuse)
        )(params, jnp.asarray(videos), jnp.asarray(audios), jnp.asarray(vid_lens))
        tokens, counts = rnnt_greedy_decode(
            model, {"params": params}, fused, lens, blank=BLANK_FIRST_TOKEN,
            max_tokens=64)
        tokens, counts = np.asarray(tokens), np.asarray(counts)
        n_exact = 0
        for i in range(len(tgt_lens)):
            hyp = tokens[i, : counts[i]].tolist()
            ref = np.asarray(tgt)[i, : int(tgt_lens[i])].tolist()
            n_exact += int(hyp == ref)
        print(f"overfit_gate: exact {n_exact}/{len(tgt_lens)}  final_loss {float(loss):.4f}")
        if n_exact != len(tgt_lens):
            raise AssertionError(
                f"memorization gate failed: {n_exact}/{len(tgt_lens)} exact "
                f"transcripts after {args.steps} steps (loss {float(loss):.4f})")


if __name__ == "__main__":
    main()
