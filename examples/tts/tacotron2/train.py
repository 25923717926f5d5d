"""Tacotron2 TTS training recipe (TPU-native).

Counterpart of the reference recipe at
/root/reference/examples/pipeline_tacotron2/ (character/phoneme text ->
mel-spectrogram, losses = MSE(mel) + MSE(postnet mel) + BCE(gate); trained
~36h on 8x V100 per its README). Here the teacher-forced decoder scan, the
postnet, and the loss all run in one jit'd program over a `jax.sharding.Mesh`
"dp" axis; gradients are psum-reduced by XLA over ICI.

Note: the flax Tacotron2 uses running-average batch-norm statistics in its
encoder/postnet convs (exact parity with the reference's eval behavior); this
recipe trains with those fixed stats, which is adequate for the demo-scale
runs it targets.

Quick synthetic smoke on a CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python train.py --synthetic --tiny --steps 2

Real data: point --ljspeech-path at an extracted LJSpeech-1.1 root.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_tpu.models import Tacotron2
from audio_tpu.parallel import batch_sharding, create_mesh, replicate
from audio_tpu.transforms import MelSpectrogram

SAMPLE_RATE = 22050
N_MELS = 80
HOP = 256
N_FFT = 1024

# character set used by the reference recipe's text preprocessor
# (examples/pipeline_tacotron2/text/text_preprocessing.py: symbols list)
SYMBOLS = "_-!'(),.:;? abcdefghijklmnopqrstuvwxyz"


def text_to_sequence(text: str) -> list:
    table = {c: i for i, c in enumerate(SYMBOLS)}
    return [table[c] for c in text.lower() if c in table]


def tiny_model(n_symbol: int) -> Tacotron2:
    return Tacotron2(
        n_symbol=n_symbol,
        n_mels=N_MELS,
        symbol_embedding_dim=32,
        encoder_embedding_dim=32,
        encoder_n_convolution=1,
        encoder_kernel_size=3,
        decoder_rnn_dim=32,
        attention_rnn_dim=32,
        attention_hidden_dim=16,
        attention_location_n_filter=4,
        attention_location_kernel_size=7,
        prenet_dim=16,
        postnet_n_convolution=2,
        postnet_kernel_size=3,
        postnet_embedding_dim=32,
    )


class SyntheticBatches:
    def __init__(self, batch_size, n_symbol, text_len=24, mel_len=64, seed=0):
        self.batch_size, self.n_symbol = batch_size, n_symbol
        self.text_len, self.mel_len = text_len, mel_len
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        while True:
            b = self.batch_size
            tok_len = self.rng.integers(self.text_len // 2, self.text_len + 1, b)
            tok = self.rng.integers(1, self.n_symbol, (b, self.text_len))
            tok = tok * (np.arange(self.text_len)[None] < tok_len[:, None])
            mel_len = self.rng.integers(self.mel_len // 2, self.mel_len + 1, b)
            mel = self.rng.standard_normal((b, N_MELS, self.mel_len)).astype(np.float32)
            yield (tok.astype(np.int32), tok_len.astype(np.int32),
                   mel, mel_len.astype(np.int32))


class LJSpeechBatches:
    """Character-level LJSpeech batches via audio_tpu.datasets.LJSPEECH."""

    def __init__(self, root, batch_size, max_text=128, max_frames=512):
        from audio_tpu.datasets import LJSPEECH

        self.ds = LJSPEECH(root, download=False)
        self.batch_size = batch_size
        self.max_text, self.max_frames = max_text, max_frames
        self.melspec = MelSpectrogram(
            sample_rate=SAMPLE_RATE, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS, power=1.0
        )

    def __iter__(self):
        rng = np.random.default_rng(0)
        batch = []
        while True:  # cycle epochs so corpora smaller than a batch still train
            for i in rng.permutation(len(self.ds)):
                wav, sr, _, text = self.ds[int(i)]
                tokens = text_to_sequence(text)[: self.max_text]
                if not tokens:
                    continue
                mel = np.log(np.clip(np.asarray(self.melspec(jnp.asarray(wav).reshape(-1))), 1e-5, None))
                mel = mel[:, : self.max_frames]
                batch.append((tokens, mel))
                if len(batch) == self.batch_size:
                    yield self._collate(batch)
                    batch = []

    def _collate(self, batch):
        tok_lens = np.array([len(t) for t, _ in batch], np.int32)
        mel_lens = np.array([m.shape[1] for _, m in batch], np.int32)
        tok = np.zeros((len(batch), int(tok_lens.max())), np.int32)
        mel = np.zeros((len(batch), N_MELS, int(mel_lens.max())), np.float32)
        for k, (t, m) in enumerate(batch):
            tok[k, : len(t)] = t
            mel[k, :, : m.shape[1]] = m
        return tok, tok_lens, mel, mel_lens


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=1e-6)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--ljspeech-path", default=None)
    p.add_argument("--overfit", action="store_true",
                   help="memorization gate: train on ONE fixed batch with "
                        "prenet dropout off, then assert the teacher-forced "
                        "mel reconstruction collapses and the stop-token is "
                        "predicted exactly")
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    print(f"mesh: {mesh.shape}, devices: {len(jax.devices())}")

    n_symbol = len(SYMBOLS)
    if args.synthetic or args.ljspeech_path is None:
        data = SyntheticBatches(args.global_batch, n_symbol)
    else:
        data = LJSpeechBatches(args.ljspeech_path, args.global_batch)

    model = tiny_model(n_symbol) if args.tiny else Tacotron2(n_symbol=n_symbol, n_mels=N_MELS)

    tok0, tl0, mel0, ml0 = next(iter(data))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(tok0), jnp.asarray(tl0),
        jnp.asarray(mel0), jnp.asarray(ml0), prenet_dropout=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f}M")

    tx = optax.adamw(args.learning_rate, weight_decay=args.weight_decay)
    opt_state = tx.init(params)
    rep = replicate(mesh)
    params, opt_state = jax.device_put((params, opt_state), rep)
    batch_stats = jax.device_put(batch_stats, rep)

    def loss_fn(params, tokens, tok_lens, mel, mel_lens, key):
        mel_out, mel_post, gate_out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            tokens, tok_lens, mel, mel_lens, dropout_rng=key,
            prenet_dropout=not args.overfit,
        )
        t = mel.shape[-1]
        valid = (jnp.arange(t)[None, :] < mel_lens[:, None]).astype(mel.dtype)  # (B, T)
        denom = jnp.maximum(valid.sum() * N_MELS, 1.0)
        mse1 = (((mel_out - mel) ** 2) * valid[:, None, :]).sum() / denom
        mse2 = (((mel_post - mel) ** 2) * valid[:, None, :]).sum() / denom
        # gate target: 1 at the last valid frame onward
        gate_tgt = (jnp.arange(t)[None, :] >= (mel_lens - 1)[:, None]).astype(mel.dtype)
        bce = optax.sigmoid_binary_cross_entropy(gate_out, gate_tgt)
        bce = (bce * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        return mse1 + mse2 + bce

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, tokens, tok_lens, mel, mel_lens, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens, tok_lens, mel, mel_lens, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    it = iter(data)
    if args.overfit:
        tok_f, tl_f, mel_f, ml_f = next(it)
        # rank-1 smooth mel targets: real mels are low-rank/smooth, and the
        # tiny model cannot memorize B*80*T independent gaussians — the gate
        # tests that the seq2seq plumbing learns, not raw capacity
        g = np.random.default_rng(7)
        u = g.standard_normal((len(tl_f), N_MELS, 1)).astype(np.float32)
        v = np.sin(np.linspace(0, 3 * np.pi, mel_f.shape[-1]))[None, None, :].astype(np.float32)
        fixed = (tok_f, tl_f, (u * v).astype(np.float32), ml_f)
        it = iter(lambda: fixed, None)  # the same batch forever
    t0 = time.time()
    for step in range(args.steps):
        tok, tok_lens, mel, mel_lens = next(it)
        tok = jax.device_put(jnp.asarray(tok), batch_sharding(mesh, 2))
        tok_lens = jax.device_put(jnp.asarray(tok_lens), batch_sharding(mesh, 1))
        mel = jax.device_put(jnp.asarray(mel), batch_sharding(mesh, 3))
        mel_lens = jax.device_put(jnp.asarray(mel_lens), batch_sharding(mesh, 1))
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, tok, tok_lens, mel, mel_lens, sub)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f}  ({time.time()-t0:.1f}s)")

    if args.overfit:
        # memorization gate: teacher-forced reconstruction of the training
        # mels must collapse, and the stop-token must flip exactly at each
        # utterance's final valid frame
        tok, tok_lens, mel, mel_lens = fixed
        mel = jnp.asarray(mel)
        mel_lens = jnp.asarray(mel_lens)
        mel_out, mel_post, gate_out, _ = jax.jit(
            lambda p: model.apply({"params": p, "batch_stats": batch_stats},
                                  jnp.asarray(tok), jnp.asarray(tok_lens), mel, mel_lens,
                                  prenet_dropout=False)
        )(params)
        t = mel.shape[-1]
        valid = (jnp.arange(t)[None, :] < mel_lens[:, None]).astype(mel.dtype)
        mse = float((((mel_post - mel) ** 2) * valid[:, None, :]).sum()
                    / jnp.maximum(valid.sum() * N_MELS, 1.0))
        gate_tgt = (jnp.arange(t)[None, :] >= (mel_lens - 1)[:, None])
        gate_pred = jax.nn.sigmoid(gate_out) > 0.5
        gate_acc = float((jnp.where(valid > 0, gate_pred == gate_tgt, True)).all(axis=1).mean())
        print(f"overfit_gate: mel_mse {mse:.4f}  gate_acc {gate_acc:.3f}  final_loss {float(loss):.4f}")
        if mse > 0.05 or gate_acc < 1.0:
            raise AssertionError(
                f"memorization gate failed: mel_mse {mse:.4f} (need <= 0.05), "
                f"stop-token accuracy {gate_acc:.3f} (need 1.0) after {args.steps} steps"
            )


if __name__ == "__main__":
    main()
