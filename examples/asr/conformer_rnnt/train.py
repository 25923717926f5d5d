"""Conformer RNN-T training recipe (TPU-native).

Counterpart of the reference recipe at
/root/reference/examples/asr/librispeech_conformer_rnnt/ (train.py:50-53,
30.2M-param Conformer transducer, 4x8 GPU DDP; published WER in README.md:44-51).
Here the transcriber is `audio_tpu.models.Conformer` (time-reduced mel input),
the predictor/joiner are the RNN-T components from `audio_tpu.models.rnnt`,
data parallelism is a `jax.sharding.Mesh` "dp" axis with XLA-inserted psum
gradient reduction, and the full step (SpecAugment -> Conformer -> predictor
-> joiner -> rnnt_loss -> adamw) is one jit'd program.

Quick synthetic smoke on a CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python train.py --synthetic --tiny --steps 2

Real data: point --librispeech-path at an extracted LibriSpeech root.
"""

from __future__ import annotations

import argparse
import functools
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

import audio_tpu.functional as F
from audio_tpu.models import Conformer
from audio_tpu.models.rnnt import _Joiner, _Predictor, _time_reduction
from audio_tpu.parallel import batch_sharding, create_mesh, replicate
from audio_tpu.transforms import MelSpectrogram

SAMPLE_RATE = 16000
N_MELS = 80
HOP = 160
BLANK_FIRST_TOKEN = 0  # predictor SOS = blank, as in the reference recipe


class ConformerRNNT(nn.Module):
    """Conformer transcriber + LSTM predictor + additive joiner transducer.

    Mirrors the architecture trained by the reference's
    librispeech_conformer_rnnt recipe (Conformer encoder over 4x
    time-reduced 80-mel features; README.md:44 "30.2M params").
    """

    num_symbols: int
    input_dim: int = N_MELS
    time_reduction_stride: int = 4
    encoding_dim: int = 256  # conformer width after input projection
    conformer_layers: int = 16
    conformer_heads: int = 4
    conformer_ffn_dim: int = 1024
    conformer_kernel_size: int = 31
    dropout: float = 0.1
    symbol_embedding_dim: int = 256
    num_lstm_layers: int = 1
    lstm_hidden_dim: int = 512
    joiner_dim: int = 256

    def setup(self):
        self.input_linear = nn.Dense(self.encoding_dim, name="input_linear")
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
            num_lstm_layers=self.num_lstm_layers,
            lstm_hidden_dim=self.lstm_hidden_dim,
            lstm_layer_norm=True,
            lstm_layer_norm_epsilon=1e-3,
            lstm_dropout=self.dropout,
            name="predictor",
        )
        self.joiner = _Joiner(output_dim=self.num_symbols, name="joiner")

    def __call__(self, sources, source_lengths, targets, target_lengths,
                 deterministic: bool = True):
        x, lengths = _time_reduction(sources, source_lengths, self.time_reduction_stride)
        x = self.input_linear(x)
        x, lengths = self.conformer(x, lengths, deterministic=deterministic)
        src_enc = self.output_linear(x)
        tgt_enc, tgt_lens, _ = self.predictor(
            targets, target_lengths, deterministic=deterministic
        )
        logits, src_lens, tgt_lens = self.joiner(src_enc, lengths, tgt_enc, tgt_lens)
        return logits, src_lens, tgt_lens

    # RNNT decode protocol (audio_tpu.models.rnnt_decoder expects
    # transcribe/predict/join, matching audio_tpu.models.RNNT)
    def transcribe(self, sources, source_lengths, deterministic: bool = True):
        x, lengths = _time_reduction(sources, source_lengths, self.time_reduction_stride)
        x = self.input_linear(x)
        x, lengths = self.conformer(x, lengths, deterministic=deterministic)
        return self.output_linear(x), lengths

    def predict(self, targets, target_lengths, state=None, deterministic: bool = True):
        return self.predictor(targets, target_lengths, state, deterministic=deterministic)

    def join(self, source_encodings, source_lengths, target_encodings, target_lengths):
        return self.joiner(source_encodings, source_lengths, target_encodings, target_lengths)


def tiny_model(num_symbols: int) -> ConformerRNNT:
    return ConformerRNNT(
        num_symbols=num_symbols,
        encoding_dim=32,
        conformer_layers=2,
        conformer_heads=2,
        conformer_ffn_dim=64,
        conformer_kernel_size=7,
        symbol_embedding_dim=16,
        lstm_hidden_dim=32,
        joiner_dim=32,
    )


class SyntheticBatches:
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=8e-4)
    p.add_argument("--warmup-steps", type=int, default=40)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--librispeech-path", default=None)
    p.add_argument("--librispeech-url", default="train-clean-100")
    p.add_argument("--num-symbols", type=int, default=1024,
                   help="vocabulary size (reference uses a 1k SentencePiece model)")
    p.add_argument("--time-mask", type=int, default=100)
    p.add_argument("--overfit", action="store_true",
                   help="memorization gate: train on ONE fixed batch with "
                        "dropout/SpecAugment off, then assert greedy decode "
                        "reproduces the training transcripts exactly")
    p.add_argument("--freq-mask", type=int, default=27)
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    print(f"mesh: {mesh.shape}, devices: {len(jax.devices())}")

    if args.synthetic or args.librispeech_path is None:
        num_symbols = args.num_symbols if not args.tiny else 32
        data = SyntheticBatches(args.global_batch, num_symbols)
    else:
        # reuse the char-level LibriSpeech batcher from the emformer recipe
        import importlib.util
        import pathlib

        emf = pathlib.Path(__file__).resolve().parent.parent / "emformer_rnnt" / "train.py"
        spec = importlib.util.spec_from_file_location("_emf_recipe", emf)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        data = mod.LibriSpeechBatches(args.librispeech_path, args.librispeech_url, args.global_batch)
        num_symbols = data.num_symbols

    model = tiny_model(num_symbols) if args.tiny else ConformerRNNT(num_symbols=num_symbols)
    stride = model.time_reduction_stride

    melspec = MelSpectrogram(
        sample_rate=SAMPLE_RATE, n_fft=400, hop_length=HOP, n_mels=N_MELS, power=2.0
    )

    def featurize(wav, wav_lens, key, train=True):
        mel = jnp.log(jnp.swapaxes(melspec(wav), 1, 2) + 1e-6)  # (B, T, n_mels)
        feat_lens = wav_lens // HOP + 1
        if train:
            # SpecAugment as in the reference recipe (2x freq 27, 2x time 100)
            spec = jnp.swapaxes(mel, 1, 2)
            for i in range(2):
                key, k1, k2 = jax.random.split(key, 3)
                spec = F.mask_along_axis_iid(spec[:, None], args.freq_mask, 0.0, 2, key=k1)[:, 0]
                spec = F.mask_along_axis_iid(spec[:, None], args.time_mask, 0.0, 3, key=k2, p=0.2)[:, 0]
            mel = jnp.swapaxes(spec, 1, 2)
        t_pad = -(-mel.shape[1] // stride) * stride
        mel = jnp.pad(mel, ((0, 0), (0, t_pad - mel.shape[1]), (0, 0)))
        return mel, jnp.minimum(feat_lens, t_pad)

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.learning_rate, args.warmup_steps, max(args.steps, args.warmup_steps + 1)
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(schedule, weight_decay=1e-6))

    wav0, wl0, tgt0, tl0 = next(iter(data))
    feats0, fl0 = featurize(jnp.asarray(wav0), jnp.asarray(wl0), jax.random.PRNGKey(9), train=False)
    tgt_in0 = jnp.pad(jnp.asarray(tgt0), ((0, 0), (1, 0)), constant_values=BLANK_FIRST_TOKEN)
    params = model.init(
        jax.random.PRNGKey(0), feats0, fl0, tgt_in0, jnp.asarray(tl0) + 1, deterministic=True
    )["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f}M")

    opt_state = tx.init(params)
    rep = replicate(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    deterministic = bool(args.overfit)  # memorization gate trains dropout-off

    def loss_fn(params, feats, feat_lens, targets, target_lengths, key):
        tgt_in = jnp.pad(targets, ((0, 0), (1, 0)), constant_values=BLANK_FIRST_TOKEN)
        logits, src_lens, _ = model.apply(
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
    for step in range(args.steps):
        wav, wav_lens, tgt, tgt_lens = next(it)
        key, kf, kd = jax.random.split(key, 3)
        feats, feat_lens = featurize(jnp.asarray(wav), jnp.asarray(wav_lens), kf,
                                     train=not args.overfit)
        feats = jax.device_put(feats, batch_sharding(mesh, 3))
        feat_lens = jax.device_put(feat_lens, batch_sharding(mesh, 1))
        tgt = jax.device_put(jnp.asarray(tgt), bsh2)
        tgt_lens = jax.device_put(jnp.asarray(tgt_lens), batch_sharding(mesh, 1))
        params, opt_state, loss = train_step(params, opt_state, feats, feat_lens, tgt, tgt_lens, kd)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f}  ({time.time()-t0:.1f}s)")

    if args.overfit:
        from audio_tpu.models.rnnt_decoder import rnnt_greedy_decode

        wav, wav_lens, tgt, tgt_lens = fixed
        feats, feat_lens = featurize(jnp.asarray(wav), jnp.asarray(wav_lens),
                                     jax.random.PRNGKey(9), train=False)
        tokens, counts = jax.jit(
            lambda p, f, fl: rnnt_greedy_decode(model, {"params": p}, f, fl,
                                                blank=BLANK_FIRST_TOKEN)
        )(params, feats, feat_lens)
        tokens, counts = np.asarray(tokens), np.asarray(counts)
        n_exact = sum(
            int(tokens[i, : counts[i]].tolist() == tgt[i, : tgt_lens[i]].tolist())
            for i in range(len(tgt_lens))
        )
        print(f"overfit_gate: exact {n_exact}/{len(tgt_lens)}  final_loss {float(loss):.4f}")
        if n_exact != len(tgt_lens):
            raise AssertionError(
                f"memorization gate failed: {n_exact}/{len(tgt_lens)} exact "
                f"transcript matches after {args.steps} steps (loss {float(loss):.4f})"
            )


if __name__ == "__main__":
    main()
