"""Conformer RNN-T with TCPGen contextual biasing (TPU-native).

Counterpart of the reference recipe at
/root/reference/examples/asr/librispeech_conformer_rnnt_biasing/ (train.py
--biasing/--biasing-list/--droprate args): a Conformer transducer whose joint
distribution is interpolated with a trie-constrained pointer-generator
(biasing.py) so words from a per-utterance biasing list are boosted.

Training-time biasing lists are sampled per batch from the reference
transcripts plus distractors (the reference's drop/insert scheme); the trie
is a dense transition table padded to a fixed node budget so every step jits
once. The RNN-T loss consumes the combined log-probabilities directly
(`fused_log_softmax=False`).

Synthetic smoke (CPU mesh):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python train.py --synthetic --tiny --steps 2
"""

from __future__ import annotations

import argparse
import functools
import importlib.util
import sys
import time
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

import audio_tpu.functional as F
from audio_tpu.models import Conformer
from audio_tpu.models.rnnt import _Predictor, _time_reduction
from audio_tpu.parallel import batch_sharding, create_mesh, replicate
from audio_tpu.transforms import MelSpectrogram

_here = Path(__file__).parent
_spec = importlib.util.spec_from_file_location("biasing", _here / "biasing.py")
biasing = importlib.util.module_from_spec(_spec)
sys.modules["biasing"] = biasing
_spec.loader.exec_module(biasing)

SAMPLE_RATE = 16000
N_MELS = 80
HOP = 160
BLANK = 0


class BiasedConformerRNNT(nn.Module):
    """Conformer transducer + TCPGen pointer-generator on the joint lattice."""

    num_symbols: int
    input_dim: int = N_MELS
    time_reduction_stride: int = 4
    encoding_dim: int = 256
    conformer_layers: int = 16
    conformer_heads: int = 4
    conformer_ffn_dim: int = 1024
    conformer_kernel_size: int = 31
    dropout: float = 0.1
    symbol_embedding_dim: int = 256
    num_lstm_layers: int = 1
    lstm_hidden_dim: int = 512
    joiner_dim: int = 256
    tcpgen_dim: int = 64

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
        self.joint_out = nn.Dense(self.num_symbols, name="joint_out")
        self.tcpgen = biasing.TCPGen(
            vocab_size=self.num_symbols, embed_dim=self.tcpgen_dim, blank=BLANK,
            name="tcpgen",
        )

    def __call__(self, sources, source_lengths, targets, target_lengths,
                 valid_mask, deterministic: bool = True):
        """valid_mask: (B, U+1, V) trie continuations from biasing.trie_states.

        Returns (log_probs (B,T,U+1,V), src_lens, tgt_lens).
        """
        x, lengths = _time_reduction(sources, source_lengths, self.time_reduction_stride)
        x = self.input_linear(x)
        x, lengths = self.conformer(x, lengths, deterministic=deterministic)
        src_enc = self.output_linear(x)
        tgt_enc, tgt_lens, _ = self.predictor(
            targets, target_lengths, deterministic=deterministic
        )
        # joint activation (B, T, U, D) — same additive join as _Joiner,
        # kept inline so TCPGen can query the pre-logit activation
        joint_act = nn.relu(src_enc[:, :, None, :] + tgt_enc[:, None, :, :])
        model_logp = jax.nn.log_softmax(self.joint_out(joint_act), axis=-1)
        log_probs = self.tcpgen(joint_act, model_logp, valid_mask)
        return log_probs, lengths, tgt_lens


def tiny_model(num_symbols: int) -> BiasedConformerRNNT:
    return BiasedConformerRNNT(
        num_symbols=num_symbols,
        encoding_dim=32,
        conformer_layers=2,
        conformer_heads=2,
        conformer_ffn_dim=64,
        conformer_kernel_size=7,
        symbol_embedding_dim=16,
        lstm_hidden_dim=32,
        joiner_dim=32,
        tcpgen_dim=16,
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
            tgt = self.rng.integers(1, self.num_symbols, (b, 12))
            tgt = tgt * (np.arange(12)[None] < tgt_len[:, None])
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
    p.add_argument("--num-symbols", type=int, default=601,
                   help="reference biasing recipe uses a 600-piece SP model")
    p.add_argument("--biasing-distractors", type=int, default=16)
    p.add_argument("--max-trie-nodes", type=int, default=256,
                   help="fixed trie node budget (static shapes, one compile)")
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    print(f"mesh: {mesh.shape}, devices: {len(jax.devices())}")

    num_symbols = 32 if args.tiny else args.num_symbols
    if args.librispeech_path and not args.synthetic:
        spec2 = importlib.util.spec_from_file_location(
            "_emf_train", _here.parent / "emformer_rnnt" / "train.py")
        emf = importlib.util.module_from_spec(spec2)
        sys.modules["_emf_train"] = emf
        spec2.loader.exec_module(emf)
        data = emf.LibriSpeechBatches(args.librispeech_path, "train-clean-100",
                                      args.global_batch)
        num_symbols = data.num_symbols
    else:
        data = SyntheticBatches(args.global_batch, num_symbols)

    model = tiny_model(num_symbols) if args.tiny else BiasedConformerRNNT(num_symbols=num_symbols)

    melspec = MelSpectrogram(sample_rate=SAMPLE_RATE, n_fft=400, hop_length=HOP,
                             n_mels=N_MELS, power=2.0)

    def featurize(wav, wav_lens):
        mel = jnp.log(jnp.swapaxes(melspec(wav), 1, 2) + 1e-6)
        return mel, jnp.minimum(wav_lens // HOP + 1, mel.shape[1])

    rng = np.random.default_rng(0)

    def make_trie(tgt, tgt_lens):
        """Sample the batch biasing list, build + pad the dense trie."""
        blist = biasing.sample_biasing_list(
            tgt, tgt_lens, rng, args.biasing_distractors, num_symbols)
        table = biasing.build_trie(blist, num_symbols)
        if table.shape[0] > args.max_trie_nodes:
            table = table[: args.max_trie_nodes]
            table = np.where(table < args.max_trie_nodes, table, -1)
        pad = np.full((args.max_trie_nodes - table.shape[0], num_symbols), -1, np.int32)
        return np.concatenate([table, pad], axis=0)

    wav0, wl0, tgt0, tl0 = next(iter(data))
    feats0, fl0 = featurize(jnp.asarray(wav0), jnp.asarray(wl0))
    trie0 = jnp.asarray(make_trie(tgt0, tl0))
    tgt_in0 = jnp.pad(jnp.asarray(tgt0), ((0, 0), (1, 0)), constant_values=BLANK)
    nodes0 = biasing.trie_states(trie0, jnp.asarray(tgt0))
    mask0 = biasing.valid_next_tokens(trie0, nodes0)
    params = model.init(
        jax.random.PRNGKey(0), feats0, fl0, tgt_in0, jnp.asarray(tl0) + 1,
        mask0, deterministic=True,
    )["params"]
    print(f"params: {sum(x.size for x in jax.tree_util.tree_leaves(params))/1e6:.2f}M "
          f"(incl. TCPGen)")

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.learning_rate, args.warmup_steps, max(args.steps, args.warmup_steps + 1))
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(schedule, weight_decay=1e-6))
    opt_state = tx.init(params)
    rep = replicate(mesh)
    params, opt_state = jax.device_put((params, opt_state), rep)

    def loss_fn(params, feats, feat_lens, targets, target_lengths, trie, key):
        tgt_in = jnp.pad(targets, ((0, 0), (1, 0)), constant_values=BLANK)
        nodes = biasing.trie_states(trie, targets)
        mask = biasing.valid_next_tokens(trie, nodes)
        log_probs, src_lens, _ = model.apply(
            {"params": params}, feats, feat_lens, tgt_in, target_lengths + 1,
            mask, deterministic=False, rngs={"dropout": key},
        )
        return F.rnnt_loss(log_probs, targets, src_lens, target_lengths,
                           blank=BLANK, reduction="mean", fused_log_softmax=False)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, feats, feat_lens, targets, target_lengths, trie, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, feats, feat_lens, targets, target_lengths, trie, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bsh2 = batch_sharding(mesh, 2)
    key = jax.random.PRNGKey(1)
    it = iter(data)
    t0 = time.time()
    for step in range(args.steps):
        wav, wav_lens, tgt, tgt_lens = next(it)
        feats, feat_lens = featurize(jnp.asarray(wav), jnp.asarray(wav_lens))
        trie = jax.device_put(jnp.asarray(make_trie(tgt, tgt_lens)), rep)
        feats = jax.device_put(feats, batch_sharding(mesh, 3))
        feat_lens = jax.device_put(feat_lens, batch_sharding(mesh, 1))
        tgt = jax.device_put(jnp.asarray(tgt), bsh2)
        tgt_lens = jax.device_put(jnp.asarray(tgt_lens), batch_sharding(mesh, 1))
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(
            params, opt_state, feats, feat_lens, tgt, tgt_lens, trie, sub)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f}  ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
