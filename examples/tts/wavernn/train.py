"""WaveRNN vocoder training recipe (TPU-native).

Counterpart of the reference recipe at /root/reference/examples/pipeline_wavernn/
(mel-conditioned autoregressive vocoder, 8-bit waveform classes, cross-entropy
loss). Teacher forcing makes the training pass fully parallel over time — the
GRU scans run once over the whole (cropped) waveform — so the step is a single
jit'd program over the "dp" mesh axis.

Quick synthetic smoke on a CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python train.py --synthetic --tiny --steps 2

Real data: point --ljspeech-path at an extracted LJSpeech-1.1 root.
"""

from __future__ import annotations

import argparse
import functools
import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import audio_tpu.functional as F
from audio_tpu.models import WaveRNN
from audio_tpu.parallel import batch_sharding, create_mesh, replicate
from audio_tpu.transforms import MelSpectrogram

SAMPLE_RATE = 22050
N_MELS = 80
HOP = 200  # must equal prod(upsample_scales)
N_FFT = 1024
N_BITS = 8


def make_model(tiny: bool) -> WaveRNN:
    if tiny:
        return WaveRNN(
            upsample_scales=(5, 5, 8),
            n_classes=2**N_BITS,
            hop_length=HOP,
            n_res_block=1,
            n_rnn=32,
            n_fc=32,
            kernel_size=5,
            n_freq=N_MELS,
            n_hidden=16,
            n_output=32,
        )
    # reference recipe defaults (examples/pipeline_wavernn/main.py args)
    return WaveRNN(
        upsample_scales=(5, 5, 8),
        n_classes=2**N_BITS,
        hop_length=HOP,
        n_res_block=10,
        n_rnn=512,
        n_fc=512,
        kernel_size=5,
        n_freq=N_MELS,
        n_hidden=128,
        n_output=128,
    )


def quantize(wav: np.ndarray, n_bits: int = N_BITS) -> np.ndarray:
    """waveform in [-1, 1] -> integer classes [0, 2^bits)."""
    q = (wav + 1.0) * (2**n_bits - 1) / 2.0
    return np.clip(np.rint(q), 0, 2**n_bits - 1).astype(np.int32)


def dequantize(q: np.ndarray, n_bits: int = N_BITS) -> np.ndarray:
    return 2.0 * q.astype(np.float32) / (2**n_bits - 1.0) - 1.0


class SyntheticBatches:
    """Random (waveform crop, aligned mel) pairs, shaped like the LJSpeech path.

    ``tonal=True`` yields sinusoid mixtures instead of white noise — the
    learnable signal for the --overfit gate (an autoregressive model can
    drive next-sample NLL to ~0 on smooth waveforms; white-noise targets
    are information-dense and unmemorizable at tiny model size).
    """

    def __init__(self, batch_size, n_frames=12, seed=0, tonal=False):
        self.batch_size, self.n_frames = batch_size, n_frames
        self.rng = np.random.default_rng(seed)
        self.tonal = tonal

    def __iter__(self):
        while True:
            b, t = self.batch_size, self.n_frames
            # conv stack trims kernel_size-1 (=4) frames; model consumes
            # wav[:-1] which must be (mel_frames - 4) * hop samples
            mel = self.rng.standard_normal((b, 1, N_MELS, t + 4)).astype(np.float32)
            if self.tonal:
                n = t * HOP + 1
                ts = np.arange(n) / SAMPLE_RATE
                f = self.rng.uniform(80, 300, (b, 1, 1))
                ph = self.rng.uniform(0, 2 * np.pi, (b, 1, 1))
                wav = 0.7 * np.sin(2 * np.pi * f * ts + ph)
            else:
                wav = np.clip(0.3 * self.rng.standard_normal((b, 1, t * HOP + 1)), -1, 1)
            yield wav.astype(np.float32), mel


class LJSpeechBatches:
    """Waveform crops + log-mel conditioning from audio_tpu.datasets.LJSPEECH."""

    def __init__(self, root, batch_size, n_frames=24, seed=0):
        from audio_tpu.datasets import LJSPEECH

        self.ds = LJSPEECH(root, download=False)
        self.batch_size, self.n_frames = batch_size, n_frames
        self.rng = np.random.default_rng(seed)
        self.melspec = MelSpectrogram(
            sample_rate=SAMPLE_RATE, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS, power=1.0
        )

    def __iter__(self):
        while True:
            wavs, mels = [], []
            while len(wavs) < self.batch_size:
                i = int(self.rng.integers(len(self.ds)))
                wav, sr, *_ = self.ds[i]
                wav = np.asarray(wav).reshape(-1)
                need = (self.n_frames + 4) * HOP  # +4 frames eaten by the conv stack
                if len(wav) < need + N_FFT:
                    continue
                start = int(self.rng.integers(0, len(wav) - need - 1))
                crop = wav[start : start + need]
                mel = np.log(np.clip(np.asarray(self.melspec(jnp.asarray(crop))), 1e-5, None))
                wavs.append(crop[2 * HOP : (self.n_frames + 2) * HOP + 1])
                mels.append(mel[:, : self.n_frames + 4])
            yield (np.stack(wavs)[:, None].astype(np.float32),
                   np.stack(mels)[:, None].astype(np.float32))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--ljspeech-path", default=None)
    p.add_argument("--overfit", action="store_true",
                   help="learning gate: train on ONE fixed batch and assert "
                        "the memorized next-sample distribution collapses "
                        "(NLL < 1.0 nat and within-1-class accuracy > 0.9 "
                        "over the 256 mu-law classes; chance NLL is "
                        "ln(256) = 5.5)")
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    print(f"mesh: {mesh.shape}, devices: {len(jax.devices())}")

    if args.synthetic or args.ljspeech_path is None:
        data = SyntheticBatches(args.global_batch, n_frames=6 if args.overfit else 12,
                                tonal=args.overfit)
    else:
        data = LJSpeechBatches(args.ljspeech_path, args.global_batch)

    model = make_model(args.tiny)

    wav0, mel0 = next(iter(data))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(wav0)[:, :, :-1], jnp.asarray(mel0))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f}M")

    tx = optax.adam(args.learning_rate)
    opt_state = tx.init(params)
    rep = replicate(mesh)
    params, opt_state = jax.device_put((params, opt_state), rep)
    batch_stats = jax.device_put(batch_stats, rep)

    def loss_fn(params, wav, mel):
        # model consumes wav[t] to predict wav[t+1]; targets are the shifted
        # quantized classes (reference: pipeline_wavernn/main.py train loop)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, wav[:, :, :-1], mel
        )  # (B,1,L,C)
        target = F.mu_law_encoding(wav[:, :, 1:], 2**N_BITS)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)
        return nll.mean()

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, wav, mel):
        loss, grads = jax.value_and_grad(loss_fn)(params, wav, mel)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    it = iter(data)
    if args.overfit:
        fixed = next(it)
        it = itertools.repeat(fixed)  # the same batch forever
    t0 = time.time()
    for step in range(args.steps):
        wav, mel = next(it)
        wav = jax.device_put(jnp.asarray(wav), batch_sharding(mesh, 3))
        mel = jax.device_put(jnp.asarray(mel), batch_sharding(mesh, 4))
        params, opt_state, loss = train_step(params, opt_state, wav, mel)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f}  ({time.time()-t0:.1f}s)")

    if args.overfit:
        wav, mel = (jnp.asarray(x) for x in fixed)
        logits = jax.jit(lambda p, w, m: model.apply(
            {"params": p, "batch_stats": batch_stats}, w[:, :, :-1], m))(params, wav, mel)
        target = F.mu_law_encoding(wav[:, :, 1:], 2**N_BITS)
        # within-1-class accuracy: mu-law quantization of a smooth waveform
        # puts many samples on steep-slope bins where the +-1 neighbour is
        # near-equiprobable; exact argmax is the wrong bar there
        err = jnp.abs(jnp.argmax(logits, axis=-1) - target)
        acc = float((err == 0).mean())
        acc1 = float((err <= 1).mean())
        print(f"overfit_gate: final_loss {float(loss):.4f}  argmax_acc {acc:.4f}  "
              f"within1_acc {acc1:.4f}")
        if float(loss) > 1.0 or acc1 < 0.9:
            raise AssertionError(
                f"memorization gate failed: loss {float(loss):.4f} (need < 1.0), "
                f"within-1-class accuracy {acc1:.4f} (need > 0.9) after {args.steps} steps")


if __name__ == "__main__":
    main()
