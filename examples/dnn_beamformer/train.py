"""DNN-MVDR beamformer training recipe (TPU-native).

Counterpart of the reference recipe at /root/reference/examples/dnn_beamformer/
(model.py:9-38: multichannel STFT -> TCN mask estimator on the log-magnitude
reference channel -> speech/noise PSD matrices -> SoudenMVDR -> iSTFT;
published L3DAS22 numbers in its README.md:41-46). The mask network here is a
flax TCN of the same shape as the Asteroid TDConvNet the reference uses, and
the loss is negative SI-SDR on the enhanced waveform (the reference combines
CI-SDR and STOI losses from external packages; SI-SDR is the same family of
scale-aware SDR objectives and keeps the recipe self-contained).

The whole step — STFT, masking, PSD, the (C, C) Hermitian solves of MVDR, the
iSTFT, and the optimizer — is one jit'd complex-valued program over the "dp"
mesh axis.

Quick synthetic smoke on a CPU mesh:

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

from audio_tpu.parallel import batch_sharding, create_mesh, replicate
from audio_tpu.transforms import PSD, InverseSpectrogram, SoudenMVDR, Spectrogram

SAMPLE_RATE = 16000


class _TCNBlock(nn.Module):
    hidden: int
    kernel: int
    dilation: int

    @nn.compact
    def __call__(self, x):  # x: (B, T, F)
        y = nn.Conv(self.hidden, (1,), name="pointwise_in")(x)
        y = nn.PReLU()(y)
        y = nn.LayerNorm(name="norm1")(y)
        pad = (self.kernel - 1) * self.dilation // 2
        y = nn.Conv(self.hidden, (self.kernel,), kernel_dilation=(self.dilation,),
                    padding=[(pad, pad)], feature_group_count=self.hidden, name="depthwise")(y)
        y = nn.PReLU()(y)
        y = nn.LayerNorm(name="norm2")(y)
        y = nn.Conv(x.shape[-1], (1,), name="pointwise_out")(y)
        return x + y


class MaskNet(nn.Module):
    """TCN speech/noise mask estimator (TDConvNet-shaped, 2 output masks)."""

    n_freq: int
    hidden: int = 256
    n_blocks: int = 8
    n_repeats: int = 2
    kernel: int = 3

    @nn.compact
    def __call__(self, logmag):  # (B, F, T) -> (B, 2, F, T)
        x = jnp.swapaxes(logmag, 1, 2)  # (B, T, F)
        x = nn.LayerNorm(name="input_norm")(x)
        x = nn.Dense(self.n_freq, name="bottleneck")(x)
        for r in range(self.n_repeats):
            for b in range(self.n_blocks):
                x = _TCNBlock(self.hidden, self.kernel, 2**b, name=f"tcn_{r}_{b}")(x)
        masks = nn.Dense(2 * self.n_freq, name="mask_out")(x)  # (B, T, 2F)
        masks = nn.relu(masks)
        masks = masks.reshape(x.shape[0], x.shape[1], 2, self.n_freq)
        return jnp.transpose(masks, (0, 2, 3, 1))  # (B, 2, F, T)


class DNNBeamformer(nn.Module):
    """STFT -> mask TCN -> PSD -> SoudenMVDR -> iSTFT (reference model.py:9-38)."""

    n_fft: int = 1024
    hop_length: int = 256
    ref_channel: int = 0
    mask_hidden: int = 256
    mask_blocks: int = 8
    mask_repeats: int = 2

    def setup(self):
        self.stft = Spectrogram(n_fft=self.n_fft, hop_length=self.hop_length, power=None)
        self.istft = InverseSpectrogram(n_fft=self.n_fft, hop_length=self.hop_length)
        self.mask_net = MaskNet(
            self.n_fft // 2 + 1, hidden=self.mask_hidden,
            n_blocks=self.mask_blocks, n_repeats=self.mask_repeats, name="mask_net",
        )
        self.psd = PSD()
        self.beamformer = SoudenMVDR()

    def __call__(self, mixture):  # (B, C, L) -> (B, L)
        spectrum = self.stft(mixture)  # (B, C, F, T) complex
        input_feature = jnp.log(jnp.abs(spectrum[:, self.ref_channel]) + 1e-8)
        mask = self.mask_net(input_feature)  # (B, 2, F, T)
        psd_speech = self.psd(spectrum, mask[:, 0])
        psd_noise = self.psd(spectrum, mask[:, 1])
        enhanced_stft = self.beamformer(spectrum, psd_speech, psd_noise, self.ref_channel)
        return self.istft(enhanced_stft, length=mixture.shape[-1])


def si_sdr_loss(estimate, clean, eps=1e-8):
    """Negative scale-invariant SDR, mean over batch."""
    estimate = estimate - estimate.mean(axis=-1, keepdims=True)
    clean = clean - clean.mean(axis=-1, keepdims=True)
    alpha = (estimate * clean).sum(-1, keepdims=True) / (
        jnp.square(clean).sum(-1, keepdims=True) + eps
    )
    target = alpha * clean
    noise = estimate - target
    ratio = jnp.square(target).sum(-1) / (jnp.square(noise).sum(-1) + eps)
    return -10.0 * jnp.log10(ratio + eps).mean()


class L3DAS22Batches:
    """Real L3DAS22 Task-1 batches (ambisonic A+B mic pairs -> clean target).

    Mirrors the reference datamodule
    (/root/reference/examples/dnn_beamformer/datamodule.py:22-57): walks
    ``<root>/L3DAS22_Task1_<sub>/data/*_A.wav``, stacks the A and B
    4-channel mics into an 8-channel mixture, pairs it with
    ``labels/<utt>.wav``, filters clips shorter than ``min_len`` and crops
    everything to a common ``seconds`` window.
    """

    _SUBSETS = {"train360": ["train360_1", "train360_2"],
                "train100": ["train100"], "dev": ["dev"], "test": ["test"]}

    def __init__(self, root, batch_size, subset="train360", seconds=4.0,
                 min_len=64000, seed=0):
        import pathlib

        import audio_tpu

        if subset not in self._SUBSETS:
            raise ValueError(f"subset must be one of {sorted(self._SUBSETS)}")
        self.files = []
        for sub in self._SUBSETS[subset]:
            path = pathlib.Path(root) / f"L3DAS22_Task1_{sub}" / "data"
            found = [str(p) for p in path.glob("*_A.wav")
                     if audio_tpu.info(str(p)).num_frames >= min_len]
            self.files += found
        if not self.files:
            raise SystemExit(f"no *_A.wav clips >= {min_len} samples under {root}")
        self.batch_size = batch_size
        self.n = int(seconds * SAMPLE_RATE)
        self.min_len = min_len
        self.rng = np.random.default_rng(seed)

    def _load(self, path_a):
        import os

        import audio_tpu

        a, sr = audio_tpu.load(path_a)
        b, _ = audio_tpu.load(path_a.replace("_A.wav", "_B.wav"))
        clean_path = os.path.join(os.path.dirname(os.path.dirname(path_a)), "labels",
                                  os.path.basename(path_a).replace("_A.wav", ".wav"))
        clean, _ = audio_tpu.load(clean_path)
        assert sr == SAMPLE_RATE, sr
        mix = np.concatenate([np.asarray(a, np.float32), np.asarray(b, np.float32)])
        clean = np.asarray(clean, np.float32).reshape(-1)
        n = min(self.n, mix.shape[-1], clean.shape[-1])
        out_mix = np.zeros((mix.shape[0], self.n), np.float32)
        out_clean = np.zeros((self.n,), np.float32)
        out_mix[:, :n] = mix[:, :n]
        out_clean[:n] = clean[:n]
        return out_mix, out_clean

    def __iter__(self):
        pos, order = 0, self.rng.permutation(len(self.files))
        while True:
            mixes, cleans = [], []
            for _ in range(self.batch_size):
                if pos >= len(order):
                    pos, order = 0, self.rng.permutation(len(self.files))
                m, c = self._load(self.files[int(order[pos])])
                pos += 1
                mixes.append(m)
                cleans.append(c)
            yield np.stack(mixes), np.stack(cleans)


class SyntheticBatches:
    """Clean speech-band noise + directional interference over C channels."""

    def __init__(self, batch_size, n_channels=4, seconds=1.0, seed=0):
        self.batch_size, self.n_channels = batch_size, n_channels
        self.length = int(seconds * SAMPLE_RATE)
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        while True:
            b, c, l = self.batch_size, self.n_channels, self.length
            clean = 0.3 * self.rng.standard_normal((b, l)).astype(np.float32)
            # per-channel delayed copies + diffuse noise
            mix = np.stack(
                [np.roll(clean, shift, axis=1) for shift in range(c)], axis=1
            ) + 0.1 * self.rng.standard_normal((b, c, l)).astype(np.float32)
            yield mix.astype(np.float32), clean

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=1e-8)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--l3das22-path", default=None,
                   help="root containing L3DAS22_Task1_*/ (the reference corpus)")
    p.add_argument("--l3das22-subset", default="train360",
                   choices=["train360", "train100", "dev", "test"])
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--min-len", type=int, default=64000)
    p.add_argument("--overfit", action="store_true",
                   help="learning gate: train on ONE fixed batch and assert "
                        "the memorized beamformer output gains > 3 dB SI-SDR "
                        "over the reference channel (the reference's "
                        "published L3DAS22 Ci-SDR is 19.0 dB, "
                        "dnn_beamformer/README.md:41-46)")
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    print(f"mesh: {mesh.shape}, devices: {len(jax.devices())}")

    if args.l3das22_path:
        data = L3DAS22Batches(args.l3das22_path, args.global_batch,
                              subset=args.l3das22_subset, seconds=args.seconds,
                              min_len=args.min_len)
        print(f"L3DAS22: {len(data.files)} clips")
    elif args.synthetic:
        data = SyntheticBatches(args.global_batch)
    else:
        raise SystemExit("pass --synthetic or --l3das22-path")
    if args.tiny:
        model = DNNBeamformer(n_fft=128, hop_length=64, mask_hidden=16,
                              mask_blocks=2, mask_repeats=1)
    else:
        model = DNNBeamformer()

    mix0, clean0 = next(iter(data))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mix0))["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.2f}M")

    tx = optax.adamw(args.learning_rate, weight_decay=args.weight_decay)
    opt_state = tx.init(params)
    rep = replicate(mesh)
    params, opt_state = jax.device_put((params, opt_state), rep)

    def loss_fn(params, mix, clean):
        est = model.apply({"params": params}, mix)
        return si_sdr_loss(est, clean)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, mix, clean):
        loss, grads = jax.value_and_grad(loss_fn)(params, mix, clean)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    it = iter(data)
    if args.overfit:
        fixed = next(it)
        it = itertools.repeat(fixed)  # the same batch forever
    t0 = time.time()
    for step in range(args.steps):
        mix, clean = next(it)
        mix = jax.device_put(jnp.asarray(mix), batch_sharding(mesh, 3))
        clean = jax.device_put(jnp.asarray(clean), batch_sharding(mesh, 2))
        params, opt_state, loss = train_step(params, opt_state, mix, clean)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: neg-SI-SDR {float(loss):.4f} dB  ({time.time()-t0:.1f}s)")

    if args.overfit:
        mix, clean = (jnp.asarray(x) for x in fixed)
        est = jax.jit(lambda p, m: model.apply({"params": p}, m))(params, mix)
        sdr_est = -float(si_sdr_loss(est, clean))
        sdr_ref = -float(si_sdr_loss(mix[:, 0], clean))
        gain = sdr_est - sdr_ref
        print(f"overfit_gate: si_sdr {sdr_est:.2f} dB  ref-channel {sdr_ref:.2f} dB  "
              f"gain {gain:.2f} dB")
        if gain < 3.0:
            raise AssertionError(
                f"memorization gate failed: SI-SDR gain {gain:.2f} dB < 3 dB "
                f"after {args.steps} steps")


if __name__ == "__main__":
    main()
