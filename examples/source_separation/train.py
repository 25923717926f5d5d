"""ConvTasNet source-separation training (TPU-native).

Counterpart of /root/reference/examples/source_separation/ (Lightning DDP,
README.md:25): utterance-level PIT with negative SI-SNR objective
(lightning_train.py / losses), data parallel over the mesh "dp" axis.

Synthetic smoke (CPU mesh):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python train.py --synthetic --tiny --steps 2
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

from audio_tpu.models import ConvTasNet
from audio_tpu.parallel import batch_sharding, create_mesh, replicate

SAMPLE_RATE = 8000


def si_snr(estimate: jnp.ndarray, reference: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR in dB over the last axis."""
    ref = reference - reference.mean(axis=-1, keepdims=True)
    est = estimate - estimate.mean(axis=-1, keepdims=True)
    proj = (jnp.sum(est * ref, axis=-1, keepdims=True) / (jnp.sum(ref**2, axis=-1, keepdims=True) + eps)) * ref
    noise = est - proj
    return 10.0 * jnp.log10((jnp.sum(proj**2, axis=-1) + eps) / (jnp.sum(noise**2, axis=-1) + eps))


def pit_neg_si_snr(estimates: jnp.ndarray, references: jnp.ndarray) -> jnp.ndarray:
    """Permutation-invariant negative SI-SNR; (B, S, T) each. Static S!."""
    s = estimates.shape[1]
    perms = list(itertools.permutations(range(s)))
    scores = jnp.stack(
        [si_snr(estimates[:, list(p)], references).mean(axis=-1) for p in perms], axis=-1
    )  # (B, n_perms)
    return -jnp.max(scores, axis=-1).mean()


class LibriMixBatches:
    """Real Libri2Mix/Libri3Mix batches via ``audio_tpu.datasets.LibriMix``.

    Mirrors the reference dataloader
    (/root/reference/examples/source_separation/utils/dataset/utils.py):
    random fixed-duration crops (3 s default, second-aligned starts) from
    each mixture's sources; short utterances are zero-padded.  The train
    step derives the mixture as sum(sources), matching the sep_clean task.
    """

    def __init__(self, root, batch_size, num_sources, subset="train-360",
                 seconds=3.0, seed=0):
        from audio_tpu.datasets import LibriMix

        self.ds = LibriMix(root, subset=subset, num_speakers=num_sources,
                           sample_rate=SAMPLE_RATE)
        if len(self.ds) == 0:
            raise SystemExit(f"no mixtures found under {root}")
        self.batch_size = batch_size
        self.num_sources = num_sources
        self.n = int(seconds * SAMPLE_RATE)
        self.rng = np.random.default_rng(seed)

    def _crop(self, srcs):
        t = srcs[0].shape[-1]
        if t <= self.n:
            out = np.zeros((self.num_sources, self.n), np.float32)
            for i, s in enumerate(srcs):
                out[i, :t] = np.asarray(s, np.float32).reshape(-1)
            return out
        # second-aligned random start, the reference convention (utils.py:37)
        max_start_s = (t - self.n) // SAMPLE_RATE
        start = int(self.rng.integers(0, max_start_s + 1)) * SAMPLE_RATE
        return np.stack([
            np.asarray(s, np.float32).reshape(-1)[start: start + self.n] for s in srcs
        ])

    def __iter__(self):
        order = self.rng.permutation(len(self.ds))
        pos = 0
        while True:
            batch = []
            for _ in range(self.batch_size):
                if pos >= len(order):
                    order = self.rng.permutation(len(self.ds))
                    pos = 0
                _sr, _mixed, srcs = self.ds[int(order[pos])]
                pos += 1
                batch.append(self._crop(srcs))
            yield np.stack(batch)  # (B, S, T)


class SyntheticMixtures:
    """Random tone+noise source pairs; mixture = sum of sources."""

    def __init__(self, batch_size, num_sources, seconds=1.0, seed=0):
        self.batch_size = batch_size
        self.num_sources = num_sources
        self.n = int(seconds * SAMPLE_RATE)
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        t = np.arange(self.n) / SAMPLE_RATE
        while True:
            freqs = self.rng.uniform(100, 3500, (self.batch_size, self.num_sources))
            phase = self.rng.uniform(0, 2 * np.pi, freqs.shape)
            src = 0.5 * np.sin(2 * np.pi * freqs[..., None] * t + phase[..., None])
            src = src + 0.01 * self.rng.standard_normal(src.shape)
            yield src.astype(np.float32)  # (B, S, T); mixture derived in-step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--global-batch", type=int, default=8)
    p.add_argument("--num-sources", type=int, default=2)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--librimix-path", default=None,
                   help="root containing Libri{2,3}Mix/ (LibriMix corpus)")
    p.add_argument("--librimix-subset", default="train-360")
    p.add_argument("--seconds", type=float, default=3.0,
                   help="crop duration for real data (reference: 3 s)")
    p.add_argument("--overfit", action="store_true",
                   help="learning gate: train on ONE fixed batch and assert "
                        "the memorized separation improves Si-SNR over the "
                        "input mixture by > 5 dB (the reference's published "
                        "Libri2Mix Si-SNRi is 15.3 dB after 200 epochs, "
                        "conv_tasnet/README.md)")
    args = p.parse_args()

    mesh = create_mesh(tp=1)
    print(f"mesh: {mesh.shape}")

    if args.tiny:
        model = ConvTasNet(
            num_sources=args.num_sources,
            enc_kernel_size=16,
            enc_num_feats=32,
            msk_kernel_size=3,
            msk_num_feats=16,
            msk_num_hidden_feats=32,
            msk_num_layers=2,
            msk_num_stacks=2,
            msk_activate="sigmoid",
        )
    else:
        from audio_tpu.models import conv_tasnet_base

        model = conv_tasnet_base(num_sources=args.num_sources)

    if args.librimix_path:
        data = LibriMixBatches(args.librimix_path, args.global_batch,
                               args.num_sources, subset=args.librimix_subset,
                               seconds=args.seconds)
        print(f"LibriMix: {len(data.ds)} mixtures")
    elif args.synthetic:
        data = SyntheticMixtures(args.global_batch, args.num_sources)
    else:
        raise SystemExit("pass --synthetic or --librimix-path")
    src0 = next(iter(data))
    mix0 = src0.sum(axis=1, keepdims=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(mix0))["params"]
    print(f"params: {sum(x.size for x in jax.tree_util.tree_leaves(params))/1e6:.2f}M")

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(args.learning_rate))
    opt_state = tx.init(params)
    params, opt_state = jax.device_put((params, opt_state), replicate(mesh))

    def loss_fn(params, sources):
        mixture = sources.sum(axis=1, keepdims=True)
        estimates = model.apply({"params": params}, mixture)
        return pit_neg_si_snr(estimates, sources)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, sources):
        loss, grads = jax.value_and_grad(loss_fn)(params, sources)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bsh = batch_sharding(mesh, 3)
    it = iter(data)
    if args.overfit:
        fixed = next(it)
        it = itertools.repeat(fixed)  # the same batch forever
    t0 = time.time()
    for step in range(args.steps):
        sources = jax.device_put(jnp.asarray(next(it)), bsh)
        params, opt_state, loss = train_step(params, opt_state, sources)
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step}: neg-si-snr {float(loss):.4f} dB  ({time.time()-t0:.1f}s)")

    if args.overfit:
        sources = jnp.asarray(fixed)
        mixture = sources.sum(axis=1, keepdims=True)
        estimates = jax.jit(lambda p, m: model.apply({"params": p}, m))(params, mixture)
        si_est = -float(pit_neg_si_snr(estimates, sources))
        si_mix = float(si_snr(jnp.broadcast_to(mixture, sources.shape), sources).mean())
        si_snri = si_est - si_mix
        print(f"overfit_gate: si_snr {si_est:.2f} dB  mixture {si_mix:.2f} dB  "
              f"si_snri {si_snri:.2f} dB")
        if si_snri < 5.0:
            raise AssertionError(
                f"memorization gate failed: Si-SNRi {si_snri:.2f} dB < 5 dB "
                f"after {args.steps} steps")


if __name__ == "__main__":
    main()
