"""HuBERT pseudo-label preprocessing: MFCC features + k-means units.

Counterpart of /root/reference/examples/hubert/preprocess.py (which shells out
to sklearn MiniBatchKMeans over dumped MFCC features, README.md:12-48): here
feature extraction AND Lloyd's k-means both run as jitted JAX programs, so the
labeling pass can use the same TPU the pretraining uses.

Usage (synthetic smoke):

    python preprocess.py --synthetic --num-clusters 20 --out labels.npz
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_tpu.transforms import MFCC

SAMPLE_RATE = 16000
HOP = 160  # 10 ms, matching HuBERT's 100 Hz label rate before 320x reduction


def mfcc_features(waveforms: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, frames, 39): MFCC + delta + delta-delta, like the reference."""
    import audio_tpu.functional as F

    mfcc = MFCC(
        sample_rate=SAMPLE_RATE,
        n_mfcc=13,
        melkwargs={"n_fft": 400, "hop_length": HOP, "n_mels": 40},
    )(waveforms)  # (B, n_mfcc, frames)
    d1 = F.compute_deltas(mfcc)
    d2 = F.compute_deltas(d1)
    return jnp.swapaxes(jnp.concatenate([mfcc, d1, d2], axis=-2), -1, -2)


@functools.partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def kmeans_fit(feats: jnp.ndarray, key, num_clusters: int, num_iters: int = 20):
    """Lloyd's k-means over (N, D) features; returns (centroids, labels).

    Distance matrix N x K is a single matmul per iteration (MXU-friendly):
    ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2.
    """
    n = feats.shape[0]
    init_idx = jax.random.choice(key, n, (num_clusters,), replace=False)
    centroids = feats[init_idx]
    x_sq = jnp.sum(feats**2, axis=1, keepdims=True)

    def assign(centroids):
        d = x_sq - 2.0 * feats @ centroids.T + jnp.sum(centroids**2, axis=1)[None]
        return jnp.argmin(d, axis=1)

    def step(centroids, _):
        labels = assign(centroids)
        one_hot = jax.nn.one_hot(labels, num_clusters, dtype=feats.dtype)  # (N, K)
        counts = one_hot.sum(axis=0)
        sums = one_hot.T @ feats
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=num_iters)
    return centroids, assign(centroids)


def kmeans_predict(feats: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    d = (
        jnp.sum(feats**2, axis=1, keepdims=True)
        - 2.0 * feats @ centroids.T
        + jnp.sum(centroids**2, axis=1)[None]
    )
    return jnp.argmin(d, axis=1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--librispeech-path", default=None,
                   help="root containing LibriSpeech/ — real MFCC features "
                        "for the k-means units (reference preprocess.py "
                        "dumps train-clean-100 MFCCs)")
    p.add_argument("--librispeech-url", default="train-clean-100")
    p.add_argument("--max-utterances", type=int, default=1000,
                   help="cap on real utterances fed to k-means")
    p.add_argument("--num-utterances", type=int, default=16)
    p.add_argument("--audio-seconds", type=float, default=2.0)
    p.add_argument("--num-clusters", type=int, default=100)
    p.add_argument("--kmeans-iters", type=int, default=20)
    p.add_argument("--out", default="labels.npz")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    paths = None
    if args.librispeech_path:
        from audio_tpu.datasets import LIBRISPEECH

        ds = LIBRISPEECH(args.librispeech_path, url=args.librispeech_url)
        idx = rng.permutation(len(ds))[: args.max_utterances]
        paths = [ds.get_metadata(int(i))[0] for i in idx]
        # pad each utterance to the batch max (frames from padding are
        # still real MFCC rows of silence; k-means tolerates them, and the
        # labels are trimmed per utterance below)
        wav_list = []
        for i in idx:
            w = np.asarray(ds[int(i)][0], np.float32).reshape(-1)
            wav_list.append(w)
        n_samp = max(w.shape[-1] for w in wav_list)
        wavs = np.zeros((len(wav_list), n_samp), np.float32)
        for j, w in enumerate(wav_list):
            wavs[j, : w.shape[-1]] = w
        print(f"LibriSpeech: {len(wav_list)} utterances, max {n_samp} samples")
    elif args.synthetic:
        n_samp = int(args.audio_seconds * SAMPLE_RATE)
        wavs = (0.1 * rng.standard_normal((args.num_utterances, n_samp))).astype(np.float32)
    else:
        raise SystemExit("pass --synthetic or --librispeech-path")

    feats = mfcc_features(jnp.asarray(wavs))  # (B, frames, 39)
    b, t, d = feats.shape
    flat = feats.reshape(-1, d)
    centroids, labels = kmeans_fit(flat, jax.random.PRNGKey(0), args.num_clusters, args.kmeans_iters)
    labels = np.asarray(labels).reshape(b, t)
    extra = {}
    if paths is not None:
        # relpaths (vs the dataset archive root) so pretrain.py can pair
        # each label row with its real audio
        extra = {"paths": np.asarray(paths), "url": args.librispeech_url}
    np.savez(args.out, labels=labels, centroids=np.asarray(centroids), **extra)
    print(f"wrote {args.out}: labels {labels.shape}, {args.num_clusters} clusters, "
          f"occupancy {len(np.unique(labels))}/{args.num_clusters}")


if __name__ == "__main__":
    main()
