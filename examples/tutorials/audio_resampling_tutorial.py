"""Resampling tutorial.

Counterpart of /root/reference/examples/tutorials/audio_resampling_tutorial.py:
demonstrates `functional.resample` / `transforms.Resample`, the
lowpass_filter_width / rolloff / window trade-offs, and measures quality as
error against an analytically resampled sweep.

    JAX_PLATFORMS=cpu python audio_resampling_tutorial.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import audio_tpu.functional as F
import audio_tpu.transforms as T


def chirp(sr, seconds=1.0, f_max=None):
    """Linear sweep 0 -> f_max (defaults to 0.9 * nyquist)."""
    f_max = f_max or 0.45 * sr
    t = np.arange(int(seconds * sr)) / sr
    phase = 2 * np.pi * (f_max / (2 * seconds)) * t**2
    return np.sin(phase).astype(np.float32)


def main():
    orig_freq, new_freq = 48000, 16000
    wav = jnp.asarray(chirp(orig_freq, f_max=6000.0))
    truth = jnp.asarray(chirp(new_freq, f_max=6000.0) * 1.0)[: wav.size * new_freq // orig_freq]

    # functional API with different kernel qualities
    for width in (6, 16, 64):
        out = F.resample(wav, orig_freq, new_freq, lowpass_filter_width=width)
        err = float(jnp.abs(out[: truth.size] - truth).mean())
        print(f"sinc width {width:3d}: mean abs err {err:.5f}")

    # kaiser window (the reference's 'kaiser_window' resampling method)
    out = F.resample(wav, orig_freq, new_freq, resampling_method="sinc_interp_kaiser", beta=14.77)
    err = float(jnp.abs(out[: truth.size] - truth).mean())
    print(f"kaiser beta 14.77: mean abs err {err:.5f}")

    # transform API precomputes the polyphase kernel once
    resampler = T.Resample(orig_freq, new_freq, lowpass_filter_width=64)
    out = resampler(wav)
    print(f"Resample transform: {wav.shape} @ {orig_freq} Hz -> {out.shape} @ {new_freq} Hz")

    # throughput: the kernel is a strided conv, so batches ride the MXU
    batch = jnp.tile(wav[None], (64, 1))
    run = jax.jit(lambda x: resampler(x))
    run(batch).block_until_ready()
    t0 = time.perf_counter()
    run(batch).block_until_ready()
    dt = time.perf_counter() - t0
    audio_s = 64 * wav.size / orig_freq
    print(f"batched resample: {audio_s / dt:.0f}x realtime over 64 streams")


if __name__ == "__main__":
    main()
