"""Music source separation with Hybrid Demucs.

Counterpart of /root/reference/examples/tutorials/hybrid_demucs_tutorial.py:
separate a mixture into drums/bass/other/vocals with HDemucs, processing long
audio in overlapping chunks with linear cross-fade — the reference tutorial's
`separate_sources` loop.

Offline by default with a tiny random model on synthetic audio; pass
--download to run HDEMUCS_HIGH_MUSDB_PLUS on real music.

    JAX_PLATFORMS=cpu python hybrid_demucs_tutorial.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

SR = 44100
SOURCES = ["drums", "bass", "other", "vocals"]


def separate_sources(apply_fn, mix, segment=2.0, overlap=0.1, sample_rate=SR):
    """Chunked inference with linear overlap-add cross-fade.

    mix: (B, C, T). Mirrors the reference tutorial's separate_sources.
    """
    b, c, t = mix.shape
    chunk = int(sample_rate * segment)
    start, end = 0, chunk
    fade_len = int(overlap * sample_rate)
    out = jnp.zeros((b, len(SOURCES), c, t), mix.dtype)
    weight = jnp.zeros((t,), mix.dtype)
    ramp = jnp.concatenate([
        jnp.linspace(0, 1, fade_len), jnp.ones((chunk - 2 * fade_len,)),
        jnp.linspace(1, 0, fade_len),
    ])
    while start < t:
        seg = mix[:, :, start:end]
        pad = chunk - seg.shape[-1]
        if pad > 0:
            seg = jnp.pad(seg, ((0, 0), (0, 0), (0, pad)))
        est = apply_fn(seg)  # (B, 4, C, chunk)
        w = ramp[: est.shape[-1] - max(pad, 0)]
        est = est[..., : est.shape[-1] - pad] if pad > 0 else est
        out = out.at[..., start : start + est.shape[-1]].add(est * w)
        weight = weight.at[start : start + est.shape[-1]].add(w)
        start += chunk - fade_len
        end = start + chunk
    return out / jnp.maximum(weight, 1e-8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--download", action="store_true")
    p.add_argument("--seconds", type=float, default=3.0)
    args = p.parse_args()

    if args.download:
        from audio_tpu import pipelines

        bundle = pipelines.HDEMUCS_HIGH_MUSDB_PLUS
        model = bundle.get_model()
        apply_fn = jax.jit(model)
        sr = bundle.sample_rate
    else:
        from audio_tpu.models import hdemucs_low

        sr = 8000
        model = hdemucs_low(SOURCES)
        mix0 = jnp.zeros((1, 2, int(2.0 * sr)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), mix0)
        apply_fn = jax.jit(lambda x: model.apply(variables, x))

    rng = np.random.default_rng(0)
    t = np.arange(int(args.seconds * sr)) / sr
    music = (np.sin(2 * np.pi * 110 * t) + 0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.2 * rng.standard_normal(t.size))
    mix = jnp.asarray(np.stack([music, music]).astype(np.float32))[None] * 0.3

    # normalize as the reference tutorial does
    ref_std = mix.std()
    sources = separate_sources(apply_fn, mix / ref_std, segment=2.0, overlap=0.1,
                               sample_rate=sr) * ref_std

    print(f"mix {mix.shape} -> sources {sources.shape}")
    recon_err = float(jnp.abs(sources.sum(axis=1) - mix).mean())
    for i, name in enumerate(SOURCES):
        rms = float(jnp.sqrt((sources[0, i] ** 2).mean()))
        print(f"  {name:>7s}: rms {rms:.4f}")
    print(f"sum-of-sources vs mix mean abs err: {recon_err:.4f}")


if __name__ == "__main__":
    main()
