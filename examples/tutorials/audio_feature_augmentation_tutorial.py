"""Feature augmentation (SpecAugment) tutorial.

Counterpart of
/root/reference/examples/tutorials/audio_feature_augmentation_tutorial.py:
applies TimeStretch, TimeMasking and FrequencyMasking to a complex
spectrogram / mel features — the SpecAugment recipe.

    JAX_PLATFORMS=cpu python audio_feature_augmentation_tutorial.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import audio_tpu.transforms as T

SAMPLE_RATE = 16000


def main():
    rng = np.random.default_rng(7)
    t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
    wav = jnp.asarray(np.sin(2 * np.pi * 440 * t).astype(np.float32))

    # complex spectrogram for TimeStretch (phase vocoder needs phase)
    spec_c = T.Spectrogram(n_fft=400, power=None)(wav)
    print(f"complex spec: {spec_c.shape} {spec_c.dtype}")

    for rate in (0.9, 1.2):
        stretched = T.TimeStretch(hop_length=200, n_freq=201, fixed_rate=rate)(spec_c)
        print(f"TimeStretch {rate}: {spec_c.shape} -> {stretched.shape}")

    # magnitude spectrogram for masking
    spec = jnp.abs(spec_c) ** 2
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    masked_t = T.TimeMasking(time_mask_param=40)(spec[None], key=k1)
    masked_f = T.FrequencyMasking(freq_mask_param=30)(spec[None], key=k2)
    zero_t = int((masked_t == 0).sum() - (spec == 0).sum())
    zero_f = int((masked_f == 0).sum() - (spec == 0).sum())
    print(f"TimeMasking:      zeroed {zero_t} cells")
    print(f"FrequencyMasking: zeroed {zero_f} cells")

    # the combined SpecAugment transform used by the ASR recipes
    aug = T.SpecAugment(n_time_masks=2, time_mask_param=40,
                        n_freq_masks=2, freq_mask_param=30, zero_masking=True)
    out = aug(spec[None], key=k3)
    print(f"SpecAugment: {out.shape}, zeroed {int((out == 0).sum() - (spec == 0).sum())} cells")


if __name__ == "__main__":
    main()
