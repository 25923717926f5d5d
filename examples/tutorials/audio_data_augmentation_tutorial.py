"""Audio data augmentation tutorial.

Counterpart of
/root/reference/examples/tutorials/audio_data_augmentation_tutorial.py:
applies filter effects (lowpass biquad chains via `lfilter`), simulates room
reverberation by convolving with a synthetic RIR (`fftconvolve`), and adds
background noise at chosen SNRs (`add_noise`).

    JAX_PLATFORMS=cpu python audio_data_augmentation_tutorial.py
"""

import jax.numpy as jnp
import numpy as np

import audio_tpu.functional as F

SAMPLE_RATE = 16000


def main():
    rng = np.random.default_rng(0)
    t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
    speech = jnp.asarray(np.sin(2 * np.pi * 440 * t).astype(np.float32))[None]

    # --- effects: lowpass, highpass + gain chain -----------------------------
    low = F.lowpass_biquad(speech, SAMPLE_RATE, cutoff_freq=300.0)
    print(f"lowpass 300 Hz:  out rms {float(jnp.sqrt((low**2).mean())):.3f} "
          f"(in rms {float(jnp.sqrt((speech**2).mean())):.3f})")

    chained = F.gain(F.highpass_biquad(speech, SAMPLE_RATE, cutoff_freq=200.0), 3.0)
    print(f"highpass+gain:   out rms {float(jnp.sqrt((chained**2).mean())):.3f}")

    # speed perturbation (resample-based, changes duration and pitch)
    fast, new_len = F.speed(speech, SAMPLE_RATE, factor=1.1,
                            lengths=jnp.asarray([speech.shape[-1]]))
    print(f"speed 1.1x:      {speech.shape[-1]} -> {int(new_len[0])} samples")

    # --- room simulation: convolve with an exponentially decaying RIR --------
    rir_len = int(0.25 * SAMPLE_RATE)
    rir = rng.standard_normal(rir_len) * np.exp(-6.0 * np.arange(rir_len) / rir_len)
    rir = jnp.asarray((rir / np.abs(rir).sum()).astype(np.float32))[None]
    reverberant = F.fftconvolve(speech, rir, mode="full")
    print(f"reverb:          {speech.shape} * RIR {rir.shape} -> {reverberant.shape}")

    # --- additive noise at exact SNRs ----------------------------------------
    noise = jnp.asarray(rng.standard_normal(speech.shape).astype(np.float32))
    for snr_db in (20.0, 10.0, 3.0):
        noisy = F.add_noise(speech, noise, jnp.asarray([snr_db]))
        sig_p = float((speech**2).mean())
        noise_p = float(((noisy - speech) ** 2).mean())
        print(f"add_noise {snr_db:4.1f} dB: measured SNR "
              f"{10 * np.log10(sig_p / noise_p):.2f} dB")


if __name__ == "__main__":
    main()
