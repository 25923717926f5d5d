"""Audio feature extraction tutorial.

Counterpart of
/root/reference/examples/tutorials/audio_feature_extractions_tutorial.py:
computes Spectrogram, GriffinLim reconstruction, mel filter banks,
MelSpectrogram, MFCC, LFCC and pitch on a synthetic speech-like signal.

    JAX_PLATFORMS=cpu python audio_feature_extractions_tutorial.py
"""

import jax.numpy as jnp
import numpy as np

import audio_tpu.functional as F
import audio_tpu.transforms as T

SAMPLE_RATE = 16000


def make_speech_like(seconds=1.0, f0=110.0):
    """Harmonic series with a slow amplitude envelope — stands in for speech."""
    t = np.arange(int(seconds * SAMPLE_RATE)) / SAMPLE_RATE
    sig = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))
    return jnp.asarray((sig * env / np.abs(sig).max()).astype(np.float32))


def main():
    waveform = make_speech_like()

    # --- Spectrogram ------------------------------------------------------
    spectrogram = T.Spectrogram(n_fft=512)
    spec = spectrogram(waveform)
    print(f"Spectrogram:    {spec.shape}  (freq, time), power 2.0")

    # --- GriffinLim waveform recovery --------------------------------------
    griffin_lim = T.GriffinLim(n_fft=512, n_iter=8)
    reconstructed = griffin_lim(spec)
    n = min(reconstructed.size, waveform.size)
    err = jnp.abs(reconstructed[:n] - waveform[:n]).mean()
    print(f"GriffinLim:     {reconstructed.shape}  mean abs err {err:.3f}")

    # --- Mel filter banks ---------------------------------------------------
    fbank = F.melscale_fbanks(
        n_freqs=257, f_min=0.0, f_max=8000.0, n_mels=64,
        sample_rate=SAMPLE_RATE, norm="slaney", mel_scale="htk",
    )
    print(f"mel fbank:      {fbank.shape}  (n_freqs, n_mels)")

    # --- MelSpectrogram / MFCC / LFCC --------------------------------------
    mel = T.MelSpectrogram(sample_rate=SAMPLE_RATE, n_fft=512, n_mels=64)(waveform)
    mfcc = T.MFCC(sample_rate=SAMPLE_RATE, n_mfcc=13,
                  melkwargs={"n_fft": 512, "n_mels": 64})(waveform)
    lfcc = T.LFCC(sample_rate=SAMPLE_RATE, n_lfcc=13,
                  speckwargs={"n_fft": 512})(waveform)
    print(f"MelSpectrogram: {mel.shape}")
    print(f"MFCC:           {mfcc.shape}")
    print(f"LFCC:           {lfcc.shape}")

    # --- Pitch --------------------------------------------------------------
    pitch = F.detect_pitch_frequency(waveform[None], SAMPLE_RATE)
    voiced = pitch[0]
    print(f"pitch:          {voiced.shape}, median {float(jnp.median(voiced)):.1f} Hz "
          f"(true f0 110 Hz)")


if __name__ == "__main__":
    main()
