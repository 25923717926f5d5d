"""MVDR beamforming tutorial.

Counterpart of /root/reference/examples/tutorials/mvdr_tutorial.py: builds
time-frequency masks for speech and noise, estimates PSD matrices, and
compares the three MVDR solutions (ref-channel Souden, RTF from eigen-
decomposition, RTF from power iteration) on a synthetic 4-mic mixture.

    JAX_PLATFORMS=cpu python mvdr_tutorial.py
"""

import jax.numpy as jnp
import numpy as np

import audio_tpu.functional as F
import audio_tpu.transforms as T

SR = 16000
N_FFT = 512
N_MIC = 4


def make_mixture(seed=0):
    """Speech = harmonic tone with per-mic delays; noise = diffuse white."""
    rng = np.random.default_rng(seed)
    t = np.arange(SR) / SR
    speech = sum(np.sin(2 * np.pi * 220 * k * t) / k for k in (1, 2, 3))
    mics = []
    for m in range(N_MIC):
        delay = m * 4  # samples
        mics.append(np.roll(speech, delay))
    speech_mc = np.stack(mics).astype(np.float32)
    noise_mc = 0.5 * rng.standard_normal(speech_mc.shape).astype(np.float32)
    return jnp.asarray(speech_mc), jnp.asarray(noise_mc)


def si_snr(est, ref):
    est, ref = est - est.mean(), ref - ref.mean()
    proj = (est * ref).sum() / (ref * ref).sum() * ref
    return float(10 * jnp.log10((proj**2).sum() / ((est - proj) ** 2).sum()))


def main():
    speech, noise = make_mixture()
    mix = speech + noise

    stft = T.Spectrogram(n_fft=N_FFT, power=None)
    specs_mix = stft(mix)        # (M, F, T) complex
    specs_speech = stft(speech)
    specs_noise = stft(noise)

    # oracle ratio masks on the reference channel, shape (F, T) — the
    # reference tutorial trains an MVDR-net; oracle masks isolate the math
    mask_s = jnp.abs(specs_speech[0]) / (
        jnp.abs(specs_speech[0]) + jnp.abs(specs_noise[0]) + 1e-8
    )
    mask_n = 1.0 - mask_s

    psd_s = F.psd(specs_mix, mask_s)
    psd_n = F.psd(specs_mix, mask_n)
    print(f"PSD matrices: {psd_s.shape}  (F, M, M)")

    ref_wav = speech[0][: mix.shape[-1]]
    results = {}

    # 1. Souden (ref-channel) solution
    w = F.mvdr_weights_souden(psd_s, psd_n, reference_channel=0)
    est = F.apply_beamforming(w, specs_mix)
    results["souden"] = T.InverseSpectrogram(n_fft=N_FFT)(est, length=mix.shape[-1])

    # 2. RTF via eigendecomposition
    rtf = F.rtf_evd(psd_s)
    w = F.mvdr_weights_rtf(rtf, psd_n, reference_channel=0)
    est = F.apply_beamforming(w, specs_mix)
    results["rtf_evd"] = T.InverseSpectrogram(n_fft=N_FFT)(est, length=mix.shape[-1])

    # 3. RTF via power iteration
    rtf = F.rtf_power(psd_s, psd_n, reference_channel=0, n_iter=3)
    w = F.mvdr_weights_rtf(rtf, psd_n, reference_channel=0)
    est = F.apply_beamforming(w, specs_mix)
    results["rtf_power"] = T.InverseSpectrogram(n_fft=N_FFT)(est, length=mix.shape[-1])

    print(f"noisy mixture   Si-SNR: {si_snr(mix[0], ref_wav):6.2f} dB")
    for name, est_wav in results.items():
        print(f"MVDR {name:>9s} Si-SNR: {si_snr(est_wav, ref_wav):6.2f} dB")

    # the stateful transform API (SoudenMVDR / RTFMVDR) wraps the same math,
    # taking precomputed PSD matrices like the reference (_multi_channel.py:407)
    souden = T.SoudenMVDR()
    est = souden(specs_mix, psd_s, psd_n, reference_channel=0)
    print(f"SoudenMVDR transform: {est.shape} (F, T) complex")


if __name__ == "__main__":
    main()
