"""Speech quality and intelligibility measurement (SQUIM) tutorial.

Counterpart of /root/reference/examples/tutorials/squim_tutorial.py:
reference-free estimation of STOI/PESQ/SI-SDR with the objective model and
MOS with the subjective model (which consumes a non-matching reference),
evaluated on clean vs noise-corrupted speech.

Offline by default with tiny random models (shows shapes/API); pass
--download to use the pretrained SQUIM bundles.

    JAX_PLATFORMS=cpu python squim_tutorial.py
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import audio_tpu.functional as F

SR = 16000


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--download", action="store_true")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    t = np.arange(SR) / SR
    clean = jnp.asarray(np.sin(2 * np.pi * 220 * t).astype(np.float32))[None]
    noise = jnp.asarray(rng.standard_normal((1, SR)).astype(np.float32))
    noisy = F.add_noise(clean, noise, jnp.asarray([3.0]))
    nmr = jnp.asarray(np.sin(2 * np.pi * 330 * t).astype(np.float32))[None]

    if args.download:
        from audio_tpu import pipelines

        obj = pipelines.SQUIM_OBJECTIVE.get_model()
        subj = pipelines.SQUIM_SUBJECTIVE.get_model()
        obj_fn = jax.jit(obj)
        subj_fn = jax.jit(subj)
    else:
        from audio_tpu.models import squim_objective_base, squim_subjective_base

        obj_m = squim_objective_base()
        subj_m = squim_subjective_base()
        vo = obj_m.init(jax.random.PRNGKey(0), clean)
        vs = subj_m.init(jax.random.PRNGKey(1), clean, nmr)
        obj_fn = jax.jit(lambda x: obj_m.apply(vo, x))
        subj_fn = jax.jit(lambda x, r: subj_m.apply(vs, x, r))

    for name, wav in (("clean", clean), ("noisy @3dB SNR", noisy)):
        stoi, pesq, si_sdr = obj_fn(wav)
        print(f"{name:>14s}: STOI {float(stoi[0]):.3f}  PESQ {float(pesq[0]):.3f}  "
              f"SI-SDR {float(si_sdr[0]):.2f} dB")

    mos = subj_fn(noisy, nmr)
    print(f"subjective MOS (non-matching reference): {float(mos[0]):.3f}")


if __name__ == "__main__":
    main()
