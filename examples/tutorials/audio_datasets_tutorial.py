"""Audio datasets tutorial.

Counterpart of /root/reference/examples/tutorials/audio_datasets_tutorial.py:
the dataset API — construction, indexing, and metadata — demonstrated on a
mock on-disk YESNO corpus (the same pattern the unit tests use), so no
network access is needed.

    JAX_PLATFORMS=cpu python audio_datasets_tutorial.py
"""

import os
import tempfile

import numpy as np

import audio_tpu
from audio_tpu.datasets import YESNO


def fabricate_yesno(root, n=4, sr=8000):
    """Write a tiny fake YESNO corpus: <root>/waves_yesno/0_1_0_1_....wav"""
    d = os.path.join(root, "waves_yesno")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        labels = rng.integers(0, 2, 8)
        name = "_".join(map(str, labels)) + ".wav"
        wav = (0.1 * rng.standard_normal((1, sr))).astype(np.float32)
        audio_tpu.save(os.path.join(d, name), wav, sr)


def main():
    with tempfile.TemporaryDirectory() as root:
        fabricate_yesno(root)
        dataset = YESNO(root)
        print(f"YESNO: {len(dataset)} utterances")
        for i in range(min(3, len(dataset))):
            waveform, sample_rate, labels = dataset[i]
            print(f"  [{i}] waveform {np.asarray(waveform).shape} @ {sample_rate} Hz, "
                  f"labels {labels}")

    # every dataset follows the same shape; the 22 available loaders:
    import audio_tpu.datasets as D

    print("available datasets:", ", ".join(D.__all__))


if __name__ == "__main__":
    main()
