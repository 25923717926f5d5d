"""Wav2Letter (flax.linen).

Architecture parity with /root/reference/src/torchaudio/models/wav2letter.py:8-110:
the 11-conv acoustic stack (+ optional waveform front conv, stride 160) with
ReLU and log_softmax output.  Layout is channels-last (B, T, F) internally —
the TPU-native layout — with the torch (B, F, T) contract at the boundary.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["Wav2Letter", "import_wav2letter_state_dict"]


class Wav2Letter(nn.Module):
    num_classes: int = 40
    input_type: str = "waveform"
    num_features: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, num_features, T) -> log-probs (B, num_classes, T')."""
        x = jnp.swapaxes(x, 1, 2)  # (B, T, F) channels-last
        idx = 0

        def conv(x, out_ch, kernel, stride, pad):
            nonlocal idx
            y = nn.Conv(out_ch, (kernel,), strides=(stride,), padding=[(pad, pad)], name=f"conv_{idx}")(x)
            idx += 1
            return nn.relu(y)

        if self.input_type == "waveform":
            x = conv(x, 250, 250, 160, 45)
        elif self.input_type not in ("power_spectrum", "mfcc"):
            raise ValueError(f"Unsupported input_type {self.input_type}")
        x = conv(x, 250, 48, 2, 23)
        for _ in range(7):
            x = conv(x, 250, 7, 1, 3)
        x = conv(x, 2000, 32, 1, 16)
        x = conv(x, 2000, 1, 1, 0)
        x = conv(x, self.num_classes, 1, 1, 0)
        x = jax.nn.log_softmax(x, axis=-1)
        return jnp.swapaxes(x, 1, 2)  # (B, C, T)


def import_wav2letter_state_dict(state_dict, input_type: str = "waveform") -> Dict:
    """Convert a torchaudio Wav2Letter state_dict into flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    # torch keys: acoustic_model.<i>... nested Sequential; conv layers appear
    # in order, so map by sorted appearance.
    conv_keys = sorted(
        {k.rsplit(".", 1)[0] for k in sd if k.endswith(".weight")},
        key=lambda key: [int(p) if p.isdigit() else p for p in key.split(".")],
    )
    for i, base in enumerate(conv_keys):
        w = sd[f"{base}.weight"]  # (out, in, K)
        params[f"conv_{i}"] = {
            "kernel": w.transpose(2, 1, 0),
            "bias": sd[f"{base}.bias"],
        }
    return {"params": params}
