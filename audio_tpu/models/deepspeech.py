"""DeepSpeech (flax.linen).

Architecture parity with /root/reference/src/torchaudio/models/deepspeech.py:6-85:
three clipped-ReLU FC layers, one bidirectional vanilla ReLU RNN (forward +
backward sums), a fourth FC, linear output, log_softmax.  The recurrence is a
``lax.scan`` over time (the torch ``nn.RNN`` equivalent).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["DeepSpeech", "import_deepspeech_state_dict"]


class FullyConnected(nn.Module):
    n_hidden: int
    dropout: float
    relu_max_clip: int = 20

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.n_hidden, name="fc")(x)
        x = jnp.clip(nn.relu(x), 0, self.relu_max_clip)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class _ReluRNNCellParams(nn.Module):
    """One direction of a vanilla ReLU RNN: h_t = relu(W_ih x + b_ih + W_hh h + b_hh)."""

    n_hidden: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F) -> (B, T, H)
        b, t, _ = x.shape
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(), (x.shape[-1], self.n_hidden))
        b_ih = self.param("b_ih", nn.initializers.zeros, (self.n_hidden,))
        w_hh = self.param("w_hh", nn.initializers.orthogonal(), (self.n_hidden, self.n_hidden))
        b_hh = self.param("b_hh", nn.initializers.zeros, (self.n_hidden,))
        pre = x @ w_ih + b_ih  # hoist the input matmul out of the scan (MXU batch)

        def step(h, pre_t):
            h = nn.relu(pre_t + h @ w_hh + b_hh)
            return h, h

        h0 = jnp.zeros((b, self.n_hidden), x.dtype)
        _, hs = jax.lax.scan(step, h0, jnp.moveaxis(pre, 1, 0))
        return jnp.moveaxis(hs, 0, 1)


class DeepSpeech(nn.Module):
    n_feature: int
    n_hidden: int = 2048
    n_class: int = 40
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (B, C, T, F) -> log-probs (B, T, n_class)."""
        x = FullyConnected(self.n_hidden, self.dropout, name="fc1")(x, deterministic)
        x = FullyConnected(self.n_hidden, self.dropout, name="fc2")(x, deterministic)
        x = FullyConnected(self.n_hidden, self.dropout, name="fc3")(x, deterministic)
        x = x.squeeze(1)  # (B, T, H)
        fwd = _ReluRNNCellParams(self.n_hidden, name="rnn_fwd")(x)
        bwd = jnp.flip(_ReluRNNCellParams(self.n_hidden, name="rnn_bwd")(jnp.flip(x, 1)), 1)
        x = fwd + bwd
        x = FullyConnected(self.n_hidden, self.dropout, name="fc4")(x, deterministic)
        x = nn.Dense(self.n_class, name="out")(x)
        return jax.nn.log_softmax(x, axis=2)


def import_deepspeech_state_dict(state_dict) -> Dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}
    for name in ("fc1", "fc2", "fc3", "fc4"):
        params[name] = {"fc": {"kernel": sd[f"{name}.fc.weight"].T, "bias": sd[f"{name}.fc.bias"]}}
    params["rnn_fwd"] = {
        "w_ih": sd["bi_rnn.weight_ih_l0"].T,
        "b_ih": sd["bi_rnn.bias_ih_l0"],
        "w_hh": sd["bi_rnn.weight_hh_l0"].T,
        "b_hh": sd["bi_rnn.bias_hh_l0"],
    }
    params["rnn_bwd"] = {
        "w_ih": sd["bi_rnn.weight_ih_l0_reverse"].T,
        "b_ih": sd["bi_rnn.bias_ih_l0_reverse"],
        "w_hh": sd["bi_rnn.weight_hh_l0_reverse"].T,
        "b_hh": sd["bi_rnn.bias_hh_l0_reverse"],
    }
    params["out"] = {"kernel": sd["out.weight"].T, "bias": sd["out.bias"]}
    return {"params": params}
