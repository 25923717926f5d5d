"""Import torchaudio-format wav2vec2/HuBERT state_dicts into flax params.

The TPU-native counterpart of the reference's checkpoint interop layer
(/root/reference/src/torchaudio/models/wav2vec2/utils/import_fairseq.py and
import_huggingface.py): the reference's published ``.pt`` state_dicts (and
anything converted to that layout) load directly into
``audio_tpu.models.Wav2Vec2Model`` parameters, so reference weights can be
used for numerical-parity testing and pipelines.

Accepts a flat ``{name: numpy array}`` mapping with torchaudio's key layout
(e.g. ``encoder.transformer.layers.0.attention.q_proj.weight``).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = ["import_torchaudio_state_dict"]


def _weight_norm_merge(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Fold torch weight_norm (dim=2) params into a plain conv weight."""
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def import_torchaudio_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Convert a torchaudio wav2vec2/HuBERT state_dict to flax params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    # --- positional conv weight norm folding ---
    pos_prefix = "encoder.transformer.pos_conv_embed.conv"
    if f"{pos_prefix}.parametrizations.weight.original0" in sd:
        g = sd.pop(f"{pos_prefix}.parametrizations.weight.original0")
        v = sd.pop(f"{pos_prefix}.parametrizations.weight.original1")
        sd[f"{pos_prefix}.weight"] = _weight_norm_merge(g, v)
    elif f"{pos_prefix}.weight_g" in sd:
        g = sd.pop(f"{pos_prefix}.weight_g")
        v = sd.pop(f"{pos_prefix}.weight_v")
        sd[f"{pos_prefix}.weight"] = _weight_norm_merge(g, v)

    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] == "feature_extractor":
            # feature_extractor.conv_layers.{i}.{conv|layer_norm}.{weight|bias}
            i = parts[2]
            mod, kind = parts[3], parts[4]
            base = ("feature_extractor", f"conv_layers_{i}", mod)
            if mod == "conv":
                if kind == "weight":  # (out, in, K) -> (K, in, out)
                    put(base + ("kernel",), value.transpose(2, 1, 0))
                else:
                    put(base + ("bias",), value)
            else:  # group/layer norm
                put(base + ("scale" if kind == "weight" else "bias",), value)
        elif parts[0] == "encoder" and parts[1] == "feature_projection":
            mod, kind = parts[2], parts[3]
            base = ("encoder", "feature_projection", mod)
            if mod == "projection":
                if kind == "weight":
                    put(base + ("kernel",), value.T)
                else:
                    put(base + ("bias",), value)
            else:
                put(base + ("scale" if kind == "weight" else "bias",), value)
        elif parts[0] == "encoder" and parts[1] == "transformer":
            if parts[2] == "pos_conv_embed":
                kind = parts[4]
                base = ("encoder", "transformer", "pos_conv_embed", "conv")
                if kind == "weight":  # (out, in/groups, K) -> (K, in/groups, out)
                    put(base + ("kernel",), value.transpose(2, 1, 0))
                else:
                    put(base + ("bias",), value)
            elif parts[2] == "layer_norm":
                put(("encoder", "transformer", "layer_norm", "scale" if parts[3] == "weight" else "bias"), value)
            elif parts[2] == "layers":
                i = parts[3]
                rest = parts[4:]
                base = ("encoder", "transformer", f"layers_{i}")
                if rest[0] == "attention":
                    proj, kind = rest[1], rest[2]
                    if kind == "weight":
                        put(base + ("attention", proj, "kernel"), value.T)
                    else:
                        put(base + ("attention", proj, "bias"), value)
                elif rest[0] == "feed_forward":
                    dense, kind = rest[1], rest[2]
                    if kind == "weight":
                        put(base + ("feed_forward", dense, "kernel"), value.T)
                    else:
                        put(base + ("feed_forward", dense, "bias"), value)
                elif rest[0] in ("layer_norm", "final_layer_norm"):
                    put(base + (rest[0], "scale" if rest[1] == "weight" else "bias"), value)
                else:
                    raise KeyError(f"Unrecognized key: {key}")
            else:
                raise KeyError(f"Unrecognized key: {key}")
        elif parts[0] == "aux":
            if parts[1] == "weight":
                put(("aux", "kernel"), value.T)
            else:
                put(("aux", "bias"), value)
        elif parts[0] == "mask_generator":
            put(("mask_generator", "mask_embedding"), value)
        elif parts[0] == "logit_generator":
            if parts[1] == "label_embeddings":
                put(("logit_generator", "label_embeddings"), value)
            elif parts[1] == "final_proj":
                if parts[2] == "weight":
                    put(("logit_generator", "final_proj", "kernel"), value.T)
                else:
                    put(("logit_generator", "final_proj", "bias"), value)
        else:
            raise KeyError(f"Unrecognized key: {key}")
    return params
