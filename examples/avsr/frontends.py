"""AVSR frontends: ResNet-18 video trunk + ResNet1D audio trunk (flax).

Shape-faithful counterparts of the reference frontends:

* ``VideoResNetFrontend``  = Conv3dResNet — Conv3D (5,7,7)/(1,2,2) stem +
  max-pool + 2D ResNet-18 [2,2,2,2] trunk + global average pool
  (/root/reference/examples/avsr/models/resnet.py:175-236, 101-166);
* ``AudioResNetFrontend``  = Conv1dResNet — Conv1D k=80 s=4 stem + 1D
  ResNet-18 trunk + 20x average pool to the 25 fps video rate
  (/root/reference/examples/avsr/models/resnet1d.py:102-233);
* ``FusionModule``         = fusion FeedForwardModule — LN -> Linear ->
  SiLU -> Dropout -> Linear -> Dropout
  (/root/reference/examples/avsr/models/fusion.py:4-36).

Deliberate TPU deviation: BatchNorm -> GroupNorm.  BatchNorm's
batch-coupled statistics need cross-replica sync and mutable state inside
the jitted step; at TPU per-chip batch sizes GroupNorm is the standard
stateless substitute (as the reference itself uses for Conformer's conv
module, torchaudio conformer.py ``use_group_norm``).  ``width`` scales all
stage widths so the smoke config stays tiny.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def _gn(x, name):
    return nn.GroupNorm(num_groups=min(32, x.shape[-1]), name=name)(x)


class BasicBlock2D(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        y = nn.swish(_gn(y, "norm1"))
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = _gn(y, "norm2")
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="downsample")(x)
            residual = _gn(residual, "downsample_norm")
        return nn.swish(y + residual)


class BasicBlock1D(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (3,), strides=(self.stride,), padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.swish(_gn(y, "norm1"))
        y = nn.Conv(self.planes, (3,), padding=1, use_bias=False, name="conv2")(y)
        y = _gn(y, "norm2")
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1,), strides=(self.stride,),
                               use_bias=False, name="downsample")(x)
            residual = _gn(residual, "downsample_norm")
        return nn.swish(y + residual)


class VideoResNetFrontend(nn.Module):
    """(B, T, H, W) grayscale lip crops -> (B, T, 8*width) embeddings."""

    width: int = 64  # reference ResNet-18: 64
    layers: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, videos, deterministic: bool = True):
        x = videos[..., None]  # (B, T, H, W, 1)
        x = nn.Conv(self.width, (5, 7, 7), strides=(1, 2, 2),
                    padding=((2, 2), (3, 3), (3, 3)), use_bias=False,
                    name="frontend3d")(x)
        x = nn.swish(_gn(x, "frontend3d_norm"))
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1)))
        b, t = x.shape[0], x.shape[1]
        x = x.reshape((b * t,) + x.shape[2:])  # fold time into batch for 2D trunk
        for stage, (n_blocks, mult) in enumerate(zip(self.layers, (1, 2, 4, 8))):
            for blk in range(n_blocks):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = BasicBlock2D(self.width * mult, stride,
                                 name=f"layer{stage + 1}_{blk}")(x)
        x = x.mean(axis=(1, 2))  # adaptive average pool to 1x1
        return x.reshape(b, t, x.shape[-1])


class AudioResNetFrontend(nn.Module):
    """(B, L) 16 kHz waveform -> (B, L//640, 8*width) at the 25 fps rate."""

    width: int = 64
    layers: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, audio, deterministic: bool = True):
        l = (audio.shape[-1] // 640) * 640
        x = audio[:, :l, None]
        x = nn.Conv(self.width, (80,), strides=(4,), padding=[(38, 38)],
                    use_bias=False, name="stem")(x)
        x = nn.swish(_gn(x, "stem_norm"))
        for stage, (n_blocks, mult) in enumerate(zip(self.layers, (1, 2, 4, 8))):
            for blk in range(n_blocks):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = BasicBlock1D(self.width * mult, stride,
                                 name=f"layer{stage + 1}_{blk}")(x)
        # total stride so far 4*2*2*2 = 32; 20x mean pool -> 640 samples/frame
        t = (x.shape[1] // 20) * 20
        x = x[:, :t].reshape(x.shape[0], t // 20, 20, x.shape[-1]).mean(axis=2)
        return x


class FusionModule(nn.Module):
    """LN -> Linear -> SiLU -> Dropout -> Linear -> Dropout (fusion.py:16-22)."""

    hidden_dim: int = 3072
    output_dim: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm(name="norm")(x)
        x = nn.silu(nn.Dense(self.hidden_dim, name="linear1")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.output_dim, name="linear2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
