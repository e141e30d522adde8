"""S3D video classifier (separable 3D convolutions).

Reference wrapper: benchmark/video/model/s3d.py:22-50 — torchvision ``s3d``
backbone + Linear(400 -> out) head. Full architecture natively: temporally
separable convs (spatial 1xkxk then temporal kx1x1), two stem stages, and the
Inception-v1 mixed-block stack (3b..5c) with separable 3x3 branches, ending in
a 1x1x1 conv classifier to 400 classes over the pooled features.

Layout: channels-last (B, T, H, W, C).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import BatchNorm, Linear
from .resnet3d import Conv3D


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv3D(self.features, self.kernel, self.stride, self.padding,
                   name="conv")(x)
        x = BatchNorm(momentum=0.999, epsilon=1e-3, name="bn")(
            x, use_running_average=not train)
        return nn.relu(x)


class SepConv(nn.Module):
    """Temporally separable conv: spatial (1,k,k) then temporal (k,1,1)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, (1, self.kernel, self.kernel),
                   (1, self.stride, self.stride),
                   (0, self.padding, self.padding), name="spatial")(x, train)
        x = ConvBN(self.features, (self.kernel, 1, 1), (self.stride, 1, 1),
                   (self.padding, 0, 0), name="temporal")(x, train)
        return x


def _max_pool(x, kernel, stride, padding):
    pad = [(p, p) for p in padding]
    return nn.max_pool(x, window_shape=kernel, strides=stride, padding=pad)


class MixedBlock(nn.Module):
    """Inception block with separable 3x3 branches (S3D "SepInception")."""
    b1: int; b2a: int; b2b: int; b3a: int; b3b: int; b4: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        br1 = ConvBN(self.b1, (1, 1, 1), name="branch1")(x, train)
        br2 = ConvBN(self.b2a, (1, 1, 1), name="branch2_reduce")(x, train)
        br2 = SepConv(self.b2b, name="branch2")(br2, train)
        br3 = ConvBN(self.b3a, (1, 1, 1), name="branch3_reduce")(x, train)
        br3 = SepConv(self.b3b, name="branch3")(br3, train)
        br4 = _max_pool(x, (3, 3, 3), (1, 1, 1), ((1, 1, 1)))
        br4 = ConvBN(self.b4, (1, 1, 1), name="branch4")(br4, train)
        return jnp.concatenate([br1, br2, br3, br4], axis=-1)


# Inception-v1 channel plan (mixed_3b .. mixed_5c)
MIXED_CFG = [
    (64, 96, 128, 16, 32, 32),      # 3b -> 256
    (128, 128, 192, 32, 96, 64),    # 3c -> 480
    "pool",
    (192, 96, 208, 16, 48, 64),     # 4b -> 512
    (160, 112, 224, 24, 64, 64),    # 4c -> 512
    (128, 128, 256, 24, 64, 64),    # 4d -> 512
    (112, 144, 288, 32, 64, 64),    # 4e -> 528
    (256, 160, 320, 32, 128, 128),  # 4f -> 832
    "pool2",
    (256, 160, 320, 32, 128, 128),  # 5b -> 832
    (384, 192, 384, 48, 128, 128),  # 5c -> 1024
]


class S3D(nn.Module):
    """S3D backbone + task head."""
    out_features: int
    backbone_classes: int = 400
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SepConv(64, kernel=7, stride=2, padding=3, name="stem")(x, train)
        x = _max_pool(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = ConvBN(64, (1, 1, 1), name="conv2")(x, train)
        x = SepConv(192, name="conv3")(x, train)
        x = _max_pool(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        i = 0
        for cfg in MIXED_CFG:
            if cfg == "pool":
                x = _max_pool(x, (3, 3, 3), (2, 2, 2), (1, 1, 1))
            elif cfg == "pool2":
                x = _max_pool(x, (2, 2, 2), (2, 2, 2), (0, 0, 0))
            else:
                x = MixedBlock(*cfg, name=f"mixed_{i}")(x, train)
                i += 1
        # torchvision head semantics: AvgPool3d((2,7,7), stride=1) ->
        # Dropout -> 1x1x1 conv classifier -> mean over remaining positions.
        # The sliding avg-pool weights interior frames more than a global
        # mean, so it is preserved exactly (window clipped at toy dims,
        # where torchvision's fixed (2,7,7) would not run at all).
        window = tuple(min(k, s) for k, s in zip((2, 7, 7), x.shape[1:4]))
        x = nn.avg_pool(x, window_shape=window, strides=(1, 1, 1),
                        padding="VALID")
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = Linear(self.backbone_classes, xavier=False, name="classifier")(x)
        x = jnp.mean(x, axis=(1, 2, 3))
        return Linear(self.out_features, xavier=False, name="head")(x)
