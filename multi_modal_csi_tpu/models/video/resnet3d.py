"""ResNet3D-18 (r3d_18) video classifier.

Reference wrapper: benchmark/video/model/resnet.py:22-50 — torchvision
``r3d_18`` (Kinetics-400 backbone, 400-dim output) + new Linear(400 -> out)
head. This is the full architecture natively in JAX: BasicStem
(3x7x7 conv, stride (1,2,2)) and four stages of two 3x3x3 BasicBlocks
(64/128/256/512, stride-2 downsampling with 1x1x1 projection from stage 2),
global average pool, fc to 400, then the task head.

Layout: channels-last (B, T, H, W, C) — the conv3d layout XLA tiles onto the
MXU. Kinetics-pretrained init is available offline via
tools/convert_torchvision.py when a torchvision checkpoint file is present.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import BatchNorm, Linear, _ConvCore
from ...nn.init import torch_linear_weight


class Conv3D(nn.Module):
    """All ResNet3D and S3D convolutions flow through this one wrapper;
    using the shared _ConvCore (bit-identical to flax nn.Conv on the float
    path) makes both conv backbones int8-serving-hookable
    (core/quantize.py) with unchanged param trees/converters."""
    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        pad = [(p, p) for p in self.padding]
        return _ConvCore(self.features, self.kernel, strides=self.stride,
                         padding=pad, kernel_dilation=(1, 1, 1),
                         feature_group_count=1, use_bias=self.use_bias,
                         kernel_init=nn.initializers.variance_scaling(
                             2.0, "fan_out", "truncated_normal"),
                         bias_init=nn.initializers.zeros,
                         name="conv")(x)


class BasicBlock3D(nn.Module):
    features: int
    stride: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = Conv3D(self.features, (3, 3, 3), self.stride, (1, 1, 1),
                     name="conv1")(x)
        out = BatchNorm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv3D(self.features, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                     name="conv2")(out)
        out = BatchNorm(name="bn2")(out, use_running_average=not train)
        if self.stride != (1, 1, 1) or x.shape[-1] != self.features:
            identity = Conv3D(self.features, (1, 1, 1), self.stride,
                              name="downsample")(x)
            identity = BatchNorm(name="downsample_bn")(
                identity, use_running_average=not train)
        return nn.relu(out + identity)


class ResNet3D18(nn.Module):
    """r3d_18 backbone + task head (Linear(400 -> out))."""
    out_features: int
    backbone_classes: int = 400
    stage_features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, H, W, 3)
        x = Conv3D(64, (3, 7, 7), (1, 2, 2), (1, 3, 3), name="stem")(x)
        x = BatchNorm(name="stem_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        for stage, feat in enumerate(self.stage_features):
            stride = (1, 1, 1) if stage == 0 else (2, 2, 2)
            x = BasicBlock3D(feat, stride, name=f"layer{stage + 1}_0")(x, train)
            x = BasicBlock3D(feat, name=f"layer{stage + 1}_1")(x, train)
        x = jnp.mean(x, axis=(1, 2, 3))
        x = Linear(self.backbone_classes, xavier=False, name="fc")(x)
        return Linear(self.out_features, xavier=False, name="head")(x)
