"""Dual-band CSI fusion model: one CNN_1D tower per WiFi band.

Reference: benchmark/wifi_csi/model/dual_band.py:24-57 — two CNN_1D towers
(2.4GHz / 5GHz) producing 512-dim embeddings, concatenated, fused by
Linear(1024->512), refined by three residual Linear(512) + ReLU blocks,
classified by a final Linear. Trained with BCE pos_weight=6 via its own
(x1, x2, y) loop — here the generic engine handles tuple inputs by treating
x as a stacked (B, 2, T, C) array.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import Linear
from .cnn_1d import CNN1D


class DualBandCNN(nn.Module):
    out_features: int
    embed_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, 2, T, C) — band1 = x[:, 0], band2 = x[:, 1]
        f1 = CNN1D(self.embed_dim, name="band1")(x[:, 0], train)
        f2 = CNN1D(self.embed_dim, name="band2")(x[:, 1], train)
        h = jnp.concatenate([f1, f2], axis=-1)
        h = Linear(512, xavier=False, name="combine")(h)
        for i in range(3):
            h = nn.relu(Linear(512, xavier=False, name=f"res_{i}")(h) + h)
        return Linear(self.out_features, xavier=False, name="head")(h)
