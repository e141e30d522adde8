"""MLP over flattened CSI windows.

Reference: benchmark/wifi_csi/model/mlp.py:23-72 — BatchNorm1d over the
flattened (3000*270) input, Linear 256 -> 128 -> out with ReLU + Dropout(0.1),
xavier-uniform weights. Trained with BCE(pos_weight=4), baseline eval mode.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import BatchNorm, Linear


class MLP(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="input_norm")(x, use_running_average=not train)
        x = Linear(256, name="layer_0")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = Linear(128, name="layer_1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = Linear(self.out_features, name="layer_2")(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return x
