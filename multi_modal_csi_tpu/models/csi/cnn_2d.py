"""CNN-2D treating the CSI window as a 1-channel (time x feature) image.

Reference: benchmark/wifi_csi/model/cnn_2d.py:23-99 — per-stage BatchNorm2d,
Conv2d stages (32/k27/s7, 64/k15/s3, 128/k7/s1), LeakyReLU + Dropout(0.2),
global mean pool, Linear head; xavier weights. Trained with BCE pos_weight=6.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import BatchNorm, Conv2d, Linear, leaky_relu


class CNN2D(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (B, T, F) -> (B, T, F, 1): NHWC with one input channel
        if x.ndim == 3:
            x = x[..., None]
        stages = [(32, (27, 27), (7, 7)), (64, (15, 15), (3, 3)),
                  (128, (7, 7), (1, 1))]
        for i, (feat, k, s) in enumerate(stages):
            x = BatchNorm(name=f"norm_{i}")(x, use_running_average=not train)
            x = Conv2d(feat, k, stride=s, name=f"conv_{i}")(x)
            x = leaky_relu(x)
            x = nn.Dropout(0.2, deterministic=not train)(x)
        x = BatchNorm(name="norm_3")(x, use_running_average=not train)
        x = jnp.mean(x, axis=(1, 2))
        return Linear(self.out_features, name="head")(x)
