"""CNN-1D over CSI windows.

Reference: benchmark/wifi_csi/model/cnn_1d.py:23-98 — BatchNorm over channels,
three strided Conv1d stages (128/k29/s13, 256/k15/s7, 512/k3/s1) with ReLU +
Dropout(0.2), global mean over time, Linear head; xavier-uniform weights.
Channels-last here: convs run on (B, T, C), no permutes.
"""

from __future__ import annotations

import flax.linen as nn

from ...nn.layers import BatchNorm, Conv1d, Linear


class CNN1D(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="input_norm")(x, use_running_average=not train)
        for i, (feat, k, s) in enumerate([(128, 29, 13), (256, 15, 7), (512, 3, 1)]):
            x = Conv1d(feat, k, stride=s, name=f"conv_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(0.2, deterministic=not train)(x)
        x = x.mean(axis=1)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        return Linear(self.out_features, name="head")(x)
