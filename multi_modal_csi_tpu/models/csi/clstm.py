"""CLSTM: large-kernel strided conv front-end + LSTM.

Reference: benchmark/wifi_csi/model/cnn_lstm.py:23-109 — BatchNorm, Conv1d
stages (64/k128/s8, 128/k64/s4, 256/k32/s2) each LeakyReLU + BatchNorm,
LSTM(512), last step, Dropout(0.5), Linear head; xavier conv/linear weights.
Trained with BCE pos_weight=8.
"""

from __future__ import annotations

import flax.linen as nn

from ...nn.layers import LSTM, BatchNorm, Conv1d, Linear, leaky_relu


class CLSTM(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="input_norm")(x, use_running_average=not train)
        for i, (feat, k, s) in enumerate([(64, 128, 8), (128, 64, 4), (256, 32, 2)]):
            x = Conv1d(feat, k, stride=s, name=f"conv_{i}")(x)
            x = leaky_relu(x)
            x = BatchNorm(name=f"norm_{i}")(x, use_running_average=not train)
        x = LSTM(512, name="lstm")(x)
        x = x[:, -1, :]
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return Linear(self.out_features, name="head")(x)
