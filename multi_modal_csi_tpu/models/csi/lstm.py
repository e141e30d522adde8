"""LSTM over time-pooled CSI windows.

Reference: benchmark/wifi_csi/model/lstm.py:23-67 — BatchNorm over channels,
AvgPool1d(10) over time (3000 -> 300 steps), LSTM(hidden 512), last hidden
state, Linear head (torch-default init). Trained with BCE pos_weight=6.
"""

from __future__ import annotations

import flax.linen as nn

from ...nn.layers import LSTM, BatchNorm, Linear, avg_pool1d


class LSTMModel(nn.Module):
    out_features: int
    hidden: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="input_norm")(x, use_running_average=not train)
        x = avg_pool1d(x, 10)
        x = LSTM(self.hidden, name="lstm")(x)
        x = x[:, -1, :]
        return Linear(self.out_features, xavier=False, name="head")(x)
