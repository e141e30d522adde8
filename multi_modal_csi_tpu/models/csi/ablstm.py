"""ABLSTM: attention-weighted bidirectional LSTM.

Reference: benchmark/wifi_csi/model/ablstm.py:23-91 — BatchNorm, AvgPool1d(8)
(3000 -> 375 steps), BiLSTM(512), per-step attention scores via
Linear(1024->1024) + LeakyReLU + softmax over TIME, attention-weighted sum of
hidden states, Dropout(0.6), Linear head; xavier linear weights.
Trained with BCE pos_weight=6.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import LSTM, BatchNorm, Linear, avg_pool1d, leaky_relu


class ABLSTM(nn.Module):
    out_features: int
    hidden: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(name="input_norm")(x, use_running_average=not train)
        x = avg_pool1d(x, 8)
        h = LSTM(self.hidden, bidirectional=True, name="bilstm")(x)   # (B, L, 2H)
        s = Linear(2 * self.hidden, name="attn")(h)
        s = leaky_relu(s)
        a = nn.softmax(s, axis=-2)          # softmax over time (dim=-2)
        t = (h * a).sum(axis=-2)
        t = nn.Dropout(0.6, deterministic=not train)(t)
        return Linear(self.out_features, name="head")(t)
