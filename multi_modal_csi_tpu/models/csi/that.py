"""THAT: Two-stream Transformer for Human Activity recognition, plus all the
reference's head variants.

Reference files:
  - trunk: benchmark/wifi_csi/model/that.py:31-302 (Gaussian_Position :31-90,
    Encoder :100-170, THAT :180-302)
  - multi-head variant: model/that_multi_head.py:178-308
  - count head: model/that_count_pred.py:180-302
  - count-constrained head: model/that_count_pred_withSoftMaxConstraint.py:185-310

Design notes (TPU-first):
  - channels-last everywhere; the reference's permutes vanish;
  - the two streams are independent until the head — XLA schedules them as
    one fused graph, no manual branching needed;
  - the right stream treats the 270 subcarrier/antenna channels as tokens and
    the pooled 150 time bins as features (that.py:220-237).

One trunk module serves THAT, THAT_MULTI_HEAD, THAT_COUNT and
THAT_COUNT_CONSTRAINED via the `head` option, replacing four near-identical
500-line files in the reference.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.layers import (BatchNorm, Conv1d, LayerNorm, Linear,
                          MultiheadAttention, avg_pool1d, leaky_relu)
from ...nn.init import xavier_uniform


class GaussianPosition(nn.Module):
    """Learned mixture-of-Gaussians positional encoding (that.py:31-90).

    pdf over `num_gaussian` learned (mu, sigma) at each position, softmaxed
    and mixed with a learned embedding table.
    """
    dim_feature: int
    dim_time: int
    num_gaussian: int = 10

    @nn.compact
    def __call__(self, x):
        k, t, f = self.num_gaussian, self.dim_time, self.dim_feature
        embedding = self.param("embedding", xavier_uniform(), (k, f))
        mu = self.param("mu", lambda *_: jnp.arange(0.0, t, t / k,
                                                    dtype=jnp.float32)[None, :k], (1, k))
        sigma = self.param("sigma", lambda *_: jnp.full((1, k), 50.0), (1, k))
        position = jnp.arange(t, dtype=jnp.float32)[:, None]      # (T, 1)
        d = position - mu                                          # (T, K)
        pdf = -d * d / (2.0 * sigma * sigma) - jnp.log(sigma)
        weights = jax.nn.softmax(pdf, axis=-1)
        pos_enc = jnp.dot(weights, embedding,
                          preferred_element_type=jnp.float32)      # (T, F)
        return x + pos_enc[None, :, :]


class EncoderBlock(nn.Module):
    """THAT encoder layer (that.py:100-170): pre-LN MHA with residual, then a
    LayerNorm'd multi-scale conv bank (Conv1d+BN+Dropout+LeakyReLU per kernel
    size, averaged) with residual."""
    dim_feature: int
    num_heads: int = 10
    conv_sizes: Sequence[int] = (1, 3, 5)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = LayerNorm(name="norm_0")(x)
        t = MultiheadAttention(self.dim_feature, self.num_heads,
                               name="attn")(t, t, t, deterministic=not train)
        t = nn.Dropout(self.dropout, deterministic=not train)(t)
        t = t + x

        s = LayerNorm(name="norm_1")(t)
        branches = []
        for i, size in enumerate(self.conv_sizes):
            b = Conv1d(self.dim_feature, size, padding="SAME", xavier=False,
                       name=f"cnn_{i}")(s)
            b = BatchNorm(name=f"cnn_bn_{i}")(b, use_running_average=not train)
            b = nn.Dropout(self.dropout, deterministic=not train)(b)
            b = leaky_relu(b)
            branches.append(b)
        s = sum(branches) / len(branches)
        s = nn.Dropout(self.dropout, deterministic=not train)(s)
        return s + t


class THATTrunk(nn.Module):
    """Two-stream trunk producing the 288-dim (256 left + 32 right) feature
    (that.py:180-302)."""
    pool: int = 20
    num_left_layers: int = 4
    num_right_layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, F) = (B, 3000, 270)
        dim_feature = x.shape[-1]
        dim_right = x.shape[-2] // self.pool

        # left stream: time tokens
        left = avg_pool1d(x, self.pool)                            # (B, 150, F)
        left = GaussianPosition(dim_feature, dim_right, name="gaussian")(left)
        for i in range(self.num_left_layers):
            left = EncoderBlock(dim_feature, 10, (1, 3, 5),
                                name=f"left_encoder_{i}")(left, train)
        left = LayerNorm(name="left_norm")(left)
        l0 = leaky_relu(Conv1d(128, 8, xavier=False, name="left_cnn_0")(left))
        l1 = leaky_relu(Conv1d(128, 16, xavier=False, name="left_cnn_1")(left))
        left = jnp.concatenate([l0.sum(axis=1), l1.sum(axis=1)], axis=-1)
        left = nn.Dropout(0.5, deterministic=not train)(left)       # (B, 256)

        # right stream: channel tokens with pooled-time features
        right = avg_pool1d(x, self.pool).swapaxes(-1, -2)           # (B, 270, 150)
        for i in range(self.num_right_layers):
            right = EncoderBlock(dim_right, 10, (1, 2, 3),
                                 name=f"right_encoder_{i}")(right, train)
        right = LayerNorm(name="right_norm")(right)
        r0 = leaky_relu(Conv1d(16, 2, xavier=False, name="right_cnn_0")(right))
        r1 = leaky_relu(Conv1d(16, 4, xavier=False, name="right_cnn_1")(right))
        right = jnp.concatenate([r0.sum(axis=1), r1.sum(axis=1)], axis=-1)
        right = nn.Dropout(0.5, deterministic=not train)(right)     # (B, 32)

        return jnp.concatenate([left, right], axis=-1)              # (B, 288)


class THAT(nn.Module):
    """Single-head THAT (baseline eval mode, BCE pos_weight=4)."""
    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = THATTrunk(name="trunk")(x, train)
        return Linear(self.out_features, xavier=False, name="head")(t)


class THATMultiHead(nn.Module):
    """THAT with 5 parallel per-user heads -> (B, 5, C)
    (that_multi_head.py:178-308), trained with the permutation-matching loss."""
    out_features: int
    num_heads: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = THATTrunk(name="trunk")(x, train)
        outs = [Linear(self.out_features, xavier=False, name=f"head_{i}")(t)
                for i in range(self.num_heads)]
        return jnp.stack(outs, axis=1)


class THATCount(nn.Module):
    """THAT with a single count-regression head -> (B, 9)
    (that_count_pred.py:180-302), SmoothL1 on summed activity counts."""
    out_features: int = 9

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = THATTrunk(name="trunk")(x, train)
        return Linear(self.out_features, xavier=False, name="head")(t)


class THATCountConstrained(nn.Module):
    """THAT -> Linear(288 -> 5*10) -> per-person softmax -> summed expected
    counts (B, 10); counts sum to 5 by construction
    (that_count_pred_withSoftMaxConstraint.py:185-310)."""
    num_persons: int = 5
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        t = THATTrunk(name="trunk")(x, train)
        logits = Linear(self.num_persons * self.num_classes, xavier=False,
                        name="head")(t)
        logits = logits.reshape(-1, self.num_persons, self.num_classes)
        probs = jax.nn.softmax(logits, axis=2)
        return probs.sum(axis=1)
