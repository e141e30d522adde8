"""DETR-style multi-user set prediction over CSI windows — the flagship.

Reference: benchmark/wifi_csi/model/detr.py:185-494.
  - CNNFeatureExtractor (:253-288): depthwise-separable conv k7 -> MaxPool/3
    -> 4 dilated conv blocks (d=1,2,4,8) -> strided conv down to
    `token_length` tokens;
  - Transformer_Encoder (:291-330): Gaussian positional encoding + 4 THAT
    encoder layers applied with an EXTRA outer residual (x = x + layer(x),
    :325-326) -> LayerNorm;
  - TransformerDecoder (:332-442): `num_decoder_layers` applications of ONE
    decoder layer instance — the reference's ModuleList holds the same object
    repeatedly (:350-352), i.e. the layers are WEIGHT-SHARED. Zero-initialized
    targets, learned query embeddings added to the cross-attention queries
    only, temperature scaling applied to the cross-attention OUTPUT
    (:445-464), a per-layer shared classification head, outputs stacked to
    [L, B, Q, C].

All torch-default initializations (this file never calls xavier_uniform_
except inside Gaussian_Position / MultiheadAttention, reproduced in nn/).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import (BatchNorm, Conv1d, LayerNorm, Linear,
                          MultiheadAttention)
from .that import EncoderBlock, GaussianPosition


class DepthwiseSeparableConv(nn.Module):
    """Depthwise k-wide conv + pointwise 1x1 (detr.py:185-196), no activation."""
    features: int
    kernel_size: int
    padding: int

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        x = Conv1d(channels, self.kernel_size, padding=self.padding,
                   feature_group_count=channels, xavier=False,
                   name="depthwise")(x)
        x = Conv1d(self.features, 1, xavier=False, name="pointwise")(x)
        return x


class DilatedConvBlock(nn.Module):
    """k3 dilated conv + BatchNorm + ReLU (detr.py:199-212)."""
    features: int
    dilation: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv1d(self.features, 3, padding=self.dilation,
                   dilation=self.dilation, xavier=False, name="conv")(x)
        x = BatchNorm(name="bn")(x, use_running_average=not train)
        return nn.relu(x)


class CNNFeatureExtractor(nn.Module):
    """(B, 3000, C) -> (B, token_length, C) token sequence (detr.py:253-288)."""
    token_length: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        channels = x.shape[-1]
        x = DepthwiseSeparableConv(channels, 7, 3, name="initial_conv")(x)
        x = nn.max_pool(x, window_shape=(3,), strides=(3,), padding="VALID")
        for i, d in enumerate([1, 2, 4, 8]):
            x = DilatedConvBlock(channels, d, name=f"dilated_{i}")(x, train)
        k = x.shape[1] // self.token_length        # 1000 // token_length
        x = Conv1d(channels, k, stride=k, xavier=False, name="final_conv")(x)
        return x


class TransformerEncoder(nn.Module):
    """Gaussian position + 4 encoder layers with outer residual + LayerNorm
    (detr.py:291-330)."""
    num_layers: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim_feature, dim_time = x.shape[-1], x.shape[-2]
        x = GaussianPosition(dim_feature, dim_time, name="gaussian")(x)
        for i in range(self.num_layers):
            # NOTE the double residual: the block already ends with its own
            # residual, and the encoder adds x again (detr.py:325-326)
            x = x + EncoderBlock(dim_feature, 10, (1,),
                                 name=f"encoder_{i}")(x, train)
        return LayerNorm(name="norm")(x)


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer (detr.py:393-442): self-attn (no positional
    queries), temperature cross-attn with query_pos added to queries, FFN."""
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    temperature: float = 1.0

    @nn.compact
    def __call__(self, tgt, memory, query_pos, train: bool = False,
                 kv=None, return_kv: bool = False):
        det = not train
        t2 = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                name="self_attn")(tgt, tgt, tgt, deterministic=det)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=det)(t2)
        tgt = LayerNorm(name="norm1")(tgt)

        # kv: hoisted memory K/V projection for weight-shared stacks — the
        # shared layer would otherwise re-project the SAME memory with the
        # SAME weights every depth iteration (nn/layers.py MHA docstring)
        t2, kv = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                    output_scale=self.temperature,
                                    name="cross_attn")(tgt + query_pos, memory,
                                                       memory, deterministic=det,
                                                       kv=kv, return_kv=True)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=det)(t2)
        tgt = LayerNorm(name="norm2")(tgt)

        t2 = Linear(self.dim_feedforward, xavier=False, name="ffn_up")(tgt)
        t2 = nn.relu(t2)
        t2 = nn.Dropout(self.dropout, deterministic=det)(t2)
        t2 = Linear(self.d_model, xavier=False, name="ffn_down")(t2)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=det)(t2)
        tgt = LayerNorm(name="norm3")(tgt)
        if return_kv:
            return tgt, kv
        return tgt


class TransformerDecoder(nn.Module):
    """Weight-shared decoder stack with per-layer class predictions
    (detr.py:332-390): one layer's parameters applied `num_layers` times, one
    shared class head, outputs stacked [L, B, Q, C]."""
    d_model: int = 270
    nhead: int = 6
    num_layers: int = 6
    num_queries: int = 5
    dim_feedforward: int = 512
    dropout: float = 0.1
    temperature: float = 1.0
    num_classes: int = 10

    def setup(self):
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(stddev=1.0),
            (self.num_queries, self.d_model))
        # ONE layer instance == shared weights across depth, exactly the
        # reference's ModuleList-of-the-same-object construction
        self.layer = TransformerDecoderLayer(
            self.d_model, self.nhead, self.dim_feedforward, self.dropout,
            self.temperature, name="shared_layer")
        self.class_embed = Linear(self.num_classes, xavier=False,
                                  name="class_embed")

    def __call__(self, memory, train: bool = False):
        b = memory.shape[0]
        query_pos = jnp.broadcast_to(self.query_embed[None],
                                     (b, *self.query_embed.shape))
        output = jnp.zeros_like(query_pos)
        preds = []
        kv = None
        for _ in range(self.num_layers):
            output, kv = self.layer(output, memory, query_pos, train,
                                    kv=kv, return_kv=True)
            preds.append(self.class_embed(output))
        return jnp.stack(preds)          # (L, B, Q, C)


class DETRMultiUser(nn.Module):
    """Full DETR pipeline (detr.py:467-494)."""
    token_length: int = 10
    num_decoder_layers: int = 6
    temp_cross: float = 1.0
    num_queries: int = 5
    dim_feedforward: int = 512
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        tokens = CNNFeatureExtractor(self.token_length,
                                     name="feature_extractor")(x, train)
        memory = TransformerEncoder(name="encoder")(tokens, train)
        return TransformerDecoder(
            d_model=memory.shape[-1], nhead=6,
            num_layers=self.num_decoder_layers,
            num_queries=self.num_queries,
            dim_feedforward=self.dim_feedforward,
            temperature=self.temp_cross,
            num_classes=self.num_classes,
            name="decoder")(memory, train)
