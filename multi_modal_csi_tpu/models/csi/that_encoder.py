"""THAT_ENCODER: THAT-style token-sequence encoder + DETR decoder with
per-layer auxiliary heads.

Reference: benchmark/wifi_csi/model/that_encoder.py:182-482.
  - encoder (:182-310): left stream keeps the (150, 270) token sequence; the
    right stream adaptively pools time to 270 -> (270, 270) tokens with
    150-dim features... actually the right stream's AdaptiveAvgPool1d(270)
    yields (B, 270 channels, 270 bins), the Encoder treats dim -2 as tokens
    and dim -1 (=270) as features; left (B,150,270) and right (B,270,270)
    concatenate on the TOKEN axis to a (B, 420, 270) memory (:306);
  - decoder (:314-382): 6 weight-shared layers (same ModuleList-of-one-object
    as DETR), but with a PER-LAYER ModuleList of class heads plus a final
    norm + head -> [L+1, B, Q, C] (:341-380).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...nn.layers import LayerNorm, Linear, adaptive_avg_pool1d, avg_pool1d
from .detr import TransformerDecoderLayer
from .that import EncoderBlock, GaussianPosition


class THATEncoderMemory(nn.Module):
    """Two-stream token-sequence encoder -> (B, 420, 270) memory."""
    pool: int = 20
    num_left_layers: int = 4
    num_right_layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim_feature = x.shape[-1]                   # 270
        dim_left_time = x.shape[-2] // self.pool    # 150

        left = avg_pool1d(x, self.pool)             # (B, 150, 270)
        left = GaussianPosition(dim_feature, dim_left_time, name="gaussian")(left)
        for i in range(self.num_left_layers):
            left = EncoderBlock(dim_feature, 10, (1, 3, 5),
                                name=f"left_encoder_{i}")(left, train)
        left = LayerNorm(name="left_norm")(left)

        # right: adaptive-pool TIME down to `dim_feature` bins; channels
        # become tokens. The reference pools to the literal 270
        # (AdaptiveAvgPool1d(270), that_encoder.py:229) which equals its
        # feature dim — generalized here so both streams share feature size
        # and the token-axis concat below is well-defined for any input.
        right = adaptive_avg_pool1d(x, dim_feature)  # (B, F bins, F ch)
        right = right.swapaxes(-1, -2)               # (B, F ch, F bins)
        for i in range(self.num_right_layers):
            right = EncoderBlock(dim_feature, 10, (1, 2, 3),
                                 name=f"right_encoder_{i}")(right, train)
        right = LayerNorm(name="right_norm")(right)

        return jnp.concatenate([left, right], axis=1)   # (B, 420, 270)


class THATEncoderDecoder(nn.Module):
    """Decoder with per-layer aux heads -> [L+1, B, Q, C]
    (that_encoder.py:314-382)."""
    d_model: int = 270
    nhead: int = 6
    num_layers: int = 6
    num_queries: int = 5
    dim_feedforward: int = 2048
    dropout: float = 0.1
    temperature: float = 1.0
    num_classes: int = 10

    def setup(self):
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(stddev=1.0),
            (self.num_queries, self.d_model))
        self.layer = TransformerDecoderLayer(
            self.d_model, self.nhead, self.dim_feedforward, self.dropout,
            self.temperature, name="shared_layer")
        self.norm = LayerNorm(name="norm")
        self.class_heads = [Linear(self.num_classes, xavier=False,
                                   name=f"class_embed_{i}")
                            for i in range(self.num_layers + 1)]

    def __call__(self, memory, train: bool = False):
        b = memory.shape[0]
        query_pos = jnp.broadcast_to(self.query_embed[None],
                                     (b, *self.query_embed.shape))
        output = jnp.zeros_like(query_pos)
        preds = []
        kv = None       # hoist the 420-token memory K/V out of the depth
        for i in range(self.num_layers):   # loop (~31% of model FLOPs, r3)
            output, kv = self.layer(output, memory, query_pos, train,
                                    kv=kv, return_kv=True)
            preds.append(self.class_heads[i](self.norm(output)))
        preds.append(self.class_heads[-1](self.norm(output)))
        return jnp.stack(preds)                     # (L+1, B, Q, C)


class THATEncoderDETR(nn.Module):
    """Full THAT_ENCODER pipeline (that_encoder.py:458-482)."""
    temp_cross: float = 1.0
    num_queries: int = 5
    num_decoder_layers: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        memory = THATEncoderMemory(name="encoder")(x, train)
        return THATEncoderDecoder(
            d_model=memory.shape[-1],
            nhead=6, num_layers=self.num_decoder_layers,
            num_queries=self.num_queries, dim_feedforward=2048,
            temperature=self.temp_cross, name="decoder")(memory, train)
