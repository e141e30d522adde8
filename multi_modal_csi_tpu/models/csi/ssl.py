"""SimCLR-style self-supervised model over CSI windows.

Reference: benchmark/wifi_csi/model/SSL_model.py:28-274.
  - backbone: the CNN_1D trunk with a 512-dim projection output (:28-105);
  - projector: Linear(512->256, no bias) + BN + ReLU + Linear(256->256, no
    bias) + BN (:139-146);
  - loss: bidirectional InfoNCE (temperature 0.1) over L2-normalized
    projections + BCE of a gradient-detached online head (:106-166);
  - the reference's cross-worker `gather_from_all` is DISABLED in torch
    (:395-414, `if False:`); here it is a REAL all-gather over the 'data'
    mesh axis when run under shard_map (parallel/collectives.py), restoring
    the published intent.

Augmentations (TimeSeriesTransform, :171-246) are reimplemented in-graph with
jax.random: per-view probabilistic jitter / elementwise scale / time-segment
masking.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...losses.basic import bce_with_logits
from ...nn.layers import BatchNorm, Linear
from ...parallel.collectives import gather_from_all
from .cnn_1d import CNN1D


class SSLModel(nn.Module):
    """Backbone + projector + online head. Returns (z1, z2, logits) in train
    composition, or logits in inference (`encode_only`)."""
    out_features: int
    embed_dim: int = 512
    proj_dim: int = 256

    def setup(self):
        self.backbone = CNN1D(self.embed_dim, name="backbone")
        self.proj_1 = Linear(self.proj_dim, use_bias=False, xavier=False,
                             name="proj_1")
        self.proj_bn_1 = BatchNorm(name="proj_bn_1")
        self.proj_2 = Linear(self.proj_dim, use_bias=False, xavier=False,
                             name="proj_2")
        self.proj_bn_2 = BatchNorm(name="proj_bn_2")
        self.online_head = Linear(self.out_features, xavier=False,
                                  name="online_head")

    def project(self, r, train: bool):
        z = self.proj_1(r)
        z = self.proj_bn_1(z, use_running_average=not train)
        z = nn.relu(z)
        z = self.proj_2(z)
        z = self.proj_bn_2(z, use_running_average=not train)
        return z

    def __call__(self, y1, y2=None, train: bool = False,
                 inference: bool = False):
        if inference or y2 is None:
            r1 = self.backbone(y1, train=False)
            return self.online_head(jax.lax.stop_gradient(r1))
        r1 = self.backbone(y1, train=train)
        r2 = self.backbone(y2, train=train)
        z1 = self.project(r1, train)
        z2 = self.project(r2, train)
        logits = self.online_head(jax.lax.stop_gradient(r1))
        return z1, z2, logits


def info_nce(a: jnp.ndarray, b: jnp.ndarray, temperature: float = 0.1,
             gather_axis: Optional[str] = None) -> jnp.ndarray:
    """InfoNCE(a -> b) after L2 normalization and (optional) cross-chip
    gather (SSL_model.py:106-118)."""
    a = a / jnp.linalg.norm(a, axis=1, keepdims=True).clip(1e-12)
    b = b / jnp.linalg.norm(b, axis=1, keepdims=True).clip(1e-12)
    a = gather_from_all(a, gather_axis)
    b = gather_from_all(b, gather_axis)
    logits = jnp.dot(a, b.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(a.shape[0])
    log_p = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(log_p, labels[:, None], axis=-1).mean()


def ssl_loss(z1, z2, logits, labels, temperature: float = 0.1,
             gather_axis: Optional[str] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Total SimCLR loss: symmetric InfoNCE / 2 + online-head BCE
    (SSL_model.py:153-166). Returns (total, ssl_part)."""
    loss_ssl = (info_nce(z1, z2, temperature, gather_axis) / 2
                + info_nce(z2, z1, temperature, gather_axis) / 2)
    labels_flat = labels.reshape(-1, logits.shape[-1])
    loss_clc = bce_with_logits(logits, labels_flat)
    return loss_ssl + loss_clc, loss_ssl


# ----------------------------------------------------------------------- #
# TimeSeriesTransform (SSL_model.py:171-246) as in-graph augmentations
# ----------------------------------------------------------------------- #

def _jitter(rng, x, noise_level=0.05):
    return x + jax.random.normal(rng, x.shape, x.dtype) * noise_level

def _scale(rng, x, lo=0.9, hi=1.1):
    return x * jax.random.uniform(rng, x.shape, x.dtype, lo, hi)

def _mask_segment(rng, x, mask_len=10):
    """Zero a random time segment (applied per sample; x: (T, C))."""
    t = x.shape[0]
    start = jax.random.randint(rng, (), 0, max(t - mask_len, 1))
    idx = jnp.arange(t)
    keep = (idx < start) | (idx >= start + mask_len)
    return x * keep[:, None].astype(x.dtype)


def two_views(rng: jax.Array, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate the two augmented views for a BATCH (B, T, C).

    View 1 probabilities (jitter .8 / scale .7 / mask .6); view 2 (.9/.8/.5)
    (SSL_model.py:172-184), gated per sample.
    """
    def one_view(rng, x, probs):
        def per_sample(rng, s):
            ks = jax.random.split(rng, 6)
            s = jnp.where(jax.random.uniform(ks[0]) < probs[0],
                          _jitter(ks[1], s), s)
            s = jnp.where(jax.random.uniform(ks[2]) < probs[1],
                          _scale(ks[3], s), s)
            s = jnp.where(jax.random.uniform(ks[4]) < probs[2],
                          _mask_segment(ks[5], s), s)
            return s
        rngs = jax.random.split(rng, x.shape[0])
        return jax.vmap(per_sample)(rngs, x)

    k1, k2 = jax.random.split(rng)
    return (one_view(k1, x, (0.8, 0.7, 0.6)),
            one_view(k2, x, (0.9, 0.8, 0.5)))
