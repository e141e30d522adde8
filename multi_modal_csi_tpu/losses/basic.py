"""Elementary losses with torch-matching numerics.

The reference trains with torch.nn.BCEWithLogitsLoss(pos_weight=k) (every
baseline CSI model), MSELoss (model/cnn_1d.py:168), SmoothL1Loss (THAT_COUNT)
and CrossEntropyLoss(weight, label_smoothing) inside the set-matching losses
(model/detr.py:503-510). These are tested bit-for-bit against the torch CPU
implementations in tests/test_losses.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    pos_weight: Optional[float] = None) -> jnp.ndarray:
    """Mean BCE-with-logits; pos_weight scales the positive term.

    Stable form: (1-y)*x + (1 + (pw-1)*y) * softplus(-x).
    """
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    sp = jax.nn.softplus(-x)
    if pos_weight is None:
        loss = (1.0 - y) * x + sp
    else:
        loss = (1.0 - y) * x + (1.0 + (pos_weight - 1.0) * y) * sp
    return loss.mean()


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch.nn.SmoothL1Loss (beta=1.0), mean reduction."""
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return loss.mean()


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  weight: Optional[jnp.ndarray] = None,
                  label_smoothing: float = 0.0,
                  reduction: str = "mean") -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss over integer class targets.

    Matches torch semantics including the interaction of class weights with
    label smoothing: per-sample loss is the weighted smoothed NLL
        l_n = (1-eps) * w_{y_n} * nll_n + eps/K * sum_c w_c * (-log p_{n,c})
    and "mean" reduction normalizes by sum_n w_{y_n} (NOT by N) when weights
    are given.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    log_p = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_p, targets[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = weight.astype(jnp.float32)
        wy = w[targets]
        nll_term = wy * nll
        smooth_term = -(log_p * w).sum(axis=-1)
    else:
        wy = jnp.ones_like(nll)
        nll_term = nll
        smooth_term = -log_p.sum(axis=-1)
    eps = label_smoothing
    loss = (1.0 - eps) * nll_term + (eps / num_classes) * smooth_term
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    return loss.sum() / wy.sum()
