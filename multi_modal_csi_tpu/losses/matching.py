"""Set-matching losses, vectorized on-device.

The reference's Hungarian matching is a per-sample Python loop calling scipy's
linear_sum_assignment with a GPU->CPU sync every batch (model/detr.py:512-585)
and its permutation matching is an O(B * 5!) Python loop
(model/that_multi_head.py:309-342). On TPU both become one gather + reduction
over the precomputed permutation table: for Q queries (Q=5 -> 120 perms)
enumerating all permutations IS the exact Hungarian optimum, evaluated as a
single (B, Q!, Q) gather and argmin — no host callback, fully differentiable
through the selected assignment (selection under stop_gradient, like the
reference's no_grad matching).
"""

from __future__ import annotations

import itertools
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .basic import cross_entropy

_MAX_ENUM_QUERIES = 8  # 8! = 40320 rows — still a trivial gather on TPU


def _permutation_table(q: int) -> jnp.ndarray:
    """(Q!, Q) int32 table of all permutations, lexicographic order."""
    if q > _MAX_ENUM_QUERIES:
        raise NotImplementedError(
            f"exact enumeration supports up to {_MAX_ENUM_QUERIES} queries; "
            f"got {q} (hungarian_assignment falls back to a host LAP solve)")
    return jnp.asarray(np.array(list(itertools.permutations(range(q))),
                                dtype=np.int32))


def _host_lap(cost: np.ndarray) -> np.ndarray:
    """Batched scipy linear_sum_assignment on host: (B, Q, Q) -> (B, Q)."""
    from scipy.optimize import linear_sum_assignment
    cost = np.asarray(cost, dtype=np.float32)
    return np.stack([linear_sum_assignment(c)[1] for c in cost]).astype(np.int32)


def hungarian_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact minimal-cost assignment for a batch of square cost matrices.

    cost: (B, Q, Q) — rows are predictions/queries, columns are targets.
    Returns col_ind: (B, Q) where row q is assigned to column col_ind[b, q],
    minimizing sum_q cost[b, q, col_ind[b, q]] (scipy linear_sum_assignment
    semantics; ties may resolve to a different — equally optimal — matching).

    Q <= 8 (the reference's whole operating range; NUM_QUERIES defaults to 5,
    config_modifier.py) is solved on device by exhaustive enumeration — a
    single gather + argmin, no host sync. Larger Q falls back to a batched
    scipy solve via jax.pure_callback: one host round trip per step, which is
    still strictly better than the reference's per-SAMPLE scipy loop
    (model/detr.py:532-544).

    Sharding note: under a data-parallel mesh the callback forces a
    device->host gather of the (B, Q, Q) cost each step (verified correct on
    an 8-device mesh — tests/test_matching_losses.py). That makes the Q>8
    path host-bandwidth-bound at scale; Q <= 8 (the reference's entire
    operating range) stays fully on device. `vmap_method="sequential"`
    requires jax >= 0.4.31.
    """
    q = cost.shape[-1]
    if q > _MAX_ENUM_QUERIES:
        out_shape = jax.ShapeDtypeStruct(cost.shape[:-1], jnp.int32)
        # the assignment itself is non-differentiable; cut the tangent before
        # the callback so it composes with value_and_grad
        cost = jax.lax.stop_gradient(cost.astype(jnp.float32))
        return jax.pure_callback(_host_lap, out_shape, cost,
                                 vmap_method="sequential")
    perms = _permutation_table(q)                        # (P, Q)
    # total[b, p] = sum_q cost[b, q, perms[p, q]]
    gathered = jnp.take_along_axis(
        cost[:, None, :, :].repeat(perms.shape[0], axis=1),
        perms[None, :, :, None], axis=-1)[..., 0]        # (B, P, Q)
    total = gathered.sum(axis=-1)                        # (B, P)
    best = jnp.argmin(total, axis=-1)                    # (B,)
    return perms[best]                                   # (B, Q)


def class_imbalance_weights(num_classes: int, last_class_weight: float) -> jnp.ndarray:
    """DETR CE weights: down-weight "no-person", renormalize to mean 1
    (model/detr.py:503-506)."""
    w = np.ones(num_classes, dtype=np.float32)
    w[-1] = last_class_weight
    w = w * (len(w) / w.sum())
    return jnp.asarray(w)


def _matched_ce(pred: jnp.ndarray, tgt_classes: jnp.ndarray,
                col_ind: jnp.ndarray, weight: Optional[jnp.ndarray],
                label_smoothing: float) -> jnp.ndarray:
    """Per-sample weighted CE of matched (query -> target) pairs, averaged
    torch-style within each sample, then mean over batch
    (model/detr.py:587-595 `_get_layer_loss`)."""
    matched = jnp.take_along_axis(tgt_classes, col_ind, axis=1)   # (B, Q)
    per = cross_entropy(pred, matched, weight=weight,
                        label_smoothing=label_smoothing, reduction="none")
    if weight is not None:
        wy = weight[matched]
        per_sample = per.sum(axis=1) / wy.sum(axis=1)
    else:
        per_sample = per.mean(axis=1)
    return per_sample.mean()


def _match_indices(layer_logits, tgt_classes, cost_class_weight):
    """Hungarian col indices for one layer's logits (no grad)."""
    prob = jax.nn.softmax(layer_logits.astype(jnp.float32), axis=-1)
    # cost[b, q, j] = -prob[b, q, class_of_target_j]
    cost = -jnp.take_along_axis(prob, tgt_classes[:, None, :].repeat(
        prob.shape[1], axis=1), axis=-1)
    cost = cost * cost_class_weight
    return jax.lax.stop_gradient(hungarian_assignment(cost))


@partial(jax.jit, static_argnames=("cost_class_weight", "aux_loss_weight",
                                   "label_smoothing", "per_layer_matching"))
def _hungarian_loss_impl(outputs, targets, weight, cost_class_weight,
                         aux_loss_weight, label_smoothing,
                         per_layer_matching=False):
    squeeze = outputs.ndim == 3
    if squeeze:
        outputs = outputs[None]
    final = outputs[-1]                                   # (B, Q, C)
    tgt_classes = jnp.argmax(targets, axis=-1)            # (B, Q)
    col_ind = _match_indices(final, tgt_classes, cost_class_weight)

    final_loss = _matched_ce(final, tgt_classes, col_ind, weight, label_smoothing)
    if squeeze or outputs.shape[0] == 1:
        return final_loss
    aux = outputs[:-1]
    if per_layer_matching:
        # THAT_ENCODER variant: each aux layer matched independently
        # (that_encoder.py:595-601)
        def aux_loss_fn(layer):
            idx = _match_indices(layer, tgt_classes, cost_class_weight)
            return _matched_ce(layer, tgt_classes, idx, weight, label_smoothing)
    else:
        # DETR variant: the final layer's indices weight every aux layer
        # (detr.py:611-621)
        def aux_loss_fn(layer):
            return _matched_ce(layer, tgt_classes, col_ind, weight,
                               label_smoothing)
    aux_losses = jax.vmap(aux_loss_fn)(aux)
    return final_loss + aux_loss_weight * aux_losses.mean()


class HungarianMatchingLoss:
    """DETR-style set loss (model/detr.py:497-631).

    outputs: [L, B, Q, C] per-decoder-layer logits (or [B, Q, C]);
    targets:  [B, Q, C] one-hot rows (class C-1 = "no-person").
    Matching uses ONLY the final layer; the same indices weight every
    auxiliary layer (detr.py:611-621). CE uses class-imbalance weights +
    label smoothing, with torch's weighted-mean normalization.
    """

    def __init__(self, cost_class_weight: float = 1.0,
                 aux_loss_weight: float = 0.25,
                 label_smoothing: float = 0.3,
                 class_imbalance_weight: float = 0.25,
                 num_classes: int = 10,
                 per_layer_matching: bool = False):
        self.cost_class_weight = float(cost_class_weight)
        self.aux_loss_weight = float(aux_loss_weight)
        self.label_smoothing = float(label_smoothing)
        self.per_layer_matching = bool(per_layer_matching)
        self.weight = class_imbalance_weights(num_classes, class_imbalance_weight)

    def __call__(self, outputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        return _hungarian_loss_impl(outputs, targets, self.weight,
                                    self.cost_class_weight,
                                    self.aux_loss_weight,
                                    self.label_smoothing,
                                    self.per_layer_matching)


@jax.jit
def permutation_matching_loss(predictions: jnp.ndarray,
                              targets: jnp.ndarray) -> jnp.ndarray:
    """THAT_MULTI_HEAD loss (model/that_multi_head.py:309-342), vectorized.

    predictions: (B, H, C) head logits; targets: (B, H, C) one-hots.
    Chooses the head permutation minimizing mean CE per sample, then returns
    the mean CE of the best-permuted predictions over the whole batch —
    identical to the reference's two-phase select-then-recompute, because the
    recomputed loss equals the selected minimum.
    """
    b, h, c = predictions.shape
    log_p = jax.nn.log_softmax(predictions.astype(jnp.float32), axis=-1)
    tgt = jnp.argmax(targets, axis=-1)                    # (B, H)
    # nll[b, i, j] = CE(pred head i, target j)
    nll = -jnp.take_along_axis(
        log_p[:, :, None, :].repeat(h, axis=2),
        tgt[:, None, :, None].repeat(h, axis=1), axis=-1)[..., 0]  # (B, H, H)
    perms = _permutation_table(h)                         # (P, H)
    # cost[b, p] = mean_j nll[b, perms[p, j], j]
    pn = jnp.take_along_axis(
        nll[:, None, :, :].repeat(perms.shape[0], axis=1),
        perms[None, :, :, None], axis=2)                  # (B, P, H, H)
    diag = jnp.diagonal(pn, axis1=-2, axis2=-1)           # (B, P, H)
    cost = diag.mean(axis=-1)                             # (B, P)
    best = jax.lax.stop_gradient(jnp.argmin(cost, axis=-1))
    best_nll = jnp.take_along_axis(diag, best[:, None, None].repeat(h, axis=2),
                                   axis=1)[:, 0, :]       # (B, H)
    return best_nll.mean()


def count_based_loss(predictions: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """THAT_COUNT_CONSTRAINED loss: SmoothL1 between summed per-person
    softmax probabilities and pre-summed count targets
    (model/that_count_pred_withSoftMaxConstraint.py:313-337)."""
    from .basic import smooth_l1
    return smooth_l1(predictions, targets)
