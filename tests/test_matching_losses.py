"""Set-matching losses vs scipy/torch oracles.

The oracle below recomputes the published loss semantics (final-layer
Hungarian matching via scipy, weighted+smoothed CE with torch, same indices
reused for aux layers) independently, to validate the on-device vectorized
implementation."""

import numpy as np
import pytest
import torch
from scipy.optimize import linear_sum_assignment

from multi_modal_csi_tpu.losses.matching import (HungarianMatchingLoss,
                                                 class_imbalance_weights,
                                                 hungarian_assignment,
                                                 permutation_matching_loss)


def test_hungarian_assignment_matches_scipy(rng):
    for _ in range(20):
        cost = rng.normal(size=(4, 5, 5))
        got = np.asarray(hungarian_assignment(cost))
        for b in range(4):
            rows, cols = linear_sum_assignment(cost[b])
            got_total = cost[b][np.arange(5), got[b]].sum()
            want_total = cost[b][rows, cols].sum()
            assert got_total == pytest.approx(want_total, rel=1e-6)


def test_hungarian_assignment_large_q_host_fallback(rng):
    """Q > 8 routes through the pure_callback scipy solve (exact, jittable)."""
    import jax
    q = 11
    cost = rng.normal(size=(3, q, q)).astype(np.float32)
    got = np.asarray(jax.jit(hungarian_assignment)(cost))
    for b in range(cost.shape[0]):
        rows, cols = linear_sum_assignment(cost[b])
        got_total = cost[b][np.arange(q), got[b]].sum()
        want_total = cost[b][rows, cols].sum()
        assert got_total == pytest.approx(want_total, rel=1e-6)


def test_hungarian_assignment_large_q_sharded_mesh(rng):
    """ADVICE r2 #3: the Q>8 pure_callback path must survive GSPMD — jit the
    solve with the batch axis sharded over the 8-device mesh and check it
    still matches scipy exactly (the callback forces a device->host gather;
    correctness, not locality, is the contract)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    q = 11
    cost = rng.normal(size=(8, q, q)).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded = jax.device_put(cost, NamedSharding(mesh, P("data", None, None)))
    got = np.asarray(jax.jit(hungarian_assignment)(sharded))
    for b in range(cost.shape[0]):
        rows, cols = linear_sum_assignment(cost[b])
        got_total = cost[b][np.arange(q), got[b]].sum()
        want_total = cost[b][rows, cols].sum()
        assert got_total == pytest.approx(want_total, rel=1e-6)


def test_hungarian_loss_large_q_end_to_end(rng):
    """The full set loss (matching + weighted CE + aux) works past the
    enumeration bound — covers the reference's NUM_QUERIES env knob
    (config_modifier.py) at any size."""
    import jax
    L, B, Q, C = 2, 3, 10, 10
    outputs = rng.normal(size=(L, B, Q, C)).astype(np.float32)
    targets = np.zeros((B, Q, C), np.float32)
    for b in range(B):
        for q in range(Q):
            targets[b, q, rng.integers(0, C)] = 1
    loss = HungarianMatchingLoss()
    got = float(loss(outputs, targets))
    want = _oracle_hungarian_loss(outputs, targets, 0.25, 0.3, 0.25)
    assert got == pytest.approx(want, rel=1e-4)
    g = jax.grad(lambda o: loss(o, targets))(outputs)
    assert np.isfinite(np.asarray(g)).all()


def _oracle_hungarian_loss(outputs, targets, aux_w, smoothing, imb):
    """Reference-semantics oracle computed with scipy + torch CE."""
    w = np.ones(10, np.float32)
    w[-1] = imb
    w = w * (len(w) / w.sum())
    ce = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w),
                                   label_smoothing=smoothing)
    final = outputs[-1]
    B = final.shape[0]
    tgt_ids = targets.argmax(-1)
    prob = torch.softmax(torch.from_numpy(final), -1).numpy()
    indices = []
    for b in range(B):
        cost = -prob[b][:, tgt_ids[b]]
        r, c = linear_sum_assignment(cost)
        indices.append((r, c))

    def layer_loss(pred):
        vals = []
        for b, (r, c) in enumerate(indices):
            vals.append(ce(torch.from_numpy(pred[b][r]),
                           torch.from_numpy(tgt_ids[b][c])).item())
        return float(np.mean(vals))

    final_loss = layer_loss(final)
    aux = [layer_loss(l) for l in outputs[:-1]]
    return final_loss + aux_w * float(np.mean(aux)) if aux else final_loss


def test_hungarian_loss_matches_oracle(rng):
    L, B, Q, C = 4, 6, 5, 10
    outputs = rng.normal(size=(L, B, Q, C)).astype(np.float32) * 2
    # random one-hot targets with a few no-person rows
    targets = np.zeros((B, Q, C), np.float32)
    for b in range(B):
        for q in range(Q):
            targets[b, q, rng.integers(0, C)] = 1
    loss = HungarianMatchingLoss(cost_class_weight=1.0, aux_loss_weight=0.25,
                                 label_smoothing=0.3, class_imbalance_weight=0.25)
    got = float(loss(outputs, targets))
    want = _oracle_hungarian_loss(outputs, targets, 0.25, 0.3, 0.25)
    assert got == pytest.approx(want, rel=1e-4)


def test_hungarian_loss_single_layer(rng):
    B, Q, C = 4, 5, 10
    outputs = rng.normal(size=(B, Q, C)).astype(np.float32)
    targets = np.zeros((B, Q, C), np.float32)
    targets[..., -1] = 1
    loss = HungarianMatchingLoss()
    got = float(loss(outputs, targets))
    want = _oracle_hungarian_loss(outputs[None], targets, 0.25, 0.3, 0.25)
    assert got == pytest.approx(want, rel=1e-4)


def test_hungarian_loss_gradient_flows(rng):
    import jax
    L, B, Q, C = 2, 3, 5, 10
    outputs = rng.normal(size=(L, B, Q, C)).astype(np.float32)
    targets = np.zeros((B, Q, C), np.float32)
    targets[..., 2] = 1
    loss = HungarianMatchingLoss()
    g = jax.grad(lambda o: loss(o, targets))(outputs)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def _oracle_permutation_loss(predictions, targets):
    """Reference semantics (that_multi_head.py:309-342) via itertools+torch."""
    from itertools import permutations
    ce = torch.nn.CrossEntropyLoss(reduction="none")
    B, H, C = predictions.shape
    tgt = targets.argmax(-1)
    best_preds = np.empty_like(predictions)
    for b in range(B):
        best, best_loss = None, np.inf
        for perm in permutations(range(H)):
            val = ce(torch.from_numpy(predictions[b, list(perm)]),
                     torch.from_numpy(tgt[b])).mean().item()
            if val < best_loss:
                best_loss, best = val, perm
        best_preds[b] = predictions[b, list(best)]
    return ce(torch.from_numpy(best_preds.reshape(-1, C)),
              torch.from_numpy(tgt.reshape(-1))).mean().item()


def test_permutation_loss_matches_oracle(rng):
    B, H, C = 5, 5, 10
    predictions = rng.normal(size=(B, H, C)).astype(np.float32) * 2
    targets = np.zeros((B, H, C), np.float32)
    for b in range(B):
        for h in range(H):
            targets[b, h, rng.integers(0, C)] = 1
    got = float(permutation_matching_loss(predictions, targets))
    want = _oracle_permutation_loss(predictions, targets)
    assert got == pytest.approx(want, rel=1e-4)


def test_class_imbalance_weights():
    w = np.asarray(class_imbalance_weights(10, 0.25))
    assert w[-1] < w[0]
    assert w.sum() == pytest.approx(10.0)
