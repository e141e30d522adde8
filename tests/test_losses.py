"""Loss numerics verified bit-for-bit (to float32 tolerance) against the torch
CPU implementations the reference uses."""

import numpy as np
import pytest
import torch

from multi_modal_csi_tpu.losses.basic import (bce_with_logits, cross_entropy,
                                              mse, smooth_l1)


@pytest.mark.parametrize("pos_weight", [None, 4.0, 6.0, 8.0])
def test_bce_with_logits_matches_torch(rng, pos_weight):
    logits = rng.normal(size=(16, 54)).astype(np.float32) * 3
    targets = (rng.random((16, 54)) > 0.8).astype(np.float32)
    if pos_weight is None:
        ref = torch.nn.BCEWithLogitsLoss()
    else:
        ref = torch.nn.BCEWithLogitsLoss(
            pos_weight=torch.tensor([pos_weight] * 54))
    want = ref(torch.from_numpy(logits), torch.from_numpy(targets)).item()
    got = float(bce_with_logits(logits, targets, pos_weight))
    assert got == pytest.approx(want, rel=1e-5)


def test_mse_matches_torch(rng):
    a = rng.normal(size=(8, 9)).astype(np.float32)
    b = rng.normal(size=(8, 9)).astype(np.float32)
    want = torch.nn.MSELoss()(torch.from_numpy(a), torch.from_numpy(b)).item()
    assert float(mse(a, b)) == pytest.approx(want, rel=1e-5)


def test_smooth_l1_matches_torch(rng):
    a = rng.normal(size=(8, 9)).astype(np.float32) * 2
    b = rng.normal(size=(8, 9)).astype(np.float32) * 2
    want = torch.nn.SmoothL1Loss()(torch.from_numpy(a), torch.from_numpy(b)).item()
    assert float(smooth_l1(a, b)) == pytest.approx(want, rel=1e-5)


@pytest.mark.parametrize("smoothing", [0.0, 0.3])
@pytest.mark.parametrize("weighted", [False, True])
def test_cross_entropy_matches_torch(rng, smoothing, weighted):
    logits = rng.normal(size=(20, 10)).astype(np.float32) * 2
    targets = rng.integers(0, 10, size=(20,))
    if weighted:
        # the DETR class-imbalance weighting (model/detr.py:503-506)
        w = np.ones(10, dtype=np.float32)
        w[-1] = 0.25
        w = w * (len(w) / w.sum())
    else:
        w = None
    ref = torch.nn.CrossEntropyLoss(
        weight=None if w is None else torch.from_numpy(w),
        label_smoothing=smoothing)
    want = ref(torch.from_numpy(logits), torch.from_numpy(targets)).item()
    got = float(cross_entropy(logits, targets,
                              weight=None if w is None else w,
                              label_smoothing=smoothing))
    assert got == pytest.approx(want, rel=1e-5)


def test_cross_entropy_reductions(rng):
    logits = rng.normal(size=(6, 4)).astype(np.float32)
    targets = rng.integers(0, 4, size=(6,))
    ref = torch.nn.CrossEntropyLoss(reduction="none")
    want = ref(torch.from_numpy(logits), torch.from_numpy(targets)).numpy()
    got = np.asarray(cross_entropy(logits, targets, reduction="none"))
    # XLA and torch differ in float32 log-softmax accumulation order
    np.testing.assert_allclose(got, want, rtol=5e-4)
