"""Metric-suite tests pinning performance_metrics semantics for all four modes
(SURVEY.md §4 item d)."""

import numpy as np
import pytest

from multi_modal_csi_tpu.metrics.performance import (
    calculate_scores, count_error, error_per_number_person,
    performance_metrics, process_predictions, threshold_round)


def test_threshold_round_strictly_greater():
    # note 1.25's decimal part is exactly representable; 2.5 with threshold
    # 0.5 stays down (strict >), matching the reference's np.ceil/floor logic
    x = np.array([1.25, 1.30001, 2.5, 2.51, -0.75])
    got = threshold_round(x, threshold=0.3)
    np.testing.assert_array_equal(got, [1.0, 2.0, 3.0, 3.0, -1.0])


def test_threshold_round_half():
    got = threshold_round(np.array([0.5, 0.500001, 1.49]), threshold=0.5)
    np.testing.assert_array_equal(got, [0.0, 1.0, 1.0])


def test_count_error():
    y_true = np.array([[1, 0, 2], [0, 0, 0]])
    y_pred = np.array([[1, 1, 2], [1, 0, 0]])
    np.testing.assert_array_equal(count_error(y_pred, y_true), [1, 1])


def test_error_per_number_person_groups():
    y_true = np.array([[1, 0, 0], [2, 0, 0], [1, 1, 0]])
    y_pred = np.array([[0, 0, 0], [2, 0, 0], [1, 0, 0]])
    out = error_per_number_person(y_pred, y_true)
    assert out[0] == 1.0          # one 1-person sample, error 1
    assert out[1] == 0.5          # two 2-person samples, errors 0 and 1
    assert all(np.isnan(v) for v in out[2:])


def test_calculate_scores_perfect():
    y = np.array([[1, 0, 2], [0, 1, 0]])
    p, r, f1, acc = calculate_scores(y, y)
    assert acc == 1.0
    # the reference's +1e-6 denominators keep P/R/F1 just under 1
    assert 0.99 < p <= 1.0 and 0.99 < r <= 1.0 and 0.99 < f1 <= 1.0


def test_process_predictions_threshold_gate():
    # user 0 confident (0.9), user 1 under the gate (0.4)
    y_pred = np.zeros((1, 2, 9))
    y_pred[0, 0, 3] = 0.9
    y_pred[0, 1, 5] = 0.4
    y_true = np.zeros((1, 2, 9))
    y_true[0, 0, 3] = 1
    pred_counts, true_counts, bs = process_predictions(y_pred, y_true, 0.5)
    assert pred_counts[0, 3] == 1 and pred_counts[0, 5] == 0
    assert bs == 1


def test_multi_head_mode_uses_final_layer_and_drops_no_person():
    L, B, Q, C = 3, 4, 5, 10
    rng = np.random.default_rng(0)
    y_pred = rng.normal(size=(L, B, Q, C))
    # targets: every query is "no-person" -> true counts all zero after drop
    y_true = np.zeros((B, Q, C))
    y_true[:, :, -1] = 1
    out = performance_metrics(y_true, y_pred, var_mode="multi_head")
    # manual: final layer argmax counts, minus no-person column
    idx = y_pred[-1].argmax(-1)
    counts = np.eye(C)[idx].sum(axis=1)[:, :-1]
    assert out["total_error"] == pytest.approx(np.abs(counts).sum() / B)


def test_multi_head_perfect_prediction():
    B, Q, C = 2, 5, 10
    y_true = np.zeros((B, Q, C))
    y_true[:, 0, 1] = 1
    y_true[:, 1:, -1] = 1
    # logits that argmax to exactly the target classes
    y_pred = np.full((1, B, Q, C), -5.0)
    y_pred[0, :, 0, 1] = 5.0
    y_pred[0, :, 1:, -1] = 5.0
    out = performance_metrics(y_true, y_pred, var_mode="multi_head")
    assert out["perfect_prediction_percentage"] == 100.0
    assert out["total_error"] == 0.0


def test_baseline_mode_end_to_end():
    B, U, C = 3, 6, 9
    y_true = np.zeros((B, U, C))
    y_true[0, 0, 2] = 1
    y_true[1, 0, 4] = 1
    y_true[1, 1, 4] = 1
    logits = np.full((B, U * C), -10.0)
    logits[0, 0 * C + 2] = 10.0
    logits[1, 0 * C + 4] = 10.0
    logits[1, 1 * C + 4] = 10.0
    out = performance_metrics(y_true.reshape(B, -1), logits, var_mode="baseline")
    assert out["perfect_prediction_percentage"] == 100.0


def test_count_classification_mode_rounds_and_clips():
    y_true = np.array([[2.0, 0.0], [1.0, 0.0]])
    y_pred = np.array([[2.4, 0.6], [7.2, -0.4]])
    out = performance_metrics(y_true, y_pred, var_mode="count_classification")
    # 2.4->2, 0.6->1, 7.2->5(clip), -0.4->0
    assert out["total_error"] == pytest.approx((0 + 1 + 4 + 0) / 2)


def test_count_constrained_mode_direct_compare():
    y_true = np.array([[1.0, 0.0, 4.0]])
    y_pred = np.array([[1.0, 0.0, 4.0]])
    out = performance_metrics(y_true, y_pred,
                              var_mode="count_classification_withConstrain")
    assert out["total_error"] == 0.0
    assert out["perfect_prediction_percentage"] == 100.0


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        performance_metrics(np.zeros((1, 2)), np.zeros((1, 2)), var_mode="nope")
