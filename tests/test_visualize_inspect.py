"""Visualization artifacts + inspection query-bias analysis."""

import os

import numpy as np

from multi_modal_csi_tpu.cli.inspect_model import query_bias
from multi_modal_csi_tpu.utils.visualize import visualize_model_performance


def test_visualize_multi_head_writes_pngs(tmp_path, rng):
    L, B, Q, C = 2, 20, 5, 10
    y_pred = rng.normal(size=(L, B, Q, C))
    y_true = np.zeros((B, Q, C))
    for b in range(B):
        for q in range(Q):
            y_true[b, q, rng.integers(0, C)] = 1
    stats = visualize_model_performance(y_pred, y_true, save_dir=str(tmp_path),
                                        var_mode="multi_head")
    for name in ["count_distributions", "confusion_matrices",
                 "error_distribution", "class_errors", "prediction_scatter"]:
        assert os.path.exists(tmp_path / f"{name}_multi_head.png")
    assert "mean_error" in stats and "class_wise_mae" in stats
    assert len(stats["class_wise_mae"]) == C - 1   # no-person dropped


def test_visualize_baseline_mode(tmp_path, rng):
    B, U, C = 16, 6, 9
    y_true = np.zeros((B, U, C))
    y_true[:, 0, 1] = 1
    logits = rng.normal(size=(B, U * C))
    stats = visualize_model_performance(logits, y_true.reshape(B, -1),
                                        save_dir=str(tmp_path),
                                        var_mode="baseline")
    assert 0.0 <= stats["perfect_predictions"] <= 1.0


def test_query_bias_histograms(rng):
    L, B, Q, C = 3, 50, 5, 10
    logits = rng.normal(size=(L, B, Q, C))
    out = query_bias(logits)
    assert set(out) == {f"query_{i}" for i in range(Q)} | {"no_person_rate_per_query"}
    for i in range(Q):
        assert sum(out[f"query_{i}"]) == B
    assert all(0.0 <= r <= 1.0 for r in out["no_person_rate_per_query"])
