"""Performance visualizations (reference: wifi_csi/utils.py:289-391).

Same artifact set: per-class count histograms, per-class confusion matrices,
per-sample error distribution, class-wise MAE bars, predicted-vs-true scatter
— saved as PNGs per experiment; returns summary statistics.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..metrics.performance import threshold_round


def _to_counts(y_pred: np.ndarray, y_true: np.ndarray, var_mode: str):
    """Convert mode-specific predictions to per-activity count vectors."""
    y_pred = np.asarray(y_pred)
    y_true = np.asarray(y_true)
    if var_mode == "count_classification_withConstrain":
        return y_pred, y_true
    if var_mode == "multi_head":
        if y_pred.ndim == 4:
            y_pred = y_pred[-1]
        _, _, num_classes = y_pred.shape
        idx = np.argmax(y_pred, axis=-1)
        y_pred = np.eye(num_classes)[idx].sum(axis=1)[:, :-1]
        y_true = y_true.sum(axis=1)[:, :-1]
        return y_pred, y_true
    if var_mode == "count_classification":
        y_pred = np.clip(threshold_round(y_pred, 0.3), 0, 5)
        return y_pred, y_true
    if var_mode == "baseline":
        y_pred = (1 / (1 + np.exp(-y_pred)) > 0.5).astype(float)
        y_true = y_true.reshape(y_true.shape[0], -1, 9)
        y_pred = y_pred.reshape(y_true.shape)
        return y_pred.sum(axis=1), y_true.sum(axis=1)
    raise ValueError(f"unsupported var_mode: {var_mode}")


def visualize_model_performance(y_pred, y_true, save_dir="./visualizations",
                                var_mode="multi_head") -> Dict[str, object]:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import confusion_matrix

    y_pred, y_true = _to_counts(y_pred, y_true, var_mode)
    os.makedirs(save_dir, exist_ok=True)
    n_classes = int(y_pred.shape[1])

    # 1. count distributions
    plt.figure(figsize=(15, 5))
    for i in range(n_classes):
        plt.subplot(2, (n_classes + 1) // 2, i + 1)
        plt.hist(y_true[:, i], alpha=0.5, label="Ground Truth", bins=range(7))
        plt.hist(y_pred[:, i], alpha=0.5, label="Predicted", bins=range(7))
        plt.title(f"Class {i}")
        if i == 0:
            plt.legend()
    plt.tight_layout()
    plt.savefig(f"{save_dir}/count_distributions_{var_mode}.png")
    plt.close()

    # 2. per-class confusion matrices
    cols = (n_classes + 1) // 2
    fig, axes = plt.subplots(2, cols, figsize=(20, 8))
    for i in range(n_classes):
        ax = axes[i // cols, i % cols]
        cm = confusion_matrix(y_true[:, i], np.round(y_pred[:, i]))
        ax.imshow(cm, cmap="Blues")
        for (r, c), v in np.ndenumerate(cm):
            ax.text(c, r, str(v), ha="center", va="center", fontsize=8)
        ax.set_title(f"Class {i}")
    plt.tight_layout()
    plt.savefig(f"{save_dir}/confusion_matrices_{var_mode}.png")
    plt.close()

    # 3. error distribution
    errors = np.abs(y_pred - y_true).mean(axis=1)
    plt.figure(figsize=(10, 6))
    plt.hist(errors, bins=30)
    plt.title("Distribution of Mean Absolute Error per Sample")
    plt.savefig(f"{save_dir}/error_distribution_{var_mode}.png")
    plt.close()

    # 4. class-wise error
    class_errors = np.abs(y_pred - y_true).mean(axis=0)
    plt.figure(figsize=(10, 6))
    plt.bar(range(n_classes), class_errors)
    plt.title("Mean Absolute Error by Class")
    plt.savefig(f"{save_dir}/class_errors_{var_mode}.png")
    plt.close()

    # 5. scatter
    plt.figure(figsize=(10, 10))
    for i in range(n_classes):
        plt.scatter(y_true[:, i], y_pred[:, i], alpha=0.1, label=f"Class {i}")
    plt.plot([0, 5], [0, 5], "r--")
    plt.legend()
    plt.savefig(f"{save_dir}/prediction_scatter_{var_mode}.png")
    plt.close()

    return {
        "class_wise_mae": class_errors.tolist(),
        "mean_error": float(errors.mean()),
        "error_std": float(errors.std()),
        "perfect_predictions": float(
            (np.abs(y_pred - y_true) < 0.5).all(axis=1).mean()),
    }
