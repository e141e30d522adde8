"""Dual-band runner: paired 2.4GHz + 5GHz CSI windows through DualBandCNN.

Reference: run_dualband.py:34-129 + model/dual_band.py:174-233. The two band
selections are loaded independently (cfg.data / cfg.data_band2) and paired
positionally, labels taken from band 1 — implemented correctly here (the
reference passes band-1 arrays for both bands' x, SURVEY.md §2.6). BCE
pos_weight=6, baseline eval with subset accuracy + classification report.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import numpy as np
from sklearn.metrics import accuracy_score, classification_report

from ..core.config import Config
from ..losses.basic import bce_with_logits
from ..models.csi.dual_band import DualBandCNN
from ..train.loop import eval_dataset, fit, make_eval_fn


def load_dual_band_data(cfg: Config):
    from .csi import master_split, _layout
    x1_tr, x1_te, y_tr, y_te = master_split(cfg, "raw", data_cfg=cfg.data)
    x2_tr, x2_te, _, _ = master_split(cfg, "raw", data_cfg=cfg.data_band2)
    n_tr = min(len(x1_tr), len(x2_tr))
    n_te = min(len(x1_te), len(x2_te))
    x_tr = np.stack([_layout(x1_tr[:n_tr], "seq"), _layout(x2_tr[:n_tr], "seq")], axis=1)
    x_te = np.stack([_layout(x1_te[:n_te], "seq"), _layout(x2_te[:n_te], "seq")], axis=1)
    return x_tr, x_te, y_tr[:n_tr], y_te[:n_te]


def run_dual_band(cfg: Config, data: Optional[Tuple[np.ndarray, ...]] = None
                  ) -> Dict[str, Any]:
    if data is None:
        x_tr, x_te, y_tr, y_te = load_dual_band_data(cfg)
    else:
        x_tr, x_te, y_tr, y_te = data
    y_tr_flat = y_tr.reshape(y_tr.shape[0], -1)
    y_te_flat = y_te.reshape(y_te.shape[0], -1)
    out_dim = y_tr_flat.shape[-1]

    result: Dict[str, Any] = {}
    accuracies, times_train, times_test = [], [], []
    for r in range(cfg.repeat):
        model = DualBandCNN(out_features=out_dim)
        t0 = time.time()
        fitres = fit(model, x_tr, y_tr_flat, x_te, y_te_flat,
                     loss_fn=lambda o, t: bce_with_logits(o, t, 6.0),
                     mode="baseline", lr=cfg.nn.lr, epochs=cfg.nn.epoch,
                     batch_size=cfg.nn.batch_size, seed=r + 39,
                     threshold=cfg.nn.threshold, patience=cfg.nn.patience)
        t1 = time.time()
        forward = make_eval_fn(model)
        logits = eval_dataset(forward, fitres.best_params,
                              fitres.best_batch_stats, x_te)
        pred = (1 / (1 + np.exp(-logits)) > cfg.nn.threshold).astype(int)
        acc = accuracy_score(y_te_flat.astype(int),
                             pred.reshape(-1, y_te_flat.shape[-1]))
        result[f"repeat_{r}"] = classification_report(
            y_te_flat.astype(int), pred, digits=6, zero_division=0,
            output_dict=True)
        accuracies.append(acc)
        times_train.append(t1 - t0)
        times_test.append(time.time() - t1)

    result["accuracy"] = {"avg": float(np.mean(accuracies)),
                          "std": float(np.std(accuracies))}
    result["time_train"] = {"avg": float(np.mean(times_train)),
                            "std": float(np.std(times_train))}
    result["time_test"] = {"avg": float(np.mean(times_test)),
                           "std": float(np.std(times_test))}
    return result
