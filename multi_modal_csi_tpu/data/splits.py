"""Deterministic dataset splits reproducing the reference's seeds.

The reference splits per environment with sklearn's
``train_test_split(test_size=0.2, shuffle=True, random_state=103)`` and then,
for the THAT/DETR runners, splits the test half 50/50 into valid/test with
``random_state=39`` (reference: wifi_csi/run_main.py:20-66 `master_splitter`;
model/that.py:332-335, model/detr.py:660-663).

We call sklearn directly so the index permutations are bit-identical to the
reference — accuracy parity depends on evaluating the same samples.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from sklearn.model_selection import train_test_split

ENV_SPLIT_SEED = 103    # run_main.py:52
VALID_SPLIT_SEED = 39   # that.py:335 / detr.py:663


def env_split(x: np.ndarray, y: np.ndarray,
              test_size: float = 0.2,
              seed: int = ENV_SPLIT_SEED) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """80/20 split of one environment's samples (x_train, x_test, y_train, y_test)."""
    return train_test_split(x, y, test_size=test_size, shuffle=True, random_state=seed)


def valid_test_split(x: np.ndarray, y: np.ndarray,
                     seed: int = VALID_SPLIT_SEED) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """50/50 valid/test split used by THAT/DETR-family runners.

    Returns (x_valid, x_test, y_valid, y_test) in the reference's order.
    """
    return train_test_split(x, y, test_size=0.5, shuffle=True, random_state=seed)


def concat_env_splits(per_env: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate per-environment (x_tr, x_te, y_tr, y_te) tuples.

    Splitting per environment and concatenating prevents cross-environment
    leakage (run_main.py:20-66).
    """
    xs_tr, xs_te, ys_tr, ys_te = zip(*per_env)
    return (np.concatenate(xs_tr, axis=0), np.concatenate(xs_te, axis=0),
            np.concatenate(ys_tr, axis=0), np.concatenate(ys_te, axis=0))
