"""Label encoders and set-target reduction.

Vectorized re-implementations of the reference's per-sample Python loops:
  - encode_identity   (wifi_csi/load_data.py:111-133)
  - encode_activity   (wifi_csi/load_data.py:137-158)
  - encode_location   (wifi_csi/load_data.py:162-183)
  - reduce_dataset    (wifi_csi/utils.py:272-287)

`reduce_dataset` must be bit-exact for accuracy parity: it converts the (6, C)
per-user one-hot matrix into (num_queries, C+1) set-prediction targets by
deleting the FIRST all-zero row, appending a zero "no-person" column, turning
every remaining all-zero row into the no-person one-hot, and (optionally)
padding to `num_object_queries` rows with no-person one-hots.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from ..core.config import ACTIVITY_ENCODING, LOCATION_ENCODING
from .annotation import USER_ACTIVITY_COLS, USER_LOCATION_COLS


def _encode_table(values: np.ndarray, table: Dict[str, List[int]]) -> np.ndarray:
    """Map an (N, 6) str array through an encoding table -> (N, 6, C) int64.

    Vectorized: build a (num_keys, C) matrix and index it with searchsorted
    over the key vocabulary instead of looping per sample.
    """
    keys = np.array(sorted(table.keys()))
    rows = np.array([table[k] for k in keys], dtype=np.int64)
    flat = values.ravel()
    idx = np.searchsorted(keys, flat)
    # validate every label is known (same KeyError the reference would raise)
    bad = (idx >= len(keys)) | (keys[np.clip(idx, 0, len(keys) - 1)] != flat)
    if bad.any():
        raise KeyError(f"unknown label(s): {sorted(set(flat[bad]))}")
    return rows[idx].reshape(*values.shape, rows.shape[-1])


def encode_identity(df: pd.DataFrame) -> np.ndarray:
    """(N, 6) presence bits: 1 where user_i_location is not NaN (int8)."""
    vals = df[USER_LOCATION_COLS].to_numpy(copy=True).astype(str)
    return (vals != "nan").astype(np.int8)


def encode_activity(df: pd.DataFrame,
                    table: Optional[Dict[str, List[int]]] = None) -> np.ndarray:
    """(N, 6, 9) activity one-hots; absent users encode to all-zero."""
    vals = df[USER_ACTIVITY_COLS].to_numpy(copy=True).astype(str)
    return _encode_table(vals, table or ACTIVITY_ENCODING)


def encode_location(df: pd.DataFrame,
                    table: Optional[Dict[str, List[int]]] = None) -> np.ndarray:
    """(N, 6, 5) location one-hots; absent users encode to all-zero."""
    vals = df[USER_LOCATION_COLS].to_numpy(copy=True).astype(str)
    return _encode_table(vals, table or LOCATION_ENCODING)


def encode_labels(df: pd.DataFrame, task: str,
                  activity_table: Optional[Dict[str, List[int]]] = None,
                  location_table: Optional[Dict[str, List[int]]] = None) -> np.ndarray:
    """Task dispatch (reference: wifi_csi/load_data.py:82-107)."""
    if task == "identity":
        return encode_identity(df)
    if task == "activity":
        return encode_activity(df, activity_table)
    if task == "location":
        return encode_location(df, location_table)
    raise ValueError(f"unknown task: {task}")


def reduce_dataset(data: np.ndarray,
                   num_object_queries: Optional[int] = None) -> np.ndarray:
    """(N, 6, C) one-hots -> (N, Q, C+1) set-prediction targets.

    Bit-exact vectorization of wifi_csi/utils.py:272-287:
      1. delete the FIRST all-zero row of each sample (argmax of the zero mask;
         note: if no row is all-zero, argmax==0 deletes row 0 — preserved);
      2. hstack a zero column (the future "no-person" class);
      3. rows that are still all-zero become the no-person one-hot [0..0, 1];
      4. if num_object_queries: append (num_object_queries - 5) no-person rows.
    """
    data = np.asarray(data)
    n, users, classes = data.shape
    row_is_zero = data.sum(axis=2) == 0                     # (N, 6)
    drop = row_is_zero.argmax(axis=1)                       # first all-zero row
    keep = np.arange(users)[None, :] != drop[:, None]       # (N, 6) keep mask
    kept = data[keep].reshape(n, users - 1, classes)        # (N, 5, C)
    out = np.concatenate(
        [kept, np.zeros((n, users - 1, 1), dtype=kept.dtype)], axis=2)
    no_person = np.zeros(classes + 1, dtype=out.dtype)
    no_person[-1] = 1
    still_zero = out.sum(axis=2) == 0                       # (N, 5)
    out[still_zero] = no_person
    if num_object_queries:
        pad = np.broadcast_to(
            no_person, (n, num_object_queries - (users - 1), classes + 1)).copy()
        out = np.concatenate([out, pad], axis=1)
    return out
