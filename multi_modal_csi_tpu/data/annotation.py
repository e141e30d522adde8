"""Annotation loading and filtering.

One shared implementation of the csv-filter layer that the reference
duplicates per modality (benchmark/wifi_csi/load_data.py:15-44 and
benchmark/video/load_data.py:65-89). All filter columns are compared as
strings, exactly as the reference does (``pd.read_csv(..., dtype=str)``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pandas as pd

USER_LOCATION_COLS = [f"user_{i}_location" for i in range(1, 7)]
USER_ACTIVITY_COLS = [f"user_{i}_activity" for i in range(1, 7)]


def load_annotation(path: str) -> pd.DataFrame:
    """Load annotation.csv with every column as str (reference semantics)."""
    return pd.read_csv(path, dtype=str)


def filter_annotation(df: pd.DataFrame,
                      environment: Optional[Sequence[str]] = None,
                      wifi_band: Optional[Sequence[str]] = None,
                      num_users: Optional[Sequence[str]] = None) -> pd.DataFrame:
    """Row filter by environment / wifi_band / number_of_users.

    Mirrors wifi_csi/load_data.py:15-44 (`load_data_y`): each filter is an
    ``isin`` over string values; ``None`` disables that filter. The video
    variant simply never passes wifi_band.
    """
    out = df
    if environment is not None:
        out = out[out["environment"].isin(list(environment))]
    if wifi_band is not None:
        out = out[out["wifi_band"].isin(list(wifi_band))]
    if num_users is not None:
        out = out[out["number_of_users"].isin(list(num_users))]
    return out


def label_list(df: pd.DataFrame) -> List[str]:
    return df["label"].to_list()
