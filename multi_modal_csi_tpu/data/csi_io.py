"""CSI amplitude loading: per-label .npy files, left-padded to a fixed window.

Reference: wifi_csi/load_data.py:48-78 (`load_data_x`) loads each sample's
(T<=3000, 3, 3, 30) float32 array and LEFT-pads the time axis with zeros to
`length`. The padded, batch-major layout is what the models and the sharded
input pipeline consume.

The batched loader here avoids the reference's per-sample Python list append:
it allocates the output array once and fills slices, which also gives the
left-pad for free (zeros-initialized buffer, write at the tail).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import numpy as np


def load_csi_windows(amp_dir: str,
                     labels: Sequence[str],
                     length: int = 3000,
                     num_threads: int = 8) -> np.ndarray:
    """Load CSI amplitude for `labels` -> (N, length, 3, 3, 30) float32.

    Time axis is left-padded with zeros (load_data.py:70-72); windows longer
    than `length` keep their LAST `length` steps (np.pad with negative width
    would fail in the reference; in practice all WiMANS windows are <=3000).
    """
    paths = [os.path.join(amp_dir, f"{label}.npy") for label in labels]
    probe = np.load(paths[0]) if paths else np.zeros((0, 3, 3, 30), np.float32)
    trailing = probe.shape[1:]
    out = np.zeros((len(paths), length, *trailing), dtype=np.float32)

    def _fill(i: int) -> None:
        arr = np.load(paths[i])
        t = min(arr.shape[0], length)
        out[i, length - t:] = arr[-t:]

    if paths:
        _fill(0)  # reuse nothing, but keeps probe/out dtype honest
        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            list(pool.map(_fill, range(1, len(paths))))
    return out


def flatten_features(x: np.ndarray) -> np.ndarray:
    """(N, T, 3, 3, 30) -> (N, T, 270): the layout every sequence model uses
    (e.g. model/lstm.py:96-97)."""
    return x.reshape(x.shape[0], x.shape[1], -1)
