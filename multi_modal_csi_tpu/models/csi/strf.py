"""ST-RF: spectrogram features + random forest (the only non-NN model).

Reference: benchmark/wifi_csi/model/strf.py:17-113 — per-sample per-channel
mean-centering (StandardScaler(with_std=None)), scipy spectrogram
(nperseg=16, noverlap=8, nfft=16) over time, mean over frames, multi-output
RandomForestClassifier(n_estimators=10, bootstrap=False, seed r+39).

The feature pipeline stays scipy/sklearn-backed on host (capability parity;
SURVEY.md §7 step 5) — a 10-tree random forest has no TPU-shaped compute.
`spectrogram_features` is the shared feature extractor, exposed for tests.
"""

from __future__ import annotations

import numpy as np
from scipy import signal
from sklearn.ensemble import RandomForestClassifier


def spectrogram_features(x: np.ndarray) -> np.ndarray:
    """(N, T, C) CSI windows -> (N, C * 9) averaged spectrogram features."""
    x = x - x.mean(axis=1, keepdims=True)             # per-sample center
    xt = np.swapaxes(x, -1, -2)                       # (N, C, T)
    _, _, ft = signal.spectrogram(xt, noverlap=8, nperseg=16, nfft=16)
    ft = ft.mean(axis=-1)                             # average over frames
    return ft.reshape(ft.shape[0], -1)


def fit_predict_strf(x_train: np.ndarray, y_train: np.ndarray,
                     x_test: np.ndarray, seed: int):
    """Train the forest and predict test labels (flattened multi-output)."""
    f_train = spectrogram_features(x_train)
    f_test = spectrogram_features(x_test)
    model = RandomForestClassifier(n_estimators=10, random_state=seed,
                                   bootstrap=False)
    model.fit(f_train, y_train.reshape(y_train.shape[0], -1))
    pred = model.predict(f_test)
    return np.asarray(pred)
