"""Dataset exploration plots and statistics.

Covers the reference's visualize/visualize.ipynb analyses as reproducible
functions: CSI amplitude heatmaps, per-band packet-loss statistics (window
lengths vs the 3000-step target), and annotation label distributions.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd


def csi_heatmap(window: np.ndarray, save_path: Optional[str] = None,
                title: str = "CSI amplitude"):
    """Time x (flattened antenna/subcarrier) amplitude heatmap for one window."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    flat = window.reshape(window.shape[0], -1)
    plt.figure(figsize=(12, 5))
    plt.imshow(flat.T, aspect="auto", origin="lower", cmap="viridis")
    plt.xlabel("packet (time)")
    plt.ylabel("rx x antenna x subcarrier")
    plt.title(title)
    plt.colorbar(label="|CSI|")
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        plt.savefig(save_path)
    plt.close()


def packet_loss_stats(amp_dir: str, labels: Sequence[str],
                      target_len: int = 3000) -> Dict[str, float]:
    """Window-length statistics: how much of each 3000-step window is real
    data vs left-pad (the notebook's per-band packet-loss analysis)."""
    lengths = []
    for label in labels:
        path = os.path.join(amp_dir, f"{label}.npy")
        # read only the header for the first-axis length
        with open(path, "rb") as f:
            version = np.lib.format.read_magic(f)
            shape, _, _ = np.lib.format._read_array_header(f, version)
        lengths.append(shape[0])
    lengths = np.asarray(lengths)
    loss = 1.0 - np.minimum(lengths, target_len) / target_len
    return {
        "num_windows": int(lengths.size),
        "mean_length": float(lengths.mean()),
        "min_length": int(lengths.min()),
        "max_length": int(lengths.max()),
        "mean_packet_loss": float(loss.mean()),
        "p95_packet_loss": float(np.percentile(loss, 95)),
        "windows_full": int((lengths >= target_len).sum()),
    }


def label_distribution(df: pd.DataFrame) -> Dict[str, Dict[str, int]]:
    """Counts per environment / wifi_band / number_of_users / activity."""
    out: Dict[str, Dict[str, int]] = {}
    for col in ["environment", "wifi_band", "number_of_users"]:
        out[col] = df[col].value_counts().to_dict()
    acts: Dict[str, int] = {}
    for i in range(1, 7):
        for val, count in df[f"user_{i}_activity"].value_counts().items():
            if isinstance(val, str) and val != "nan":
                acts[val] = acts.get(val, 0) + int(count)
    out["activity"] = acts
    return out


def plot_label_distribution(df: pd.DataFrame, save_dir: str) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    dist = label_distribution(df)
    os.makedirs(save_dir, exist_ok=True)
    for key, counts in dist.items():
        plt.figure(figsize=(8, 4))
        names = list(counts.keys())
        plt.bar(range(len(names)), [counts[n] for n in names])
        plt.xticks(range(len(names)), names, rotation=45, ha="right")
        plt.title(f"samples per {key}")
        plt.tight_layout()
        plt.savefig(f"{save_dir}/dist_{key}.png")
        plt.close()
