"""Dataset-exploration utilities (visualize.ipynb coverage)."""

import os

import numpy as np

from multi_modal_csi_tpu.utils.explore import (csi_heatmap,
                                               label_distribution,
                                               packet_loss_stats,
                                               plot_label_distribution)


def test_csi_heatmap_writes_png(tmp_path, rng):
    window = rng.normal(size=(120, 3, 3, 30)).astype(np.float32)
    path = str(tmp_path / "heat.png")
    csi_heatmap(window, save_path=path)
    assert os.path.exists(path)


def test_packet_loss_stats(tmp_path, rng):
    for i, t in enumerate([3000, 2400, 1500]):
        np.save(tmp_path / f"s{i}.npy",
                rng.normal(size=(t, 3, 3, 30)).astype(np.float32))
    stats = packet_loss_stats(str(tmp_path), ["s0", "s1", "s2"], 3000)
    assert stats["num_windows"] == 3
    assert stats["windows_full"] == 1
    assert abs(stats["mean_packet_loss"] - np.mean([0, 0.2, 0.5])) < 1e-6


def test_label_distribution(annotation_df, tmp_path):
    dist = label_distribution(annotation_df)
    assert set(dist["environment"]) == {"classroom", "meeting_room", "empty_room"}
    assert "walk" in dist["activity"]
    plot_label_distribution(annotation_df.head(500), str(tmp_path))
    assert os.path.exists(tmp_path / "dist_environment.png")
