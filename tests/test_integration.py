"""End-to-end integration: real annotation.csv semantics + synthetic CSI amp
cache -> master split -> train -> result JSON, through the public CLI-level
entry points."""

import json
import os

import numpy as np
import pytest

from multi_modal_csi_tpu.core.config import Config
from multi_modal_csi_tpu.runners.csi import master_split, run_experiment


@pytest.fixture(scope="module")
def amp_env(tmp_path_factory, annotation_df):
    """Synthetic amp dir for a small real-annotation selection."""
    d = tmp_path_factory.mktemp("wimans")
    amp = d / "amp"
    amp.mkdir()
    sel = annotation_df[(annotation_df["environment"] == "classroom")
                        & (annotation_df["wifi_band"] == "2.4")
                        & (annotation_df["number_of_users"].isin(["0", "1"]))]
    sel = sel.head(40)
    rng = np.random.default_rng(0)
    for label in sel["label"]:
        t = rng.integers(50, 80)
        np.save(amp / f"{label}.npy",
                rng.normal(size=(t, 3, 3, 30)).astype(np.float32))
    # a trimmed annotation with exactly these rows
    csv = d / "annotation.csv"
    sel.to_csv(csv, index=False)
    return str(amp), str(csv)


def _cfg(amp_dir, csv_path, tmp_path, model="MLP"):
    return Config().override({
        "model": model, "task": "activity", "repeat": 1,
        "path.data_x": amp_dir, "path.data_y": csv_path,
        "path.save": str(tmp_path / "result.json"),
        "data.environment": ["classroom"], "data.wifi_band": ["2.4"],
        "data.num_users": ["0", "1"], "data.length": 100,
        "nn.epoch": 2, "nn.batch_size": 8, "nn.patience": 5,
    })


def test_master_split_real_annotation(amp_env, tmp_path):
    amp_dir, csv = amp_env
    cfg = _cfg(amp_dir, csv, tmp_path)
    x_tr, x_te, y_tr, y_te = master_split(cfg, "raw")
    assert x_tr.shape[1:] == (100, 3, 3, 30)
    assert y_tr.shape[1:] == (6, 9)
    assert len(x_tr) + len(x_te) == 40
    # left-pad: short windows have zero heads
    assert (x_tr[0][:10] == 0).all()


def test_run_experiment_mlp_end_to_end(amp_env, tmp_path):
    amp_dir, csv = amp_env
    cfg = _cfg(amp_dir, csv, tmp_path, model="MLP")
    result = run_experiment(cfg, save=True)
    assert os.path.exists(cfg.path.save)
    with open(cfg.path.save) as f:
        saved = json.load(f)
    assert saved["model"] == "MLP"
    assert "repeat_0" in saved
    assert 0.0 <= saved["accuracy"]["avg"] <= 1.0
    assert saved["complexity"]["parameter"] > 0
