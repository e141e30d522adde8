"""Config tree, annotation filters, splits, and CSI IO tests."""

import numpy as np
import pandas as pd
import pytest

from multi_modal_csi_tpu.core.config import Config, apply_env_overrides, load_config
from multi_modal_csi_tpu.data.annotation import filter_annotation
from multi_modal_csi_tpu.data.csi_io import flatten_features, load_csi_windows
from multi_modal_csi_tpu.data.splits import (concat_env_splits, env_split,
                                             valid_test_split)


def test_config_defaults_match_reference_preset():
    cfg = Config()
    assert cfg.model == "DETR" and cfg.task == "activity"
    assert cfg.nn.lr == 5e-4 and cfg.nn.batch_size == 16 and cfg.nn.epoch == 300
    assert cfg.nn.loss.aux_loss_weight == 0.25
    assert cfg.nn.num_obj_queries == 5 and cfg.nn.token_length == 10
    assert cfg.data.length == 3000 and cfg.data.wifi_band == ["5"]


def test_config_override_dotted_and_coercion():
    cfg = Config().override({"nn.lr": "0.001", "data.environment": "classroom,empty_room",
                             "nn.batch_size": "32"})
    assert cfg.nn.lr == 0.001
    assert cfg.data.environment == ["classroom", "empty_room"]
    assert cfg.nn.batch_size == 32
    with pytest.raises(KeyError):
        Config().override({"nn.bogus": 1})


def test_env_overlay_matches_config_modifier_vars():
    env = {"LEARNING_RATE": "0.01", "NUM_DECODER_LAYERS": "3",
           "ENVIRONMENTS_EXP": "classroom, meeting_room",
           "DATA_PATH": "/data/wimans", "AUX_LOSS": "0.5"}
    cfg = apply_env_overrides(Config(), env)
    assert cfg.nn.lr == 0.01
    assert cfg.nn.num_decoder_layers == 3
    assert cfg.data.environment == ["classroom", "meeting_room"]
    assert cfg.path.data_x == "/data/wimans/wifi_csi/amp"
    assert cfg.path.data_y == "/data/wimans/annotation.csv"
    assert cfg.nn.loss.aux_loss_weight == 0.5


def test_load_config_json(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text('{"model": "MLP", "nn": {"lr": 0.002, "loss": {"label_smoothing": 0.1}}}')
    cfg = load_config(str(p), use_env=False)
    assert cfg.model == "MLP" and cfg.nn.lr == 0.002
    assert cfg.nn.loss.label_smoothing == 0.1


def test_filter_annotation_string_semantics(annotation_df):
    out = filter_annotation(annotation_df, environment=["classroom"],
                            wifi_band=["2.4"], num_users=["1", "2"])
    assert len(out) > 0
    assert set(out["environment"]) == {"classroom"}
    assert set(out["wifi_band"]) == {"2.4"}
    assert set(out["number_of_users"]) <= {"1", "2"}
    # band "5" must not match "5GHz"-style strings; filters are exact
    none = filter_annotation(annotation_df, wifi_band=["5GHz"])
    assert len(none) == 0


def test_env_split_reproduces_sklearn_seed():
    from sklearn.model_selection import train_test_split
    x = np.arange(100).reshape(50, 2)
    y = np.arange(50)
    want = train_test_split(x, y, test_size=0.2, shuffle=True, random_state=103)
    got = env_split(x, y)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # valid/test split with seed 39
    want2 = train_test_split(x, y, test_size=0.5, shuffle=True, random_state=39)
    got2 = valid_test_split(x, y)
    for g, w in zip(got2, want2):
        np.testing.assert_array_equal(g, w)


def test_concat_env_splits():
    a = (np.ones((2, 3)), np.ones((1, 3)), np.ones(2), np.ones(1))
    b = (np.zeros((3, 3)), np.zeros((1, 3)), np.zeros(3), np.zeros(1))
    xtr, xte, ytr, yte = concat_env_splits([a, b])
    assert xtr.shape == (5, 3) and xte.shape == (2, 3)
    assert ytr.shape == (5,) and yte.shape == (2,)


def test_load_csi_windows_left_pad(tmp_path):
    # short sample gets zeros at the FRONT of the time axis
    arr = np.arange(2 * 3 * 3 * 30, dtype=np.float32).reshape(2, 3, 3, 30) + 1
    np.save(tmp_path / "s1.npy", arr)
    long = np.ones((7, 3, 3, 30), dtype=np.float32)
    np.save(tmp_path / "s2.npy", long)
    out = load_csi_windows(str(tmp_path), ["s1", "s2"], length=5)
    assert out.shape == (2, 5, 3, 3, 30)
    assert (out[0, :3] == 0).all()
    np.testing.assert_array_equal(out[0, 3:], arr)
    # long sample keeps its LAST 5 steps
    assert (out[1] == 1).all()
    flat = flatten_features(out)
    assert flat.shape == (2, 5, 270)


def test_serving_dtype_defaults():
    """VERDICT r2 next #8: "auto" must pick the measured per-model winner —
    bf16 fleet-wide would slow Swin at serving batches (BASELINE.md r2
    sweep); MViT flipped to bf16 in r3 with the tiled flash serving path;
    explicit settings always win."""
    from multi_modal_csi_tpu.core.config import resolve_serving_dtype
    assert resolve_serving_dtype("auto", "Swin-T") == "float32"
    assert resolve_serving_dtype("auto", "Swin-S") == "float32"
    assert resolve_serving_dtype("auto", "MViT-v1") == "bfloat16"
    assert resolve_serving_dtype("auto", "MViT-v2") == "bfloat16"
    assert resolve_serving_dtype("auto", "S3D") == "bfloat16"
    assert resolve_serving_dtype("auto", "ResNet") == "bfloat16"
    assert resolve_serving_dtype("auto", "DETR") == "bfloat16"
    assert resolve_serving_dtype("bfloat16", "Swin-T") == "bfloat16"
    assert resolve_serving_dtype("float32", "S3D") == "float32"


def test_serving_batch_defaults():
    """Measured throughput knees (BASELINE.md batch-scaling sweeps) are the
    "auto" serving batch; explicit values always win."""
    from multi_modal_csi_tpu.core.config import resolve_serving_batch
    assert resolve_serving_batch("DETR") == 256
    assert resolve_serving_batch("MLP") == 256
    assert resolve_serving_batch("ResNet") == 64
    assert resolve_serving_batch("S3D") == 32
    assert resolve_serving_batch("Swin-T") == 2
    assert resolve_serving_batch("MViT-v2") == 2
    assert resolve_serving_batch("S3D", 8) == 8
