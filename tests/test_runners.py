"""Hermetic runner tests: synthetic CSI windows + real annotation semantics,
tiny configs, every runner family end-to-end."""

import numpy as np
import pytest

from multi_modal_csi_tpu.core.config import Config
from multi_modal_csi_tpu.data.encoders import reduce_dataset
from multi_modal_csi_tpu.runners.csi import (CSI_MODELS,
                                             apply_target_reduction,
                                             run_csi_model, run_experiment)


def _tiny_cfg(model, **nn_over):
    cfg = Config().override({
        "model": model, "repeat": 1,
        "nn.epoch": 1, "nn.batch_size": 8, "nn.patience": 10,
        "nn.token_length": 10, "nn.num_decoder_layers": 2,
        "nn.dim_ffn": 32,
    })
    if nn_over:
        cfg = cfg.override(nn_over)
    return cfg


def _synth(n=32, t=200, f=20, users=6, classes=9, seed=0, target="raw", cfg=None):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, t, f)).astype(np.float32)
    y = np.zeros((n, users, classes), np.int64)
    for i in range(n):
        for u in rng.choice(users, size=rng.integers(0, 5), replace=False):
            y[i, u, rng.integers(0, classes)] = 1
    y = apply_target_reduction(y, target, cfg or Config())
    split = int(n * 0.8)
    return x[:split], x[split:], y[:split], y[split:]


@pytest.mark.parametrize("model", ["MLP", "LSTM", "CNN-2D", "ABLSTM"])
def test_baseline_runners(model):
    cfg = _tiny_cfg(model)
    data = _synth()
    result = run_csi_model(cfg, data=data)
    assert "repeat_0" in result
    assert 0.0 <= result["accuracy"]["avg"] <= 1.0
    assert "complexity" in result and result["complexity"]["parameter"] > 0


def test_cnn1d_count_round_runner():
    cfg = _tiny_cfg("CNN-1D")
    result = run_csi_model(cfg, data=_synth())
    assert "accuracy" in result
    assert "final_metrics" in result


def test_that_runner_with_valid_split():
    cfg = _tiny_cfg("THAT")
    result = run_csi_model(cfg, data=_synth(n=40))
    assert "final_metrics" in result
    assert "total_error" in result["final_metrics"]


def test_that_multi_head_runner():
    cfg = _tiny_cfg("THAT_MULTI_HEAD")
    spec = CSI_MODELS["THAT_MULTI_HEAD"]
    data = _synth(target=spec.target, cfg=cfg)
    result = run_csi_model(cfg, data=data)
    assert "final_metrics" in result


def test_that_count_runners():
    cfg = _tiny_cfg("THAT_COUNT")
    result = run_csi_model(cfg, data=_synth(n=40))
    assert "final_metrics" in result

    cfg = _tiny_cfg("THAT_COUNT_CONSTRAINED")
    spec = CSI_MODELS["THAT_COUNT_CONSTRAINED"]
    result = run_csi_model(cfg, data=_synth(target=spec.target, cfg=cfg))
    assert "final_metrics" in result


def test_detr_runner():
    cfg = _tiny_cfg("DETR")
    spec = CSI_MODELS["DETR"]
    data = _synth(n=40, t=300, f=30, target=spec.target, cfg=cfg)  # 30 % 6 == 0
    result = run_csi_model(cfg, data=data)
    assert "final_metrics" in result
    assert result["complexity"]["parameter"] > 0


def test_strf_runner():
    cfg = _tiny_cfg("ST-RF")
    result = run_csi_model(cfg, data=_synth(t=64))
    assert 0.0 <= result["accuracy"]["avg"] <= 1.0


def test_ssl_runner():
    cfg = _tiny_cfg("SSL")
    result = run_csi_model(cfg, data=_synth(n=40, t=1800))
    assert "accuracy" in result


def test_dual_band_runner():
    cfg = _tiny_cfg("dual_band")
    x_tr, x_te, y_tr, y_te = _synth(n=40, t=1800)
    data = (np.stack([x_tr, x_tr], axis=1), np.stack([x_te, x_te], axis=1),
            y_tr, y_te)
    result = run_csi_model(cfg, data=data)
    assert "accuracy" in result


def test_run_experiment_writes_json(tmp_path):
    cfg = _tiny_cfg("MLP").override({"path.save": str(tmp_path / "result.json")})
    result = run_experiment(cfg, data=_synth(), save=True)
    assert (tmp_path / "result.json").exists()
    assert result["model"] == "MLP" and result["task"] == "activity"


def test_ssl_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.core.checkpoint import load_components
    from multi_modal_csi_tpu.models.csi.ssl import SSLModel
    from multi_modal_csi_tpu.runners.ssl import run_ssl

    cfg = _tiny_cfg("SSL")
    data = _synth(n=24, t=1800)
    path = str(tmp_path / "ssl.msgpack")
    run_ssl(cfg, data=data, save_path=path)

    x_te, y_te = data[1], data[3]
    out_dim = y_te.reshape(y_te.shape[0], -1).shape[-1]
    model = SSLModel(out_features=out_dim)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x_te[:2]), jnp.asarray(x_te[:2]),
                           train=False)
    saved = load_components(path, like={
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {})})
    logits = model.apply({"params": saved["params"],
                          "batch_stats": saved["batch_stats"]},
                         jnp.asarray(x_te), inference=True)
    assert logits.shape == (x_te.shape[0], out_dim)


@pytest.mark.parametrize("task,classes", [("identity", 1), ("location", 5)])
def test_identity_and_location_tasks(task, classes):
    # identity labels are (N, 6) bits; location (N, 6, 5) one-hots
    rng = np.random.default_rng(0)
    n = 32
    x = rng.normal(size=(n, 200, 20)).astype(np.float32)
    if task == "identity":
        y = rng.integers(0, 2, size=(n, 6)).astype(np.int8)
    else:
        y = np.zeros((n, 6, classes), np.int64)
        for i in range(n):
            y[i, rng.integers(0, 6), rng.integers(0, classes)] = 1
    cfg = _tiny_cfg("MLP").override({"task": task})
    split = int(n * 0.8)
    result = run_csi_model(cfg, data=(x[:split], x[split:], y[:split], y[split:]))
    assert 0.0 <= result["accuracy"]["avg"] <= 1.0


def test_writer_receives_repeat_summaries_and_aggregates():
    """Per-repeat summary metrics and run-level aggregates flow through the
    MetricWriter (reference: detr.py:788-829 W&B summaries) — VERDICT r1
    item 10."""
    records = {}

    class Capture:
        def __init__(self, name):
            self.name = name
            records[name] = []

        def log(self, metrics, step=None):
            records[self.name].append(dict(metrics))

        def finish(self):
            pass

    cfg = _tiny_cfg("MLP").override({"repeat": 2})
    run_csi_model(cfg, data=_synth(), writer_factory=Capture)

    per_repeat = [k for k in records if not k.endswith("_aggregate")]
    assert len(per_repeat) == 2
    for k in per_repeat:
        summaries = [r for r in records[k] if "summary/test_accuracy" in r]
        assert len(summaries) == 1
        assert 0.0 <= summaries[0]["summary/test_accuracy"] <= 1.0
    agg_keys = [k for k in records if k.endswith("_aggregate")]
    assert len(agg_keys) == 1
    agg = records[agg_keys[0]][0]
    assert {"aggregate/accuracy_avg", "aggregate/accuracy_std",
            "aggregate/time_train_avg",
            "aggregate/time_test_avg"} <= set(agg)


def test_csi_runner_bf16_serving_eval():
    """compute_dtype='bfloat16' runs the final inference in serving precision
    and lands within tolerance of the f32 metrics (training stays f32)."""
    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = _tiny_cfg("MLP").override({"compute_dtype": dtype})
        results[dtype] = run_csi_model(cfg, data=_synth())
    a = results["float32"]["accuracy"]["avg"]
    b = results["bfloat16"]["accuracy"]["avg"]
    assert abs(a - b) < 0.1
