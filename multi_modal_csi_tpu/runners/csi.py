"""CSI experiment driver: data selection -> per-model repeat loop -> results.

Mirrors the reference's run_main.py flow:
  master_splitter (:20-66): per-environment annotation filter + CSI load +
  label encoding + model-specific target reduction (:39-47) + 80/20 split
  (seed 103), concatenated across environments;
  dispatch table (:111-140) -> per-model runner: seeds r+39, optimizer/loss
  per SURVEY.md §2.2's table, engine train, final test, JSON-able result.

Divergences from the reference are deliberate fixes of its known drift
(SURVEY.md §2.6): the baseline runners pass var_mode="baseline" (the reference
omits it -> TypeError), and CNN-1D's final eval uses the count-metric pipeline
(the reference calls an undefined function).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np
from sklearn.metrics import accuracy_score, classification_report

from ..core.checkpoint import component_path, restore_scenario, save_components
from ..core.config import Config
from ..data.annotation import filter_annotation, label_list, load_annotation
from ..data.csi_io import flatten_features
from ..data.native_loader import load_csi_windows_native as load_csi_windows
from ..data.encoders import encode_labels, reduce_dataset
from ..data.splits import concat_env_splits, env_split, valid_test_split
from ..losses.basic import bce_with_logits, mse, smooth_l1
from ..losses.matching import (HungarianMatchingLoss, count_based_loss,
                               permutation_matching_loss)
from ..metrics.performance import performance_metrics
from ..models import csi as csi_models
from ..train.loop import (cast_for_serving, eval_dataset, fit,
                          make_eval_fn)
from ..train.transfer import transfer_optimizer
from ..utils.complexity import complexity_report
from ..utils.logging import MetricWriter
from ..utils.results import NumpyJSONEncoder


# --------------------------------------------------------------------- #
# model table
# --------------------------------------------------------------------- #

@dataclasses.dataclass
class CSIModelSpec:
    key: str
    build: Callable[[Tuple[int, ...], int, Config], Any]
    make_loss: Callable[[Config, int], Callable]
    mode: str                      # performance_metrics mode
    input_layout: str = "seq"      # "seq" (B,T,F) | "flat" (B, T*F)
    target: str = "raw"            # raw | reduce | reduce_pad | reduce_sum
    valid_split: bool = False      # THAT/DETR-family 50/50 valid/test split
    weight_decay: float = 0.0
    final_eval: str = "report"     # report | metrics | count_round
    batch_axis: int = 0            # batch axis in model OUTPUT


def _wd_from_preset(cfg: Config, _out: int) -> float:
    return cfg.nn.weight_decay


CSI_MODELS: Dict[str, CSIModelSpec] = {
    "MLP": CSIModelSpec(
        key="MLP",
        build=lambda xs, out, cfg: csi_models.MLP(out_features=out),
        make_loss=lambda cfg, out: lambda o, t: bce_with_logits(o, t, 4.0),
        mode="baseline", input_layout="flat", weight_decay=1e-3),
    "LSTM": CSIModelSpec(
        key="LSTM",
        build=lambda xs, out, cfg: csi_models.LSTMModel(out_features=out),
        make_loss=lambda cfg, out: lambda o, t: bce_with_logits(o, t, 6.0),
        mode="baseline"),
    "CNN-1D": CSIModelSpec(
        key="CNN-1D",
        build=lambda xs, out, cfg: csi_models.CNN1D(out_features=out),
        make_loss=lambda cfg, out: lambda o, t: mse(o, t),
        mode="baseline", final_eval="count_round"),
    "CNN-2D": CSIModelSpec(
        key="CNN-2D",
        build=lambda xs, out, cfg: csi_models.CNN2D(out_features=out),
        make_loss=lambda cfg, out: lambda o, t: bce_with_logits(o, t, 6.0),
        mode="baseline", weight_decay=1e-4),
    "CLSTM": CSIModelSpec(
        key="CLSTM",
        build=lambda xs, out, cfg: csi_models.CLSTM(out_features=out),
        make_loss=lambda cfg, out: lambda o, t: bce_with_logits(o, t, 8.0),
        mode="baseline"),
    "ABLSTM": CSIModelSpec(
        key="ABLSTM",
        build=lambda xs, out, cfg: csi_models.ABLSTM(out_features=out),
        make_loss=lambda cfg, out: lambda o, t: bce_with_logits(o, t, 6.0),
        mode="baseline"),
    "THAT": CSIModelSpec(
        key="THAT",
        build=lambda xs, out, cfg: csi_models.THAT(out_features=out),
        make_loss=lambda cfg, out: lambda o, t: bce_with_logits(o, t, 4.0),
        mode="baseline", valid_split=True,
        weight_decay=2e-4, final_eval="metrics"),
    "THAT_MULTI_HEAD": CSIModelSpec(
        key="THAT_MULTI_HEAD",
        build=lambda xs, out, cfg: csi_models.THATMultiHead(out_features=out),
        make_loss=lambda cfg, out: permutation_matching_loss,
        mode="multi_head", target="reduce", final_eval="metrics"),
    "THAT_COUNT": CSIModelSpec(
        key="THAT_COUNT",
        build=lambda xs, out, cfg: csi_models.THATCount(),
        make_loss=lambda cfg, out: lambda o, t: smooth_l1(o, t),
        mode="count_classification", valid_split=True, final_eval="metrics"),
    "THAT_COUNT_CONSTRAINED": CSIModelSpec(
        key="THAT_COUNT_CONSTRAINED",
        build=lambda xs, out, cfg: csi_models.THATCountConstrained(),
        make_loss=lambda cfg, out: count_based_loss,
        mode="count_classification_withConstrain", target="reduce_sum",
        weight_decay=1e-4, final_eval="metrics"),
    "THAT_ENCODER": CSIModelSpec(
        key="THAT_ENCODER",
        build=lambda xs, out, cfg: csi_models.THATEncoderDETR(
            temp_cross=cfg.nn.cross_attention_temp,
            num_queries=cfg.nn.num_obj_queries,
            num_decoder_layers=cfg.nn.num_decoder_layers),
        make_loss=lambda cfg, out: HungarianMatchingLoss(
            cost_class_weight=cfg.nn.loss.cost_class_weight,
            aux_loss_weight=cfg.nn.loss.aux_loss_weight,
            label_smoothing=cfg.nn.loss.label_smoothing,
            class_imbalance_weight=cfg.nn.loss.class_imbalance_weight,
            per_layer_matching=True),
        mode="multi_head", target="reduce_pad", valid_split=True,
        weight_decay=2e-4, final_eval="metrics", batch_axis=1),
    "DETR": CSIModelSpec(
        key="DETR",
        build=lambda xs, out, cfg: csi_models.DETRMultiUser(
            token_length=cfg.nn.token_length,
            num_decoder_layers=cfg.nn.num_decoder_layers,
            temp_cross=cfg.nn.cross_attention_temp,
            num_queries=cfg.nn.num_obj_queries,
            dim_feedforward=cfg.nn.dim_ffn),
        make_loss=lambda cfg, out: HungarianMatchingLoss(
            cost_class_weight=cfg.nn.loss.cost_class_weight,
            aux_loss_weight=cfg.nn.loss.aux_loss_weight,
            label_smoothing=cfg.nn.loss.label_smoothing,
            class_imbalance_weight=cfg.nn.loss.class_imbalance_weight),
        mode="multi_head", target="reduce_pad", valid_split=True,
        weight_decay=2e-4, final_eval="metrics", batch_axis=1),
}


# --------------------------------------------------------------------- #
# data assembly (master_splitter)
# --------------------------------------------------------------------- #

def apply_target_reduction(y: np.ndarray, target: str, cfg: Config) -> np.ndarray:
    """Model-dependent target transform (run_main.py:39-47)."""
    if target == "raw":
        return y
    if target == "reduce":
        return reduce_dataset(y)
    if target == "reduce_pad":
        return reduce_dataset(y, cfg.nn.num_obj_queries)
    if target == "reduce_sum":
        return reduce_dataset(y).sum(axis=1)
    raise ValueError(f"unknown target transform: {target}")


def master_split(cfg: Config, target: str = "raw",
                 data_cfg=None) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-environment load + encode + reduce + seeded split + concat."""
    data_cfg = data_cfg or cfg.data
    annotation = load_annotation(cfg.path.data_y)
    per_env = []
    for env in data_cfg.environment:
        df = filter_annotation(annotation, environment=[env],
                               wifi_band=data_cfg.wifi_band,
                               num_users=data_cfg.num_users)
        x = load_csi_windows(cfg.path.data_x, label_list(df),
                             length=data_cfg.length)
        y = encode_labels(df, cfg.task, cfg.encoding_activity,
                          cfg.encoding_location)
        y = apply_target_reduction(y, target, cfg)
        per_env.append(env_split(x, y))
    return concat_env_splits(per_env)


def _layout(x: np.ndarray, layout: str) -> np.ndarray:
    if layout == "flat":
        return x.reshape(x.shape[0], -1)
    return flatten_features(x) if x.ndim > 3 else x


# --------------------------------------------------------------------- #
# final-test evaluators
# --------------------------------------------------------------------- #

def _final_report(logits: np.ndarray, y_test: np.ndarray,
                  threshold: float) -> Tuple[float, dict]:
    """Baseline-family final eval: sigmoid > threshold, subset accuracy +
    classification report (model/mlp.py:161-184)."""
    pred = (1.0 / (1.0 + np.exp(-logits)) > threshold).astype(float)
    y_c = y_test.reshape(-1, y_test.shape[-1]).astype(int)
    p_c = pred.reshape(-1, y_test.shape[-1]).astype(int)
    acc = accuracy_score(y_c, p_c)
    report = classification_report(y_c, p_c, digits=6, zero_division=0,
                                   output_dict=True)
    return acc, report


def _count_round_metrics(logits: np.ndarray, y_test: np.ndarray) -> dict:
    """CNN-1D final eval (intended semantics; the reference's is broken —
    SURVEY.md §2.6): round+clamp the per-user-one-hot regression to counts."""
    pred = np.clip(np.round(logits), 0, 5)
    users = y_test.shape[1] if y_test.ndim == 3 else 6
    pred_counts = pred.reshape(pred.shape[0], users, -1).sum(axis=1)
    true_counts = y_test.reshape(y_test.shape[0], users, -1).sum(axis=1)
    return performance_metrics(true_counts, pred_counts,
                               var_mode="count_classification_withConstrain")


# --------------------------------------------------------------------- #
# the runner
# --------------------------------------------------------------------- #

def _mesh_sharding(cfg: Config):
    """Batch sharding over the config's device mesh (data parallelism); None
    on a single device."""
    from ..parallel.mesh import config_batch_sharding
    return config_batch_sharding(cfg)


def run_csi_model(cfg: Config,
                  data: Optional[Tuple[np.ndarray, ...]] = None,
                  writer_factory: Optional[Callable[[str], MetricWriter]] = None,
                  use_mesh: bool = False) -> Dict[str, Any]:
    """Run `cfg.repeat` seeded experiments for cfg.model; returns the result
    dict that run_main.py would JSON-dump. With use_mesh, batches are sharded
    over the 'data' axis of the config mesh (data-parallel training)."""
    key = cfg.model
    if key == "ST-RF":
        return _run_strf(cfg, data)
    if key == "SSL":
        from .ssl import run_ssl
        return run_ssl(cfg, data)
    if key == "dual_band":
        from .dual_band import run_dual_band
        return run_dual_band(cfg, data)
    if key not in CSI_MODELS:
        raise ValueError(f"unknown CSI model: {key}")
    spec = CSI_MODELS[key]

    if data is None:
        x_tr, x_te, y_tr, y_te = master_split(cfg, spec.target)
    else:
        x_tr, x_te, y_tr, y_te = data

    if spec.valid_split:
        x_va, x_te, y_va, y_te = valid_test_split(x_te, y_te)
    else:
        x_va, y_va = x_te, y_te

    x_tr = _layout(x_tr, spec.input_layout)
    x_va = _layout(x_va, spec.input_layout)
    x_te = _layout(x_te, spec.input_layout)

    out_dim = int(np.asarray(y_tr[0]).reshape(-1).shape[0]) \
        if spec.target == "raw" else int(np.asarray(y_tr[0]).shape[-1])

    # engine-level target views (train.py:91-94)
    if spec.mode == "baseline":
        y_tr_fit = y_tr.reshape(y_tr.shape[0], -1)
        y_va_fit = y_va.reshape(y_va.shape[0], -1)
    elif spec.mode == "count_classification":
        y_tr_fit = y_tr.sum(axis=1)
        y_va_fit = y_va.sum(axis=1)
    else:
        y_tr_fit, y_va_fit = y_tr, y_va

    result: Dict[str, Any] = {}
    accuracies: List[float] = []
    times_train: List[float] = []
    times_test: List[float] = []
    last_metrics: Dict[str, Any] = {}

    model0 = spec.build(x_tr.shape[1:], out_dim, cfg)
    example = jax.numpy.asarray(x_tr[:1])
    v0 = model0.init({"params": jax.random.PRNGKey(0)}, example, train=False)
    result["complexity"] = complexity_report(model0, v0, example)

    # load/import the pretrained checkpoint ONCE (a torch .pt goes through
    # the full strict importer — repeating that per repeat was pure waste;
    # ADVICE r3). The restored host-side tree is reused by every repeat.
    pretrained_variables = None
    if cfg.pretrained_path:
        pretrained_variables = restore_scenario(
            v0["params"], v0.get("batch_stats", {}), cfg.pretrained_path,
            cfg.transfer_scenario, model_key=key)

    repeats = cfg.repeat
    for r in range(repeats):
        seed = r + 39
        model = spec.build(x_tr.shape[1:], out_dim, cfg)
        loss_fn = spec.make_loss(cfg, out_dim)

        init_variables = None
        tx = None
        if pretrained_variables is not None:
            init_variables = pretrained_variables
            tx = transfer_optimizer(pretrained_variables[0], cfg.nn.lr,
                                    cfg.transfer_scenario)

        writer = writer_factory(f"{key}_{r}") if writer_factory else None
        sharding = _mesh_sharding(cfg) if use_mesh else None
        t0 = time.time()
        fitres = fit(model, x_tr, y_tr_fit, x_va, y_va_fit,
                     loss_fn=loss_fn, mode=spec.mode, lr=cfg.nn.lr,
                     epochs=cfg.nn.epoch, batch_size=cfg.nn.batch_size,
                     seed=seed, weight_decay=spec.weight_decay,
                     threshold=cfg.nn.threshold, patience=cfg.nn.patience,
                     warmup_epochs=cfg.nn.scheduler.num_warmup_epochs,
                     min_lr_ratio=cfg.nn.scheduler.min_lr_ratio,
                     batch_axis=spec.batch_axis, writer=writer,
                     init_variables=init_variables, tx=tx,
                     sharding=sharding, fsdp=cfg.mesh.fsdp,
                     train_dtype=cfg.train_dtype)
        t1 = time.time()

        if cfg.save_model:
            save_components(component_path(cfg.saving_path,
                                           cfg.data.environment, key),
                            fitres.best_params, fitres.best_batch_stats)

        forward = make_eval_fn(model)
        # final test-set inference — the serving path. compute_dtype
        # "bfloat16" casts weights + eval batches (BASELINE.md serving
        # tables); training above stayed f32 like the reference.
        from ..core.config import resolve_serving_dtype
        eval_params, eval_stats, eval_dtype = (
            fitres.best_params, fitres.best_batch_stats, None)
        if resolve_serving_dtype(cfg.compute_dtype, key) == "bfloat16":
            import jax.numpy as jnp
            eval_dtype = jnp.bfloat16
            eval_params = cast_for_serving(eval_params, eval_dtype)
            eval_stats = cast_for_serving(eval_stats, eval_dtype)
        logits = eval_dataset(forward, eval_params, eval_stats, x_te,
                              batch_axis=spec.batch_axis, dtype=eval_dtype)
        t2 = time.time()

        if spec.final_eval == "report":
            y_eval = y_te.reshape(y_te.shape[0], -1) \
                if spec.mode == "baseline" else y_te
            acc, report = _final_report(logits, y_eval, cfg.nn.threshold)
            result[f"repeat_{r}"] = report
            accuracies.append(acc)
        elif spec.final_eval == "count_round":
            last_metrics = _count_round_metrics(logits, y_te)
            accuracies.append(last_metrics["perfect_prediction_percentage"])
            result[f"repeat_{r}"] = {k: v for k, v in last_metrics.items()
                                     if k != "counting_error_perPerson"}
        else:  # metrics
            if spec.mode == "count_classification":
                y_eval = y_te.sum(axis=1)
            elif spec.mode == "count_classification_withConstrain":
                y_eval = y_te
            else:
                y_eval = y_te
            last_metrics = performance_metrics(
                y_eval, logits, var_mode=spec.mode,
                var_threshold=cfg.nn.threshold)
            accuracies.append(last_metrics["perfect_prediction_percentage"])
            result[f"repeat_{r}"] = {k: v for k, v in last_metrics.items()
                                     if k != "counting_error_perPerson"}

        times_train.append(t1 - t0)
        times_test.append(t2 - t1)
        if writer:
            # per-repeat run-level summary (reference: detr.py:788-804 logs
            # the final test metrics into each repeat's W&B run)
            summary = {"summary/test_accuracy": float(accuracies[-1]),
                       "summary/time_train": times_train[-1],
                       "summary/time_test": times_test[-1]}
            if spec.final_eval != "report" and last_metrics:
                summary.update(
                    {f"summary/{k}": float(v)
                     for k, v in last_metrics.items() if np.isscalar(v)})
            writer.log(summary)
            writer.finish()

    result["accuracy"] = {"avg": float(np.mean(accuracies)),
                          "std": float(np.std(accuracies))}
    result["time_train"] = {"avg": float(np.mean(times_train)),
                            "std": float(np.std(times_train))}
    result["time_test"] = {"avg": float(np.mean(times_test)),
                           "std": float(np.std(times_test))}
    if last_metrics:
        result["final_metrics"] = {k: v for k, v in last_metrics.items()
                                   if k != "counting_error_perPerson"}
    if writer_factory:
        # run-level aggregates over repeats (reference: detr.py:806-829
        # logs avg/std accuracy + timing as a final W&B summary)
        agg = writer_factory(f"{key}_aggregate")
        agg.log({"aggregate/accuracy_avg": result["accuracy"]["avg"],
                 "aggregate/accuracy_std": result["accuracy"]["std"],
                 "aggregate/time_train_avg": result["time_train"]["avg"],
                 "aggregate/time_test_avg": result["time_test"]["avg"]})
        agg.finish()
    return result


def _run_strf(cfg: Config, data) -> Dict[str, Any]:
    """ST-RF runner (model/strf.py:17-113): sklearn pipeline, repeat-seeded."""
    if data is None:
        x_tr, x_te, y_tr, y_te = master_split(cfg, "raw")
    else:
        x_tr, x_te, y_tr, y_te = data
    x_tr = _layout(x_tr, "seq")
    x_te = _layout(x_te, "seq")

    result: Dict[str, Any] = {}
    accuracies, times_train, times_test = [], [], []
    for r in range(cfg.repeat):
        t0 = time.time()
        pred = csi_models.fit_predict_strf(x_tr, y_tr, x_te, seed=r + 39)
        t1 = time.time()
        y_c = y_te.reshape(-1, y_te.shape[-1])
        p_c = pred.reshape(-1, y_te.shape[-1])
        accuracies.append(accuracy_score(y_c, p_c))
        result[f"repeat_{r}"] = classification_report(
            y_c, p_c, digits=6, zero_division=0, output_dict=True)
        times_train.append(t1 - t0)
        times_test.append(time.time() - t1)
    result["accuracy"] = {"avg": float(np.mean(accuracies)),
                          "std": float(np.std(accuracies))}
    result["time_train"] = {"avg": float(np.mean(times_train)),
                            "std": float(np.std(times_train))}
    result["time_test"] = {"avg": float(np.mean(times_test)),
                           "std": float(np.std(times_test))}
    return result


def run_experiment(cfg: Config, data=None, save: bool = True) -> Dict[str, Any]:
    """Top-level entry mirroring run_main.py:88-160."""
    result = run_csi_model(cfg, data)
    result["model"] = cfg.model
    result["task"] = cfg.task
    result["data"] = dataclasses.asdict(cfg.data)
    result["nn"] = dataclasses.asdict(cfg.nn)
    if save and cfg.path.save:
        import os
        os.makedirs(os.path.dirname(cfg.path.save) or ".", exist_ok=True)
        with open(cfg.path.save, "w") as f:
            json.dump(result, f, indent=4, cls=NumpyJSONEncoder)
    return result
