"""Video experiment driver.

Mirrors benchmark/video/run.py:37-99 + video/train.py:19-176:
  - annotation filter (environment + num_users, no wifi_band), split with
    seed 39 (video/run.py:56-59);
  - template runner per backbone: seed r+39, Adam(lr 1e-4), BCE(pos_weight=1);
  - per-epoch: train over all batches, then FULL evaluation on train AND test
    sets; best weights by test subset-accuracy alone;
  - optional warm-start/save via cfg.path.save_model.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.metrics import accuracy_score, classification_report
from sklearn.model_selection import train_test_split

from ..core.checkpoint import load_components, save_components
from ..core.config import Config
from ..data.annotation import filter_annotation, label_list, load_annotation
from ..data.encoders import encode_labels
from ..data.pipeline import device_batches, epoch_batches
from ..data.video_io import load_clips
from ..losses.basic import bce_with_logits
from ..models import video as video_models
from ..train.loop import adam_like_torch, eval_dataset, make_eval_fn
from ..utils.complexity import complexity_report

VIDEO_MODELS: Dict[str, Callable[[int], Any]] = {
    "ResNet": lambda out: video_models.ResNet3D18(out_features=out),
    "S3D": lambda out: video_models.S3D(out_features=out),
    "MViT-v1": lambda out: video_models.mvit_v1_b(out),
    "MViT-v2": lambda out: video_models.mvit_v2_s(out),
    "Swin-T": lambda out: video_models.swin3d_t(out),
    "Swin-S": lambda out: video_models.swin3d_s(out),
}


def load_video_data(cfg: Config) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    df = load_annotation(cfg.path.data_y)
    df = filter_annotation(df, environment=cfg.data.environment,
                           num_users=cfg.data.num_users)
    tr_df, te_df = train_test_split(df, test_size=0.2, shuffle=True,
                                    random_state=39)
    x_tr = load_clips(cfg.path.video_pre_x, label_list(tr_df),
                      cfg.data.frame_stride)
    x_te = load_clips(cfg.path.video_pre_x, label_list(te_df),
                      cfg.data.frame_stride)
    y_tr = encode_labels(tr_df, cfg.task, cfg.encoding_activity,
                         cfg.encoding_location)
    y_te = encode_labels(te_df, cfg.task, cfg.encoding_activity,
                         cfg.encoding_location)
    return x_tr, x_te, y_tr, y_te


def _evaluate(forward, params, batch_stats, x, y_flat, threshold, chunk=16):
    logits = eval_dataset(forward, params, batch_stats, x, chunk=chunk)
    pred = (1 / (1 + np.exp(-logits)) > threshold).astype(int)
    acc = accuracy_score(y_flat.astype(int),
                         pred.reshape(-1, y_flat.shape[-1]))
    return acc, pred, logits


def fit_video(model, x_tr, y_tr_flat, x_te, y_te_flat, *, lr: float,
              epochs: int, batch_size: int, seed: int, threshold: float,
              init_variables=None, verbose: bool = True):
    """Video engine (video/train.py:19-103): best weights by test accuracy."""
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng(seed)
    init_rng, rng = jax.random.split(rng)
    if init_variables is None:
        variables = model.init({"params": init_rng},
                               jnp.asarray(x_tr[:1]), train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    else:
        params, batch_stats = init_variables
    tx = adam_like_torch(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, bx, by, rng):
        def loss_wrap(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, bx, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            return bce_with_logits(out, by), mut

        (loss, mut), grads = jax.value_and_grad(loss_wrap, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, mut.get("batch_stats", {}), opt_state, loss

    forward = make_eval_fn(model)
    best_acc = 0.0
    best = (jax.device_get(params), jax.device_get(batch_stats))
    n = x_tr.shape[0]
    for epoch in range(epochs):
        t0 = time.time()
        # all-full batches; partial tail dropped for static shapes
        idx = epoch_batches(n, batch_size, np_rng, skip_last=False)
        loss = jnp.zeros(())
        for bx, by in device_batches(x_tr, y_tr_flat, idx):
            rng, srng = jax.random.split(rng)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, bx, by, srng)
        train_acc, _, _ = _evaluate(forward, params, batch_stats, x_tr,
                                    y_tr_flat, threshold, chunk=batch_size)
        test_acc, _, test_logits = _evaluate(forward, params, batch_stats,
                                             x_te, y_te_flat, threshold,
                                             chunk=batch_size)
        if verbose:
            print(f"Epoch {epoch}/{epochs} - {time.time() - t0:.3f}s "
                  f"- Loss {float(loss):.6f} - Accuracy {train_acc:.6f} "
                  f"- Test Accuracy {test_acc:.6f}")
        if test_acc > best_acc:
            best_acc = test_acc
            best = (jax.device_get(params), jax.device_get(batch_stats))
    return best, best_acc


def run_video_model(cfg: Config,
                    data: Optional[Tuple[np.ndarray, ...]] = None
                    ) -> Dict[str, Any]:
    if cfg.model not in VIDEO_MODELS:
        raise ValueError(f"unknown video model: {cfg.model}")
    if data is None:
        x_tr, x_te, y_tr, y_te = load_video_data(cfg)
    else:
        x_tr, x_te, y_tr, y_te = data
    y_tr_flat = y_tr.reshape(y_tr.shape[0], -1)
    y_te_flat = y_te.reshape(y_te.shape[0], -1)
    out_dim = y_tr_flat.shape[-1]

    result: Dict[str, Any] = {}
    accuracies, times_train, times_test = [], [], []

    model0 = VIDEO_MODELS[cfg.model](out_dim)
    ex = jnp.asarray(x_tr[:1])
    v0 = model0.init({"params": jax.random.PRNGKey(0)}, ex, train=False)
    result["complexity"] = complexity_report(model0, v0, ex)

    for r in range(cfg.repeat):
        model = VIDEO_MODELS[cfg.model](out_dim)
        init_variables = None
        if cfg.path.save_model:
            try:  # warm start (video/model/resnet.py:106)
                saved = load_components(cfg.path.save_model,
                                        like={"params": v0["params"],
                                              "batch_stats": v0.get("batch_stats", {})})
                init_variables = (saved["params"], saved["batch_stats"])
            except FileNotFoundError:
                pass
        t0 = time.time()
        best, _ = fit_video(model, x_tr, y_tr_flat, x_te, y_te_flat,
                            lr=cfg.nn.lr, epochs=cfg.nn.epoch,
                            batch_size=cfg.nn.batch_size, seed=r + 39,
                            threshold=cfg.nn.threshold,
                            init_variables=init_variables)
        t1 = time.time()
        forward = make_eval_fn(model)
        acc, pred, _ = _evaluate(forward, best[0], best[1], x_te, y_te_flat,
                                 cfg.nn.threshold, chunk=cfg.nn.batch_size)
        result[f"repeat_{r}"] = classification_report(
            y_te_flat.astype(int), pred, digits=6, zero_division=0,
            output_dict=True)
        accuracies.append(acc)
        times_train.append(t1 - t0)
        times_test.append(time.time() - t1)
        if cfg.path.save_model:
            save_components(cfg.path.save_model, best[0], best[1])

    result["accuracy"] = {"avg": float(np.mean(accuracies)),
                          "std": float(np.std(accuracies))}
    result["time_train"] = {"avg": float(np.mean(times_train)),
                            "std": float(np.std(times_train))}
    result["time_test"] = {"avg": float(np.mean(times_test)),
                           "std": float(np.std(times_test))}
    return result
