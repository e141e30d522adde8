"""SSL (SimCLR) pretraining runner.

Reference flow (model/SSL_model.py:276-391 + train_ssl.py:16-91 +
inference_only.py:47-90):
  - two augmented views per batch (TimeSeriesTransform) -> InfoNCE + online
    head BCE;
  - batching: unlike the CSI loop (train.py:80-82, which skips the last
    batch), train_ssl.py:37 iterates EVERY DataLoader batch including the
    final partial one — mirrored here (r5 fix; caught writing the SSL
    engine-parity tool);
  - per-epoch eval: ONE test batch through the online head (accuracy);
  - best-weight selection is DEAD CODE in the reference: train_ssl.py:24
    hardcodes saving_flag=False, so the epoch-best branch (:76-86) never
    fires and the FINAL weights are always returned (:88-90). Default
    behavior here matches; `select_best=True` enables the rule the
    reference evidently intended (documented divergence knob).
  - final: full-test-set online-head evaluation.

TPU-native: the two views are generated in-graph (jax.random) inside the
jitted step; the InfoNCE gather becomes a real collective under a mesh
(models/csi/ssl.py).
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.metrics import accuracy_score, classification_report

from ..core.config import Config
from ..models.csi.ssl import SSLModel, ssl_loss, two_views
from ..train.loop import adam_like_torch, eval_dataset
from ..data.pipeline import device_batches


def run_ssl(cfg: Config, data: Optional[Tuple[np.ndarray, ...]] = None,
            save_path: Optional[str] = None,
            history: Optional[list] = None,
            select_best: bool = False,
            view_fn=None) -> Dict[str, Any]:
    """`history`, when given, collects one dict per (repeat, epoch) with the
    epoch's mean train loss (InfoNCE + online-head BCE) and the one-batch
    eval accuracy — the numbers the reference prints per epoch
    (train_ssl.py:50-67); used by tests/test_convergence.py.

    `view_fn(rng, bx) -> (v1, v2)` overrides the stochastic two_views
    augmentation (the reference's TimeSeriesTransform equivalent) with a
    caller-supplied view generator; tools/ssl_engine_parity.py passes a
    deterministic pair so the loop can be compared bit-for-bit against the
    reference's own train_ssl() loop."""
    from .csi import master_split, _layout
    if data is None:
        x_tr, x_te, y_tr, y_te = master_split(cfg, "raw")
    else:
        x_tr, x_te, y_tr, y_te = data
    x_tr = _layout(x_tr, "seq")
    x_te = _layout(x_te, "seq")
    y_tr_flat = y_tr.reshape(y_tr.shape[0], -1)
    y_te_flat = y_te.reshape(y_te.shape[0], -1)
    out_dim = y_tr_flat.shape[-1]

    result: Dict[str, Any] = {}
    accuracies, times_train, times_test = [], [], []

    for r in range(cfg.repeat):
        seed = r + 39
        model = SSLModel(out_features=out_dim)
        rng = jax.random.PRNGKey(seed)
        np_rng = np.random.default_rng(seed)

        init_rng, rng = jax.random.split(rng)
        variables = model.init({"params": init_rng},
                               jnp.asarray(x_tr[:2]), jnp.asarray(x_tr[:2]),
                               train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        tx = adam_like_torch(cfg.nn.lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state, bx, by, rng):
            aug_rng, drop_rng = jax.random.split(rng)
            v1, v2 = (view_fn or two_views)(aug_rng, bx)

            def loss_wrap(p):
                (z1, z2, logits), mut = model.apply(
                    {"params": p, "batch_stats": batch_stats}, v1, v2,
                    train=True, rngs={"dropout": drop_rng},
                    mutable=["batch_stats"])
                total, _ = ssl_loss(z1, z2, logits, by)
                return total, mut

            (loss, mut), grads = jax.value_and_grad(loss_wrap, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, mut.get("batch_stats", {}), opt_state, loss

        @jax.jit
        def infer(params, batch_stats, x):
            return model.apply({"params": params, "batch_stats": batch_stats},
                               x, inference=True)

        best_acc = 0.0
        best = (jax.device_get(params), jax.device_get(batch_stats))
        n = x_tr.shape[0]
        bs = cfg.nn.batch_size
        t0 = time.time()
        for epoch in range(cfg.nn.epoch):
            # train_ssl.py:26 DataLoader(shuffle=True) with NO drop_last:
            # every batch trains, including the partial final one (unlike the
            # CSI loop's train.py:80-82 skip). The ragged tail costs one
            # extra jit specialization; the reference pays a dynamo
            # recompile for the same reason.
            perm = np_rng.permutation(n)
            nb = n // bs
            idx = perm[:nb * bs].reshape(nb, bs)
            tail = perm[nb * bs:]

            def _batches():
                yield from device_batches(x_tr, y_tr_flat, idx)
                if tail.size:
                    yield (jnp.asarray(x_tr[tail]),
                           jnp.asarray(y_tr_flat[tail]))

            total_loss, total_n = 0.0, 0
            for bx, by in _batches():
                rng, srng = jax.random.split(rng)
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state, bx, by, srng)
                total_loss += float(loss) * bx.shape[0]
                total_n += bx.shape[0]

            # one-batch eval (train_ssl.py:54-67)
            xb = x_te[:cfg.nn.batch_size]
            yb = y_te_flat[:cfg.nn.batch_size]
            logits = np.asarray(infer(params, batch_stats, jnp.asarray(xb)))
            pred = (1 / (1 + np.exp(-logits)) > cfg.nn.threshold).astype(int)
            acc = accuracy_score(yb.astype(int), pred)
            if history is not None:
                history.append({"repeat": r, "epoch": epoch,
                                "train_loss": total_loss / max(total_n, 1),
                                "accuracy_batch": float(acc)})
            if select_best and acc > best_acc:
                best_acc = acc
                best = (jax.device_get(params), jax.device_get(batch_stats))
        t1 = time.time()

        if not select_best or best_acc == 0.0:
            # reference default (saving_flag=False, train_ssl.py:24): the
            # best-weight branch never fires -> FINAL weights always win
            # (train_ssl.py:88-90); also the never-improved fallback.
            best = (jax.device_get(params), jax.device_get(batch_stats))
        if save_path:         # checkpoint for inference_only (train_ssl.py:80-86)
            from ..core.checkpoint import save_components
            save_components(save_path, best[0], best[1])

        # full-test-set evaluation (inference_only.py:47-90)
        logits = eval_dataset(lambda p, b, x: infer(p, b, x), best[0], best[1],
                              x_te)
        pred = (1 / (1 + np.exp(-logits)) > cfg.nn.threshold).astype(int)
        acc = accuracy_score(y_te_flat.astype(int), pred)
        result[f"repeat_{r}"] = classification_report(
            y_te_flat.astype(int), pred, digits=6, zero_division=0,
            output_dict=True)
        accuracies.append(acc)
        times_train.append(t1 - t0)
        times_test.append(time.time() - t1)

    result["accuracy"] = {"avg": float(np.mean(accuracies)),
                          "std": float(np.std(accuracies))}
    result["time_train"] = {"avg": float(np.mean(times_train)),
                            "std": float(np.std(times_train))}
    result["time_test"] = {"avg": float(np.mean(times_test)),
                           "std": float(np.std(times_test))}
    return result
