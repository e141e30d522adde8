"""TPU bench: TRAINING-step throughput for the CSI model families.

Originally DETR + THAT + LSTM (VERDICT r2 #8); extended late-r3 to every
remaining CSI family (MLP, CNN-1D/2D, CLSTM, ABLSTM, the THAT variants,
THAT_ENCODER, DualBand, SSL) so BASELINE.md's training table covers the
full SURVEY §2.2 inventory.

Full step = in-graph augmentation + forward + loss (Hungarian matching for
DETR) + backward + torch-semantics Adam, at batch 64, f32 and bf16 compute.
(SSL's "augmentation" is its own two_views transform; CNN-1D's loss is the
reference's MSE count path; the count heads use SmoothL1 — each row matches
its reference runner's loss, SURVEY §2.2.)

Methodology: the parameter chain IS a data-dependency chain (step t+1's
state depends on step t's), so the marginal step time between a short and a
long run — with the final loss fetched to host — cannot be faked by relay
caching (same hardening as bench.py; BASELINE.md "Measured numbers").

Breakdown per model (f32): separately jitted augmentation, forward+loss,
and loss-only passes; backward+update is the remainder of the full step.

Run:  nohup python tools/bench_training.py > /tmp/bench_train.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multi_modal_csi_tpu.losses.basic import bce_with_logits
from multi_modal_csi_tpu.losses.matching import HungarianMatchingLoss
from multi_modal_csi_tpu.models import csi as csi_models
from multi_modal_csi_tpu.train.loop import (_init_variables, adam_like_torch,
                                            aot_train_step)
from tools.bench_lib import marginal_step_s  # noqa: E402

BATCH = 64


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if hasattr(a, "dtype")
        and a.dtype == jnp.float32 else a, tree)


def build(name: str, dtype):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(BATCH, 3000, 270)).astype(np.float32)
    augment = True          # train.py:65-73 — all engine-trained models;
    # dual_band's own local loop has none (dual_band.py:174-233)
    if name == "DETR":
        from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser
        model = DETRMultiUser(token_length=10, num_decoder_layers=6,
                              temp_cross=2.0, num_queries=5,
                              dim_feedforward=512)
        y = np.zeros((BATCH, 5, 10), np.float32)
        y[np.arange(BATCH)[:, None], np.arange(5)[None, :],
          rng.integers(0, 10, size=(BATCH, 5))] = 1.0
        loss = HungarianMatchingLoss()
        out_axis = 1
    elif name == "THAT":
        model = csi_models.THAT(out_features=9)
        y = (rng.random(size=(BATCH, 9)) < 0.3).astype(np.float32)
        loss = lambda o, t: bce_with_logits(o, t, 4.0)
        out_axis = 0
    elif name == "LSTM":
        model = csi_models.LSTMModel(out_features=9)
        y = (rng.random(size=(BATCH, 9)) < 0.3).astype(np.float32)
        loss = lambda o, t: bce_with_logits(o, t, 6.0)
        out_axis = 0
    elif name == "MLP":
        model = csi_models.MLP(out_features=9)
        x = x.reshape(BATCH, -1)          # runner flattens (mlp.py:101-102)
        y = (rng.random(size=(BATCH, 9)) < 0.3).astype(np.float32)
        loss = lambda o, t: bce_with_logits(o, t, 4.0)
        out_axis = 0
    elif name == "CNN-1D":
        # the reference's MSE count-regression path (cnn_1d.py:168)
        from multi_modal_csi_tpu.losses.basic import mse
        model = csi_models.CNN1D(out_features=9)
        y = rng.integers(0, 3, size=(BATCH, 9)).astype(np.float32)
        loss = mse
        out_axis = 0
    elif name == "CNN-2D":
        model = csi_models.CNN2D(out_features=9)
        y = (rng.random(size=(BATCH, 9)) < 0.3).astype(np.float32)
        loss = lambda o, t: bce_with_logits(o, t, 6.0)
        out_axis = 0
    elif name == "CLSTM":
        model = csi_models.CLSTM(out_features=9)
        y = (rng.random(size=(BATCH, 9)) < 0.3).astype(np.float32)
        loss = lambda o, t: bce_with_logits(o, t, 8.0)
        out_axis = 0
    elif name == "ABLSTM":
        model = csi_models.ABLSTM(out_features=9)
        y = (rng.random(size=(BATCH, 9)) < 0.3).astype(np.float32)
        loss = lambda o, t: bce_with_logits(o, t, 6.0)
        out_axis = 0
    elif name == "THAT_MULTI_HEAD":
        from multi_modal_csi_tpu.losses.matching import \
            permutation_matching_loss
        model = csi_models.THATMultiHead(out_features=10)
        y = np.zeros((BATCH, 5, 10), np.float32)
        y[np.arange(BATCH)[:, None], np.arange(5)[None, :],
          rng.integers(0, 10, size=(BATCH, 5))] = 1.0
        loss = permutation_matching_loss
        out_axis = 1
    elif name == "THAT_ENCODER":
        model = csi_models.THATEncoderDETR(temp_cross=2.0, num_queries=5,
                                           num_decoder_layers=6)
        y = np.zeros((BATCH, 5, 10), np.float32)
        y[np.arange(BATCH)[:, None], np.arange(5)[None, :],
          rng.integers(0, 10, size=(BATCH, 5))] = 1.0
        loss = HungarianMatchingLoss(per_layer_matching=True)
        out_axis = 1
    elif name == "THAT_COUNT":
        from multi_modal_csi_tpu.losses.basic import smooth_l1
        model = csi_models.THATCount(out_features=9)
        y = rng.integers(0, 3, size=(BATCH, 9)).astype(np.float32)
        loss = smooth_l1
        out_axis = 0
    elif name == "THAT_COUNT_CONSTRAINED":
        from multi_modal_csi_tpu.losses.matching import count_based_loss
        model = csi_models.THATCountConstrained()
        # labels pre-summed to expected per-class counts (run_main.py:43-45)
        cls = rng.integers(0, 10, size=(BATCH, 5))
        y = np.zeros((BATCH, 10), np.float32)
        np.add.at(y, (np.arange(BATCH)[:, None], cls), 1.0)
        loss = count_based_loss
        out_axis = 0
    elif name == "DUAL_BAND":
        model = csi_models.DualBandCNN(out_features=9)
        x = rng.normal(size=(BATCH, 2, 3000, 270)).astype(np.float32)
        y = (rng.random(size=(BATCH, 9)) < 0.3).astype(np.float32)
        loss = lambda o, t: bce_with_logits(o, t, 6.0)
        out_axis = 0
        augment = False
    else:
        raise ValueError(name)
    tx = adam_like_torch(1e-4)
    params, batch_stats = _init_variables(model, jax.random.PRNGKey(0), x[:2])
    if dtype != jnp.float32:
        params = _cast(params, dtype)
        x = x.astype(dtype)
    opt_state = tx.init(params)
    return model, tx, loss, params, batch_stats, opt_state, \
        jnp.asarray(x, dtype), jnp.asarray(y), out_axis, augment


def bench_ssl(dtype):
    """SSL has its own step shape (two_views + symmetric InfoNCE + online
    head, runners/ssl.py:64-80) — benched with a donated jitted step."""
    from multi_modal_csi_tpu.models.csi.ssl import (SSLModel, ssl_loss,
                                                    two_views)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(BATCH, 3000, 270)).astype(np.float32)
    y = (rng.random(size=(BATCH, 9)) < 0.3).astype(np.float32)
    model = SSLModel(out_features=9)
    tx = adam_like_torch(1e-3)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x[:2],
                           x[:2], train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if dtype != jnp.float32:
        params = _cast(params, dtype)
        x = x.astype(dtype)
    opt_state = tx.init(params)
    bx, by = jnp.asarray(x, dtype), jnp.asarray(y)

    @jax.jit
    def step(params, batch_stats, opt_state, bx, by, rng):
        aug_rng, drop_rng = jax.random.split(rng)
        v1, v2 = two_views(aug_rng, bx)

        def loss_wrap(p):
            (z1, z2, logits), mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, v1, v2,
                train=True, rngs={"dropout": drop_rng},
                mutable=["batch_stats"])
            total, _ = ssl_loss(z1, z2, logits, by)
            return total, mutated

        (l, mutated), grads = jax.value_and_grad(
            loss_wrap, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, mutated["batch_stats"], opt_state, l

    state = [params, batch_stats, opt_state]

    def step_once(i):
        p, bs, o, l = step(state[0], state[1], state[2], bx, by,
                           jax.random.fold_in(jax.random.PRNGKey(0), i))
        state[0], state[1], state[2] = p, bs, o
        return l

    # extra warm calls: the undonated jit path can recompile on layout
    # churn; ride it out before timing
    for i in range(3):
        float(step_once(i))
    t_step = marginal_step_s(step_once)
    tag = "bf16" if dtype == jnp.bfloat16 else "f32"
    print(f"SSL [{tag}] full train step: {t_step*1e3:.2f} ms = "
          f"{BATCH / t_step:.0f} windows/s", flush=True)


def bench_model(name: str, dtype, breakdown: bool):
    if name == "SSL":
        return bench_ssl(dtype)
    model, tx, loss, params, batch_stats, opt_state, bx, by, _, augment = \
        build(name, dtype)
    # keep host copies: the AOT step donates the device state, and the
    # breakdown passes below need undonated params/batch_stats
    params_host = jax.device_get(params)
    stats_host = jax.device_get(batch_stats)
    step_fn, (p0, bs0, o0), put_batch, put_rng = aot_train_step(
        model, tx, loss, params, batch_stats, opt_state,
        (jax.ShapeDtypeStruct(bx.shape, bx.dtype),
         jax.ShapeDtypeStruct(by.shape, by.dtype)),
        jax.random.PRNGKey(0), augment=augment)
    bx, by = put_batch(bx, by)
    state = [p0, bs0, o0]

    def step_once(i):
        p, bs, o, l, _ = step_fn(state[0], state[1], state[2], bx, by,
                                 put_rng(jax.random.PRNGKey(i)))
        state[0], state[1], state[2] = p, bs, o
        return l

    t_step = marginal_step_s(step_once)
    tag = "bf16" if dtype == jnp.bfloat16 else "f32"
    print(f"{name} [{tag}] full train step: {t_step*1e3:.2f} ms = "
          f"{BATCH / t_step:.0f} windows/s", flush=True)
    if not breakdown:
        return

    # --- breakdown (all under the same chained methodology) ---------------
    params = jax.device_put(params_host)
    batch_stats = jax.device_put(stats_host)
    from multi_modal_csi_tpu.train.augment import apply_augmentation

    @jax.jit
    def aug_only(x, i):
        out = apply_augmentation(
            jax.random.fold_in(jax.random.PRNGKey(0), i), x)
        return out, jnp.mean(out)

    xs = [bx]

    def aug_once(i):
        out, m = aug_only(xs[0], i)
        xs[0] = out
        return m
    t_aug = marginal_step_s(aug_once) if augment else 0.0

    @jax.jit
    def fwd_loss(p, bs, x, y):
        out = model.apply({"params": p, "batch_stats": bs}, x, train=False)
        l = loss(out, y)
        # chain the input through the loss so runs cannot be cached/elided
        return l, x + jnp.asarray(1e-9, x.dtype) * l.astype(x.dtype)

    bxs = [bx]

    def fwd_once(i):
        l, bxs[0] = fwd_loss(params, batch_stats, bxs[0], by)
        return l
    t_fwd = marginal_step_s(fwd_once)

    example_out = model.apply({"params": params, "batch_stats": batch_stats},
                              bx[:BATCH], train=False)

    @jax.jit
    def loss_only(out, y):
        l = loss(out, y)
        return l, jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(1e-9, a.dtype) * l.astype(a.dtype), out)

    os_ = [example_out]

    def loss_once(i):
        l, os_[0] = loss_only(os_[0], by)
        return l
    t_loss = marginal_step_s(loss_once)

    t_bwd = t_step - t_aug - t_fwd
    print(f"{name} [f32] breakdown: aug {t_aug*1e3:.2f} ms | fwd+loss "
          f"{t_fwd*1e3:.2f} ms (loss alone {t_loss*1e3:.3f} ms) | "
          f"bwd+adam {t_bwd*1e3:.2f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    # optional argv filter: e.g. `bench_training.py DETR:bf16 THAT LSTM`
    wanted = sys.argv[1:] or ["DETR", "THAT", "LSTM"]
    for item in wanted:
        name, _, dt = item.partition(":")
        if dt not in ("", "f32", "bf16"):
            raise SystemExit(f"unknown dtype suffix {dt!r} in {item!r} "
                             "(use f32 or bf16)")
        if dt in ("", "f32"):
            bench_model(name, jnp.float32, breakdown=True)
        if dt in ("", "bf16"):
            bench_model(name, jnp.bfloat16, breakdown=False)


if __name__ == "__main__":
    main()
