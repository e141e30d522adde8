"""TPU experiment: eliminate the train-step double compile (VERDICT weak #3).

Round-1 observation (BASELINE.md): the donated train step compiles TWICE —
once for the host-uploaded initial state, once for the device-produced state
whose donated-buffer layouts differ — costing ~26 s extra warmup.

Hypothesis: AOT-compile the step with Format(Layout.AUTO) on inputs+outputs
(XLA then picks ONE layout per donated in/out pair), then device_put the
initial state into the compiled input formats. Result: a single compile.

Run on the real TPU chip:  nohup python tools/exp_double_compile.py > /tmp/exp_dc.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout

from multi_modal_csi_tpu.losses.matching import HungarianMatchingLoss
from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser
from multi_modal_csi_tpu.train.loop import (adam_like_torch, make_train_step,
                                            _init_variables)


def build(batch=64):
    model = DETRMultiUser(token_length=10, num_decoder_layers=6,
                          temp_cross=2.0, num_queries=5, dim_feedforward=512)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, 3000, 270)).astype(np.float32)
    y = np.zeros((batch, 5, 10), np.float32)
    y[np.arange(batch)[:, None], np.arange(5)[None, :],
      rng.integers(0, 10, size=(batch, 5))] = 1.0
    loss = HungarianMatchingLoss()
    tx = adam_like_torch(1e-4)
    params, batch_stats = _init_variables(model, jax.random.PRNGKey(0), x[:2])
    opt_state = tx.init(params)
    return model, tx, loss, params, batch_stats, opt_state, x, y


def timed_steps(run_one, n=4, label=""):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        run_one(i)
        ts.append(time.perf_counter() - t0)
        print(f"  {label} step {i}: {ts[-1]:.3f}s", flush=True)
    return ts


def main():
    print("devices:", jax.devices(), flush=True)

    # ---- Path A: status quo (jit + donate) --------------------------------
    model, tx, loss, params, batch_stats, opt_state, x, y = build()
    step_fn = make_train_step(model, tx, loss, augment=True)
    bx, by = jnp.asarray(x), jnp.asarray(y)
    state = {"p": params, "bs": batch_stats, "o": opt_state}

    def run_a(i):
        nonlocal state
        p, bs, o, l, out = step_fn(state["p"], state["bs"], state["o"],
                                   bx, by, jax.random.PRNGKey(i))
        jax.block_until_ready(l)
        state = {"p": p, "bs": bs, "o": o}

    print("Path A: jit + donate (status quo)", flush=True)
    t_a = timed_steps(run_a, 4, "A")

    # ---- Path B: AOT with AUTO layouts, state device_put to input formats --
    model, tx, loss, params, batch_stats, opt_state, x, y = build()

    def step(params, batch_stats, opt_state, bx, by, rng):
        # identical body to make_train_step's
        aug_rng, drop_rng = jax.random.split(rng)
        from multi_modal_csi_tpu.train.augment import apply_augmentation
        bxa = apply_augmentation(aug_rng, bx)

        def loss_wrap(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, bxa, train=True,
                rngs={"dropout": drop_rng}, mutable=["batch_stats"])
            return loss(out, by), (out, mutated)

        (l, (out, mutated)), grads = jax.value_and_grad(
            loss_wrap, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params2 = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params2, mutated.get("batch_stats", {}), opt_state, l, out

    auto = Format(Layout.AUTO)
    jitted = jax.jit(step, donate_argnums=(0, 1, 2),
                     in_shardings=auto, out_shardings=auto)
    t0 = time.perf_counter()
    compiled = jitted.lower(params, batch_stats, opt_state, jnp.asarray(x),
                            jnp.asarray(y), jax.random.PRNGKey(0)).compile()
    print(f"Path B: AOT compile: {time.perf_counter() - t0:.3f}s", flush=True)
    in_fmt = compiled.input_formats[0]
    params = jax.device_put(params, in_fmt[0])
    batch_stats = jax.device_put(batch_stats, in_fmt[1])
    opt_state = jax.device_put(opt_state, in_fmt[2])
    bx = jax.device_put(jnp.asarray(x), in_fmt[3])
    by = jax.device_put(jnp.asarray(y), in_fmt[4])
    state_b = {"p": params, "bs": batch_stats, "o": opt_state}

    def run_b(i):
        nonlocal state_b
        p, bs, o, l, out = compiled(state_b["p"], state_b["bs"], state_b["o"],
                                    bx, by, jax.device_put(
                                        jax.random.PRNGKey(i), in_fmt[5]))
        jax.block_until_ready(l)
        state_b = {"p": p, "bs": bs, "o": o}

    print("Path B: AOT + AUTO layouts + formatted device_put", flush=True)
    t_b = timed_steps(run_b, 4, "B")

    print("\nsummary:")
    print(f"  A (status quo): steps {['%.3f' % t for t in t_a]}")
    print(f"  B (AOT+layout): steps {['%.3f' % t for t in t_b]}")
    print(f"  A total warmup (steps 0+1): {t_a[0] + t_a[1]:.1f}s; "
          f"B step 0: {t_b[0]:.3f}s")


if __name__ == "__main__":
    main()
