"""Per-op device profiling for any model's train step: top TPU ops by time.

The method that localized both r3 training pathologies (MViT's 343 ms of
rel-pos transposes; MLP bf16's 13.9 ms BatchNorm convert_reduce_fusion —
BASELINE.md post-mortems): run the real AOT train step under
``jax.profiler``, then parse the xplane trace IN-PROCESS with
``jax.profiler.ProfileData`` (no tensorboard needed) and aggregate event
durations by HLO op name. Works over the axon TPU tunnel.

Usage:
    python tools/profile_step.py MLP:bf16            # one model
    python tools/profile_step.py DETR THAT:bf16      # several
    python tools/profile_step.py MLP:bf16 --steps 30 --top 20

Reads the same model registry as bench_training.build(); the reported
ms/step is the op's total device time across the traced window divided by
the step count (async ops show wall duration, so overlapping copies can
exceed the step time — compare against the jit_step root line).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp


def top_ops(logdir: str, k: int):
    from jax.profiler import ProfileData
    pbs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not pbs:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    agg = collections.Counter()
    for plane in ProfileData.from_file(pbs[-1]).planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += ev.duration_ns
    return agg.most_common(k)


def profile_model(name: str, dtype, steps: int, top: int):
    import bench_training as bt
    from multi_modal_csi_tpu.train.loop import aot_train_step

    model, tx, loss, params, batch_stats, opt_state, bx, by, _, augment = \
        bt.build(name, dtype)
    step_fn, (p0, bs0, o0), put_batch, put_rng = aot_train_step(
        model, tx, loss, params, batch_stats, opt_state,
        (jax.ShapeDtypeStruct(bx.shape, bx.dtype),
         jax.ShapeDtypeStruct(by.shape, by.dtype)),
        jax.random.PRNGKey(0), augment=augment)
    bx, by = put_batch(bx, by)
    st = [p0, bs0, o0]

    def once(i):
        p, bs, o, l, _ = step_fn(st[0], st[1], st[2], bx, by,
                                 put_rng(jax.random.PRNGKey(i)))
        st[0], st[1], st[2] = p, bs, o
        return l

    for i in range(5):
        once(i)
    jax.block_until_ready(st[0])

    tag = "bf16" if dtype == jnp.bfloat16 else "f32"
    logdir = tempfile.mkdtemp(prefix=f"trace_{name}_{tag}_")
    jax.profiler.start_trace(logdir)
    for i in range(steps):
        once(100 + i)
    jax.block_until_ready(st[0])
    jax.profiler.stop_trace()

    print(f"=== {name} [{tag}] top TPU ops over {steps} steps:", flush=True)
    for op, ns in top_ops(logdir, top):
        print(f"  {ns / steps / 1e6:8.3f} ms/step  {op[:120]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="+",
                    help="MODEL or MODEL:f32 / MODEL:bf16 (default f32)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=14)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    for item in args.models:
        name, _, dt = item.partition(":")
        dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
        profile_model(name, dtype, args.steps, args.top)


if __name__ == "__main__":
    main()
