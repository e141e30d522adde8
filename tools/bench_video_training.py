"""TPU bench: TRAINING-step throughput for all six video backbones
(VERDICT r2 next #4 — the video half of the training axis).

Full step = forward + BCE(pos_weight=1) + backward + torch-semantics Adam —
exactly the reference video engine's hot loop
(/root/reference/benchmark/video/train.py:19-103; it has NO augmentation),
through the same aot_train_step the production fit_video uses. Batch sizes
match the BASELINE.md inference table (ResNet bs8@112px, S3D bs4, Swin/MViT
bs2 @224px, 45 frames). f32 and bf16 (params+input cast) per model.

Methodology: the parameter chain is a data-dependency chain; marginal step
time between short/long runs with the final loss fetched (bench.py
hardening).

Run:  nohup python tools/bench_video_training.py > /tmp/bench_vtrain.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_csi_tpu.losses.basic import bce_with_logits
from multi_modal_csi_tpu.train.loop import adam_like_torch, aot_train_step
from tools.bench_lib import marginal_step_s  # noqa: E402

CONFIGS = [
    # (name, ctor, (T, H, W), batch)
    ("ResNet", lambda: _m("resnet3d", "ResNet3D18"), (45, 112, 112), 8),
    ("S3D", lambda: _m("s3d", "S3D"), (45, 224, 224), 4),
    ("Swin-T", lambda: _swin("swin3d_t"), (45, 224, 224), 2),
    ("Swin-S", lambda: _swin("swin3d_s"), (45, 224, 224), 2),
    ("MViT-v1", lambda: _mvit("v1"), (45, 224, 224), 2),
    ("MViT-v2", lambda: _mvit("v2"), (45, 224, 224), 2),
]

OUT = 9


def _m(mod, cls):
    import importlib
    m = importlib.import_module(f"multi_modal_csi_tpu.models.video.{mod}")
    return getattr(m, cls)(out_features=OUT)


def _swin(fn):
    from multi_modal_csi_tpu.models.video import swin3d
    return getattr(swin3d, fn)(OUT)


def _mvit(variant):
    from multi_modal_csi_tpu.models.video import mvit
    return mvit.mvit_v1_b(OUT) if variant == "v1" else mvit.mvit_v2_s(OUT)


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if hasattr(a, "dtype")
        and a.dtype == jnp.float32 else a, tree)


def bench(name, make_model, shape, batch, dtype):
    tag = "bf16" if dtype == jnp.bfloat16 else "f32"
    try:
        model = make_model()
        rng = np.random.default_rng(0)
        x = rng.normal(size=(batch,) + shape + (3,)).astype(np.float32)
        y = (rng.random(size=(batch, OUT)) < 0.3).astype(np.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.asarray(x[:1]), train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if dtype != jnp.float32:
            params = _cast(params, dtype)
            x = x.astype(dtype)
        tx = adam_like_torch(1e-4)   # video/train engine lr (video runners)
        opt_state = tx.init(params)
        bx, by = jnp.asarray(x, dtype), jnp.asarray(y)
        step_fn, (p0, bs0, o0), put_batch, put_rng = aot_train_step(
            model, tx, lambda o, t: bce_with_logits(o, t, None),
            params, batch_stats, opt_state,
            (jax.ShapeDtypeStruct(bx.shape, bx.dtype),
             jax.ShapeDtypeStruct(by.shape, by.dtype)),
            jax.random.PRNGKey(0), augment=False)
        bx, by = put_batch(bx, by)
        state = [p0, bs0, o0]

        def step_once(i):
            p, bs, o, l, _ = step_fn(state[0], state[1], state[2], bx, by,
                                     put_rng(jax.random.PRNGKey(i)))
            state[0], state[1], state[2] = p, bs, o
            return l

        # (2, 12) windows: video steps are 100+ ms, already stable
        t = marginal_step_s(step_once, n_short=2, n_long=12)
        print(f"{name} [{tag}] train step bs{batch}: {t*1e3:.1f} ms = "
              f"{batch / t:.1f} clips/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name} [{tag}] FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    wanted = sys.argv[1:] or [c[0] for c in CONFIGS]
    for name, ctor, shape, batch in CONFIGS:
        if name not in wanted:
            continue
        bench(name, ctor, shape, batch, jnp.float32)
        bench(name, ctor, shape, batch, jnp.bfloat16)


if __name__ == "__main__":
    main()
