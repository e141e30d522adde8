"""r3 follow-up roofline for the low-MFU video backbones (S3D 11.4%,
MViT-v1 12.6%, MViT-v2 10.0% — BASELINE.md video MFU table).

Two questions, answered on the real chip:
  1. Batch scaling: does a larger serving batch buy throughput? (The bench
     configs bs4/bs2 were inherited from r1 memory limits, never swept the
     way DETR's bs256 knee was.) Chained-marginal clips/s at 2-3 batch
     sizes per model.
  2. Bandwidth roofline: compiled-program "bytes accessed" -> arithmetic
     intensity; achieved bytes/s vs the v5e HBM peak (~819 GB/s). If the
     achieved bandwidth is at peak, the low MFU is intrinsic to the
     architecture's intensity, not a scheduling loss.

Usage: nohup python tools/exp_video_batch.py > /tmp/exp_video_batch.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 49.3e12
V5E_HBM_BPS = 819e9

CONFIGS = [
    # (label, builder key, clip shape, batch sizes, dtype)
    ("S3D bf16", "s3d", (45, 224, 224, 3), (4, 8, 16), "bf16"),
    ("MViT-v1 bf16", "mvit_v1", (45, 224, 224, 3), (2, 4, 8), "bf16"),
    ("MViT-v2 bf16", "mvit_v2", (45, 224, 224, 3), (2, 4, 8), "bf16"),
    ("Swin3D-T f32", "swin_t", (45, 224, 224, 3), (2, 4), "f32"),
]


def build(key):
    from multi_modal_csi_tpu.models import video as V
    return {
        "s3d": lambda: V.S3D(out_features=9),
        "mvit_v1": lambda: V.mvit_v1_b(out_features=9),
        "mvit_v2": lambda: V.mvit_v2_s(out_features=9),
        "swin_t": lambda: V.swin3d_t(out_features=9),
    }[key]()


def marginal_rate(step, v, x, batch, n_short=2, n_long=10):
    import jax

    def run(n):
        xs = x
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            xs, out = step(v, xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    xs, out = step(v, x)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_s, t_l = run(n_short), run(n_long)
    return batch * (n_long - n_short) / max(t_l - t_s, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    for label, key, shape, batches, dt in CONFIGS:
        model = build(key)
        dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
        peak = V5E_BF16_PEAK if dt == "bf16" else V5E_F32_PEAK
        v = model.init({"params": jax.random.PRNGKey(0)},
                       np.zeros((1,) + shape, np.float32), train=False)
        if dt == "bf16":
            v = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, v)

        for bs in batches:
            rng = np.random.default_rng(0)
            x = jnp.asarray(rng.normal(size=(bs,) + shape), dtype)

            @jax.jit
            def step(v, xs, model=model):
                out = model.apply(v, xs, train=False)
                return xs + jnp.asarray(1e-6, xs.dtype) * jnp.mean(
                    out).astype(xs.dtype), out

            try:
                cost = step.lower(v, x).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0))
                nbytes = float(cost.get("bytes accessed", 0.0))
            except Exception as e:  # noqa: BLE001
                print(f"{label} bs{bs}: compile failed: {e!r}"[:300],
                      flush=True)
                continue

            try:
                cps = marginal_rate(step, v, x, bs)
            except Exception as e:  # noqa: BLE001
                print(f"{label} bs{bs}: run failed: {e!r}"[:300], flush=True)
                continue
            steps_per_s = cps / bs
            print(json.dumps({
                "model": label, "bs": bs,
                "clips_per_sec": round(cps, 1),
                "gflop_per_clip": round(flops / bs / 1e9, 2),
                "ai_flop_per_byte": round(flops / max(nbytes, 1.0), 1),
                "mfu_vs_peak": round(flops * steps_per_s / peak, 3),
                "hbm_util_vs_819GBps": round(
                    nbytes * steps_per_s / V5E_HBM_BPS, 3),
            }), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
