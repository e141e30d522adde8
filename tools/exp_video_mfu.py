"""Video-backbone MFU from compiled-program cost analysis (r3).

For each backbone at its bench config: compile the serving forward on the
TPU backend, read the compiled program's FLOP count, and combine with the
measured clips/s (BASELINE.md video inference table) into an MFU estimate
against the v5e peak for that dtype. Pure compile — nothing executes.

Run:  nohup python tools/exp_video_mfu.py > /tmp/exp_video_mfu.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK = {"f32": 49.3e12, "bf16": 197e12}

# (label, builder, clip shape, bs, dtype, measured clips/s from BASELINE.md)
CONFIGS = [
    ("ResNet3D-18 bf16", "resnet", (45, 112, 112, 3), 8, "bf16", 311.0),
    ("S3D bf16", "s3d", (45, 224, 224, 3), 4, "bf16", 203.5),
    ("Swin3D-T f32", "swin_t", (45, 224, 224, 3), 2, "f32", 63.0),
    ("Swin3D-S f32", "swin_s", (45, 224, 224, 3), 2, "f32", 35.8),
    ("MViT-v1 bf16", "mvit_v1", (45, 224, 224, 3), 2, "bf16", 75.9),
    ("MViT-v2 bf16", "mvit_v2", (45, 224, 224, 3), 2, "bf16", 68.4),
]


def build(key):
    from multi_modal_csi_tpu.models import video as V
    return {
        "resnet": lambda: V.ResNet3D18(out_features=9),
        "s3d": lambda: V.S3D(out_features=9),
        "swin_t": lambda: V.swin3d_t(out_features=9),
        "swin_s": lambda: V.swin3d_s(out_features=9),
        "mvit_v1": lambda: V.mvit_v1_b(out_features=9),
        "mvit_v2": lambda: V.mvit_v2_s(out_features=9),
    }[key]()


def main():
    print("devices:", jax.devices(), flush=True)
    for label, key, shape, bs, dt, clips in CONFIGS:
        model = build(key)
        dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
        x = jax.ShapeDtypeStruct((bs,) + shape, dtype)
        v = model.init({"params": jax.random.PRNGKey(0)},
                       np.zeros((1,) + shape, np.float32), train=False)
        if dt == "bf16":
            v = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, v)

        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        try:
            cost = fwd.lower(v, x).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
        except Exception as e:  # noqa: BLE001
            print(f"{label}: cost analysis failed: {e!r}"[:300], flush=True)
            continue
        per_clip = flops / bs
        mfu = per_clip * clips / V5E_PEAK[dt]
        print(json.dumps({
            "model": label, "gflop_per_clip": round(per_clip / 1e9, 2),
            "clips_per_sec": clips, "tflops_achieved":
                round(per_clip * clips / 1e12, 2),
            "mfu_vs_peak": round(mfu, 3)}), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
