"""TPU bench: int8 serving (w8 / w8a8) vs bf16 for the video backbones.

Companion to tools/exp_quant_serving.py (CSI models). Conv backbones
(ResNet3D, S3D) hook through the shared Conv3D wrapper; the attention
backbones (MViT, Swin) hook their qkv/proj/mlp Linears — the flash
attention core itself stays bf16 (the Pallas kernel has no int8 path).
Serving batch = the measured knee (core.config.SERVING_BATCH_DEFAULTS);
serving dtype = each model's measured default.

Run:  nohup python tools/exp_quant_video.py > /tmp/exp_quant_video.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_SHORT, N_LONG = 2, 12


def measure(model, variables, x, bs, label):
    @jax.jit
    def step(v, xx):
        out = model.apply(v, xx, train=False)
        leaf = jax.tree_util.tree_leaves(out)[0]
        # bf16-exact multiplicative carry (see exp_quant_serving.py note)
        scale = (jnp.float32(1.0 + 1.0 / 128)
                 + 1e-6 * jnp.mean(leaf).astype(jnp.float32))
        return xx * scale.astype(xx.dtype), out

    def run(n):
        xs, out = x, None
        t0 = time.perf_counter()
        for _ in range(n):
            xs, out = step(variables, xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    xs, out = step(variables, x)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_s, t_l = run(N_SHORT), run(N_LONG)
    rate = bs * (N_LONG - N_SHORT) / max(t_l - t_s, 1e-9)
    print(f"{label}: {rate:.1f} clips/s", flush=True)
    return rate


def bench_model(name, model, shape, bs, results):
    from multi_modal_csi_tpu.core.config import resolve_serving_dtype
    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    from multi_modal_csi_tpu.train.loop import cast_for_serving

    dtype = jnp.dtype(resolve_serving_dtype("auto", name))
    rng = np.random.default_rng(0)
    x32 = rng.normal(size=(bs,) + shape).astype(np.float32)
    x = jnp.asarray(x32, dtype)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.asarray(x32[:1]), train=False)
    v = cast_for_serving(v, dtype) if dtype == jnp.bfloat16 else v
    row = {"dtype": str(dtype)}
    row["base"] = measure(model, v, x, bs, f"{name} {dtype}")
    calib = [jnp.asarray(x32[:min(bs, 4)])]
    v_w8 = quantize_for_serving(model, v, calib, mode="w8", train=False)
    row["w8"] = measure(model, v_w8, x, bs, f"{name} w8")
    v_a8 = quantize_for_serving(model, v, calib, mode="w8a8", train=False)
    row["w8a8"] = measure(model, v_a8, x, bs, f"{name} w8a8")
    results[name] = row


def main():
    print("devices:", jax.devices(), flush=True)
    from multi_modal_csi_tpu.models.video.resnet3d import ResNet3D18
    from multi_modal_csi_tpu.models.video.s3d import S3D
    from multi_modal_csi_tpu.models.video.mvit import MViT
    from multi_modal_csi_tpu.models.video.swin3d import Swin3D

    results = {}
    bench_model("ResNet", ResNet3D18(out_features=9), (45, 112, 112, 3),
                64, results)
    bench_model("S3D", S3D(out_features=9), (45, 224, 224, 3), 32, results)
    bench_model("MViT-v2", MViT(out_features=9, variant="v2"),
                (45, 224, 224, 3), 2, results)
    bench_model("Swin-T", Swin3D(out_features=9, depths=(2, 2, 6, 2)),
                (45, 224, 224, 3), 2, results)
    print("SUMMARY", json.dumps(results), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
