"""Compiled HBM footprint of the serving configs (bf16 vs int8).

Uses the compiled program's own memory analysis (argument + temp + output
allocation) — the ops-grade companion to the throughput tables: int8
weights halve/quarter the resident weight bytes, which sets how many model
replicas fit per chip in a serving fleet.

Run:  nohup python tools/exp_serving_memory.py > /tmp/exp_mem.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def footprint(model, variables, x, label, results):
    @jax.jit
    def fwd(v, xx):
        return model.apply(v, xx, train=False)

    compiled = fwd.lower(variables, x).compile()
    row = {}
    try:
        mem = compiled.memory_analysis()
        if isinstance(mem, (list, tuple)):
            mem = mem[0]
        for key in ("argument_size_in_bytes", "temp_size_in_bytes",
                    "output_size_in_bytes", "generated_code_size_in_bytes"):
            val = getattr(mem, key, None)
            if val is not None:
                row[key.replace("_in_bytes", "_mb")] = round(val / 1e6, 1)
    except Exception as e:  # noqa: BLE001
        row["error"] = repr(e)[:120]
    row["param_mb"] = round(sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(variables)) / 1e6, 1)
    results[label] = row
    print(label, json.dumps(row), flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    from multi_modal_csi_tpu.models import csi as M
    from multi_modal_csi_tpu.models.video.resnet3d import ResNet3D18

    results = {}
    rng = np.random.default_rng(0)

    def cast16(v):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, v)

    for name, model, shape, bs, mode in (
            ("MLP", M.MLP(out_features=54), (3000 * 270,), 256, "w8"),
            ("DETR", M.DETRMultiUser(token_length=10, num_decoder_layers=6,
                                     temp_cross=2.0, num_queries=5,
                                     dim_feedforward=512),
             (3000, 270), 256, "w8a8"),
            ("ResNet", ResNet3D18(out_features=9), (45, 112, 112, 3),
             64, "w8a8")):
        x32 = rng.normal(size=(bs,) + shape).astype(np.float32)
        x = jnp.asarray(x32, jnp.bfloat16)
        v = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.asarray(x32[:1]), train=False)
        v16 = cast16(v)
        footprint(model, v16, x, f"{name} bf16", results)
        qv = quantize_for_serving(model, v16, [jnp.asarray(x32[:4])],
                                  mode=mode, train=False)
        footprint(model, qv, x, f"{name} {mode}", results)
    print("SUMMARY", json.dumps(results), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
