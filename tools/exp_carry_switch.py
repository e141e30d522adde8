"""One-time carry-switch cross-check (VERDICT r3 next #2).

bench.py r4 switched its chain carry from the additive `x + 1e-6*mean(out)`
bump (bit-absorbed by bf16 after step 1 — CLAUDE.md / BASELINE.md
post-mortems, relay result-caching risk) to the provably-distinct
multiplicative carry in tools/bench_lib.py. This script measures BOTH
carries side by side on the bench.py axes (DETR bf16, DETR w8a8, S3D bf16)
so the r1-r3 numbers stay comparable across the switch; the result is
recorded in BASELINE.md ("carry switch" section).

Run:  nohup python tools/exp_carry_switch.py > /tmp/exp_carry_switch.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_lib import chained_rate, make_chain_step  # noqa: E402


def make_additive_step(apply_fn):
    """The r1-r3 bench.py carry (bit-absorbed in bf16 after step 1)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(v, xs):
        out = apply_fn(v, xs)
        nxt = xs + jnp.asarray(1e-6, xs.dtype) * jnp.mean(out).astype(xs.dtype)
        return nxt, out

    return step


def main():
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser
    from multi_modal_csi_tpu.models.video.s3d import S3D

    print("devices:", jax.devices(), flush=True)
    dtype = jnp.bfloat16
    results = {}

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree)

    # --- DETR bf16 + w8a8 (bench.py CSI axis config) -----------------------
    batch = 256
    model = DETRMultiUser(token_length=10, num_decoder_layers=6,
                          temp_cross=2.0, num_queries=5, dim_feedforward=512)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 3000, 270)), dtype)
    v = cast(model.init({"params": jax.random.PRNGKey(0)},
                        x[:2].astype(jnp.float32), train=False))
    apply_fn = lambda vv, xs: model.apply(vv, xs, train=False)  # noqa: E731

    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    calib = [jnp.asarray(np.asarray(x[:32], np.float32))]
    qv = quantize_for_serving(model, v, calib, mode="w8a8", train=False)

    for name, vv in (("detr_bf16", v), ("detr_w8a8", qv)):
        for carry, mk in (("additive", make_additive_step),
                          ("distinct", make_chain_step)):
            med, samples = chained_rate(mk(apply_fn), vv, x, batch)
            results[f"{name}_{carry}"] = {
                "median": round(med, 1),
                "samples": [round(s, 1) for s in samples]}
            print(name, carry, json.dumps(results[f"{name}_{carry}"]),
                  flush=True)

    # --- S3D bf16 (bench.py video axis config) -----------------------------
    vbatch = 32
    vmodel = S3D(out_features=9)
    vx = jnp.asarray(np.random.default_rng(1).normal(
        size=(vbatch, 45, 224, 224, 3)), dtype)
    vv = cast(vmodel.init({"params": jax.random.PRNGKey(1)},
                          vx[:2].astype(jnp.float32), train=False))
    vapply = lambda w, xs: vmodel.apply(w, xs, train=False)  # noqa: E731
    for carry, mk in (("additive", make_additive_step),
                      ("distinct", make_chain_step)):
        med, samples = chained_rate(mk(vapply), vv, vx, vbatch)
        results[f"s3d_bf16_{carry}"] = {
            "median": round(med, 1),
            "samples": [round(s, 1) for s in samples]}
        print("s3d_bf16", carry, json.dumps(results[f"s3d_bf16_{carry}"]),
              flush=True)

    print("SUMMARY", json.dumps(results), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
