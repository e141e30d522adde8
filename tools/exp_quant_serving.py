"""TPU bench: int8 serving (w8 / w8a8) vs bf16 for the quant-hooked CSI
models.

Motivation (tools/exp_int8_probe.py, numbers in BASELINE.md): int8 matmul
327 TOPS vs bf16 199 TFLOP/s; the DETR dilated conv 197 vs 105; inline
int8->bf16 weight dequant fuses (491 GB/s effective weight readback). This
bench answers whether those op-level wins survive in the full models.

MLP is additionally run with a bf16 INPUT (its serving cost is input
readback: 3.24 MB/window f32 — BASELINE.md), since int8 weights do not
move an input-bound model.

Methodology: chained steps inside jit-compiled step fn (output feeds the
next input), marginal between two trip counts, identical to bench.py /
tools/bench_bf16_sweep.py. NOTE: runs 1-2 (the BASELINE.md table) used
the additive 1e-6 carry, which bf16 bit-absorbs (CLAUDE.md gotcha); the
step below now scales by the bf16-exact (1 + 1/128) so chained inputs
genuinely differ. Within-run comparisons from the earlier runs remain
valid (every variant shared the same carry).

Run:  nohup python tools/exp_quant_serving.py > /tmp/exp_quant.log 2>&1 &
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

BS = 256
N_SHORT, N_LONG = 2, 12


def measure(model, variables, x, label):
    @jax.jit
    def step(v, xx):
        out = model.apply(v, xx, train=False)
        leaf = jax.tree_util.tree_leaves(out)[0]
        scale = (jnp.float32(1.0 + 1.0 / 128)
                 + 1e-6 * jnp.mean(leaf).astype(jnp.float32))
        return xx * scale.astype(xx.dtype), out

    def run(n):
        xs = x
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            xs, out = step(variables, xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    xs, out = step(variables, x)   # compile
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_s, t_l = run(N_SHORT), run(N_LONG)
    rate = BS * (N_LONG - N_SHORT) / max(t_l - t_s, 1e-9)
    print(f"{label}: {rate:.1f} windows/s", flush=True)
    return rate


def bench_model(name, model, shape, results, input_dtype=jnp.bfloat16):
    from multi_modal_csi_tpu.core.quantize import quantize_for_serving

    rng = np.random.default_rng(0)
    x32 = rng.normal(size=(BS,) + shape).astype(np.float32)
    x = jnp.asarray(x32, input_dtype)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.asarray(x32[:2]), train=False)
    v16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
    row = {}
    row["bf16"] = measure(model, v16, x, f"{name} bf16")
    calib = [jnp.asarray(x32[:32])]
    v_w8 = quantize_for_serving(model, v16, calib, mode="w8", train=False)
    row["w8"] = measure(model, v_w8, x, f"{name} w8")
    v_a8 = quantize_for_serving(model, v16, calib, mode="w8a8", train=False)
    row["w8a8"] = measure(model, v_a8, x, f"{name} w8a8")
    results[name] = row


def main():
    print("devices:", jax.devices(), flush=True)
    from multi_modal_csi_tpu.models import csi as M

    results = {}
    bench_model("DETR", M.DETRMultiUser(token_length=10,
                                        num_decoder_layers=6,
                                        temp_cross=2.0, num_queries=5,
                                        dim_feedforward=512),
                (3000, 270), results)
    bench_model("THAT_ENCODER", M.THATEncoderDETR(temp_cross=2.0,
                                                  num_queries=5,
                                                  num_decoder_layers=6),
                (3000, 270), results)
    bench_model("CNN-2D", M.CNN2D(out_features=9), (3000, 270), results)
    bench_model("THAT", M.THAT(out_features=9), (3000, 270), results)
    # MLP: input-readback bound; bf16 input is the serving contract that
    # matters (BASELINE.md) — measure int8 weights on top of it.
    bench_model("MLP", M.MLP(out_features=54), (3000 * 270,), results)
    print("SUMMARY", json.dumps(results), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
