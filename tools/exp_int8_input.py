"""TPU probe: int8 INPUT contract for the input-readback-bound MLP.

MLP serving is bound by reading the (B, 810000) input: 3.24 MB/window f32,
halved by the bf16 input contract (BASELINE.md). An int8 input contract
(host quantizes windows with one per-batch scale; first op dequantizes
inline) halves it again — IF XLA fuses the dequant into the leading
BatchNorm read instead of materializing a bf16 copy.

Variants (all with w8 int8 weights — MLP's measured winner):
  bf16_in   : bf16 input (the current contract)
  int8_in   : int8 input, inline x.astype(bf16) * scale before the model
  int8_in_f32 : same but dequant to f32 (checks convert-cost sensitivity)

Run:  nohup python tools/exp_int8_input.py > /tmp/exp_int8_input.log 2>&1 &
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


def measure(step, v, x, label):
    def run(n):
        xs, out = x, None
        t0 = time.perf_counter()
        for _ in range(n):
            xs, out = step(v, xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.perf_counter() - t0

    xs, out = step(v, x)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_s, t_l = run(N_SHORT), run(N_LONG)
    rate = BS * (N_LONG - N_SHORT) / max(t_l - t_s, 1e-9)
    print(f"{label}: {rate:.1f} windows/s", flush=True)
    return rate


def main():
    print("devices:", jax.devices(), flush=True)
    from multi_modal_csi_tpu.core.quantize import quantize_for_serving
    from multi_modal_csi_tpu.models import csi as M

    rng = np.random.default_rng(0)
    x32 = rng.normal(size=(BS, 3000 * 270)).astype(np.float32)
    amax = float(np.max(np.abs(x32)))
    scale = amax / 127.0
    x8 = np.clip(np.round(x32 / scale), -127, 127).astype(np.int8)

    model = M.MLP(out_features=54)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.asarray(x32[:2]), train=False)
    v16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
    v_w8 = quantize_for_serving(model, v16, [jnp.asarray(x32[:32])],
                                mode="w8", train=False)

    results = {}

    def chain(prep):
        @jax.jit
        def step(vv, xx):
            xin = prep(xx)
            out = model.apply(vv, xin, train=False)
            # carry an input-dtype perturbation so the chain has a real
            # data dependency in xx's own dtype
            bump = jnp.mean(out).astype(jnp.float32) * 1e-6
            if xx.dtype == jnp.int8:
                nxt = xx + jnp.round(bump).astype(jnp.int8)
            else:
                nxt = xx + bump.astype(xx.dtype)
            return nxt, out
        return step

    xb = jnp.asarray(x32, jnp.bfloat16)
    results["bf16_in"] = measure(chain(lambda x: x), v_w8, xb, "bf16_in")
    xi = jnp.asarray(x8)
    results["int8_in"] = measure(
        chain(lambda x: x.astype(jnp.bfloat16) * jnp.bfloat16(scale)),
        v_w8, xi, "int8_in")
    results["int8_in_f32"] = measure(
        chain(lambda x: x.astype(jnp.float32) * scale), v_w8, xi,
        "int8_in_f32")
    print("SUMMARY", json.dumps(results), flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
