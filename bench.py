"""Benchmark: CSI windows/sec/chip on the flagship DETR inference path.

Prints ONE JSON line:
  {"metric": "csi_windows_per_sec_per_chip", "value": N, "unit": "windows/s",
   "vs_baseline": R}

Methodology (important on relayed/async backends): repeated identical
executions get result-cached, and block_until_ready can resolve before remote
compute completes — both fake enormous numbers. This bench therefore:
  1. chains each iteration's INPUT through the previous OUTPUT (full data
     dependency — nothing can be elided or cached);
  2. FETCHES the final output bytes to host (cannot be faked);
  3. reports the MARGINAL cost per step between a short and a long chain,
     which cancels the fixed dispatch/fetch round-trip.

Configuration: batch 256, bfloat16 with f32 MXU accumulation. Baseline:
the reference's PyTorch-CPU DETR throughput (tools/measure_baseline.py,
see BASELINE.md). Target (BASELINE.json): >=5x PyTorch-CPU per chip.
"""

from __future__ import annotations

import json
import time

import numpy as np

# PyTorch-CPU reference throughput (windows/sec) for DETR_MultiUser inference
# on (3000, 270) float32 windows — tools/measure_baseline.py, BASELINE.md.
PYTORCH_CPU_BASELINE_WPS = 13.12


def chained_wps(step, v, x, batch: int, n_short: int = 2,
                n_long: int = 12) -> float:
    """Marginal windows/sec between two chained runs (fetch included)."""
    def run(n):
        xs = x
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            xs, out = step(v, xs)
        np.asarray(out)                       # fetch — forces real completion
        return time.perf_counter() - t0

    xs, out = step(v, x)
    np.asarray(out)                           # compile + warm fetch path
    t_short = run(n_short)
    t_long = run(n_long)
    return batch * (n_long - n_short) / max(t_long - t_short, 1e-9)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser

    batch = 256
    dtype = jnp.bfloat16
    model = DETRMultiUser(token_length=10, num_decoder_layers=6,
                          temp_cross=2.0, num_queries=5, dim_feedforward=512)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 3000, 270)), dtype)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           x[:2].astype(jnp.float32), train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables)

    @jax.jit
    def step(v, x):
        out = model.apply(v, x, train=False)
        nxt = x + jnp.asarray(1e-6, x.dtype) * jnp.mean(out).astype(x.dtype)
        return nxt, out

    wps = chained_wps(step, variables, x, batch)

    print(json.dumps({
        "metric": "csi_windows_per_sec_per_chip",
        "value": round(wps, 2),
        "unit": "windows/s",
        "vs_baseline": round(wps / PYTORCH_CPU_BASELINE_WPS, 2),
    }))


if __name__ == "__main__":
    main()
