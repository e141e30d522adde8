"""Benchmark: CSI windows/sec/chip on the flagship DETR inference path.

Prints ONE JSON line:
  {"metric": "csi_windows_per_sec_per_chip", "value": N, "unit": "windows/s",
   "vs_baseline": R}

Configuration: batch 256, bfloat16 params/activations with float32 MXU
accumulation (preferred_element_type) — the production TPU serving setup.
The baseline denominator is the reference's PyTorch-CPU DETR inference
throughput on identical (3000, 270) windows, measured by
tools/measure_baseline.py and recorded in BASELINE.md.
Target (BASELINE.json): >=5x PyTorch-CPU per chip.

Measured history (v5e, 1 chip):
  f32  bs=8   : 4312 windows/s   (328x)
  f32  bs=64  : 11582 windows/s  (883x)
  bf16 bs=64  : 14223 windows/s  (1084x)
  bf16 bs=256 : 26123 windows/s  (1991x)
"""

from __future__ import annotations

import json
import time

import numpy as np

# PyTorch-CPU reference throughput (windows/sec) for DETR_MultiUser inference
# on (3000, 270) float32 windows, measured on this machine by
# tools/measure_baseline.py — see BASELINE.md.
PYTORCH_CPU_BASELINE_WPS = 13.12


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
    def forward(x):
        return model.apply(variables, x, train=False)

    forward(x).block_until_ready()          # compile
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = forward(x)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    wps = batch * n_iter / dt

    print(json.dumps({
        "metric": "csi_windows_per_sec_per_chip",
        "value": round(wps, 2),
        "unit": "windows/s",
        "vs_baseline": round(wps / PYTORCH_CPU_BASELINE_WPS, 2),
    }))


if __name__ == "__main__":
    main()
