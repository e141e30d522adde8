"""Benchmark: CSI windows/sec/chip on the flagship DETR forward path.

Prints ONE JSON line:
  {"metric": "csi_windows_per_sec_per_chip", "value": N, "unit": "windows/s",
   "vs_baseline": R}

The baseline denominator is the reference's PyTorch-CPU DETR inference
throughput on identical shapes, measured by tools/measure_baseline.py and
recorded in BASELINE.md. BASELINE target: >=5x PyTorch-CPU throughput.
"""

from __future__ import annotations

import json
import time

import numpy as np

# PyTorch-CPU reference throughput (windows/sec) for DETR_MultiUser inference
# on (B=8, 3000, 270) float32, measured on this machine by
# tools/measure_baseline.py — see BASELINE.md for the measurement log.
PYTORCH_CPU_BASELINE_WPS = 13.12


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser

    batch = 8
    model = DETRMultiUser(token_length=10, num_decoder_layers=6,
                          temp_cross=2.0, num_queries=5, dim_feedforward=512)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 3000, 270)),
        jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    @jax.jit
    def forward(x):
        return model.apply(variables, x, train=False)

    forward(x).block_until_ready()          # compile
    # timed runs
    n_iter = 30
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
