"""Benchmark: CSI windows/sec/chip on the flagship DETR inference path,
plus the video clips/sec/chip axis (S3D) and the flagship's MFU.

Prints ONE JSON line:
  {"metric": "csi_windows_per_sec_per_chip", "value": N, "unit": "windows/s",
   "vs_baseline": R, "video_clips_per_sec_per_chip": C,
   "video_vs_baseline": RV, "mfu": M, "int8_windows_per_sec": Q}

The BASELINE.json north-star is "CSI windows/sec/chip AND video
clips/sec/chip"; both now ride the same line (VERDICT r2 next #5). `mfu` is
the DETR step's model-FLOPs utilization: XLA compiled-program cost analysis
flops x steps/sec / the v5e bf16 peak (197 TFLOP/s).

Methodology (important on relayed/async backends): repeated identical
executions get result-cached, and block_until_ready can resolve before remote
compute completes — both fake enormous numbers. This bench therefore uses
tools/bench_lib.py (the shared chained-marginal core):
  1. chains each iteration's INPUT through the previous OUTPUT with a
     PROVABLY-DISTINCT carry — a leading slice scaled by the bf16-exact
     1 + 1/128 (r4 hardening, VERDICT r3 next #2: the old additive
     `x + 1e-6*mean(out)` bump is bit-absorbed by bf16 after step 1, and
     the relay was observed result-caching identical-input chains);
  2. FETCHES the final output bytes to host (cannot be faked);
  3. reports the MARGINAL cost per step between a short and a long chain,
     which cancels the fixed dispatch/fetch round-trip — median of 3 pairs.
Old-vs-new carry cross-check: tools/exp_carry_switch.py + BASELINE.md
"carry switch" section (run once at the r4 switch for comparability).

Configuration: batch 256, bfloat16 with f32 MXU accumulation. Baseline:
the reference's PyTorch-CPU DETR throughput (tools/measure_baseline.py,
see BASELINE.md). Target (BASELINE.json): >=5x PyTorch-CPU per chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tools.bench_lib import chained_rate, make_chain_step  # noqa: E402

# PyTorch-CPU reference throughput (windows/sec) for DETR_MultiUser inference
# on (3000, 270) float32 windows — tools/measure_baseline.py, BASELINE.md.
PYTORCH_CPU_BASELINE_WPS = 13.12
# torch-CPU S3D inference at (45, 224, 224) bs4 — BASELINE.md video table.
PYTORCH_CPU_BASELINE_S3D_CPS = 0.284
V5E_BF16_PEAK_FLOPS = 197e12


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

    step = make_chain_step(lambda v, xs: model.apply(v, xs, train=False))
    wps, _ = chained_rate(step, variables, x, batch)

    # int8 serving path (w8a8 — DETR's measured winner, core.config.
    # QUANT_DEFAULTS / BASELINE.md int8 section). Headline stays bf16 for
    # cross-round comparability; this field tracks the quantized config.
    wps_int8 = None
    try:
        from multi_modal_csi_tpu.core.quantize import quantize_for_serving
        calib = [jnp.asarray(np.asarray(x[:32], np.float32))]
        qv = quantize_for_serving(model, variables, calib, mode="w8a8",
                                  train=False)
        wps_int8, _ = chained_rate(step, qv, x, batch)
    except Exception:
        pass

    # MFU from the compiled program's own cost analysis (flops per step),
    # using the marginal steps/sec just measured
    mfu = None
    try:
        cost = step.lower(variables, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = flops * (wps / batch) / V5E_BF16_PEAK_FLOPS
    except Exception:
        pass

    # video axis: S3D bf16 at the BASELINE.md serving config (bs32 — the
    # r3 batch-scaling knee; bs64 OOMs. tools/exp_video_batch.py)
    from multi_modal_csi_tpu.models.video.s3d import S3D
    vbatch = 32
    vmodel = S3D(out_features=9)
    vx = jnp.asarray(np.random.default_rng(1).normal(
        size=(vbatch, 45, 224, 224, 3)), dtype)
    vv = vmodel.init({"params": jax.random.PRNGKey(1)},
                     vx[:2].astype(jnp.float32), train=False)
    vv = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, vv)

    vstep = make_chain_step(lambda v, xs: vmodel.apply(v, xs, train=False))
    cps, _ = chained_rate(vstep, vv, vx, vbatch)

    print(json.dumps({
        "metric": "csi_windows_per_sec_per_chip",
        "value": round(wps, 2),
        "unit": "windows/s",
        "vs_baseline": round(wps / PYTORCH_CPU_BASELINE_WPS, 2),
        "video_clips_per_sec_per_chip": round(cps, 2),
        "video_vs_baseline": round(cps / PYTORCH_CPU_BASELINE_S3D_CPS, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "int8_windows_per_sec": (round(wps_int8, 2)
                                 if wps_int8 is not None else None),
    }))


def _transient(e: BaseException) -> bool:
    msg = repr(e)
    return any(t in msg for t in ("UNAVAILABLE", "remote_compile",
                                  "Unable to initialize backend",
                                  "DEADLINE_EXCEEDED"))


if __name__ == "__main__":
    # The TPU tunnel occasionally goes unavailable for tens of minutes
    # (observed r3: backend init UNAVAILABLE after a wedged compile). The
    # bench is the round's graded artifact, so retry transient backend
    # failures with a long backoff instead of dying on the first one.
    # Backend init is process-global, so each retry re-execs the script.
    import os
    import sys
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "4"))
    try:
        main()
    except Exception as e:                      # noqa: BLE001
        if attempts <= 1 or not _transient(e):
            raise
        print(f"bench: transient backend failure ({type(e).__name__}); "
              f"retrying in 300 s ({attempts - 1} attempts left)",
              file=sys.stderr, flush=True)
        time.sleep(300)
        env = dict(os.environ, BENCH_ATTEMPTS=str(attempts - 1))
        os.execve(sys.executable, [sys.executable, __file__], env)
