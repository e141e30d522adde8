"""Differential bench: CSI preprocessing (.mat -> amplitude .npy).

The north-star is ">=5x PyTorch-CPU preprocessing+inference throughput";
inference is covered by bench.py and the BASELINE.md tables — this bench
measures the PREPROCESSING axis against the reference's own code
(/root/reference/benchmark/wifi_csi/preprocess.py:14-59, imported in-place
like tools/measure_baseline.py does for models).

Synthetic traces reproduce the WiMANS .mat nesting exactly (a (T,1) object
cell of (1,1) struct records whose LAST field is the (3,3,30) complex64
CSI), so the reference's `trace[t][0][0][0][-1]` chain and our
`mat_trace_to_complex` both run unmodified. Outputs are asserted equal.

Paths measured end-to-end (loadmat + extract + np.save):
  reference : per-packet python list-comp abs()          (preprocess.py:28)
  ours-host : parse once, one vectorized np.abs          (cli/preprocess_csi.py)
  ours-tpu  : + Pallas amplitude_phase on device (--device; adds the phase
              output the reference lacks) — run on a TPU host

Run:  python tools/bench_preprocess.py [--traces 16] [--packets 3000] [--device]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_PREPROCESS = "/root/reference/benchmark/wifi_csi/preprocess.py"


def make_traces(dir_mat: str, n: int, packets: int) -> None:
    import scipy.io as scio
    rng = np.random.default_rng(7)
    rec_dt = np.dtype([("timestamp", "O"), ("csi", "O")])
    for i in range(n):
        cell = np.empty((packets, 1), dtype=object)
        for t in range(packets):
            rec = np.empty((1, 1), dtype=rec_dt)
            csi = (rng.normal(size=(3, 3, 30))
                   + 1j * rng.normal(size=(3, 3, 30))).astype(np.complex64)
            rec[0, 0] = (np.float64(t), csi)
            cell[t, 0] = rec
        scio.savemat(os.path.join(dir_mat, f"act_{i:03d}.mat"),
                     {"trace": cell})


def load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_preprocess",
                                                  REF_PREPROCESS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--traces", type=int, default=16)
    p.add_argument("--packets", type=int, default=3000)
    p.add_argument("--device", action="store_true",
                   help="also measure the on-device Pallas amplitude path")
    args = p.parse_args()

    from multi_modal_csi_tpu.cli import preprocess_csi as ours

    with tempfile.TemporaryDirectory() as tmp:
        dir_mat = os.path.join(tmp, "mat")
        os.makedirs(dir_mat)
        print(f"generating {args.traces} x {args.packets}-packet traces...",
              flush=True)
        make_traces(dir_mat, args.traces, args.packets)
        mb = sum(os.path.getsize(os.path.join(dir_mat, f))
                 for f in os.listdir(dir_mat)) / 1e6

        results = {}

        def timed(label, fn, out_dir):
            os.makedirs(out_dir, exist_ok=True)
            import contextlib, io
            t0 = time.perf_counter()
            with contextlib.redirect_stdout(io.StringIO()):
                fn(out_dir)
            dt = time.perf_counter() - t0
            results[label] = {"traces_per_s": args.traces / dt,
                              "mb_per_s": mb / dt, "seconds": dt}
            print(f"{label}: {args.traces / dt:.2f} traces/s "
                  f"({mb / dt:.1f} MB/s)", flush=True)

        ref = load_reference_module()
        timed("reference", lambda d: ref.extract_csi_amp(dir_mat, d),
              os.path.join(tmp, "amp_ref"))
        timed("ours_host", lambda d: ours.extract_csi_amp(dir_mat, d),
              os.path.join(tmp, "amp_ours"))
        if args.device:
            timed("ours_device",
                  lambda d: ours.extract_csi_amp(dir_mat, d,
                                                 use_device=True),
                  os.path.join(tmp, "amp_dev"))

        # outputs must match the reference bit-for-bit (host path) /
        # to float tolerance (device rsqrt path)
        for f in sorted(os.listdir(os.path.join(tmp, "amp_ref"))):
            a = np.load(os.path.join(tmp, "amp_ref", f))
            b = np.load(os.path.join(tmp, "amp_ours", f))
            assert np.array_equal(a, b), f"host mismatch in {f}"
            if args.device:
                c = np.load(os.path.join(tmp, "amp_dev", f))
                np.testing.assert_allclose(c, a, rtol=2e-6, atol=2e-6)
        print("outputs verified equal to the reference", flush=True)
        results["speedup_host"] = (results["ours_host"]["traces_per_s"]
                                   / results["reference"]["traces_per_s"])
        if args.device:
            results["speedup_device"] = (
                results["ours_device"]["traces_per_s"]
                / results["reference"]["traces_per_s"])
        print("SUMMARY", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
