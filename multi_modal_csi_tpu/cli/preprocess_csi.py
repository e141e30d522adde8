"""CSI preprocessing CLI: raw .mat traces -> amplitude (+phase) .npy cache.

Reference: benchmark/wifi_csi/preprocess.py:14-59 — per-packet Python loop
taking abs() of the last CSI field. Here the .mat is parsed once and the
amplitude is computed as a single vectorized pass (Pallas kernel on TPU,
numpy on host), with optional phase extraction the reference lacks.

Usage:
  python -m multi_modal_csi_tpu.cli.preprocess_csi --dir_mat X --dir_amp Y
         [--phase --dir_phase Z] [--device]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def mat_trace_to_complex(data_mat) -> np.ndarray:
    """Extract the per-packet CSI array from a loaded .mat trace.

    The WiMANS trace is an object array of nested structs whose LAST field is
    the (3, 3, 30) complex CSI (wifi_csi/preprocess.py:27). Stacks to
    (T, 3, 3, 30) complex64.
    """
    trace = data_mat["trace"]
    packets = [trace[t][0][0][0][-1] for t in range(trace.shape[0])]
    return np.asarray(packets, dtype=np.complex64)


def extract_amplitude(csi: np.ndarray, use_device: bool = False):
    """(T, 3, 3, 30) complex -> (amp, phase) float32, vectorized."""
    if use_device:
        import jax.numpy as jnp
        from ..kernels.csi_preprocess import amplitude_phase
        re = jnp.asarray(csi.real.reshape(csi.shape[0], -1))
        im = jnp.asarray(csi.imag.reshape(csi.shape[0], -1))
        amp, phase = amplitude_phase(re, im)
        return (np.asarray(amp).reshape(csi.shape).astype(np.float32),
                np.asarray(phase).reshape(csi.shape).astype(np.float32))
    return (np.abs(csi).astype(np.float32),
            np.angle(csi).astype(np.float32))


def _convert_one(job) -> tuple:
    """One trace end-to-end (loadmat -> amplitude/phase -> save).

    Module-level so it pickles for the worker pool. Preprocessing is
    .mat-PARSE-bound (tools/bench_preprocess.py: the vectorized abs is
    ~free; scipy's nested-struct unpacking is ~98% of the time), so the
    scaling lever is process parallelism over independent traces — the
    reference is strictly single-process (preprocess.py:35-59).
    """
    import scipy.io as scio
    path_mat, dir_amp, dir_phase, use_device = job
    data_mat = scio.loadmat(path_mat)
    csi = mat_trace_to_complex(data_mat)
    amp, phase = extract_amplitude(csi, use_device)
    out = os.path.basename(path_mat).replace(".mat", ".npy")
    np.save(os.path.join(dir_amp, out), amp)
    if dir_phase:
        np.save(os.path.join(dir_phase, out), phase)
    return out, amp.shape


def extract_csi_amp(dir_mat: str, dir_amp: str,
                    dir_phase: str | None = None,
                    use_device: bool = False,
                    workers: int = 1) -> int:
    """Process every .mat in dir_mat; returns the number converted.

    workers > 1 fans the traces over a process pool (they are fully
    independent); use_device is incompatible with workers > 1 (one TPU).
    """
    os.makedirs(dir_amp, exist_ok=True)
    if dir_phase:
        os.makedirs(dir_phase, exist_ok=True)
    jobs = [(os.path.join(dir_mat, name), dir_amp, dir_phase, use_device)
            for name in sorted(os.listdir(dir_mat))
            if name.endswith(".mat")]
    if workers > 1:
        if use_device:
            raise ValueError("--device is single-process (one accelerator)")
        import multiprocessing
        with multiprocessing.Pool(workers) as pool:
            for i, (_, shape) in enumerate(
                    pool.imap_unordered(_convert_one, jobs), 1):
                print(i, shape)
        return len(jobs)
    for i, job in enumerate(jobs, 1):
        _, shape = _convert_one(job)
        print(i, shape)
    return len(jobs)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dir_mat", default="dataset/wifi_csi/mat")
    p.add_argument("--dir_amp", default="dataset/wifi_csi/amp")
    p.add_argument("--dir_phase", default=None)
    p.add_argument("--device", action="store_true",
                   help="run the amplitude kernel on the accelerator")
    p.add_argument("--workers", type=int, default=1,
                   help="process-pool width (traces are independent; "
                        "preprocessing is .mat-parse-bound)")
    args = p.parse_args()
    t0 = time.time()
    n = extract_csi_amp(args.dir_mat, args.dir_amp, args.dir_phase,
                        args.device, workers=args.workers)
    print(f"converted {n} traces in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
