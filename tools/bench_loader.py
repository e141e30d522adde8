"""CPU bench: native C++ CSI batch loader vs the numpy loader.

Generates a synthetic amp cache (variable-length windows like WiMANS), then
times cold-ish loads of a batch through both paths. The native loader
(native/csi_loader.cpp) parses .npy headers itself and preads each window's
tail straight into the left-padded slot of one preallocated buffer across a
thread pool — no per-file numpy allocation, no concat, no second pad pass.

Run:  python tools/bench_loader.py [n_files] [rows]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from multi_modal_csi_tpu.data.csi_io import load_csi_windows
from multi_modal_csi_tpu.data.native_loader import (load_csi_windows_native,
                                                    native_available)


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    max_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        labels = []
        total_bytes = 0
        for i in range(n_files):
            rows = int(rng.integers(max_rows // 2, max_rows + 1))
            a = rng.normal(size=(rows, 3, 3, 30)).astype(np.float32)
            np.save(os.path.join(d, f"w{i}.npy"), a)
            total_bytes += a.nbytes
            labels.append(f"w{i}")
        print(f"{n_files} files, {total_bytes / 1e9:.2f} GB")

        assert native_available(), "native loader unavailable"

        def timeit(fn, label, reps=3):
            best = float("inf")
            out = None
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn()
                best = min(best, time.perf_counter() - t0)
            gbps = total_bytes / best / 1e9
            print(f"{label}: {best:.3f} s best-of-{reps} = {gbps:.2f} GB/s")
            return out

        a = timeit(lambda: load_csi_windows_native(d, labels, max_rows),
                   "native C++ (8 threads)")
        b = timeit(lambda: load_csi_windows(d, labels, max_rows),
                   "numpy loader")
        np.testing.assert_array_equal(a, b)
        print("outputs identical")


if __name__ == "__main__":
    main()
