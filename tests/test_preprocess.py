"""CSI preprocessing (.mat -> amplitude .npy) differential tests.

Synthetic traces reproduce the WiMANS .mat nesting (a (T,1) object cell of
(1,1) struct records whose LAST field is the (3,3,30) complex64 CSI) so
the reference's own extract_csi_amp
(/root/reference/benchmark/wifi_csi/preprocess.py:14-59, imported in-place
— the pattern of tests/test_metrics.py's differential oracle) runs
unmodified as the oracle. Throughput: tools/bench_preprocess.py.
"""

import importlib.util
import os

import numpy as np
import pytest

from multi_modal_csi_tpu.cli.preprocess_csi import (extract_csi_amp,
                                                    mat_trace_to_complex)

scio = pytest.importorskip("scipy.io")

REF_PREPROCESS = "/root/reference/benchmark/wifi_csi/preprocess.py"


def _write_traces(dir_mat, n=2, packets=40):
    rng = np.random.default_rng(11)
    rec_dt = np.dtype([("timestamp", "O"), ("csi", "O")])
    os.makedirs(dir_mat, exist_ok=True)
    for i in range(n):
        cell = np.empty((packets, 1), dtype=object)
        for t in range(packets):
            rec = np.empty((1, 1), dtype=rec_dt)
            csi = (rng.normal(size=(3, 3, 30))
                   + 1j * rng.normal(size=(3, 3, 30))).astype(np.complex64)
            rec[0, 0] = (np.float64(t), csi)
            cell[t, 0] = rec
        scio.savemat(os.path.join(dir_mat, f"act_{i}.mat"), {"trace": cell})


def test_amplitude_matches_reference_bit_exact(tmp_path):
    dir_mat = str(tmp_path / "mat")
    _write_traces(dir_mat)

    spec = importlib.util.spec_from_file_location("ref_pre", REF_PREPROCESS)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    ref_dir, our_dir = str(tmp_path / "ref"), str(tmp_path / "ours")
    os.makedirs(ref_dir)
    ref.extract_csi_amp(dir_mat, ref_dir)
    extract_csi_amp(dir_mat, our_dir)
    for f in sorted(os.listdir(ref_dir)):
        a = np.load(os.path.join(ref_dir, f))
        b = np.load(os.path.join(our_dir, f))
        assert a.shape == (40, 3, 3, 30) and a.dtype == np.float32
        assert np.array_equal(a, b), f


def test_workers_pool_matches_serial(tmp_path):
    dir_mat = str(tmp_path / "mat")
    _write_traces(dir_mat, n=3)
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    assert extract_csi_amp(dir_mat, d1, workers=1) == 3
    assert extract_csi_amp(dir_mat, d2, workers=2) == 3
    for f in sorted(os.listdir(d1)):
        assert np.array_equal(np.load(os.path.join(d1, f)),
                              np.load(os.path.join(d2, f)))
    with pytest.raises(ValueError):
        extract_csi_amp(dir_mat, d1, use_device=True, workers=2)


def test_phase_output(tmp_path):
    """The phase extension (the reference lacks it) is np.angle exactly."""
    dir_mat = str(tmp_path / "mat")
    _write_traces(dir_mat, n=1, packets=10)
    amp_d, ph_d = str(tmp_path / "amp"), str(tmp_path / "phase")
    extract_csi_amp(dir_mat, amp_d, dir_phase=ph_d)
    m = scio.loadmat(os.path.join(dir_mat, "act_0.mat"))
    csi = mat_trace_to_complex(m)
    ph = np.load(os.path.join(ph_d, "act_0.npy"))
    assert np.array_equal(ph, np.angle(csi).astype(np.float32))
