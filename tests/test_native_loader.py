"""Native C++ CSI loader vs the numpy reference implementation."""

import numpy as np
import pytest

from multi_modal_csi_tpu.data.csi_io import load_csi_windows
from multi_modal_csi_tpu.data.native_loader import (load_csi_windows_native,
                                                    native_available)


@pytest.fixture(scope="module")
def sample_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("amp")
    rng = np.random.default_rng(0)
    for i, t in enumerate([5, 12, 20, 1]):
        arr = rng.normal(size=(t, 3, 3, 30)).astype(np.float32)
        np.save(d / f"s{i}.npy", arr)
    return str(d)


def test_native_builds():
    assert native_available(), "g++ build of native/csi_loader.cpp failed"


def test_native_matches_numpy_loader(sample_dir):
    labels = ["s0", "s1", "s2", "s3"]
    want = load_csi_windows(sample_dir, labels, length=12)
    got = load_csi_windows_native(sample_dir, labels, length=12)
    assert got.shape == want.shape == (4, 12, 3, 3, 30)
    np.testing.assert_array_equal(got, want)


def test_native_single_thread(sample_dir):
    labels = ["s1", "s3"]
    want = load_csi_windows(sample_dir, labels, length=16)
    got = load_csi_windows_native(sample_dir, labels, length=16, num_threads=1)
    np.testing.assert_array_equal(got, want)


def test_native_missing_file_raises(sample_dir):
    if not native_available():
        pytest.skip("native loader unavailable")
    with pytest.raises(IOError):
        load_csi_windows_native(sample_dir, ["nope"], length=8)
