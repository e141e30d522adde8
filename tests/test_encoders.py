"""Golden tests for label encoding + reduce_dataset against a reference-
semantics oracle implemented independently (per wifi_csi/load_data.py and
wifi_csi/utils.py:272-287)."""

import numpy as np
import pandas as pd
import pytest

from multi_modal_csi_tpu.data.encoders import (
    encode_activity, encode_identity, encode_location, reduce_dataset)


def _df(rows):
    cols = (["label", "environment", "wifi_band", "number_of_users"]
            + [f"user_{i}_location" for i in range(1, 7)]
            + [f"user_{i}_activity" for i in range(1, 7)])
    return pd.DataFrame(rows, columns=cols).astype(str)


def test_encode_identity_presence_bits():
    df = _df([
        ["a1", "classroom", "2.4", "2", "a", "b", None, None, None, None,
         "walk", "jump", None, None, None, None],
        ["a2", "classroom", "2.4", "0", None, None, None, None, None, None,
         None, None, None, None, None, None],
    ])
    got = encode_identity(df)
    np.testing.assert_array_equal(got, [[1, 1, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0]])
    assert got.dtype == np.int8


def test_encode_activity_onehot():
    df = _df([
        ["a1", "classroom", "2.4", "2", "a", "b", None, None, None, None,
         "walk", "stand_up", None, None, None, None],
    ])
    got = encode_activity(df)
    assert got.shape == (1, 6, 9)
    np.testing.assert_array_equal(got[0, 0], [0, 1, 0, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(got[0, 1], [0, 0, 0, 0, 0, 0, 0, 0, 1])
    np.testing.assert_array_equal(got[0, 2], np.zeros(9))


def test_encode_location_onehot():
    df = _df([
        ["a1", "classroom", "2.4", "1", "e", None, None, None, None, None,
         "walk", None, None, None, None, None],
    ])
    got = encode_location(df)
    assert got.shape == (1, 6, 5)
    np.testing.assert_array_equal(got[0, 0], [0, 0, 0, 0, 1])
    np.testing.assert_array_equal(got[0, 1], np.zeros(5))


def test_encode_unknown_label_raises():
    df = _df([
        ["a1", "classroom", "2.4", "1", "a", None, None, None, None, None,
         "moonwalk", None, None, None, None, None],
    ])
    with pytest.raises(KeyError):
        encode_activity(df)


def _reference_reduce(data, num_object_queries=None):
    """Direct transcription of the published semantics (utils.py:272-287),
    used only as a test oracle."""
    new_data = []
    zero = np.zeros((5, 1))
    for sample in data:
        nz = sample.sum(axis=1)
        new_sample = np.delete(sample, (nz == 0).argmax(), axis=0)
        new_sample = np.hstack((new_sample, zero))
        nz = new_sample.sum(axis=1)
        new_sample[nz == 0, :] = [0, 0, 0, 0, 0, 0, 0, 0, 0, 1]
        if num_object_queries:
            pad = np.repeat([[0, 0, 0, 0, 0, 0, 0, 0, 0, 1]],
                            num_object_queries - 5, axis=0)
            new_sample = np.concatenate((new_sample, pad))
        new_data.append(new_sample)
    return np.array(new_data)


@pytest.mark.parametrize("num_queries", [None, 5, 7])
def test_reduce_dataset_matches_reference_oracle(rng, num_queries):
    # random per-user one-hot-or-zero rows over 9 classes
    n = 64
    data = np.zeros((n, 6, 9), dtype=np.int64)
    for i in range(n):
        k = rng.integers(0, 7)          # number of active users
        users = rng.choice(6, size=k, replace=False)
        for u in users:
            data[i, u, rng.integers(0, 9)] = 1
    got = reduce_dataset(data, num_queries)
    want = _reference_reduce(data, num_queries)
    np.testing.assert_array_equal(got.astype(np.float64), want)
    assert got.shape == (n, num_queries or 5, 10)


def test_reduce_dataset_six_active_users_drops_first_row():
    # no all-zero row: argmax of zero-mask is 0 -> row 0 dropped (reference quirk)
    data = np.zeros((1, 6, 9), dtype=np.int64)
    for u in range(6):
        data[0, u, u] = 1
    got = reduce_dataset(data)
    want = _reference_reduce(data)
    np.testing.assert_array_equal(got.astype(np.float64), want)
    # user 0's activity is gone
    assert got[0, :, 0].sum() == 0


def test_reduce_dataset_count_constrained_targets():
    # THAT_COUNT_CONSTRAINED pre-sums over queries (run_main.py:43-45)
    data = np.zeros((2, 6, 9), dtype=np.int64)
    data[0, 0, 1] = 1
    data[0, 1, 1] = 1
    counts = reduce_dataset(data).sum(axis=1)
    assert counts.shape == (2, 10)
    assert counts[0, 1] == 2 and counts[0, -1] == 3   # 3 no-person slots
    assert counts[1, -1] == 5
