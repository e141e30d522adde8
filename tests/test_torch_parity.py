"""Architecture parity vs the reference torch models: flax weights are
transplanted into the reference's own modules (loaded in-place from
/root/reference with stubbed deps) and forward outputs compared.

These are the heavyweight parity proofs (tools/parity_check.py); skipped
automatically when the reference tree is unavailable.
"""

import os
import sys

import pytest

REF = "/root/reference/benchmark/wifi_csi/model"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")

sys.path.insert(0, "/root/repo")


def test_detr_matches_reference_torch_model():
    from tools.parity_check import check_detr
    err = check_detr(atol=2e-4)
    assert err < 2e-4


def test_that_matches_reference_torch_model():
    from tools.parity_check import check_that
    err = check_that(atol=2e-4)
    assert err < 2e-4


@pytest.mark.parametrize("name", ["mlp", "cnn1d", "cnn2d", "lstm",
                                  "ablstm", "clstm"])
def test_baseline_models_match_reference(name):
    from tools.parity_check import ALL_CHECKS
    err = ALL_CHECKS[name](atol=1e-4)
    assert err < 1e-4


def test_that_encoder_matches_reference():
    from tools.parity_check import check_that_encoder
    err = check_that_encoder(atol=3e-4)
    assert err < 3e-4


@pytest.mark.parametrize("name", ["that_multi_head", "that_count_constrained",
                                  "dual_band", "ssl"])
def test_remaining_models_match_reference(name):
    from tools.parity_check import ALL_CHECKS
    err = ALL_CHECKS[name](atol=2e-4)
    assert err < 2e-4


def test_that_count_matches_reference():
    from tools.parity_check import check_that_count
    assert check_that_count(atol=2e-4) < 2e-4
