"""On-device spectrogram vs scipy.signal.spectrogram (ST-RF parity)."""

import numpy as np
import pytest
from scipy import signal

from multi_modal_csi_tpu.kernels.spectrogram import (spectrogram,
                                                     strf_features,
                                                     tukey_window)
from multi_modal_csi_tpu.models.csi.strf import spectrogram_features


def test_tukey_window_matches_scipy():
    want = signal.windows.tukey(16, 0.25)
    np.testing.assert_allclose(tukey_window(16, 0.25), want, atol=1e-12)


def test_spectrogram_matches_scipy(rng):
    x = rng.normal(size=(3, 5, 128)).astype(np.float32)
    _, _, want = signal.spectrogram(x, noverlap=8, nperseg=16, nfft=16)
    got = np.asarray(spectrogram(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_strf_features_match_host_pipeline(rng):
    x = rng.normal(size=(4, 64, 6)).astype(np.float32)
    want = spectrogram_features(x)           # host scipy pipeline
    got = np.asarray(strf_features(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_strf_features_jittable(rng):
    """The serving path compiles the whole feature pipeline into ONE
    program (the host-window `scale` must not trace — spectrogram.py:58)."""
    import jax
    x = rng.normal(size=(4, 64, 6)).astype(np.float32)
    got = np.asarray(jax.jit(strf_features)(x))
    np.testing.assert_allclose(got, spectrogram_features(x),
                               rtol=2e-4, atol=1e-6)
