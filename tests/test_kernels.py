"""Pallas kernel tests (interpret mode on CPU) against jnp oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_csi_tpu.kernels.csi_preprocess import (
    amplitude_phase, amplitude_phase_reference, pad_normalize,
    pad_normalize_reference)
from multi_modal_csi_tpu.train.augment import apply_augmentation


def test_amplitude_phase_matches_reference(rng):
    re = rng.normal(size=(3, 16, 128)).astype(np.float32)
    im = rng.normal(size=(3, 16, 128)).astype(np.float32)
    amp, phase = amplitude_phase(jnp.asarray(re), jnp.asarray(im),
                                 interpret=True)
    amp_ref, phase_ref = amplitude_phase_reference(re, im)
    np.testing.assert_allclose(np.asarray(amp), np.asarray(amp_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(phase), np.asarray(phase_ref),
                               rtol=1e-5, atol=1e-6)
    # amplitude equals |complex|
    np.testing.assert_allclose(np.asarray(amp), np.abs(re + 1j * im),
                               rtol=1e-5)


def test_pad_normalize_left_pad_semantics(rng):
    b, t, f = 4, 16, 8
    x = rng.normal(size=(b, t, f)).astype(np.float32)
    lengths = np.array([16, 10, 1, 7], np.int32)
    out = pad_normalize(jnp.asarray(x), jnp.asarray(lengths), interpret=True)
    want = pad_normalize_reference(jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)
    # left-pad: first (t - len) rows are zero, data occupies the tail
    out_np = np.asarray(out)
    assert (out_np[1, :6] == 0).all()
    np.testing.assert_allclose(out_np[1, 6:], x[1, :10], rtol=1e-6)
    # matches the numpy np.pad semantics of load_data.py:70-72
    np.testing.assert_allclose(
        out_np[3], np.pad(x[3, :7], ((t - 7, 0), (0, 0))), rtol=1e-6)


def test_pad_normalize_with_standardization(rng):
    b, t, f = 2, 8, 4
    x = rng.normal(size=(b, t, f)).astype(np.float32) * 3 + 1
    lengths = np.array([8, 5], np.int32)
    mean = x.reshape(-1, f).mean(axis=0, keepdims=True).astype(np.float32)
    std = x.reshape(-1, f).std(axis=0, keepdims=True).astype(np.float32)
    out = pad_normalize(jnp.asarray(x), jnp.asarray(lengths),
                        jnp.asarray(mean), jnp.asarray(std), interpret=True)
    want = pad_normalize_reference(jnp.asarray(x), jnp.asarray(lengths),
                                   jnp.asarray(mean), jnp.asarray(std))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5)


def test_augmentation_shapes_and_changes(rng):
    x = jnp.asarray(rng.normal(size=(4, 16, 8)).astype(np.float32))
    out = apply_augmentation(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(out), np.asarray(x))
    # bf16 batches pass through unchanged in dtype (bf16 training path)
    xb = x.astype(jnp.bfloat16)
    outb = apply_augmentation(jax.random.PRNGKey(0), xb)
    assert outb.dtype == jnp.bfloat16


def test_augmentation_statistics(rng):
    # distribution check: ~4% zeros (bernoulli mask), mean ~1 elsewhere
    x = jnp.ones((8, 64, 128), jnp.float32)
    out = np.asarray(apply_augmentation(jax.random.PRNGKey(1), x))
    zero_frac = (out == 0).mean()
    assert 0.005 < zero_frac < 0.12
    nonzero = out[out != 0]
    assert abs(nonzero.mean() - 1.0) < 0.1
