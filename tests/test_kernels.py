"""Pallas kernel tests (interpret mode on CPU) against jnp oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_csi_tpu.kernels.csi_preprocess import (
    amplitude_phase, amplitude_phase_reference)
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
