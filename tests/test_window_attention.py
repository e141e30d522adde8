"""Fused window-attention kernel vs jnp oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_csi_tpu.kernels.window_attention import (
    window_attention, window_attention_reference)


def test_window_attention_no_mask(rng):
    bw, h, n, d = 4, 2, 24, 16
    q = jnp.asarray(rng.normal(size=(bw, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(bw, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bw, h, n, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(h, n, n)).astype(np.float32) * 0.1)
    got = window_attention(q, k, v, bias, interpret=True)
    want = window_attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


def test_window_attention_with_shift_mask(rng):
    nw, reps, h, n, d = 3, 2, 2, 16, 8
    bw = nw * reps
    q = jnp.asarray(rng.normal(size=(bw, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(bw, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bw, h, n, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(h, n, n)).astype(np.float32) * 0.1)
    mask = np.zeros((nw, n, n), np.float32)
    mask[1, :, n // 2:] = -100.0
    mask = jnp.asarray(mask)
    got = window_attention(q, k, v, bias, mask, interpret=True)
    want = window_attention_reference(q, k, v, bias, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)


def test_window_attention_unaligned_shapes(rng):
    # N and D deliberately not multiples of the tile sizes
    bw, h, n, d = 2, 3, 13, 9
    q = jnp.asarray(rng.normal(size=(bw, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(bw, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(bw, h, n, d)).astype(np.float32))
    bias = jnp.zeros((h, n, n), jnp.float32)
    got = window_attention(q, k, v, bias, interpret=True)
    want = window_attention_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)
