"""Ring attention vs full attention on the 8-device CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_csi_tpu.kernels.ring_attention import (
    full_attention_reference, ring_attention)
from multi_modal_csi_tpu.parallel.mesh import create_mesh


@pytest.mark.parametrize("n", [64, 128])
def test_ring_attention_matches_full(rng, n):
    mesh = create_mesh({"data": 8, "model": 1})
    b, h, d = 2, 4, 16
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    got = ring_attention(q, k, v, mesh)
    want = full_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_ring_attention_long_sequence(rng):
    # sequence length far beyond a single shard's block
    mesh = create_mesh({"data": 8, "model": 1})
    q = jnp.asarray(rng.normal(size=(1, 2, 512, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 512, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 512, 8)).astype(np.float32))
    got = ring_attention(q, k, v, mesh)
    want = full_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
