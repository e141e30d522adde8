"""Mesh/sharding tests on the 8-device virtual CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multi_modal_csi_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                               replicated, shard_batch)
from multi_modal_csi_tpu.parallel.partition import (DEFAULT_TP_RULES,
                                                    partition_specs,
                                                    shard_params)


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_create_mesh_default_and_2d():
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = create_mesh({"data": 4, "model": 2})
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh({"data": 3, "model": 2})


def test_batch_sharding_places_batch_axis():
    mesh = create_mesh({"data": 8, "model": 1})
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_data_parallel_matmul_matches_single_device():
    mesh = create_mesh({"data": 8, "model": 1})
    x = np.random.default_rng(0).normal(size=(16, 32)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(32, 8)).astype(np.float32)

    @jax.jit
    def f(x, w):
        return jnp.dot(x, w).sum(axis=0)

    xs = jax.device_put(x, batch_sharding(mesh, 2))
    ws = jax.device_put(w, replicated(mesh))
    got = np.asarray(f(xs, ws))
    want = np.asarray(f(x, w))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_partition_specs_rules():
    mesh = create_mesh({"data": 4, "model": 2})
    params = {
        "decoder": {"layer": {"attn": {"in_proj_weight": np.zeros((64, 192)),
                                       "out_proj_weight": np.zeros((64, 64))},
                    "ffn_up": {"kernel": np.zeros((64, 128))},
                    "ffn_down": {"kernel": np.zeros((128, 64))}}},
        "head": {"kernel": np.zeros((64, 10))},
    }
    specs = partition_specs(params, mesh)
    layer = specs["decoder"]["layer"]
    assert layer["attn"]["in_proj_weight"] == P(None, "model")
    assert layer["attn"]["out_proj_weight"] == P("model", None)
    assert layer["ffn_up"]["kernel"] == P(None, "model")
    assert layer["ffn_down"]["kernel"] == P("model", None)
    assert specs["head"]["kernel"] == P()


def test_partition_specs_skips_indivisible():
    mesh = create_mesh({"data": 4, "model": 2})
    params = {"attn": {"in_proj_weight": np.zeros((7, 9))}}  # 9 % 2 != 0
    specs = partition_specs(params, mesh)
    assert specs["attn"]["in_proj_weight"] == P()


def test_shard_params_places_leaves():
    mesh = create_mesh({"data": 4, "model": 2})
    params = {"ffn_up": {"kernel": np.ones((16, 32), np.float32)}}
    sharded = shard_params(params, mesh)
    leaf = sharded["ffn_up"]["kernel"]
    assert isinstance(leaf.sharding, NamedSharding)
    assert leaf.sharding.spec == P(None, "model")
