"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule == serial.

Capability extension over the single-device reference (SURVEY.md §2.5); the
oracle is the serial composition of the same stages. Runs on the 8-device
virtual CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_csi_tpu.parallel.mesh import create_mesh
from multi_modal_csi_tpu.parallel.pipeline import (
    pipeline_apply, serial_reference, stack_stage_params)


def _toy_stage(p, x):
    return x + jnp.tanh(x @ p["w"] + p["b"])


def _toy_setup(n_stages=4, n_micro=6, mb=3, d=16, seed=0):
    rng = np.random.default_rng(seed)
    params = [{"w": jnp.asarray(rng.normal(size=(d, d)).astype(np.float32)
                                / np.sqrt(d)),
               "b": jnp.asarray(rng.normal(size=(d,)).astype(np.float32))}
              for _ in range(n_stages)]
    stacked = stack_stage_params(params)
    x = jnp.asarray(rng.normal(size=(n_micro, mb, d)).astype(np.float32))
    return stacked, x


def test_pipeline_matches_serial_forward():
    stacked, x = _toy_setup()
    mesh = create_mesh({"pipe": 4}, devices=jax.devices()[:4])
    out = jax.jit(lambda p, x: pipeline_apply(_toy_stage, p, x, mesh))(
        stacked, x)
    ref = serial_reference(_toy_stage, stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_pipeline_grads_match_serial():
    stacked, x = _toy_setup(n_micro=5)
    mesh = create_mesh({"pipe": 4}, devices=jax.devices()[:4])

    def loss_pipe(p):
        return jnp.sum(pipeline_apply(_toy_stage, p, x, mesh) ** 2)

    def loss_serial(p):
        return jnp.sum(serial_reference(_toy_stage, p, x) ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_ref = jax.grad(loss_serial)(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_pipeline_dp_pp_combined():
    """DP x PP mesh: microbatch dim sharded over 'data', stages over 'pipe'."""
    stacked, x = _toy_setup(mb=4)
    mesh = create_mesh({"pipe": 4, "data": 2})
    out = jax.jit(lambda p, x: pipeline_apply(_toy_stage, p, x, mesh,
                                              data_axis="data"))(stacked, x)
    ref = serial_reference(_toy_stage, stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_pipeline_single_microbatch_and_many():
    stacked, _ = _toy_setup()
    mesh = create_mesh({"pipe": 4}, devices=jax.devices()[:4])
    for n_micro in (1, 2, 9):
        rng = np.random.default_rng(n_micro)
        x = jnp.asarray(rng.normal(size=(n_micro, 2, 16)).astype(np.float32))
        out = pipeline_apply(_toy_stage, stacked, x, mesh)
        ref = serial_reference(_toy_stage, stacked, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-6)


def test_pipeline_that_encoder_blocks():
    """The real THAT left-stream encoder stack (4 homogeneous EncoderBlocks,
    reference model/that.py:100-170) pipelined over 4 devices == serial."""
    from multi_modal_csi_tpu.models.csi.that import EncoderBlock

    d, n_tokens = 30, 24
    block = EncoderBlock(dim_feature=d, num_heads=10, conv_sizes=(1, 3, 5))
    rng = np.random.default_rng(7)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    x_init = jnp.asarray(rng.normal(size=(2, n_tokens, d)).astype(np.float32))
    variables = [block.init({"params": k}, x_init, False) for k in keys]
    stacked = stack_stage_params(variables)

    def stage(v, x):
        return block.apply(v, x, False)

    mesh = create_mesh({"pipe": 4}, devices=jax.devices()[:4])
    x = jnp.asarray(rng.normal(size=(3, 2, n_tokens, d)).astype(np.float32))
    out = jax.jit(lambda v, x: pipeline_apply(stage, v, x, mesh))(stacked, x)
    ref = serial_reference(stage, stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
