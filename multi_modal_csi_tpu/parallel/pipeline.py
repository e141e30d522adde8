"""Pipeline parallelism: GPipe-style microbatched execution over a mesh axis.

Capability extension (SURVEY.md §2.5): the reference is strictly
single-device — like ring attention (kernels/ring_attention.py) this module
supplies the TPU-native scaling dimension the reference lacks. A stack of
homogeneous stages (e.g. the THAT/DETR encoder's ``x = x + layer(x)`` blocks,
model/that.py:100-170 in the reference) is laid out one-stage-per-device over
a 'pipe' mesh axis; microbatches stream through the classic GPipe schedule
with activations hopping stage-to-stage via ``ppermute`` (one ICI hop per
tick — neighbours on the ring), so per-device parameter memory is 1/n_stages
of the stack and compute overlaps across microbatches after the fill phase.

The schedule runs ``n_micro + n_stages - 1`` ticks inside one ``lax.scan``
under ``shard_map``; every collective is XLA-visible, and the whole pipeline
is reverse-mode differentiable (scan + ppermute + psum all have transposes),
so it drops into a jitted train step unchanged.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_stage_params(stage_params: Sequence[Any]) -> Any:
    """Stack per-stage param pytrees along a new leading 'stage' axis.

    The result is what ``pipeline_apply`` shards over the pipe axis: leaf
    shapes become ``(n_stages, *leaf.shape)``.
    """
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *stage_params)


def pipeline_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   stacked_params: Any,
                   microbatches: jnp.ndarray,
                   mesh: Mesh,
                   axis: str = PIPE_AXIS,
                   data_axis: str | None = None) -> jnp.ndarray:
    """Run ``x -> stage_fn(p[n-1], ... stage_fn(p[0], x))`` as a pipeline.

    Args:
      stage_fn: one homogeneous stage, ``(params_i, x) -> y`` with
        ``y.shape == x.shape`` (residual blocks, encoder layers, ...).
      stacked_params: pytree whose leaves carry a leading ``n_stages`` axis
        (see ``stack_stage_params``); sharded one stage per device over
        ``axis``.
      microbatches: ``(n_micro, mb, ...)`` — the batch pre-split into
        microbatches (replicated across the pipe axis).
      mesh: mesh containing ``axis`` with size == n_stages.
      data_axis: optional second mesh axis; the microbatch dimension (axis 1)
        is sharded over it for combined DP+PP — each data-parallel group runs
        its own pipeline over its batch shard.

    Returns:
      ``(n_micro, mb, ...)`` outputs, bit-equal to applying the stages
      serially per microbatch (same op order per stage; only the schedule
      differs).
    """
    n_stages = mesh.shape[axis]
    n_micro = microbatches.shape[0]
    ticks = n_micro + n_stages - 1

    def local(params, mb):
        # shard_map hands each device a (1, ...)-leading shard of the stack
        params = jax.tree_util.tree_map(lambda a: a[0], params)
        if data_axis:  # params are data-invariant; activations are not
            params = jax.lax.pvary(params, (data_axis,))
        sidx = jax.lax.axis_index(axis)
        vary = (axis,) + ((data_axis,) if data_axis else ())
        x0 = jax.lax.pvary(jnp.zeros(mb.shape[1:], mb.dtype), vary)
        # zeros_like inherits mb's data-axis variance; add only 'pipe'
        outs0 = jax.lax.pvary(jnp.zeros_like(mb), (axis,))

        perm = [(j, (j + 1) % n_stages) for j in range(n_stages)]

        def tick(carry, t):
            x_cur, outs = carry
            # stage 0 ingests microbatch t during the fill/steady phase;
            # later stages consume what the previous tick permuted in
            feed = jax.lax.dynamic_index_in_dim(
                mb, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            feed = jax.lax.pvary(feed, (axis,))
            x_in = jnp.where(sidx == 0, feed, x_cur)
            y = stage_fn(params, x_in)
            # the last stage drains: tick t completes microbatch
            # t - (n_stages - 1)
            slot = t - (n_stages - 1)
            write = jnp.logical_and(sidx == n_stages - 1, slot >= 0)
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(slot, 0, n_micro - 1), 0)
            outs = jnp.where(write, upd, outs)
            return (jax.lax.ppermute(y, axis, perm), outs), None

        (_, outs), _ = jax.lax.scan(tick, (x0, outs0), jnp.arange(ticks))
        # broadcast the drain buffer (valid only on the last stage) to every
        # device so the result comes back replicated
        outs = jax.lax.psum(
            jnp.where(sidx == n_stages - 1, outs, jnp.zeros_like(outs)), axis)
        return outs

    stage_spec = jax.tree_util.tree_map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked_params)
    mb_spec = P(None, data_axis) if data_axis else P()
    return shard_map(local, mesh=mesh,
                     in_specs=(stage_spec, mb_spec), out_specs=mb_spec)(
                         stacked_params, microbatches)


def serial_reference(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                     stacked_params: Any,
                     microbatches: jnp.ndarray) -> jnp.ndarray:
    """The pipeline's semantics, unpipelined (oracle for tests)."""
    n_stages = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    x = microbatches
    for i in range(n_stages):
        p_i = jax.tree_util.tree_map(lambda a, i=i: a[i], stacked_params)
        # per-microbatch application, same op shapes as one pipeline tick
        x = jnp.stack([stage_fn(p_i, x[j]) for j in range(x.shape[0])], axis=0)
    return x
