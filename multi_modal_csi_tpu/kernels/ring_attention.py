"""Ring attention: sequence-parallel exact attention over the 'data' mesh axis.

Capability extension (SURVEY.md §5.7): the reference handles its 3000-step CSI
windows by pooling/striding — attention never sees more than 420 tokens. This
module makes the attention core SEQUENCE-SHARDABLE so much longer CSI windows
can be attended to exactly: queries stay resident per device, K/V blocks
rotate around the ring via ppermute (riding ICI), and the streaming
log-sum-exp accumulator keeps the softmax exact — the standard blockwise/ring
attention recipe expressed with shard_map + XLA collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _block_attend(q, k, v, m_prev, l_prev, o_prev, scale, precision=None):
    """One K/V block of streaming-softmax attention.

    q: (B, H, Nq, D); k/v: (B, H, Nk, D); m/l/o: running max, normalizer,
    unnormalized output. `precision=HIGHEST` forces exact f32 multiplies
    (TPU's default is bf16 passes) — used by correctness checks.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision,
                   preferred_element_type=jnp.float32) * scale
    m_cur = s.max(axis=-1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new[..., None])
    correction = jnp.exp(m_prev - m_new)
    l_new = l_prev * correction + p.sum(axis=-1)
    o_new = o_prev * correction[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v, precision=precision,
        preferred_element_type=jnp.float32)
    return m_new, l_new, o_new


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = "data",
                   precision=None) -> jnp.ndarray:
    """Exact attention with the SEQUENCE axis sharded over `axis`.

    q, k, v: (B, H, N, D) logically; physically each device holds an
    (B, H, N/devices, D) shard. Returns attention output with the same
    sharding. K/V shards rotate through every device (ppermute ring), so the
    result equals full attention at 1/devices the per-chip memory.
    """
    n_dev = mesh.shape[axis]
    scale = 1.0 / (q.shape[-1] ** 0.5)

    def local_fn(q, k, v):
        b, h, nq, d = q.shape
        m = jnp.full((b, h, nq), -jnp.inf, jnp.float32)
        l = jnp.zeros((b, h, nq), jnp.float32)
        o = jnp.zeros((b, h, nq, d), jnp.float32)
        # the accumulators become device-varying inside the loop; mark them
        # as such up front so the scan carry types match (shard_map vma rule)
        m, l, o = jax.lax.pvary((m, l, o), (axis,))

        def body(i, carry):
            m, l, o, k, v = carry
            m, l, o = _block_attend(q, k, v, m, l, o, scale,
                                    precision)
            perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
            return m, l, o, k, v

        m, l, o, _, _ = jax.lax.fori_loop(0, n_dev, body, (m, l, o, k, v))
        return (o / l[..., None]).astype(q.dtype)

    spec = P(None, None, axis, None)
    return shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)


def full_attention_reference(q, k, v, precision=None):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, precision=precision,
                      preferred_element_type=jnp.float32).astype(q.dtype)
