"""Thin collective layer over named mesh axes.

Restores the reference's *disabled* distributed intent — the SimCLR
`gather_from_all` whose torch.distributed path is hard-gated off
(model/SSL_model.py:395-414, `if False:`) — as a real cross-chip all-gather,
plus the helpers sharded losses need. Inside jit over a mesh these lower to
XLA collectives riding ICI; outside any mesh context they are identity,
matching the reference's single-device fallback.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def axis_present(axis: str) -> bool:
    """True when called under shard_map/vmap with this named axis bound."""
    try:
        jax.lax.axis_index(axis)
        return True
    except NameError:
        return False


def gather_from_all(x: jnp.ndarray, axis: Optional[str] = "data") -> jnp.ndarray:
    """Concatenate x across the named axis (batch-dim 0), identity if unbound.

    The TPU-native equivalent of SimCLR's cross-replica embedding gather:
    gradients flow back only to the local shard (matching the reference's
    GatherLayer semantics where each worker backprops its own slice).
    """
    if axis is None:
        return x
    try:
        return jax.lax.all_gather(x, axis, axis=0, tiled=True)
    except NameError:
        return x


def psum(x: jnp.ndarray, axis: str = "data") -> jnp.ndarray:
    try:
        return jax.lax.psum(x, axis)
    except NameError:
        return x


def pmean(x: jnp.ndarray, axis: str = "data") -> jnp.ndarray:
    try:
        return jax.lax.pmean(x, axis)
    except NameError:
        return x
