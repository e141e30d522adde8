"""Fused training-augmentation kernel using the on-chip TPU PRNG.

The reference's augmentation (train.py:65-73) is three elementwise passes
(gauss noise, per-sample scale, bernoulli mask). This kernel generates all
randomness with pltpu.prng_* and applies the full chain in ONE pass over the
batch — one HBM read, one write — instead of materializing three random
tensors. Falls back to the jnp implementation (train/augment.py) off-TPU.

Random streams differ from jax.random (hardware PRNG vs threefry); the
augmentation is stochastic regularization, so only the distribution matters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..train.augment import apply_augmentation as _jnp_augment


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 bits -> float32 uniform [0, 1) via mantissa packing."""
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _augment_kernel(seed_ref, x_ref, out_ref):
    i = pl.program_id(0)        # sample
    j = pl.program_id(1)        # time tile
    # per-SAMPLE scale: same seed (and same draw position) for every tile of
    # a sample, so the scale is consistent across tiles
    pltpu.prng_seed(seed_ref[0] + i)
    s_bits = pltpu.bitcast(pltpu.prng_random_bits((1, 128)), jnp.uint32)
    scale = 0.9 + 0.2 * _uniform_from_bits(s_bits)[0, 0]

    # per-TILE stream for noise/mask
    pltpu.prng_seed(seed_ref[0] + i * 7919 + (j + 1) * 104729)
    # randomness is generated in f32 regardless of the activation dtype
    # (bf16 batches included); the result casts back at the single write
    x = x_ref[0].astype(jnp.float32)               # (tile, F)

    # gaussian noise sigma 0.1 (Box-Muller on two uniform draws)
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(x.shape),
                                          jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(x.shape),
                                          jnp.uint32))
    eps = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-7))) \
        * jnp.cos(2.0 * jnp.pi * u2)
    x = (x + eps * 0.1) * scale

    # bernoulli keep-mask p=0.96
    m = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(x.shape),
                                         jnp.uint32))
    x = x * (m < 0.96).astype(x.dtype)
    out_ref[0] = x.astype(out_ref.dtype)


def fused_augmentation(rng: jax.Array, x: jnp.ndarray, *,
                       interpret: bool | None = None) -> jnp.ndarray:
    """One-pass noise+scale+mask augmentation for (B, T, F) batches."""
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu and not interpret:
        # pltpu.prng_* has no interpret-mode support; use the jnp equivalent
        return _jnp_augment(rng, x)
    interpret = bool(interpret) and not on_tpu
    if x.ndim == 2:
        # flattened MLP windows: a (1, 810000) block cannot tile VMEM sanely;
        # the jnp chain is already negligible next to the MLP's first matmul
        return _jnp_augment(rng, x)
    b, t, f = x.shape
    seed = jax.random.randint(rng, (1,), 0, 2**31 - 1, dtype=jnp.int32)
    # tile the time axis so VMEM holds ~tile*F floats (x + 3 random draws),
    # not the whole 3000-step window. Mosaic requires the sublane dim of a
    # partial block to be a multiple of 8, so pick the largest divisor of t
    # that is a multiple of 8 and fits the budget.
    max_rows = max(8, (1024 * 1024) // max(f * 4, 1))
    tile = t
    if t > max_rows:
        candidates = [d for d in range(8, max_rows + 1, 8) if t % d == 0]
        tile = candidates[-1] if candidates else t
    num_tiles = t // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_tiles),
        in_specs=[pl.BlockSpec((1, tile, f), lambda i, j, *_: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile, f), lambda i, j, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _augment_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, f), x.dtype),
        interpret=interpret,
    )(seed, x)
