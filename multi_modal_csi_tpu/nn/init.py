"""Parameter initializers reproducing the reference models' init distributions.

The reference mixes explicit ``xavier_uniform_`` calls (e.g. model/mlp.py:45-47)
with PyTorch layer defaults (kaiming-uniform(a=sqrt(5)) for Linear/Conv weight,
uniform(+-1/sqrt(fan_in)) for bias, uniform(+-1/sqrt(hidden)) for LSTM).
Bit-exact RNG parity with torch is impossible across frameworks; what matters
for accuracy parity is the *distribution*, reproduced here.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import random
from jax.nn.initializers import Initializer


def xavier_uniform() -> Initializer:
    """Glorot/Xavier uniform (torch.nn.init.xavier_uniform_, gain=1)."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_weight() -> Initializer:
    """PyTorch Linear/Conv default: kaiming_uniform(a=sqrt(5)) ==
    uniform(+-1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape)
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_bias(fan_in: int) -> Initializer:
    """PyTorch Linear/Conv default bias: uniform(+-1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return random.uniform(key, shape, dtype, -bound, bound)
    return init


def uniform_scale(bound: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)
    return init


def _fans(shape) -> tuple:
    """fan_in/fan_out for dense (in, out) and conv (*window, in, out) shapes
    (flax kernel layout)."""
    if len(shape) < 1:
        return 1, 1
    if len(shape) == 1:
        return shape[0], shape[0]
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    return shape[-2] * receptive, shape[-1] * receptive
