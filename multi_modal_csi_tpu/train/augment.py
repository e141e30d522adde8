"""In-graph training augmentation.

Reproduces the reference's on-device augmentation (wifi_csi/train.py:65-73)
with jax.random inside the jitted step — no host round trip:
  1. additive gaussian noise, sigma 0.1;
  2. per-sample uniform scale in [0.9, 1.1);
  3. elementwise bernoulli keep-mask with p=0.96.

(The reference's (B,1,1)-shaped scale broadcast is only well-defined for 3-D
inputs; for 2-D inputs (MLP's flattened windows) we scale per-sample, which is
the evident intent — see SURVEY.md §2.6 on the baseline-runner drift.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_augmentation(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    k_noise, k_scale, k_mask = jax.random.split(rng, 3)
    x = x + jax.random.normal(k_noise, x.shape, x.dtype) * 0.1
    scale_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    scale = jax.random.uniform(k_scale, scale_shape, x.dtype, 0.9, 1.1)
    x = x * scale
    mask = jax.random.bernoulli(k_mask, 0.96, x.shape)
    return x * mask.astype(x.dtype)
