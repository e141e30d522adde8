"""Learning-rate schedules.

`cosine_warmup` reproduces the reference's get_cosine_schedule_with_warmup
(wifi_csi/train.py:26-33): linear warmup from 0, then cosine decay floored at
`min_lr_ratio`, all expressed as a multiplier on the base lr.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warmup(base_lr: float, num_warmup_steps: int,
                  num_training_steps: int, min_lr_ratio: float = 0.1):
    """optax-compatible schedule: step -> lr."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps)
        cos = jnp.maximum(min_lr_ratio, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return base_lr * jnp.where(step < num_warmup_steps, warm, cos)
    return schedule


def constant(base_lr: float):
    def schedule(step):
        return base_lr
    return schedule
