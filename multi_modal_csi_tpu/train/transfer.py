"""Transfer-learning optimizer: per-component learning rates and freezing.

Reference semantics (wifi_csi/utils.py:16-86):
  full              -> one Adam over everything at lr;
  feature_extractor -> feature_extractor at lr*0.01, encoder/decoder at lr;
  feature_encoder   -> feature_extractor FROZEN, encoder at lr*0.1,
                       decoder at lr.
torch builds these as Adam param groups with no weight decay; here they are an
optax.multi_transform keyed by the top-level parameter collection.
"""

from __future__ import annotations

from typing import Any, Tuple

import optax

from .loop import adam_like_torch

SCENARIO_LR = {
    "full": {},
    "feature_extractor": {"feature_extractor": 0.01},
    "feature_encoder": {"feature_extractor": 0.0, "encoder": 0.1},
}


def transfer_optimizer(params: Any, lr: float, scenario: str = "full"
                       ) -> optax.GradientTransformation:
    """Build the per-group optimizer for a restored model."""
    if scenario not in SCENARIO_LR:
        raise ValueError(f"unknown scenario: {scenario}")
    multipliers = SCENARIO_LR[scenario]
    if not multipliers:
        return adam_like_torch(lr)

    def label(key: str) -> str:
        return key if key in multipliers else "_default"

    labels = {k: label(k) for k in params.keys()}
    transforms = {"_default": adam_like_torch(lr)}
    for key, mult in multipliers.items():
        transforms[key] = (optax.set_to_zero() if mult == 0.0
                           else adam_like_torch(lr * mult))
    return optax.multi_transform(transforms, labels)
