"""MLP over flattened CSI windows.

Reference: benchmark/wifi_csi/model/mlp.py:23-72 — BatchNorm1d over the
flattened (3000*270) input, Linear 256 -> 128 -> out with ReLU + Dropout(0.1),
xavier-uniform weights. Trained with BCE(pos_weight=4), baseline eval mode.

Serving: ``fold_input_norm=True`` skips the input BatchNorm; pair it with
``fold_input_norm(variables)`` below, which folds the eval-mode affine
(x*a + c) into layer_0's kernel/bias exactly. The BN materializes a full
(B, 810000) copy before the first matmul — an ~830 MB/batch HBM round trip
at serving batch 256 — and folding it measured **+114%** serving throughput
(99.2k -> 212.5k windows/s median with w8 + int8 inputs;
tools/exp_mlp_ladder.py, BASELINE.md stabilized ladder).
Training always keeps the live BatchNorm.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.layers import BatchNorm, Linear


class MLP(nn.Module):
    out_features: int
    fold_input_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not self.fold_input_norm:
            x = BatchNorm(name="input_norm")(x,
                                             use_running_average=not train)
        x = Linear(256, name="layer_0")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = Linear(128, name="layer_1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = Linear(self.out_features, name="layer_2")(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return x


def fold_input_norm(variables: Dict) -> Dict:
    """Fold MLP's eval-mode input BatchNorm into layer_0 (exact).

    BN(x) = x*a + c with a = gamma*rsqrt(var+eps), c = beta - mean*a, so
    layer_0(BN(x)) = x @ (a[:, None] * W) + (c @ W + b). Returns variables
    for ``MLP(fold_input_norm=True)`` — params without input_norm, no
    batch_stats. Fold arithmetic runs in float64 on host; the only
    difference vs the live BN is f32 dot-summation order (tested).
    """
    import numpy as np
    from flax.core import unfreeze

    params = unfreeze(jax.device_get(variables["params"]))
    stats = jax.device_get(variables["batch_stats"]["input_norm"]["bn"])
    bn = params.pop("input_norm")["bn"]
    gamma = np.asarray(bn["scale"], np.float64)
    beta = np.asarray(bn["bias"], np.float64)
    mean = np.asarray(stats["mean"], np.float64)
    var = np.asarray(stats["var"], np.float64)
    a = gamma / np.sqrt(var + 1e-5)
    c = beta - mean * a
    w0 = np.asarray(params["layer_0"]["kernel"], np.float64)
    b0 = np.asarray(params["layer_0"]["bias"], np.float64)
    params["layer_0"] = {
        "kernel": jnp.asarray((a[:, None] * w0).astype(np.float32)),
        "bias": jnp.asarray((b0 + c @ w0).astype(np.float32)),
    }
    out = {k: v for k, v in variables.items()
           if k not in ("params", "batch_stats")}
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    rest_stats = {k: v for k, v in variables["batch_stats"].items()
                  if k != "input_norm"}
    if rest_stats:
        out["batch_stats"] = rest_stats
    return out
