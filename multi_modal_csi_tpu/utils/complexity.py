"""Model complexity report: parameter count + compiled FLOPs.

Replaces the reference's ptflops probe (params + 2*MACs printed in every
runner, e.g. model/mlp.py:120-123) with XLA's own cost analysis of the jitted
forward — the honest number for the compiled TPU program.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def parameter_count(params: Any) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


def compiled_flops(fn, *example_args) -> float:
    """FLOPs of the jitted fn per invocation (XLA cost analysis); NaN if the
    backend does not report."""
    try:
        lowered = jax.jit(fn).lower(*example_args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return float("nan")


def complexity_report(model, variables, example_x) -> Dict[str, float]:
    params = variables.get("params", variables)
    flops = compiled_flops(
        lambda x: model.apply(variables, x, train=False), example_x)
    return {"parameter": parameter_count(params), "flops": flops}
