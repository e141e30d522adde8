"""SSL inference-only evaluation (reference: inference_only.py:11-90).

Reloads an SSL checkpoint and evaluates the online head on the full test
split. Accepts our native .msgpack (saved by runners/ssl.py) OR the
reference's own torch .pt — the `{'model_state_dict': ...}` wrapper and
`_orig_mod.` compile prefixes inference_only.py:13-21 handles are handled
the same way by core/torch_import.py.

Usage:
  python -m multi_modal_csi_tpu.cli.ssl_inference --checkpoint ssl.msgpack
  python -m multi_modal_csi_tpu.cli.ssl_inference --checkpoint ref_ssl.pt
"""

from __future__ import annotations

import argparse
import json

import numpy as np
from sklearn.metrics import accuracy_score, classification_report

from ..core.config import load_config
from ..utils.results import NumpyJSONEncoder


def main() -> None:
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--task", default="activity")
    p.add_argument("--config", default=None)
    args = p.parse_args()
    cfg = load_config(args.config, {"model": "SSL", "task": args.task})

    from ..models.csi.ssl import SSLModel
    from ..runners.csi import master_split, _layout
    from ..train.loop import eval_dataset

    x_tr, x_te, y_tr, y_te = master_split(cfg, "raw")
    x_te = _layout(x_te, "seq")
    y_flat = y_te.reshape(y_te.shape[0], -1)

    model = SSLModel(out_features=y_flat.shape[-1])
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x_te[:2]), jnp.asarray(x_te[:2]),
                           train=False)
    # restore_scenario routes a reference torch .pt (inference_only.py's
    # own checkpoint format, incl. the _orig_mod. prefixes it strips) through
    # core/torch_import.py; a native .msgpack loads directly
    from ..core.checkpoint import restore_scenario
    params, batch_stats = restore_scenario(
        variables["params"], variables.get("batch_stats", {}),
        args.checkpoint, "full", model_key="SSL")
    saved = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def infer(params, batch_stats, x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x, inference=True)

    logits = eval_dataset(infer, saved["params"], saved["batch_stats"], x_te)
    pred = (1 / (1 + np.exp(-logits)) > cfg.nn.threshold).astype(int)
    acc = accuracy_score(y_flat.astype(int), pred)
    report = classification_report(y_flat.astype(int), pred, digits=6,
                                   zero_division=0, output_dict=True)
    print(json.dumps({"accuracy": acc, "report": report},
                     indent=2, cls=NumpyJSONEncoder))


if __name__ == "__main__":
    main()
