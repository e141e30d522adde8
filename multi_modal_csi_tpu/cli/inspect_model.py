"""Model inspection CLI: per-query prediction analysis for set-prediction
models (the reference's InspectingOutput.ipynb as a reproducible command).

Loads a saved component checkpoint, runs the model over the selected dataset,
and reports:
  - per-query class-prediction histograms (query bias — which query predicts
    "no-person" how often);
  - the full performance_metrics dict;
  - optional visualization PNGs.

Usage:
  python -m multi_modal_csi_tpu.cli.inspect_model --checkpoint X.msgpack \
      --model DETR [--viz out_dir]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..core.config import load_config
from ..metrics.performance import performance_metrics
from ..utils.results import NumpyJSONEncoder


def query_bias(logits: np.ndarray) -> dict:
    """Per-query argmax-class histogram from [L, B, Q, C] or [B, Q, C]."""
    if logits.ndim == 4:
        logits = logits[-1]
    _, q, c = logits.shape
    idx = logits.argmax(-1)                       # (B, Q)
    hist = {f"query_{i}": np.bincount(idx[:, i], minlength=c).tolist()
            for i in range(q)}
    hist["no_person_rate_per_query"] = [
        float((idx[:, i] == c - 1).mean()) for i in range(q)]
    return hist


def main() -> None:
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default="DETR")
    p.add_argument("--task", default="activity")
    p.add_argument("--viz", default=None)
    p.add_argument("--config", default=None)
    args = p.parse_args()

    cfg = load_config(args.config, {"model": args.model, "task": args.task})
    from ..core.checkpoint import load_components
    from ..runners.csi import CSI_MODELS, master_split
    from ..train.loop import eval_dataset, make_eval_fn

    spec = CSI_MODELS[cfg.model]
    x_tr, x_te, y_tr, y_te = master_split(cfg, spec.target)
    x_te = x_te.reshape(x_te.shape[0], x_te.shape[1], -1)

    out_dim = int(np.asarray(y_tr[0]).shape[-1])
    model = spec.build(x_te.shape[1:], out_dim, cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jax.numpy.asarray(x_te[:1]), train=False)
    saved = load_components(args.checkpoint,
                            like={"params": variables["params"],
                                  "batch_stats": variables.get("batch_stats", {})})

    forward = make_eval_fn(model)
    logits = eval_dataset(forward, saved["params"], saved["batch_stats"],
                          x_te, batch_axis=spec.batch_axis)

    report = {
        "query_bias": query_bias(np.asarray(logits)),
        "metrics": {k: v for k, v in performance_metrics(
            y_te, logits, var_mode=spec.mode).items()
            if k != "counting_error_perPerson"},
    }
    if args.viz:
        from ..utils.visualize import visualize_model_performance
        report["viz_stats"] = visualize_model_performance(
            np.asarray(logits), y_te, save_dir=args.viz, var_mode=spec.mode)
    print(json.dumps(report, indent=2, cls=NumpyJSONEncoder))


if __name__ == "__main__":
    main()
