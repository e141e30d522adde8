"""Pluggable metric writers.

Replaces the reference's hard W&B coupling (wifi_csi/train.py:130-144 logs to
wandb unconditionally) with stdout/JSONL writers plus an optional W&B backend
that activates only when the package is importable and a project is set.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Dict, Optional


class MetricWriter:
    """Fan-out writer: stdout (compact), optional JSONL file, optional W&B."""

    def __init__(self, jsonl_path: Optional[str] = None,
                 wandb_project: Optional[str] = None,
                 run_name: Optional[str] = None,
                 config: Optional[dict] = None,
                 verbose: bool = True):
        self.verbose = verbose
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None
        self._wandb = None
        if wandb_project:
            try:
                import wandb
                self._wandb = wandb.init(project=wandb_project, name=run_name,
                                         config=config, reinit=True)
            except Exception as e:  # wandb missing or offline — degrade
                print(f"[metrics] wandb unavailable ({e}); stdout/JSONL only",
                      file=sys.stderr)

    def log(self, metrics: Dict[str, object], step: Optional[int] = None) -> None:
        record = {"_time": time.time()}
        if step is not None:
            record["step"] = step
        record.update({k: _scalarize(v) for k, v in metrics.items()})
        if self.verbose:
            parts = [f"{k} {v:.6f}" if isinstance(v, float) else f"{k} {v}"
                     for k, v in record.items() if not k.startswith("_")]
            print(" - ".join(parts))
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def finish(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._wandb:
            self._wandb.finish()


def _scalarize(v):
    try:
        import numpy as np
        if isinstance(v, (np.floating, np.integer)):
            return v.item()
        if hasattr(v, "item") and getattr(v, "size", None) == 1:
            return v.item()
    except Exception:
        pass
    return v
