"""Result serialization helpers (reference: utils.py:185-193 NumpyEncoder)."""

from __future__ import annotations

import json

import numpy as np


class NumpyJSONEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if hasattr(obj, "item"):
            try:
                return obj.item()
            except Exception:
                pass
        return super().default(obj)
