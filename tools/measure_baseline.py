"""Measure the reference's PyTorch-CPU inference throughput (BASELINE.md).

Loads the reference model code in-place from /root/reference (read-only,
stubbing its unavailable deps: wandb, ptflops) and times CPU inference.
Usage: python tools/measure_baseline.py [model]
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time
import types
from unittest.mock import MagicMock

import numpy as np

REF = "/root/reference/benchmark/wifi_csi"


def _stub(name):
    if name not in sys.modules:
        sys.modules[name] = MagicMock()


def load_ref_module(fname: str):
    for missing in ["wandb", "ptflops"]:
        _stub(missing)
    sys.path.insert(0, REF)
    sys.path.insert(0, f"{REF}/model")
    # 'train' imports wandb — stub the symbol the model file needs
    train_stub = types.ModuleType("train")
    train_stub.train = MagicMock()
    sys.modules.setdefault("train", train_stub)
    spec = importlib.util.spec_from_file_location(
        fname.replace(".py", "_ref"), f"{REF}/model/{fname}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def measure_detr(batch=8, n_iter=10):
    import torch
    torch.set_num_threads(torch.get_num_threads())
    detr = load_ref_module("detr.py")
    model = detr.DETR_MultiUser((3000, 270), [10], embedding_time_dim=10,
                                num_decoder_layers=6, temp_cross=2,
                                num_queries=5, dim_feedforward=512)
    model.eval()
    x = torch.randn(batch, 3000, 270)
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(n_iter):
            model(x)
        dt = time.perf_counter() - t0
    return batch * n_iter / dt


def measure_that(batch=8, n_iter=10):
    import torch
    that = load_ref_module("that.py")
    model = that.THAT((3000, 270), (54,))
    model.eval()
    x = torch.randn(batch, 3000, 270)
    with torch.no_grad():
        model(x)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            model(x)
        dt = time.perf_counter() - t0
    return batch * n_iter / dt


def measure_simple(fname, cls, batch=8, n_iter=10, flat=False):
    import torch
    mod = load_ref_module(fname)
    shape = (3000 * 270,) if flat else (3000, 270)
    model = getattr(mod, cls)(shape, (54,))
    model.eval()
    x = torch.randn(batch, *shape)
    with torch.no_grad():
        model(x)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            model(x)
        dt = time.perf_counter() - t0
    return batch * n_iter / dt


MEASURES = {
    "DETR": measure_detr,
    "THAT": measure_that,
    "MLP": lambda: measure_simple("mlp.py", "MLP", flat=True, n_iter=30),
    "CNN-1D": lambda: measure_simple("cnn_1d.py", "CNN_1D", n_iter=30),
    "CLSTM": lambda: measure_simple("cnn_lstm.py", "CNN_LSTM"),
    "ABLSTM": lambda: measure_simple("ablstm.py", "ABLSTM"),
    "LSTM": lambda: measure_simple("lstm.py", "LSTMM"),
}


if __name__ == "__main__":
    which = sys.argv[1:] or ["DETR"]
    out = {}
    for name in which:
        out[name] = round(MEASURES[name](), 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"windows_per_sec_cpu": out}))
