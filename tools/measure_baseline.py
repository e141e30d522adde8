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


def measure_detr_training(batch=64, n_iter=5):
    """Reference torch-CPU TRAINING step (train.py:80-103): augmentation +
    DETR forward + HungarianMatchingLoss (per-sample scipy) + backward +
    Adam. The loss's hardcoded `.to('cuda')` (detr.py:508 — SURVEY.md §2.6
    drift) is neutralized by letting cuda-less `.to` fall back to identity,
    which is the evident CPU intent."""
    import torch
    detr = load_ref_module("detr.py")
    model = detr.DETR_MultiUser((3000, 270), [10], embedding_time_dim=10,
                                num_decoder_layers=6, temp_cross=2,
                                num_queries=5, dim_feedforward=512)
    model.train()
    orig_to = torch.Tensor.to

    def safe_to(self, *args, **kw):
        try:
            return orig_to(self, *args, **kw)
        except (RuntimeError, AssertionError):
            return self

    torch.Tensor.to = safe_to
    try:
        loss_fn = detr.HungarianMatchingLoss(
            cost_class_weight=1.0, aux_loss_weight=0.25,
            label_smoothing=0.3, class_imbalance_weight=0.25)
    finally:
        torch.Tensor.to = orig_to
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    x = torch.randn(batch, 3000, 270)
    y = torch.zeros(batch, 5, 10)
    y[torch.arange(batch)[:, None], torch.arange(5)[None, :],
      torch.randint(0, 10, (batch, 5))] = 1.0

    def step():
        noise = torch.randn_like(x) * 0.1
        xb = x + noise
        scale = torch.rand(xb.size(0), 1) * 0.2 + 0.9
        xb = xb * scale.unsqueeze(-1)
        mask = torch.bernoulli(torch.ones_like(xb) * 0.96)
        xb = xb * mask
        out = model(xb)
        l = loss_fn(out, y.float())
        opt.zero_grad()
        l.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_iter):
        step()
    dt = time.perf_counter() - t0
    return batch * n_iter / dt


def measure_simple_training(fname, cls, batch=64, n_iter=5, pos_weight=4.0):
    """Reference torch-CPU TRAINING step for a BCE-mode model (train.py's
    baseline path): augmentation + forward + BCEWithLogits(pos_weight) +
    backward + Adam."""
    import torch
    mod = load_ref_module(fname)
    model = mod.__dict__[cls]((3000, 270), (54,))
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    loss_fn = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.full((54,), float(pos_weight)))
    x = torch.randn(batch, 3000, 270)
    y = (torch.rand(batch, 54) < 0.3).float()

    def step():
        noise = torch.randn_like(x) * 0.1
        xb = x + noise
        scale = torch.rand(xb.size(0), 1) * 0.2 + 0.9
        xb = xb * scale.unsqueeze(-1)
        mask = torch.bernoulli(torch.ones_like(xb) * 0.96)
        xb = xb * mask
        out = model(xb)
        l = loss_fn(out, y)
        opt.zero_grad()
        l.backward()
        opt.step()

    step()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        step()
    dt = time.perf_counter() - t0
    return batch * n_iter / dt


def measure_video_cpu(n_iter=3):
    """torch-CPU video inference baselines at the bench shapes.

    torchvision itself is absent in this image; these run our torch
    reconstructions of its published module graphs (tools/torch_video_refs.py
    — the same modules the weight-transplant parity proofs validate), so the
    numbers are the reference architecture on CPU, head included."""
    import torch
    sys.path.insert(0, "/root/repo")
    from tools.torch_video_refs import (MViTRef, R3D18Ref, S3DRef, Swin3DRef)

    configs = [
        ("ResNet3D-18", R3D18Ref(400), (1, 3, 45, 112, 112)),
        ("S3D", S3DRef(400), (1, 3, 45, 224, 224)),
        ("Swin3D-T", Swin3DRef(400), (1, 3, 45, 224, 224)),
        # temporal_size=46: MViTRef sizes its pos tables as T//2, but the
        # stride-2 conv on T=45 outputs 23 frames (torchvision quirk)
        ("MViT-v1", MViTRef("v1", 400, (224, 224), 46), (1, 3, 45, 224, 224)),
    ]
    rates = {}
    for name, model, shape in configs:
        model.eval()
        x = torch.randn(*shape)
        with torch.no_grad():
            model(x)
            t0 = time.perf_counter()
            for _ in range(n_iter):
                model(x)
            dt = time.perf_counter() - t0
        rates[name] = shape[0] * n_iter / dt
        print(f"{name}: {rates[name]:.3f} clips/s", flush=True)
    return rates


def measure_video_training_cpu(n_iter=2):
    """torch-CPU video TRAINING baselines (reference video engine hot loop,
    video/train.py:19-103: forward + BCEWithLogits(pos_weight=1) + backward
    + Adam(lr 1e-4); no augmentation) at the BASELINE.md batch sizes.

    Same reconstruction caveat as measure_video_cpu: torchvision is absent,
    so these run our transplant-parity-validated torch replicas."""
    import torch
    sys.path.insert(0, "/root/repo")
    from tools.torch_video_refs import (MViTRef, R3D18Ref, S3DRef, Swin3DRef)

    configs = [
        ("ResNet3D-18", lambda: R3D18Ref(9), (8, 3, 45, 112, 112)),
        ("S3D", lambda: S3DRef(9), (4, 3, 45, 224, 224)),
        ("Swin3D-T", lambda: Swin3DRef(9), (2, 3, 45, 224, 224)),
        ("Swin3D-S", lambda: Swin3DRef(9, depths=(2, 2, 18, 2)),
         (2, 3, 45, 224, 224)),
        ("MViT-v1", lambda: MViTRef("v1", 9, (224, 224), 46),
         (2, 3, 45, 224, 224)),
        ("MViT-v2", lambda: MViTRef("v2", 9, (224, 224), 46),
         (2, 3, 45, 224, 224)),
    ]
    rates = {}
    for name, ctor, shape in configs:
        model = ctor()
        model.train()
        opt = torch.optim.Adam(model.parameters(), lr=1e-4)
        loss_fn = torch.nn.BCEWithLogitsLoss()
        x = torch.randn(*shape)
        y = (torch.rand(shape[0], 9) < 0.3).float()

        def step():
            out = model(x)
            l = loss_fn(out, y)
            opt.zero_grad()
            l.backward()
            opt.step()

        step()      # warmup
        t0 = time.perf_counter()
        for _ in range(n_iter):
            step()
        dt = time.perf_counter() - t0
        rates[name] = shape[0] * n_iter / dt
        print(f"{name}: {rates[name]:.4f} clips/s training", flush=True)
    return rates


def measure_cnn2d(batch=8, n_iter=10):
    return measure_simple("cnn_2d.py", "CNN_2D", batch=batch, n_iter=n_iter)


def measure_that_encoder(batch=8, n_iter=10):
    """Reference THAT_ENCODER+DETR decoder inference (that_encoder.py:458)."""
    import torch
    mod = load_ref_module("that_encoder.py")
    model = mod.DETR_MultiUser((3000, 270), [10], temp_cross=2, num_queries=5)
    model.eval()
    x = torch.randn(batch, 3000, 270)
    with torch.no_grad():
        model(x)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            model(x)
        dt = time.perf_counter() - t0
    return batch * n_iter / dt

def measure_that_variant(fname, cls, y_width, batch=8, n_iter=10):
    """Inference for the THAT head variants (multi-head / count / count
    constrained) — each is (var_x_shape, var_y_shape) like THAT itself."""
    import torch
    mod = load_ref_module(fname)
    model = getattr(mod, cls)((3000, 270), (y_width,))
    model.eval()
    x = torch.randn(batch, 3000, 270)
    with torch.no_grad():
        model(x)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            model(x)
        dt = time.perf_counter() - t0
    return batch * n_iter / dt


def measure_ssl_inference(batch=8, n_iter=10):
    """Reference SSL inference path (SSL_model.py:147-152: backbone +
    online head, inference=True)."""
    import torch
    mod = load_ref_module("SSL_model.py")
    model = mod.SS_Model((3000, 270), (54,))
    model.eval()
    x = torch.randn(batch, 3000, 270)
    with torch.no_grad():
        model(x, inference=True)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            model(x, inference=True)
        dt = time.perf_counter() - t0
    return batch * n_iter / dt


def measure_dual_band(batch=8, n_iter=10):
    """Reference dual-band inference (dual_band.py:24-57, two CNN towers)."""
    import torch
    mod = load_ref_module("dual_band.py")
    model = mod.DualBandCNN((3000, 270), (3000, 270), (54,))
    model.eval()
    x1 = torch.randn(batch, 3000, 270)
    x2 = torch.randn(batch, 3000, 270)
    with torch.no_grad():
        model(x1, x2)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            model(x1, x2)
        dt = time.perf_counter() - t0
    return batch * n_iter / dt


def measure_strf_inference(batch=64, n_iter=5):
    """Reference ST-RF inference half (strf.py:40-67): per-sample
    StandardScaler(with_std=None) centering + scipy spectrogram
    (nperseg 16 / noverlap 8) + frame average + RandomForest predict,
    on a forest pre-fit to synthetic features."""
    import numpy as np
    from scipy import signal as sp_signal
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.preprocessing import StandardScaler

    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, 3000, 270)).astype(np.float32)

    def features(xb):
        # the reference passes with_std=None (strf.py:44); this sklearn
        # rejects None — with_std=False is the same no-scaling behavior
        scaler = StandardScaler(with_std=False)
        xb = np.array([scaler.fit_transform(s) for s in xb])
        xt = np.swapaxes(xb, -1, -2)
        _, _, ft = sp_signal.spectrogram(xt, noverlap=8, nperseg=16, nfft=16)
        ft = np.average(ft, axis=-1)
        return ft.reshape(ft.shape[0], -1)

    f_train = features(x)
    y = rng.integers(0, 2, size=(batch, 54))
    forest = RandomForestClassifier(n_estimators=10, random_state=39,
                                    bootstrap=False)
    forest.fit(f_train, y)
    forest.predict(features(x))        # warmup
    t0 = time.perf_counter()
    for _ in range(n_iter):
        forest.predict(features(x))
    dt = time.perf_counter() - t0
    return batch * n_iter / dt


# --- torch-CPU TRAINING baselines for the remaining CSI families ---------


def _aug(x):
    import torch
    noise = torch.randn_like(x) * 0.1
    xb = x + noise
    scale = torch.rand(xb.size(0), 1) * 0.2 + 0.9
    xb = xb * scale.unsqueeze(-1)
    mask = torch.bernoulli(torch.ones_like(xb) * 0.96)
    return xb * mask


def _train_rate(model, step, batch, n_iter):
    step()      # warmup
    t0 = time.perf_counter()
    for _ in range(n_iter):
        step()
    return batch * n_iter / (time.perf_counter() - t0)


def measure_mlp_training(batch=64, n_iter=10):
    """MLP training (flattened input, BCE pw4 — run_mlp's intended
    baseline path)."""
    import torch
    mod = load_ref_module("mlp.py")
    model = mod.MLP((3000 * 270,), (54,))
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    loss_fn = torch.nn.BCEWithLogitsLoss(pos_weight=torch.full((54,), 4.0))
    x = torch.randn(batch, 3000 * 270)
    y = (torch.rand(batch, 54) < 0.3).float()

    def step():
        # 2-D aug: the reference's 3-D-shaped scale broadcast is a latent
        # defect on flat batches (PARITY.md engine notes); use the intent
        xb = x + torch.randn_like(x) * 0.1
        xb = xb * (torch.rand(xb.size(0), 1) * 0.2 + 0.9)
        xb = xb * torch.bernoulli(torch.ones_like(xb) * 0.96)
        l = loss_fn(model(xb), y)
        opt.zero_grad(); l.backward(); opt.step()

    return _train_rate(model, step, batch, n_iter)


def measure_cnn1d_training(batch=64, n_iter=3):
    """CNN-1D training — the reference's MSE count path (cnn_1d.py:168)."""
    import torch
    mod = load_ref_module("cnn_1d.py")
    model = mod.CNN_1D((3000, 270), (54,))
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    loss_fn = torch.nn.MSELoss()
    x = torch.randn(batch, 3000, 270)
    y = torch.randint(0, 3, (batch, 54)).float()

    def step():
        l = loss_fn(model(_aug(x)), y)
        opt.zero_grad(); l.backward(); opt.step()

    return _train_rate(model, step, batch, n_iter)


def measure_that_multihead_training(batch=64, n_iter=3):
    """THAT_MULTI_HEAD training: PermutationMatchingLoss — the reference's
    brute-force 5! python loop (that_multi_head.py:309-342)."""
    import torch
    mod = load_ref_module("that_multi_head.py")
    model = mod.THAT((3000, 270), (10,))
    model.train()
    loss_fn = mod.PermutationMatchingLoss()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    x = torch.randn(batch, 3000, 270)
    y = torch.zeros(batch, 5, 10)
    y[torch.arange(batch)[:, None], torch.arange(5)[None, :],
      torch.randint(0, 10, (batch, 5))] = 1.0

    def step():
        l = loss_fn(model(_aug(x)), y)
        opt.zero_grad(); l.backward(); opt.step()

    return _train_rate(model, step, batch, n_iter)


def measure_that_encoder_training(batch=64, n_iter=3):
    """THAT_ENCODER training: per-layer Hungarian matching
    (that_encoder.py:540-612; cuda-hardcode neutralized like DETR's)."""
    import torch
    mod = load_ref_module("that_encoder.py")
    model = mod.DETR_MultiUser((3000, 270), [10], temp_cross=2, num_queries=5)
    model.train()
    orig_to = torch.Tensor.to

    def safe_to(self, *args, **kw):
        try:
            return orig_to(self, *args, **kw)
        except (RuntimeError, AssertionError):
            return self

    torch.Tensor.to = safe_to
    try:
        loss_fn = mod.HungarianMatchingLoss(
            cost_class_weight=1.0, aux_loss_weight=0.25,
            label_smoothing=0.3, class_imbalance_weight=0.25)
    finally:
        torch.Tensor.to = orig_to
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    x = torch.randn(batch, 3000, 270)
    y = torch.zeros(batch, 5, 10)
    y[torch.arange(batch)[:, None], torch.arange(5)[None, :],
      torch.randint(0, 10, (batch, 5))] = 1.0

    def step():
        l = loss_fn(model(_aug(x)), y)
        opt.zero_grad(); l.backward(); opt.step()

    return _train_rate(model, step, batch, n_iter)


def measure_count_training(constrained=False, batch=64, n_iter=3):
    """THAT_COUNT(/CONSTRAINED) training: SmoothL1 on count targets
    (train.py:91-92) / CountBasedLoss on summed softmax rows."""
    import torch
    if constrained:
        mod = load_ref_module("that_count_pred_withSoftMaxConstraint.py")
        model = mod.THAT_COUNT_PRED_with_Constraint((3000, 270), (9,))
        loss_fn = mod.CountBasedLoss()
        cls = torch.randint(0, 10, (batch, 5))
        y = torch.zeros(batch, 10)
        y.scatter_add_(1, cls, torch.ones(batch, 5))
    else:
        mod = load_ref_module("that_count_pred.py")
        model = mod.THAT_COUNT_PRED((3000, 270), (9,))
        loss_fn = torch.nn.SmoothL1Loss()
        y = torch.randint(0, 3, (batch, 9)).float()
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    x = torch.randn(batch, 3000, 270)

    def step():
        l = loss_fn(model(_aug(x)), y)
        opt.zero_grad(); l.backward(); opt.step()

    return _train_rate(model, step, batch, n_iter)


def measure_ssl_training(batch=64, n_iter=3):
    """SSL training: two TimeSeriesTransform views + symmetric InfoNCE +
    online-head BCE (SSL_model.py:147-166, train_ssl.py:16-53)."""
    import torch
    mod = load_ref_module("SSL_model.py")
    model = mod.SS_Model((3000, 270), (54,))
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.randn(batch, 3000, 270)
    y = (torch.rand(batch, 54) < 0.3).float()

    def view(xb):
        v = xb + torch.randn_like(xb) * 0.05       # jitter
        v = v * (torch.rand_like(v) * 0.2 + 0.9)   # scale
        start = int(torch.randint(0, 2990, ()).item())
        v[:, start:start + 10, :] = 0              # mask segment
        return v

    def step():
        l, _ = model(view(x), view(x), y)
        opt.zero_grad(); l.backward(); opt.step()

    return _train_rate(model, step, batch, n_iter)


def measure_dual_band_training(batch=64, n_iter=3):
    """Dual-band training — the model's own local loop semantics
    (dual_band.py:174-233: no augmentation, BCE pos_weight 6)."""
    import torch
    mod = load_ref_module("dual_band.py")
    model = mod.DualBandCNN((3000, 270), (3000, 270), (54,))
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    loss_fn = torch.nn.BCEWithLogitsLoss(pos_weight=torch.full((54,), 6.0))
    x1 = torch.randn(batch, 3000, 270)
    x2 = torch.randn(batch, 3000, 270)
    y = (torch.rand(batch, 54) < 0.3).float()

    def step():
        l = loss_fn(model(x1, x2), y)
        opt.zero_grad(); l.backward(); opt.step()

    return _train_rate(model, step, batch, n_iter)


# Registry + CLI live at the END of the file so every measure_* above is
# defined before the CLI runs (a NameError here once broke the CLI while
# the import-only smoke test stayed green — ADVICE r2 #1).
MEASURES = {
    "DETR": measure_detr,
    "THAT": measure_that,
    "MLP": lambda: measure_simple("mlp.py", "MLP", flat=True, n_iter=30),
    "CNN-1D": lambda: measure_simple("cnn_1d.py", "CNN_1D", n_iter=30),
    "CLSTM": lambda: measure_simple("cnn_lstm.py", "CNN_LSTM"),
    "ABLSTM": lambda: measure_simple("ablstm.py", "ABLSTM"),
    "LSTM": lambda: measure_simple("lstm.py", "LSTMM"),
    "CNN-2D": measure_cnn2d,
    "THAT_ENCODER": measure_that_encoder,
    "THAT_MULTI_HEAD": lambda: measure_that_variant(
        "that_multi_head.py", "THAT", 10),
    "THAT_COUNT": lambda: measure_that_variant(
        "that_count_pred.py", "THAT_COUNT_PRED", 9),
    "THAT_COUNT_CONSTRAINED": lambda: measure_that_variant(
        "that_count_pred_withSoftMaxConstraint.py",
        "THAT_COUNT_PRED_with_Constraint", 9),
    "SSL": measure_ssl_inference,
    "DUAL_BAND": measure_dual_band,
    "ST-RF": measure_strf_inference,
    # training rows (windows/s through the reference's own hot loops)
    "MLP_TRAIN": measure_mlp_training,
    "CNN-1D_TRAIN": measure_cnn1d_training,
    "CNN-2D_TRAIN": lambda: measure_simple_training(
        "cnn_2d.py", "CNN_2D", pos_weight=6.0, n_iter=3),
    "CLSTM_TRAIN": lambda: measure_simple_training(
        "cnn_lstm.py", "CNN_LSTM", pos_weight=8.0, n_iter=3),
    "ABLSTM_TRAIN": lambda: measure_simple_training(
        "ablstm.py", "ABLSTM", pos_weight=6.0, n_iter=3),
    "THAT_MULTI_HEAD_TRAIN": measure_that_multihead_training,
    "THAT_ENCODER_TRAIN": measure_that_encoder_training,
    "THAT_COUNT_TRAIN": lambda: measure_count_training(False),
    "THAT_COUNT_CONSTRAINED_TRAIN": lambda: measure_count_training(True),
    "SSL_TRAIN": measure_ssl_training,
    "DUAL_BAND_TRAIN": measure_dual_band_training,
}


if __name__ == "__main__":
    which = sys.argv[1:] or ["DETR"]
    out = {}
    for name in which:
        out[name] = round(MEASURES[name](), 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"windows_per_sec_cpu": out}))
