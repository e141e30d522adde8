"""VIDEO ENGINE-level parity: our runners/video.py::fit_video vs the
reference's OWN train() loop (/root/reference/benchmark/video/train.py:19-103),
run end-to-end for several epochs (VERDICT r3 next #3).

Video train-step parity (tools/video_train_parity.py) proves one optimizer
step; this closes the layer above it — the video loop's distinctive
composition, executed by the reference's own code:
  - DataLoader(shuffle=True) epoch batching (vs our epoch_batches with
    skip_last=False; n divisible by batch so the two cover the same rows);
  - per-epoch FULL-dataset evaluation of BOTH the train and the test set
    through test() (train.py:80-85) — eval-mode BN running stats;
  - the printed last-batch train loss;
  - best-weight selection by STRICT test-accuracy improvement
    (train.py:97-100) — no f1/PPP rule, no patience, no augmentation.

The torch MODEL is the randomized strict-converter replica backbone + the
reference's fresh Linear head (same composition as video_train_parity.py;
torchvision is absent in this environment) — but the LOOP, the DataLoader,
the eval composition, and the best-weight rule are the reference's own
train()/test() functions running that model.

Determinism plumbing (same class as tools/engine_parity.py):
  - torch.randperm patched to replay the np.random.default_rng(seed)
    permutation sequence fit_video's epoch_batches consumes;
  - DataLoader forced to num_workers=0 (the reference's 4 workers only
    load tensors; the sampler runs in-process either way);
  - r3d_18 has no dropout/stochastic depth, so no RNG neutralization is
    needed beyond the shuffle.

MEASURED profile (r5, after the RandomSampler double-draw fix in
deterministic_video_loop): every epoch of 4 — train loss 1.8e-7 /
2.7e-6 / 2.1e-5 / 1.5e-4 rel (pure f32 drift growth through 18 BN'd conv
layers), train/test accuracies EXACT, best-weight rule fires on both
sides, selected weights within 1.5e-3 max leaf err (BN running stats
integrate the drift). Before the fix the replay was offset by one
permutation from epoch 1 on and only epoch 0 was assertable.

Usage: python tools/video_engine_parity.py
"""

from __future__ import annotations

import contextlib
import importlib.util
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

REF = "/root/reference/benchmark/video"


def load_ref_video_train():
    spec = importlib.util.spec_from_file_location("ref_video_train",
                                                  f"{REF}/train.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@contextlib.contextmanager
def deterministic_video_loop(mod, seed: int, n: int):
    """Replay fit_video's epoch permutations inside the reference loop and
    keep the DataLoader in-process."""
    import torch
    from torch.utils.data import DataLoader

    perm_rng = np.random.default_rng(seed)
    orig_randperm = torch.randperm
    orig_loader = mod.DataLoader
    # RandomSampler's measured two-draws-per-epoch mapping is shared by
    # all three engine-parity harnesses: tools/replay_lib.py (r5).
    from tools.replay_lib import make_replay_randperm

    def loader(dataset, batch_size, **kw):
        kw["num_workers"] = 0
        return DataLoader(dataset, batch_size, **kw)

    torch.randperm = make_replay_randperm(n, perm_rng, orig_randperm)
    mod.DataLoader = loader
    try:
        yield
    finally:
        torch.randperm = orig_randperm
        mod.DataLoader = orig_loader


def video_engine_parity(epochs: int = 4, n: int = 16, n_test: int = 8,
                        batch: int = 8, shape=(3, 4, 32, 32),
                        out_features: int = 6, seed: int = 0,
                        lr: float = 1e-3):
    """r3d_18 replica, BCE pos_weight=1, Adam (the reference video config,
    video/model/resnet.py:108-112) — lr raised from 1e-4 so test accuracy
    actually moves within the horizon (the best-weight rule must fire on
    both sides to compare the selected weights)."""
    import jax
    import jax.numpy as jnp
    import torch

    from convert_torchvision import CONVERTERS, build_model
    from torch_video_refs import R3D18Ref
    from video_parity_check import randomize_

    from multi_modal_csi_tpu.data.video_io import ArrayClips
    from multi_modal_csi_tpu.runners.video import fit_video

    backbone = R3D18Ref()
    randomize_(backbone, seed)
    params, stats = CONVERTERS["r3d_18"](backbone.state_dict(), out_features)
    # deep-copy: the converter's arrays view the live torch tensors
    params, stats = (jax.tree_util.tree_map(lambda a: np.array(a), t)
                     for t in (params, stats))

    class TorchFull(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = backbone
            self.head = torch.nn.Linear(400, out_features)

        def forward(self, x):
            return self.head(self.backbone(x))

    tm = TorchFull()
    with torch.no_grad():
        tm.head.weight.copy_(
            torch.from_numpy(np.asarray(params["head"]["kernel"]).T))
        tm.head.bias.copy_(
            torch.from_numpy(np.asarray(params["head"]["bias"])))

    # separable labels so accuracy rises and the best rule fires
    rng = np.random.default_rng(seed + 100)
    x = rng.normal(size=(n,) + shape).astype(np.float32)     # (n, C, T, H, W)
    w = rng.normal(size=(shape[0], out_features))
    y = (x.mean(axis=(2, 3, 4)) @ w > 0).astype(np.int64)
    xt = x[:n_test].copy()
    yt = y[:n_test].copy()

    # ---- flax side: the production fit_video ----
    x_j = np.transpose(x, (0, 2, 3, 4, 1))                   # (n, T, H, W, C)
    xt_j = np.transpose(xt, (0, 2, 3, 4, 1))
    model = build_model("r3d_18", out_features=out_features)
    ours = []
    best, best_acc = fit_video(
        model, ArrayClips(x_j, y), ArrayClips(xt_j, yt), lr=lr,
        epochs=epochs, batch_size=batch, seed=seed, threshold=0.5,
        init_variables=(params, stats), verbose=False, history=ours)

    # ---- torch side: the reference's own train()/test() loop ----
    mod = load_ref_video_train()
    records = []
    orig_test = mod.test

    def test_recording(*a, **k):
        acc, rep, l = orig_test(*a, **k)
        records.append({"acc": float(acc), "loss": float(l)})
        return acc, rep, l

    mod.test = test_recording
    from torch.utils.data import TensorDataset
    train_set = TensorDataset(torch.from_numpy(x), torch.from_numpy(y))
    test_set = TensorDataset(torch.from_numpy(xt), torch.from_numpy(yt))
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    loss = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.tensor([1.0] * out_features))

    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with deterministic_video_loop(mod, seed, n), redirect_stdout(buf):
        best_weight = mod.train(tm, opt, loss, train_set, test_set,
                                0.5, batch, epochs, torch.device("cpu"))
    printed = [ln for ln in buf.getvalue().splitlines()
               if ln.startswith("Epoch")]

    # per-epoch: records alternate (train-set eval, test-set eval); the
    # printed line carries the last-batch train loss
    assert len(records) == 2 * epochs and len(ours) == epochs
    per_epoch = []
    worst = {"train_loss": 0.0, "train_acc": 0.0, "test_acc": 0.0}
    for e in range(epochs):
        ref_train_acc = records[2 * e]["acc"]
        ref_test_acc = records[2 * e + 1]["acc"]
        ref_loss = float(printed[e].split("- Loss ")[1].split(" ")[0])
        rec = {
            "train_loss": abs(ours[e]["train_loss"] - ref_loss)
            / max(abs(ref_loss), 1e-9),
            "train_acc": abs(ours[e]["train_acc"] - ref_train_acc),
            "test_acc": abs(ours[e]["test_acc"] - ref_test_acc),
        }
        per_epoch.append(rec)
        for k in worst:
            worst[k] = max(worst[k], rec[k])

    # best-weight selection: convert the reference's chosen state_dict back
    # through the strict converter and compare to our chosen tree
    best_err = None
    if best_weight is not None:
        back = {k[len("backbone."):]: v for k, v in best_weight.items()
                if k.startswith("backbone.")}
        params_t, stats_t = CONVERTERS["r3d_18"](back, out_features)
        params_t["head"] = {
            "kernel": best_weight["head.weight"].numpy().T,
            "bias": best_weight["head.bias"].numpy()}
        from video_train_parity import _flax_tree_err
        perr = _flax_tree_err(params_t, best[0])[0]
        serr = _flax_tree_err(stats_t, best[1])[0]
        best_err = max(perr, serr)

    return {"per_epoch": per_epoch, "worst": worst, "epochs": epochs,
            "best_weight_err": best_err,
            "ref_best_fired": best_weight is not None,
            "our_best_acc": best_acc}


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    print(json.dumps(video_engine_parity()))
