"""TRAIN-STEP parity for the VIDEO modality: our runners/video.py step vs
the reference's torch video loop.

Extends tools/train_parity.py (CSI) to the video backbones: from identical
initial weights (torch replica randomized, converted with the strict
tools/convert_torchvision.py converter), run K full optimizer steps in BOTH
frameworks on identical batches and compare per-step losses + final params.

Covers what the video forward-transplant proofs cannot: gradients through
the 3D conv/BN graphs, torch-Adam semantics at the reference's video config
(Adam lr=1e-4, NO weight decay — video/model/resnet.py:108-110), BN
train-mode normalization + unbiased running-var updates across dozens of
BatchNorm3d layers, and the BCE(pos_weight=1) loss head
(video/model/resnet.py:112, train.py:62-77).

The torch side composes the randomized backbone replica
(tools/torch_video_refs.py) with the reference's fresh Linear(400->out)
task head (video/model/resnet.py:38-41); the flax side runs the production
step body train/loop.py::_train_step_body exactly as fit_video uses it
(augment off; dropout AND stochastic depth neutralized on both sides —
RNG cannot be made bitwise identical across frameworks; the torch replicas
omit DropPath entirely, so the flax DropPath is patched to identity to
compare the same deterministic graph).

r3 extension: all four attention backbones (swin3d_t/s, mvit_v1_b/v2_s)
join r3d_18 + s3d — this additionally proves gradients through windowed /
pooling attention, the rel-pos bias tables (both the Swin index-gather and
the MViT decomposed interpolation forms), LayerNorm, GELU MLPs, and patch
merging against torch autograd.

Usage: python tools/video_train_parity.py [r3d_18 s3d swin3d_t mvit_v1_b ...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

LR = 1e-4       # preset["lr"] (video/preset.py:35)


def _flax_tree_err(a, b, path="", _acc=None):
    """(max_err, worst_key, frac>1e-4, p999) over every leaf of two nested
    dicts with the same structure."""
    top = _acc is None
    if top:
        _acc = []
    worst, worst_key = 0.0, None
    for k in a:
        pa, pb = a[k], b[k]
        sub = f"{path}/{k}"
        if isinstance(pa, dict):
            e, kk = _flax_tree_err(pa, pb, sub, _acc)[:2]
        else:
            d = np.abs(np.asarray(pa, np.float32)
                       - np.asarray(pb, np.float32)).ravel()
            _acc.append(d)
            e, kk = float(d.max()) if d.size else 0.0, sub
        if e > worst:
            worst, worst_key = e, kk
    if not top:
        return worst, worst_key, None, None
    errs = np.concatenate(_acc) if _acc else np.zeros(1)
    return (worst, worst_key, float((errs > 1e-4).mean()),
            float(np.quantile(errs, 0.999)))


import contextlib


@contextlib.contextmanager
def flax_droppath_disabled():
    """Neutralize stochastic depth (identity) for the duration: the torch
    reconstructions omit DropPath (it is identity in eval, where the
    forward-parity oracle lives), so train-mode comparison must drop it on
    the flax side too."""
    from multi_modal_csi_tpu.models.video import mvit, swin3d
    patched = [(cls, cls.__call__) for cls in (mvit.DropPath,
                                               swin3d.DropPath)]
    for cls, _ in patched:
        cls.__call__ = lambda self, x, deterministic=True: x
    try:
        yield
    finally:
        for cls, orig in patched:
            cls.__call__ = orig


def video_train_parity(arch: str = "r3d_18", steps: int = 3,
                       shape=(2, 3, 8, 64, 64), out_features: int = 54,
                       seed: int = 0):
    import jax
    import jax.numpy as jnp
    import torch

    from convert_torchvision import CONVERTERS
    from torch_video_refs import MViTRef, R3D18Ref, S3DRef, Swin3DRef
    from train_parity import flax_dropout_disabled, neutralize_torch_dropout
    from video_parity_check import randomize_

    from multi_modal_csi_tpu.losses.basic import bce_with_logits
    from multi_modal_csi_tpu.train.loop import (_train_step_body,
                                                adam_like_torch)
    from convert_torchvision import build_model

    sp, tt = (shape[3], shape[4]), shape[2]
    builders = {
        "r3d_18": R3D18Ref,
        "s3d": S3DRef,
        "swin3d_t": lambda: Swin3DRef(depths=(2, 2, 6, 2)),
        "swin3d_s": lambda: Swin3DRef(depths=(2, 2, 18, 2)),
        "mvit_v1_b": lambda: MViTRef("v1", spatial_size=sp,
                                     temporal_size=tt),
        "mvit_v2_s": lambda: MViTRef("v2", spatial_size=sp,
                                     temporal_size=tt),
    }
    backbone = builders[arch]()
    randomize_(backbone, seed)

    params, stats = CONVERTERS[arch](backbone.state_dict(), out_features)
    # the converter's arrays VIEW the live torch tensors (StateDict uses
    # .detach().numpy()); torch's in-place Adam step would silently mutate
    # our "initial" weights — deep-copy before anything trains.
    params, stats = (jax.tree_util.tree_map(lambda a: np.array(a), t)
                     for t in (params, stats))

    # torch full model = randomized backbone + the reference's fresh task
    # head, with the head weights copied from the converted flax head so the
    # two frameworks start bit-identical everywhere.
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
    neutralize_torch_dropout(tm)
    tm.train()

    rng = np.random.default_rng(seed + 1)
    xs = rng.normal(size=(steps,) + shape).astype(np.float32)
    ys = (rng.random(size=(steps, shape[0], out_features)) < 0.3
          ).astype(np.float32)

    # ---- torch side: the reference video loop semantics (train.py:62-77)
    opt = torch.optim.Adam(tm.parameters(), lr=LR)
    loss_torch = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.tensor([1.0] * out_features))
    losses_t = []
    for k in range(steps):
        out = tm(torch.from_numpy(xs[k]))
        loss = loss_torch(out, torch.from_numpy(ys[k]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses_t.append(float(loss))

    # ---- flax side: the production video step (runners/video.py:128-151)
    model = build_model(arch, out_features=out_features)
    tx = adam_like_torch(LR)
    opt_state = tx.init(params)
    loss_fn = lambda o, y: bce_with_logits(o, y, pos_weight=1.0)  # noqa: E731
    xs_j = np.transpose(xs, (0, 1, 3, 4, 5, 2))   # (K,B,T,H,W,C)
    losses_j = []
    p, s = params, stats
    with flax_dropout_disabled(), flax_droppath_disabled():
        step = jax.jit(_train_step_body(model, tx, loss_fn, augment=False))
        for k in range(steps):
            p, s, opt_state, loss, _ = step(
                p, s, opt_state, jnp.asarray(xs_j[k]), jnp.asarray(ys[k]),
                jax.random.PRNGKey(k))
            losses_j.append(float(loss))
    p, s = jax.device_get(p), jax.device_get(s)

    # ---- final params: convert the TRAINED torch tree back through the
    # strict converter and overwrite its fresh head with the trained one
    params_t, stats_t = CONVERTERS[arch](tm.backbone.state_dict(),
                                         out_features)
    params_t["head"] = {
        "kernel": tm.head.weight.detach().numpy().T,
        "bias": tm.head.bias.detach().numpy()}
    perr, pkey, pfrac, p999 = _flax_tree_err(params_t, p)
    serr, skey = _flax_tree_err(stats_t, s)[:2]
    return {"model": arch, "losses_jax": losses_j, "losses_torch": losses_t,
            "param_err": perr, "param_err_key": pkey,
            "param_frac_above_1e-4": pfrac, "param_err_p999": p999,
            "stats_err": serr, "stats_err_key": skey}


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    targets = sys.argv[1:] or ["r3d_18", "s3d"]
    for arch in targets:
        res = video_train_parity(arch)
        loss_rel = max(abs(a - b) / max(abs(b), 1e-9) for a, b in
                       zip(res["losses_jax"], res["losses_torch"]))
        print(json.dumps({**res, "max_loss_rel_err": loss_rel}), flush=True)
