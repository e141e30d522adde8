"""Weight-transplant parity proofs for the video backbones.

Same methodology as tools/parity_check.py (CSI): randomize every parameter
of a torch replica of the torchvision backbone (tools/torch_video_refs.py),
convert its state_dict with tools/convert_torchvision.py, load into the flax
model, and compare eval-mode forward outputs on the same input. Proves the
converter layout AND the flax architecture agree numerically with the torch
module graph (the reference's backbone: benchmark/video/model/*.py).

The torch side is a reconstruction of torchvision (no egress), so this pins
flax == reconstructed-torchvision; the strict converter flags any layout
drift when a real checkpoint is supplied.

Usage: python tools/video_parity_check.py [s3d swin3d_t ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root
sys.path.insert(0, _HERE)                    # sibling tools modules

import jax  # noqa: E402

# parity runs on CPU f32 — the axon TPU plugin force-selects itself and its
# conv numerics would swamp the tolerance (CLAUDE.md environment gotchas)
jax.config.update("jax_platforms", "cpu")


def randomize_(module, seed: int = 0):
    """Fill every param/buffer with random values (positive running_var)."""
    import torch
    g = torch.Generator().manual_seed(seed)
    state = module.state_dict()
    for key, t in state.items():
        if not torch.is_floating_point(t):
            continue
        if key.endswith("running_var"):
            t.copy_(torch.rand(t.shape, generator=g) + 0.5)
        else:
            t.copy_(torch.empty(t.shape).uniform_(-0.1, 0.1, generator=g))
    module.load_state_dict(state)


def _flax_forward(arch, params, stats, x_tvhwc):
    import jax
    from convert_torchvision import build_model
    model = build_model(arch, out_features=54)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    # drop the fresh task head: compare backbone logits (400-d)
    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    return np.asarray(fn(variables, x_tvhwc))


def check(arch: str, shape=(2, 3, 8, 64, 64), tol=2e-4, seed=0) -> float:
    import torch

    from convert_torchvision import CONVERTERS
    from torch_video_refs import MViTRef, R3D18Ref, S3DRef, Swin3DRef

    # mvit replicas built at the parity clip size so pos/rel tables line up
    sp, tt = (shape[3], shape[4]), shape[2]
    builders = {
        "r3d_18": lambda: R3D18Ref(),
        "s3d": lambda: S3DRef(),
        "swin3d_t": lambda: Swin3DRef(depths=(2, 2, 6, 2)),
        "swin3d_s": lambda: Swin3DRef(depths=(2, 2, 18, 2)),
        "mvit_v1_b": lambda: MViTRef("v1", spatial_size=sp, temporal_size=tt),
        "mvit_v2_s": lambda: MViTRef("v2", spatial_size=sp, temporal_size=tt),
    }
    ref = builders[arch]()
    randomize_(ref, seed)
    ref.eval()

    params, stats = CONVERTERS[arch](ref.state_dict(), 54)

    rng = np.random.default_rng(seed)
    x = rng.normal(size=shape).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()          # (B, 400)

    x_jax = np.transpose(x, (0, 2, 3, 4, 1))             # channels-last
    got = _flax_forward(arch, params, stats, x_jax)       # (B, 54) via head

    # compare at the 400-d backbone output: re-apply the known random task
    # head to the torch output and compare final logits instead
    head = params["head"]
    want_head = want @ np.asarray(head["kernel"]) + np.asarray(head["bias"])
    err = float(np.max(np.abs(got - want_head)))
    scale = float(np.max(np.abs(want_head))) + 1e-8
    rel = err / scale
    status = "OK" if rel < tol else "FAIL"
    print(f"{arch}: max abs err {err:.2e} (rel {rel:.2e}) {status}")
    if rel >= tol:
        raise SystemExit(f"{arch} parity FAILED")
    return rel


if __name__ == "__main__":
    targets = sys.argv[1:] or ["r3d_18", "s3d", "swin3d_t", "swin3d_s",
                               "mvit_v1_b", "mvit_v2_s"]
    for t in targets:
        check(t)
