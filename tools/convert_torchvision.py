"""Offline torchvision-checkpoint -> JAX weight converter.

The reference initializes its video backbones from torchvision Kinetics-400
weights (e.g. video/model/resnet.py:33). With zero egress, weights arrive as
a .pth state-dict file; this tool converts one into the flax param tree of
the corresponding multi_modal_csi_tpu video model and saves a .msgpack
loadable by core.checkpoint.load_components.

Currently maps: r3d_18 -> ResNet3D18. Layout rules:
  conv3d  (O, I, T, H, W) -> (T, H, W, I, O)
  linear  (O, I)          -> (I, O)
  batchnorm weight/bias/running_mean/running_var -> scale/bias/mean/var

Usage: python tools/convert_torchvision.py r3d_18.pth out.msgpack
"""

from __future__ import annotations

import sys

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _linear(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def convert_r3d_18(state: dict, out_features: int = 54):
    """torchvision VideoResNet state_dict -> (params, batch_stats)."""
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in state.items()}
    params: dict = {}
    stats: dict = {}

    def bn(dst_p, dst_s, src):
        dst_p["bn"] = {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}
        dst_s["bn"] = {"mean": sd[f"{src}.running_mean"],
                       "var": sd[f"{src}.running_var"]}

    params["stem"] = {"conv": {"kernel": _conv(sd["stem.0.weight"])}}
    params["stem_bn"] = {}
    stats["stem_bn"] = {}
    bn(params["stem_bn"], stats["stem_bn"], "stem.1")

    for layer in range(1, 5):
        for block in range(2):
            name = f"layer{layer}_{block}"
            src = f"layer{layer}.{block}"
            p: dict = {}
            s: dict = {}
            p["conv1"] = {"conv": {"kernel": _conv(sd[f"{src}.conv1.0.weight"])}}
            p["bn1"], s["bn1"] = {}, {}
            bn(p["bn1"], s["bn1"], f"{src}.conv1.1")
            p["conv2"] = {"conv": {"kernel": _conv(sd[f"{src}.conv2.0.weight"])}}
            p["bn2"], s["bn2"] = {}, {}
            bn(p["bn2"], s["bn2"], f"{src}.conv2.1")
            if f"{src}.downsample.0.weight" in sd:
                p["downsample"] = {"conv": {"kernel":
                                            _conv(sd[f"{src}.downsample.0.weight"])}}
                p["downsample_bn"], s["downsample_bn"] = {}, {}
                bn(p["downsample_bn"], s["downsample_bn"], f"{src}.downsample.1")
            params[name] = p
            stats[name] = s

    params["fc"] = {"kernel": _linear(sd["fc.weight"]), "bias": sd["fc.bias"]}
    # the new task head stays randomly initialized (reference adds a fresh
    # Linear(400 -> out), video/model/resnet.py:38-41)
    rng = np.random.default_rng(0)
    bound = 1.0 / np.sqrt(400)
    params["head"] = {
        "kernel": rng.uniform(-bound, bound, (400, out_features)).astype(np.float32),
        "bias": rng.uniform(-bound, bound, (out_features,)).astype(np.float32),
    }
    return params, stats


def verify_against_model(params, stats, out_features: int = 54) -> bool:
    """Structural check: the converted tree initializes our ResNet3D18."""
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.models.video.resnet3d import ResNet3D18
    model = ResNet3D18(out_features=out_features)
    ref = model.init({"params": jax.random.PRNGKey(0)},
                     jnp.zeros((1, 4, 32, 32, 3)), train=False)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), params)
    return ref_shapes == got_shapes


if __name__ == "__main__":
    import torch
    from multi_modal_csi_tpu.core.checkpoint import save_components

    src, dst = sys.argv[1], sys.argv[2]
    state = torch.load(src, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    params, stats = convert_r3d_18(state)
    assert verify_against_model(params, stats), "structure mismatch"
    save_components(dst, params, stats)
    print(f"converted {src} -> {dst}")
