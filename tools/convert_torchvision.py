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


def _pool(sd: StateDict, src: str) -> dict:
    """torchvision Pool (depthwise conv + LayerNorm at norm_act.0) ->
    flax PoolConv {conv: {kernel}, norm: {scale, bias}}."""
    return {"conv": {"kernel": _conv(sd.take(f"{src}.pool.weight"))},
            "norm": _ln(sd, f"{src}.norm_act.0")}


def _interp_table_np(table: np.ndarray, dst: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on dim 0."""
    src = table.shape[0]
    if src == dst:
        return table
    pos = np.clip((np.arange(dst) + 0.5) * (src / dst) - 0.5, 0, src - 1)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, src - 1)
    frac = (pos - i0)[:, None].astype(table.dtype)
    return table[i0] * (1 - frac) + table[i1] * frac


def resize_mvit_tables(params: dict, variant: str,
                       target_clip) -> dict:
    """Adapt a converted MViT tree to a different clip size (T, H, W).

    v2: linearly interpolate each block's decomposed rel-pos tables to the
    target sizes — torchvision does this at runtime (_add_rel_pos); flax
    shapes are static under jit, so it happens once, offline. v1: absolute
    pos tables are re-initialized fresh at the target size, exactly what the
    reference does (mvit_v1.py:36-45 rebuilds PositionalEncoding).
    """
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_video_refs import _mvit_block_settings

    t, h, w = target_clip
    # conv_proj kernel (3,7,7) stride (2,4,4) pad (1,3,3) output dims
    tt, hh, ww = (t - 1) // 2 + 1, (h - 1) // 4 + 1, (w - 1) // 4 + 1
    if variant == "v1":
        c = params["class_token"].shape[0]
        rng = np.random.default_rng(1)
        std = 0.02
        params["spatial_pos"] = (rng.standard_normal((hh * ww, c)) * std
                                 ).astype(np.float32)
        params["temporal_pos"] = (rng.standard_normal((tt, c)) * std
                                  ).astype(np.float32)
        params["class_pos"] = (rng.standard_normal((c,)) * std
                               ).astype(np.float32)
        return params
    size = [tt, hh, ww]
    for i, cfg in enumerate(_mvit_block_settings(variant)):
        attn = params[f"block{i}"]["attn"]
        sp = max(size[1], size[2])
        rel_sp = 2 * max(sp // cfg[3][1], sp // cfg[4][1]) - 1
        attn["rel_pos_h"] = _interp_table_np(np.asarray(attn["rel_pos_h"]),
                                             rel_sp)
        attn["rel_pos_w"] = _interp_table_np(np.asarray(attn["rel_pos_w"]),
                                             rel_sp)
        attn["rel_pos_t"] = _interp_table_np(np.asarray(attn["rel_pos_t"]),
                                             2 * size[0] - 1)
        if cfg[5]:
            size = [s // st for s, st in zip(size, cfg[3])]
    return params


def convert_mvit(state: dict, out_features: int = 54, variant: str = "v1"):
    """torchvision ``mvit_v1_b``/``mvit_v2_s`` state_dict -> (params, {}).

    Source layout: conv_proj, pos_encoding.{class_token,spatial_pos,
    temporal_pos,class_pos}, blocks.{0..15} MultiscaleBlock (attn.qkv,
    attn.pool_{q,k,v}.{pool,norm_act.0}, attn.project.0, attn.rel_pos_{h,w,t}
    for v2, block project, mlp.0/mlp.3), norm, head.1
    (reference backbones: benchmark/video/model/mvit_v1.py:33-45,
    mvit_v2.py:33-45; v1 pos encoding is rebuilt per clip size there).
    """
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_video_refs import _mvit_block_settings

    sd = StateDict(state)
    params: dict = {}
    params["conv_proj"] = {"kernel": _conv(sd.take("conv_proj.weight")),
                           "bias": sd.take("conv_proj.bias")}
    params["class_token"] = sd.take("pos_encoding.class_token")
    if variant == "v1":
        params["spatial_pos"] = sd.take("pos_encoding.spatial_pos")
        params["temporal_pos"] = sd.take("pos_encoding.temporal_pos")
        params["class_pos"] = sd.take("pos_encoding.class_pos")

    for i, cfg in enumerate(_mvit_block_settings(variant)):
        src = f"blocks.{i}"
        attn: dict = {
            "qkv": _dense(sd, f"{src}.attn.qkv"),
            "project": _dense(sd, f"{src}.attn.project.0"),
            "pool_k": _pool(sd, f"{src}.attn.pool_k"),
            "pool_v": _pool(sd, f"{src}.attn.pool_v"),
        }
        if cfg[5]:                                  # has_pool_q
            attn["pool_q"] = _pool(sd, f"{src}.attn.pool_q")
        if variant == "v2":
            for axis in ("h", "w", "t"):
                attn[f"rel_pos_{axis}"] = sd.take(
                    f"{src}.attn.rel_pos_{axis}")
        block = {
            "norm1": _ln(sd, f"{src}.norm1"),
            "attn": attn,
            "norm2": _ln(sd, f"{src}.norm2"),
            "mlp_up": _dense(sd, f"{src}.mlp.0"),
            "mlp_down": _dense(sd, f"{src}.mlp.3"),
        }
        if cfg[0] != cfg[1]:                        # in_ch != out_ch
            block["project"] = _dense(sd, f"{src}.project")
        params[f"block{i}"] = block

    params["norm"] = _ln(sd, "norm")
    params["fc"] = _dense(sd, "head.1")
    params["head"] = _task_head(out_features)
    sd.finish()
    return params, {}


def mvit_input_shape(params: dict, variant: str):
    """Infer the (B, T, H, W, 3) input the converted tree was trained at —
    v1 from the absolute pos tables, v2 from block0's rel_pos tables."""
    if variant == "v1":
        t = params["temporal_pos"].shape[0]
        hw = params["spatial_pos"].shape[0]
        s = int(round(hw ** 0.5))
    else:
        t = (params["block0"]["attn"]["rel_pos_t"].shape[0] + 1) // 2
        s = (params["block0"]["attn"]["rel_pos_h"].shape[0] + 1) // 2
    return (1, 2 * t, 4 * s, 4 * s, 3)


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
    "mvit_v1_b": lambda sd, out: convert_mvit(sd, out, "v1"),
    "mvit_v2_s": lambda sd, out: convert_mvit(sd, out, "v2"),
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
    import jax.numpy as jnp
    model = build_model(arch, out_features)
    if arch.startswith("mvit"):
        # mvit pos/rel tables are sized by clip dims: init at the size the
        # checkpoint was trained at (inferred from the converted tree)
        example = jnp.zeros(mvit_input_shape(params, arch[5:7]))
    else:
        example = _example_input(arch)
    ref = model.init({"params": jax.random.PRNGKey(0)}, example,
                     train=False)
    shape = lambda t: jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), t)
    ok = shape(ref["params"]) == shape(params)
    if "batch_stats" in ref or stats:
        ok = ok and shape(ref.get("batch_stats", {})) == shape(stats)
    return ok


if __name__ == "__main__":
    import torch
    from multi_modal_csi_tpu.core.checkpoint import save_components

    if len(sys.argv) not in (4, 5) or sys.argv[1] not in CONVERTERS:
        raise SystemExit(
            "usage: convert_torchvision.py <arch> src.pth out.msgpack "
            "[T,H,W]\n"
            f"archs: {' '.join(sorted(CONVERTERS))}\n"
            "T,H,W (mvit only): resize pos/rel tables to this clip size")
    arch, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    state = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    params, stats = CONVERTERS[arch](state, 54)
    if len(sys.argv) == 5:
        if not arch.startswith("mvit"):
            raise SystemExit("clip-size resize only applies to mvit archs")
        clip = tuple(int(v) for v in sys.argv[4].split(","))
        params = resize_mvit_tables(params, arch[5:7], clip)
    assert verify_against_model(params, stats, arch), "structure mismatch"
    save_components(dst, params, stats)
    print(f"converted {arch}: {src} -> {dst}")
