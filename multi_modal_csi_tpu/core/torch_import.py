"""Import reference torch checkpoints into our flax CSI models.

The inverse direction of tools/parity_check.py's transplants: brings a
reference user's trained `.pt` state_dict OVER, so checkpoints trained with
`/root/reference/benchmark/wifi_csi` keep working after switching frameworks
(docs/MIGRATION.md "Checkpoints"). Wired into core.checkpoint.restore_scenario
(a `--pretrained ckpt.pt` path routes here); the forward-parity round-trip
oracles against the live reference modules live in tools/import_torch_csi.py.

Same strictness contract as the video converter (tools/convert_torchvision.py):
every state_dict key must be consumed and every flax leaf must be filled, or
the import raises — a layout drift can never load silently. Handled quirks:
  - `_orig_mod.` prefixes from torch.compile checkpoints are stripped
    (reference: wifi_csi/inference_only.py:17-21);
  - `num_batches_tracked` and the Gaussian position constant `var_position`
    (that.py:48-52, non-trainable) carry no information and are dropped;
  - the weight-SHARED decoder layer (detr.py / that_encoder.py register the
    same module at every ModuleList index, so the state_dict repeats its
    tensors under decoder_layers.1..N-1) — aliases are verified equal to
    layer 0, then consumed.
"""

from __future__ import annotations

import re

import numpy as np


class _Unfilled:
    """Sentinel leaf recording the expected shape until the import fills it."""

    def __init__(self, shape):
        self.shape = tuple(shape)


def _blank_like(tree):
    if isinstance(tree, dict):
        return {k: _blank_like(v) for k, v in tree.items()}
    return _Unfilled(np.shape(tree))


def _check_filled(tree, path=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _check_filled(v, f"{path}/{k}")
        return
    if isinstance(tree, _Unfilled):
        raise ValueError(f"import left flax leaf unfilled: {path}")


class _Ctx:
    """State-dict access with consumed-key tracking."""

    def __init__(self, sd):
        self.sd = sd
        self.used = set()

    def take(self, key):
        if key not in self.sd:
            raise KeyError(f"state_dict is missing expected key: {key}")
        self.used.add(key)
        return self.sd[key]

    def drop_if_present(self, key):
        if key in self.sd:
            self.used.add(key)

    def leftovers(self):
        return sorted(set(self.sd) - self.used)


def normalize_state_dict(sd):
    """torch tensors -> float32 numpy; strip torch.compile/DataParallel
    prefixes (inference_only.py:17-21 strips `_orig_mod.` the same way).
    Stripping loops until no prefix matches, so stacked wrappers
    (`module._orig_mod.*` from DataParallel-around-compile) unwrap too."""
    prefixes = ("_orig_mod.", "module.")
    out = {}
    for k, v in sd.items():
        while k.startswith(prefixes):
            for prefix in prefixes:
                if k.startswith(prefix):
                    k = k[len(prefix):]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _fill(node, key, arr):
    if key not in node:
        raise KeyError(f"flax tree has no leaf {key!r} at this node "
                       f"(has {sorted(node)})")
    want = node[key].shape if isinstance(node[key], _Unfilled) else np.shape(node[key])
    arr = np.asarray(arr, np.float32)
    if tuple(want) != arr.shape:
        raise ValueError(f"shape mismatch for {key!r}: flax {tuple(want)} "
                         f"vs checkpoint {arr.shape}")
    node[key] = arr


# --- per-layer inverses of parity_check.py's transplant helpers ------------

def _linear(c, node, pre):
    _fill(node, "kernel", c.take(f"{pre}.weight").T)
    if "bias" in node:
        _fill(node, "bias", c.take(f"{pre}.bias"))


def _conv1d(c, node, pre):
    # torch (out, in/groups, k) -> flax (k, in/groups, out)
    n = node["conv"]
    _fill(n, "kernel", np.transpose(c.take(f"{pre}.weight"), (2, 1, 0)))
    if "bias" in n:
        _fill(n, "bias", c.take(f"{pre}.bias"))


def _conv2d(c, node, pre):
    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    n = node["conv"]
    _fill(n, "kernel", np.transpose(c.take(f"{pre}.weight"), (2, 3, 1, 0)))
    if "bias" in n:
        _fill(n, "bias", c.take(f"{pre}.bias"))


def _bn(c, pnode, snode, pre):
    _fill(pnode["bn"], "scale", c.take(f"{pre}.weight"))
    _fill(pnode["bn"], "bias", c.take(f"{pre}.bias"))
    _fill(snode["bn"], "mean", c.take(f"{pre}.running_mean"))
    _fill(snode["bn"], "var", c.take(f"{pre}.running_var"))
    c.drop_if_present(f"{pre}.num_batches_tracked")


def _ln(c, node, pre):
    _fill(node["ln"], "scale", c.take(f"{pre}.weight"))
    _fill(node["ln"], "bias", c.take(f"{pre}.bias"))


def _mha(c, node, pre):
    _fill(node, "in_proj_weight", c.take(f"{pre}.in_proj_weight").T)
    _fill(node, "in_proj_bias", c.take(f"{pre}.in_proj_bias"))
    _fill(node, "out_proj_weight", c.take(f"{pre}.out_proj.weight").T)
    _fill(node, "out_proj_bias", c.take(f"{pre}.out_proj.bias"))


def _gaussian(c, node, pre):
    _fill(node, "embedding", c.take(f"{pre}.var_embedding"))
    _fill(node, "mu", c.take(f"{pre}.var_mu"))
    _fill(node, "sigma", c.take(f"{pre}.var_sigma"))
    c.drop_if_present(f"{pre}.var_position")   # arange constant, that.py:48


def _lstm(c, node, pre, name="fwd", suffix="l0"):
    _fill(node, f"w_ih_{name}", c.take(f"{pre}.weight_ih_{suffix}").T)
    _fill(node, f"w_hh_{name}", c.take(f"{pre}.weight_hh_{suffix}").T)
    _fill(node, f"b_ih_{name}", c.take(f"{pre}.bias_ih_{suffix}"))
    _fill(node, f"b_hh_{name}", c.take(f"{pre}.bias_hh_{suffix}"))


def _encoder_block(c, p, s, pre, n_convs):
    _ln(c, p["norm_0"], f"{pre}.layer_norm_0")
    _mha(c, p["attn"], f"{pre}.layer_attention")
    _ln(c, p["norm_1"], f"{pre}.layer_norm_1")
    for i in range(n_convs):
        _conv1d(c, p[f"cnn_{i}"], f"{pre}.layer_cnn.{i}.0")
        _bn(c, p[f"cnn_bn_{i}"], s[f"cnn_bn_{i}"], f"{pre}.layer_cnn.{i}.1")


def _shared_decoder(c, dp, pre, *, class_embed_layers=None, final_norm=False):
    """The weight-shared transformer decoder (detr.py:330-420 /
    that_encoder.py:350-470): one layer object at every ModuleList index."""
    _fill(dp, "query_embed", c.take(f"{pre}.query_embed"))
    lp = dp["shared_layer"]
    l0 = f"{pre}.decoder_layers.0"
    _mha(c, lp["self_attn"], f"{l0}.self_attn")
    _mha(c, lp["cross_attn"], f"{l0}.cross_attn")
    _ln(c, lp["norm1"], f"{l0}.norm1")
    _ln(c, lp["norm2"], f"{l0}.norm2")
    _ln(c, lp["norm3"], f"{l0}.norm3")
    _linear(c, lp["ffn_up"], f"{l0}.ffn.0")
    _linear(c, lp["ffn_down"], f"{l0}.ffn.3")
    if final_norm:
        _ln(c, dp["norm"], f"{pre}.norm")
    if class_embed_layers is None:
        _linear(c, dp["class_embed"], f"{pre}.class_embed")
    else:
        for i in range(class_embed_layers):
            _linear(c, dp[f"class_embed_{i}"], f"{pre}.class_embed.{i}")
    # consume the shared-layer aliases, verifying they ARE the layer-0 tensors
    alias = re.compile(re.escape(pre) + r"\.decoder_layers\.(\d+)\.(.+)")
    for key in list(c.sd):
        m = alias.match(key)
        if m and m.group(1) != "0":
            want = c.sd[f"{l0}.{m.group(2)}"]
            if not np.array_equal(np.asarray(c.sd[key]), np.asarray(want)):
                raise ValueError(
                    f"{key} differs from its layer-0 counterpart — this "
                    "checkpoint was not trained with the reference's "
                    "weight-shared decoder")
            c.used.add(key)


# --- per-model importers (walks mirror parity_check.py's transplants) ------

def _import_mlp(c, p, s):
    _bn(c, p["input_norm"], s["input_norm"], "layer_norm")
    for i in range(3):
        _linear(c, p[f"layer_{i}"], f"layer_{i}")


def _import_lstm(c, p, s):
    _bn(c, p["input_norm"], s["input_norm"], "layer_norm")
    _lstm(c, p["lstm"], "layer_lstm")
    _linear(c, p["head"], "layer_linear")


def _import_ablstm(c, p, s):
    _bn(c, p["input_norm"], s["input_norm"], "layer_norm")
    _lstm(c, p["bilstm"], "layer_bilstm", "fwd", "l0")
    _lstm(c, p["bilstm"], "layer_bilstm", "bwd", "l0_reverse")
    _linear(c, p["attn"], "layer_linear")
    _linear(c, p["head"], "layer_output")


def _import_cnn1d(c, p, s):
    _bn(c, p["input_norm"], s["input_norm"], "layer_norm")
    for i in range(3):
        _conv1d(c, p[f"conv_{i}"], f"layer_cnn_1d_{i}")
    _linear(c, p["head"], "layer_linear")


def _import_cnn2d(c, p, s):
    for i in range(4):
        _bn(c, p[f"norm_{i}"], s[f"norm_{i}"], f"layer_norm_{i}")
    for i in range(3):
        _conv2d(c, p[f"conv_{i}"], f"layer_cnn_2d_{i}")
    _linear(c, p["head"], "layer_linear")


def _import_clstm(c, p, s):
    _bn(c, p["input_norm"], s["input_norm"], "layer_norm")
    for i in range(3):
        _conv1d(c, p[f"conv_{i}"], f"layer_cnn_1d_{i}")
        _bn(c, p[f"norm_{i}"], s[f"norm_{i}"], f"layer_norm_{i}")
    _lstm(c, p["lstm"], "layer_lstm")
    _linear(c, p["head"], "layer_linear")


def _that_trunk(c, tp, ts, pre=""):
    _gaussian(c, tp["gaussian"], f"{pre}layer_left_gaussian")
    for i in range(4):
        _encoder_block(c, tp[f"left_encoder_{i}"], ts[f"left_encoder_{i}"],
                       f"{pre}layer_left_encoder.{i}", 3)
    _ln(c, tp["left_norm"], f"{pre}layer_left_norm")
    _conv1d(c, tp["left_cnn_0"], f"{pre}layer_left_cnn_0")
    _conv1d(c, tp["left_cnn_1"], f"{pre}layer_left_cnn_1")
    _encoder_block(c, tp["right_encoder_0"], ts["right_encoder_0"],
                   f"{pre}layer_right_encoder.0", 3)
    _ln(c, tp["right_norm"], f"{pre}layer_right_norm")
    _conv1d(c, tp["right_cnn_0"], f"{pre}layer_right_cnn_0")
    _conv1d(c, tp["right_cnn_1"], f"{pre}layer_right_cnn_1")


def _import_that(c, p, s):
    _that_trunk(c, p["trunk"], s["trunk"])
    _linear(c, p["head"], "layer_output")


def _import_that_multi_head(c, p, s):
    _that_trunk(c, p["trunk"], s["trunk"])
    for i in range(5):
        _linear(c, p[f"head_{i}"], f"layer_output.{i}")


def _import_that_count(c, p, s):
    _that_trunk(c, p["trunk"], s["trunk"])
    _linear(c, p["head"], "layer_output")


def _import_that_encoder(c, p, s):
    ep, es = p["encoder"], s["encoder"]
    _gaussian(c, ep["gaussian"], "encoder.layer_left_gaussian")
    for i in range(4):
        _encoder_block(c, ep[f"left_encoder_{i}"], es[f"left_encoder_{i}"],
                       f"encoder.layer_left_encoder.{i}", 3)
    _ln(c, ep["left_norm"], "encoder.layer_left_norm")
    _encoder_block(c, ep["right_encoder_0"], es["right_encoder_0"],
                   "encoder.layer_right_encoder.0", 3)
    _ln(c, ep["right_norm"], "encoder.layer_right_norm")
    # dead reference params: that_encoder.py:217-247 registers the THAT
    # trunk's cnn layers, but its forward never calls them (the only uses
    # are commented out, :282-285) — so our model has no counterpart and a
    # trained checkpoint carries their untouched init values. Drop them.
    for side in ("left", "right"):
        for i in (0, 1):
            for leaf in ("weight", "bias"):
                c.drop_if_present(f"encoder.layer_{side}_cnn_{i}.{leaf}")
    n_heads = len([k for k in p["decoder"] if k.startswith("class_embed_")])
    _shared_decoder(c, p["decoder"], "decoder",
                    class_embed_layers=n_heads, final_norm=True)


def _import_detr(c, p, s):
    fp, fs = p["feature_extractor"], s["feature_extractor"]
    _conv1d(c, fp["initial_conv"]["depthwise"],
            "feature_extractor.initial_conv.depthwise")
    _conv1d(c, fp["initial_conv"]["pointwise"],
            "feature_extractor.initial_conv.pointwise")
    for i in range(4):
        _conv1d(c, fp[f"dilated_{i}"]["conv"],
                f"feature_extractor.dilated_blocks.{i}.conv")
        _bn(c, fp[f"dilated_{i}"]["bn"], fs[f"dilated_{i}"]["bn"],
            f"feature_extractor.dilated_blocks.{i}.bn")
    _conv1d(c, fp["final_conv"], "feature_extractor.final_conv")

    ep, es = p["encoder"], s["encoder"]
    _gaussian(c, ep["gaussian"], "encoder.layer_embedding_gaussian")
    for i in range(4):
        _encoder_block(c, ep[f"encoder_{i}"], es[f"encoder_{i}"],
                       f"encoder.layer_embedding_encoder.{i}", 1)
    _ln(c, ep["norm"], "encoder.layer_embedding_norm")

    _shared_decoder(c, p["decoder"], "decoder")
    # dead reference param: detr.py:354 registers a decoder-level LayerNorm
    # that the forward never applies (its layers norm internally) — drop.
    c.drop_if_present("decoder.norm.weight")
    c.drop_if_present("decoder.norm.bias")


def _import_dual_band(c, p, s):
    for band, tower in (("band1", "cnn_band1"), ("band2", "cnn_band2")):
        _bn(c, p[band]["input_norm"], s[band]["input_norm"],
            f"{tower}.layer_norm")
        for i in range(3):
            _conv1d(c, p[band][f"conv_{i}"], f"{tower}.layer_cnn_1d_{i}")
        _linear(c, p[band]["head"], f"{tower}.layer_linear")
    _linear(c, p["combine"], "combine_linear")
    for i in range(3):
        _linear(c, p[f"res_{i}"], f"linear{i + 1}")
    _linear(c, p["head"], "final_linear")


def _import_ssl(c, p, s):
    _bn(c, p["backbone"]["input_norm"], s["backbone"]["input_norm"],
        "backbone.layer_norm")
    for i in range(3):
        _conv1d(c, p["backbone"][f"conv_{i}"], f"backbone.layer_cnn_1d_{i}")
    _linear(c, p["backbone"]["head"], "backbone.layer_linear")
    _linear(c, p["online_head"], "online_head")
    _linear(c, p["proj_1"], "projector.0")
    _bn(c, p["proj_bn_1"], s["proj_bn_1"], "projector.1")
    _linear(c, p["proj_2"], "projector.3")
    _bn(c, p["proj_bn_2"], s["proj_bn_2"], "projector.4")


IMPORTERS = {
    "MLP": _import_mlp,
    "LSTM": _import_lstm,
    "ABLSTM": _import_ablstm,
    "CNN-1D": _import_cnn1d,
    "CNN-2D": _import_cnn2d,
    "CLSTM": _import_clstm,
    "THAT": _import_that,
    "THAT_MULTI_HEAD": _import_that_multi_head,
    "THAT_COUNT": _import_that_count,
    "THAT_COUNT_CONSTRAINED": _import_that_count,
    "THAT_ENCODER": _import_that_encoder,
    "DETR": _import_detr,
    "dual_band": _import_dual_band,
    "SSL": _import_ssl,
}


def import_state_dict(model_key, state_dict, variables):
    """Fill `variables` (from model.init — the structure/shape donor) with a
    reference torch state_dict's weights. Strict both ways: raises on any
    unconsumed checkpoint key or unfilled flax leaf."""
    from flax.core import unfreeze
    if model_key not in IMPORTERS:
        raise KeyError(f"no torch importer for model {model_key!r} "
                       f"(have {sorted(IMPORTERS)})")
    blank = _blank_like(unfreeze(variables))
    c = _Ctx(normalize_state_dict(state_dict))
    IMPORTERS[model_key](c, blank["params"], blank.get("batch_stats", {}))
    left = c.leftovers()
    if left:
        raise ValueError(f"unconsumed checkpoint keys ({len(left)}): "
                         f"{left[:10]}{'...' if len(left) > 10 else ''}")
    _check_filled(blank)
    return blank


