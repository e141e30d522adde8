"""Architecture-parity check: our flax models vs the reference torch models.

Loads the reference model classes in-place from /root/reference (deps
stubbed), TRANSPLANTS our flax parameters into the torch module, and compares
forward outputs on the same input. Passing means the architectures are
mathematically identical — the strongest parity evidence available without
the WiMANS dataset.

Usage: python tools/parity_check.py [detr|that]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from tools.measure_baseline import load_ref_module  # noqa: E402


def _t(x):
    import torch
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _linear(dst, params):
    dst.weight.data = _t(params["kernel"]).T
    if "bias" in params and dst.bias is not None:
        dst.bias.data = _t(params["bias"])


def _conv1d(dst, params):
    # flax (k, in/groups, out) -> torch (out, in/groups, k)
    kernel = np.asarray(params["conv"]["kernel"])
    dst.weight.data = _t(np.transpose(kernel, (2, 1, 0)))
    if "bias" in params["conv"] and dst.bias is not None:
        dst.bias.data = _t(params["conv"]["bias"])


def _bn(dst, params, stats):
    dst.weight.data = _t(params["bn"]["scale"])
    dst.bias.data = _t(params["bn"]["bias"])
    dst.running_mean.data = _t(stats["bn"]["mean"])
    dst.running_var.data = _t(stats["bn"]["var"])


def _ln(dst, params):
    dst.weight.data = _t(params["ln"]["scale"])
    dst.bias.data = _t(params["ln"]["bias"])


def _mha(dst, params):
    dst.in_proj_weight.data = _t(params["in_proj_weight"]).T
    dst.in_proj_bias.data = _t(params["in_proj_bias"])
    dst.out_proj.weight.data = _t(params["out_proj_weight"]).T
    dst.out_proj.bias.data = _t(params["out_proj_bias"])


def _gaussian(dst, params):
    dst.var_embedding.data = _t(params["embedding"])
    dst.var_mu.data = _t(params["mu"])
    dst.var_sigma.data = _t(params["sigma"])


def _encoder_block(dst, params, stats, n_convs):
    _ln(dst.layer_norm_0, params["norm_0"])
    _mha(dst.layer_attention, params["attn"])
    _ln(dst.layer_norm_1, params["norm_1"])
    for i in range(n_convs):
        seq = dst.layer_cnn[i]
        _conv1d(seq[0].__self__ if hasattr(seq[0], "__self__") else seq[0],
                {"conv": params[f"cnn_{i}"]["conv"]})
        _bn(seq[1], params[f"cnn_bn_{i}"], stats[f"cnn_bn_{i}"])


def check_detr(atol=2e-4) -> float:
    import jax
    import jax.numpy as jnp
    import torch
    from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser

    # T must be 3000: the reference hardcodes the post-pool length 1000 in
    # its final-conv kernel computation (detr.py:274)
    T, F = 3000, 270
    model = DETRMultiUser(token_length=10, num_decoder_layers=3,
                          temp_cross=2.0, num_queries=5, dim_feedforward=512)
    x = np.random.default_rng(0).normal(size=(2, T, F)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    p = variables["params"]
    s = variables["batch_stats"]

    ref = load_ref_module("detr.py")
    tm = ref.DETR_MultiUser((T, F), [10], embedding_time_dim=10,
                            num_decoder_layers=3, temp_cross=2,
                            num_queries=5, dim_feedforward=512)
    tm.eval()

    # feature extractor
    fe_p, fe_s = p["feature_extractor"], s["feature_extractor"]
    _conv1d(tm.feature_extractor.initial_conv.depthwise,
            {"conv": fe_p["initial_conv"]["depthwise"]["conv"]})
    _conv1d(tm.feature_extractor.initial_conv.pointwise,
            {"conv": fe_p["initial_conv"]["pointwise"]["conv"]})
    for i in range(4):
        blk = tm.feature_extractor.dilated_blocks[i]
        _conv1d(blk.conv, {"conv": fe_p[f"dilated_{i}"]["conv"]["conv"]})
        _bn(blk.bn, fe_p[f"dilated_{i}"]["bn"], fe_s[f"dilated_{i}"]["bn"])
    _conv1d(tm.feature_extractor.final_conv,
            {"conv": fe_p["final_conv"]["conv"]})

    # encoder
    enc_p, enc_s = p["encoder"], s["encoder"]
    _gaussian(tm.encoder.layer_embedding_gaussian, enc_p["gaussian"])
    for i in range(4):
        _encoder_block(tm.encoder.layer_embedding_encoder[i],
                       enc_p[f"encoder_{i}"], enc_s[f"encoder_{i}"], 1)
    _ln(tm.encoder.layer_embedding_norm, enc_p["norm"])

    # decoder (weight-shared layer)
    dec_p = p["decoder"]
    tm.decoder.query_embed.data = _t(dec_p["query_embed"])
    layer = tm.decoder.decoder_layers[0]     # all entries are the same object
    lp = dec_p["shared_layer"]
    _mha(layer.self_attn, lp["self_attn"])
    _mha(layer.cross_attn, lp["cross_attn"])
    _ln(layer.norm1, lp["norm1"])
    _ln(layer.norm2, lp["norm2"])
    _ln(layer.norm3, lp["norm3"])
    _linear(layer.ffn[0], lp["ffn_up"])
    _linear(layer.ffn[3], lp["ffn_down"])
    _linear(tm.decoder.class_embed, dec_p["class_embed"])

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"DETR parity: max |flax - torch| = {err:.2e} "
          f"(out range {want.min():.2f}..{want.max():.2f})")
    assert err < atol, f"DETR outputs diverge: {err}"
    return err


def check_that(atol=2e-4) -> float:
    import jax
    import jax.numpy as jnp
    import torch
    from multi_modal_csi_tpu.models.csi.that import THAT

    T, F = 400, 270   # T/20 = 20 tokens (left conv k16 needs >= 16)
    model = THAT(out_features=54)
    x = np.random.default_rng(1).normal(size=(2, T, F)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    p, s = variables["params"], variables["batch_stats"]

    ref = load_ref_module("that.py")
    tm = ref.THAT((T, F), (54,))
    tm.eval()
    tp, ts = p["trunk"], s["trunk"]
    _gaussian(tm.layer_left_gaussian, tp["gaussian"])
    for i in range(4):
        _encoder_block(tm.layer_left_encoder[i], tp[f"left_encoder_{i}"],
                       ts[f"left_encoder_{i}"], 3)
    _ln(tm.layer_left_norm, tp["left_norm"])
    _conv1d(tm.layer_left_cnn_0, {"conv": tp["left_cnn_0"]["conv"]})
    _conv1d(tm.layer_left_cnn_1, {"conv": tp["left_cnn_1"]["conv"]})
    for i in range(1):
        _encoder_block(tm.layer_right_encoder[i], tp[f"right_encoder_{i}"],
                       ts[f"right_encoder_{i}"], 3)
    _ln(tm.layer_right_norm, tp["right_norm"])
    _conv1d(tm.layer_right_cnn_0, {"conv": tp["right_cnn_0"]["conv"]})
    _conv1d(tm.layer_right_cnn_1, {"conv": tp["right_cnn_1"]["conv"]})
    _linear(tm.layer_output, p["head"])

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"THAT parity: max |flax - torch| = {err:.2e} "
          f"(out range {want.min():.2f}..{want.max():.2f})")
    assert err < atol, f"THAT outputs diverge: {err}"
    return err


if __name__ == "__main__":
    which = sys.argv[1:] or ["detr", "that"]
    if "detr" in which:
        check_detr()
    if "that" in which:
        check_that()
    print("PARITY OK")
