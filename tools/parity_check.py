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


def transplant_detr(tm, variables):
    """Write a DETRMultiUser flax variable tree into the reference torch
    module's parameters/buffers (shared by forward- and train-parity)."""
    p = variables["params"]
    s = variables["batch_stats"]

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

    ref = load_ref_module("detr.py")
    tm = ref.DETR_MultiUser((T, F), [10], embedding_time_dim=10,
                            num_decoder_layers=3, temp_cross=2,
                            num_queries=5, dim_feedforward=512)
    tm.eval()
    transplant_detr(tm, variables)

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"DETR parity: max |flax - torch| = {err:.2e} "
          f"(out range {want.min():.2f}..{want.max():.2f})")
    assert err < atol, f"DETR outputs diverge: {err}"
    return err


def transplant_that(tm, variables):
    """Write a THAT flax variable tree into the reference torch module."""
    p, s = variables["params"], variables["batch_stats"]
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

    ref = load_ref_module("that.py")
    tm = ref.THAT((T, F), (54,))
    tm.eval()
    transplant_that(tm, variables)

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"THAT parity: max |flax - torch| = {err:.2e} "
          f"(out range {want.min():.2f}..{want.max():.2f})")
    assert err < atol, f"THAT outputs diverge: {err}"
    return err



def _lstm(dst, params, name="fwd", suffix="l0"):
    dst_w_ih = getattr(dst, f"weight_ih_{suffix}")
    dst_w_hh = getattr(dst, f"weight_hh_{suffix}")
    dst_b_ih = getattr(dst, f"bias_ih_{suffix}")
    dst_b_hh = getattr(dst, f"bias_hh_{suffix}")
    dst_w_ih.data = _t(params[f"w_ih_{name}"]).T
    dst_w_hh.data = _t(params[f"w_hh_{name}"]).T
    dst_b_ih.data = _t(params[f"b_ih_{name}"])
    dst_b_hh.data = _t(params[f"b_hh_{name}"])


def _bn_direct(dst, p, s):
    """BatchNorm whose flax module sits directly at this param node."""
    _bn(dst, p, s)


def transplant_mlp(tm, v):
    """Write an MLP flax variable tree into the reference torch module."""
    _bn(tm.layer_norm, v["params"]["input_norm"], v["batch_stats"]["input_norm"])
    _linear(tm.layer_0, v["params"]["layer_0"])
    _linear(tm.layer_1, v["params"]["layer_1"])
    _linear(tm.layer_2, v["params"]["layer_2"])


def check_mlp(atol=1e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.mlp import MLP
    F = 1024
    x = np.random.default_rng(2).normal(size=(4, F)).astype(np.float32)
    model = MLP(out_features=54)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    ref = load_ref_module("mlp.py")
    tm = ref.MLP((F,), (54,)); tm.eval()
    transplant_mlp(tm, v)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"MLP parity: {err:.2e}")
    assert err < atol
    return err


def transplant_cnn1d(tm, v):
    _bn(tm.layer_norm, v["params"]["input_norm"], v["batch_stats"]["input_norm"])
    for i in range(3):
        _conv1d(getattr(tm, f"layer_cnn_1d_{i}"), {"conv": v["params"][f"conv_{i}"]["conv"]})
    _linear(tm.layer_linear, v["params"]["head"])


def check_cnn1d(atol=1e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.cnn_1d import CNN1D
    T, F = 600, 270
    x = np.random.default_rng(3).normal(size=(2, T, F)).astype(np.float32)
    model = CNN1D(out_features=54)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    ref = load_ref_module("cnn_1d.py")
    tm = ref.CNN_1D((T, F), (54,)); tm.eval()
    transplant_cnn1d(tm, v)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"CNN-1D parity: {err:.2e}")
    assert err < atol
    return err


def transplant_cnn2d(tm, v):
    for i in range(4):
        _bn(getattr(tm, f"layer_norm_{i}"), v["params"][f"norm_{i}"], v["batch_stats"][f"norm_{i}"])
    for i in range(3):
        # flax conv2d kernel (kh, kw, in, out) -> torch (out, in, kh, kw)
        kern = np.asarray(v["params"][f"conv_{i}"]["conv"]["kernel"])
        conv = getattr(tm, f"layer_cnn_2d_{i}")
        conv.weight.data = _t(np.transpose(kern, (3, 2, 0, 1)))
        conv.bias.data = _t(v["params"][f"conv_{i}"]["conv"]["bias"])
    _linear(tm.layer_linear, v["params"]["head"])


def check_cnn2d(atol=1e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.cnn_2d import CNN2D
    T, F = 300, 270
    x = np.random.default_rng(4).normal(size=(2, T, F)).astype(np.float32)
    model = CNN2D(out_features=54)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    ref = load_ref_module("cnn_2d.py")
    tm = ref.CNN_2D((T, F), (54,)); tm.eval()
    transplant_cnn2d(tm, v)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"CNN-2D parity: {err:.2e}")
    assert err < atol
    return err


def transplant_lstm(tm, v):
    _bn(tm.layer_norm, v["params"]["input_norm"], v["batch_stats"]["input_norm"])
    _lstm(tm.layer_lstm, v["params"]["lstm"])
    _linear(tm.layer_linear, v["params"]["head"])


def check_lstm(atol=1e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.lstm import LSTMModel
    T, F = 200, 90
    x = np.random.default_rng(5).normal(size=(2, T, F)).astype(np.float32)
    model = LSTMModel(out_features=54)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    ref = load_ref_module("lstm.py")
    tm = ref.LSTMM((T, F), (54,)); tm.eval()
    transplant_lstm(tm, v)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"LSTM parity: {err:.2e}")
    assert err < atol
    return err


def transplant_ablstm(tm, v):
    _bn(tm.layer_norm, v["params"]["input_norm"], v["batch_stats"]["input_norm"])
    _lstm(tm.layer_bilstm, v["params"]["bilstm"], "fwd", "l0")
    _lstm(tm.layer_bilstm, v["params"]["bilstm"], "bwd", "l0_reverse")
    _linear(tm.layer_linear, v["params"]["attn"])
    _linear(tm.layer_output, v["params"]["head"])


def check_ablstm(atol=1e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.ablstm import ABLSTM
    T, F = 320, 90
    x = np.random.default_rng(6).normal(size=(2, T, F)).astype(np.float32)
    model = ABLSTM(out_features=54)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    ref = load_ref_module("ablstm.py")
    tm = ref.ABLSTM((T, F), (54,)); tm.eval()
    transplant_ablstm(tm, v)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"ABLSTM parity: {err:.2e}")
    assert err < atol
    return err


def transplant_clstm(tm, v):
    _bn(tm.layer_norm, v["params"]["input_norm"], v["batch_stats"]["input_norm"])
    for i in range(3):
        _conv1d(getattr(tm, f"layer_cnn_1d_{i}"), {"conv": v["params"][f"conv_{i}"]["conv"]})
        _bn(getattr(tm, f"layer_norm_{i}"), v["params"][f"norm_{i}"], v["batch_stats"][f"norm_{i}"])
    _lstm(tm.layer_lstm, v["params"]["lstm"])
    _linear(tm.layer_linear, v["params"]["head"])


def check_clstm(atol=1e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.clstm import CLSTM
    T, F = 1800, 90
    x = np.random.default_rng(7).normal(size=(2, T, F)).astype(np.float32)
    model = CLSTM(out_features=54)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    ref = load_ref_module("cnn_lstm.py")
    tm = ref.CNN_LSTM((T, F), (54,)); tm.eval()
    transplant_clstm(tm, v)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"CLSTM parity: {err:.2e}")
    assert err < atol
    return err


ALL_CHECKS = {
    "detr": check_detr, "that": check_that, "mlp": check_mlp,
    "cnn1d": check_cnn1d, "cnn2d": check_cnn2d, "lstm": check_lstm,
    "ablstm": check_ablstm, "clstm": check_clstm,
}


if __name__ == "__main__":
    # transplant parity is a NUMERICS check: force the CPU backend so TPU
    # matmul precision (and the axon plugin's self-selection) can't skew it
    import jax
    jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1:] or list(ALL_CHECKS)
    for name in which:
        ALL_CHECKS[name]()
    print("PARITY OK")


def transplant_that_encoder(tm, v, num_decoder_layers=3):
    p, s = v["params"], v["batch_stats"]
    ep, es = p["encoder"], s["encoder"]
    _gaussian(tm.encoder.layer_left_gaussian, ep["gaussian"])
    for i in range(4):
        _encoder_block(tm.encoder.layer_left_encoder[i],
                       ep[f"left_encoder_{i}"], es[f"left_encoder_{i}"], 3)
    _ln(tm.encoder.layer_left_norm, ep["left_norm"])
    for i in range(1):
        _encoder_block(tm.encoder.layer_right_encoder[i],
                       ep[f"right_encoder_{i}"], es[f"right_encoder_{i}"], 3)
    _ln(tm.encoder.layer_right_norm, ep["right_norm"])

    dp = p["decoder"]
    tm.decoder.query_embed.data = _t(dp["query_embed"])
    layer = tm.decoder.decoder_layers[0]
    lp = dp["shared_layer"]
    _mha(layer.self_attn, lp["self_attn"])
    _mha(layer.cross_attn, lp["cross_attn"])
    _ln(layer.norm1, lp["norm1"])
    _ln(layer.norm2, lp["norm2"])
    _ln(layer.norm3, lp["norm3"])
    _linear(layer.ffn[0], lp["ffn_up"])
    _linear(layer.ffn[3], lp["ffn_down"])
    _ln(tm.decoder.norm, dp["norm"])
    for i in range(num_decoder_layers + 1):
        _linear(tm.decoder.class_embed[i], dp[f"class_embed_{i}"])


def check_that_encoder(atol=2e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.that_encoder import THATEncoderDETR
    T, F = 400, 270
    x = np.random.default_rng(8).normal(size=(2, T, F)).astype(np.float32)
    model = THATEncoderDETR(temp_cross=1.0, num_queries=5, num_decoder_layers=3)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    p, s = v["params"], v["batch_stats"]

    ref = load_ref_module("that_encoder.py")
    tm = ref.DETR_MultiUser((T, F), (54,), temp_cross=1, num_queries=5)
    # the reference hardcodes 6 decoder layers; rebuild with 3 for the test
    tm.decoder = ref.TransformerDecoder(d_model=270, nhead=6,
                                        num_decoder_layers=3, num_queries=5,
                                        dim_feedforward=2048,
                                        temp_cross_attention=1)
    tm.eval()

    transplant_that_encoder(tm, v)

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"THAT_ENCODER parity: {err:.2e} (out range {want.min():.2f}..{want.max():.2f})")
    assert err < atol, f"THAT_ENCODER diverges: {err}"
    return err


ALL_CHECKS["that_encoder"] = check_that_encoder


def _that_trunk(tm, tp, ts):
    """Map a THATTrunk param tree onto a reference THAT-family torch module."""
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


def transplant_that_multi_head(tm, v):
    _that_trunk(tm, v["params"]["trunk"], v["batch_stats"]["trunk"])
    for i in range(5):
        _linear(tm.layer_output[i], v["params"][f"head_{i}"])


def check_that_multi_head(atol=2e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.that import THATMultiHead
    T, F = 400, 270
    x = np.random.default_rng(9).normal(size=(2, T, F)).astype(np.float32)
    model = THATMultiHead(out_features=10)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    ref = load_ref_module("that_multi_head.py")
    tm = ref.THAT((T, F), (10,)); tm.eval()
    transplant_that_multi_head(tm, v)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"THAT_MULTI_HEAD parity: {err:.2e}")
    assert err < atol
    return err


def transplant_that_count(tm, v):
    """THAT trunk + single output head (shared by THAT_COUNT and the
    softmax-constrained variant)."""
    _that_trunk(tm, v["params"]["trunk"], v["batch_stats"]["trunk"])
    _linear(tm.layer_output, v["params"]["head"])


def check_that_count_constrained(atol=2e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.that import THATCountConstrained
    T, F = 400, 270
    x = np.random.default_rng(10).normal(size=(2, T, F)).astype(np.float32)
    model = THATCountConstrained()
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    ref = load_ref_module("that_count_pred_withSoftMaxConstraint.py")
    tm = ref.THAT_COUNT_PRED_with_Constraint((T, F), (10,)); tm.eval()
    transplant_that_count(tm, v)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"THAT_COUNT_CONSTRAINED parity: {err:.2e}")
    assert err < atol
    return err


def transplant_dual_band(tm, v):
    def map_tower(dst, p, s):
        _bn(dst.layer_norm, p["input_norm"], s["input_norm"])
        for i in range(3):
            _conv1d(getattr(dst, f"layer_cnn_1d_{i}"), {"conv": p[f"conv_{i}"]["conv"]})
        _linear(dst.layer_linear, p["head"])

    map_tower(tm.cnn_band1, v["params"]["band1"], v["batch_stats"]["band1"])
    map_tower(tm.cnn_band2, v["params"]["band2"], v["batch_stats"]["band2"])
    _linear(tm.combine_linear, v["params"]["combine"])
    for i in range(3):
        _linear(getattr(tm, f"linear{i+1}"), v["params"][f"res_{i}"])
    _linear(tm.final_linear, v["params"]["head"])


def check_dual_band(atol=1e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.dual_band import DualBandCNN
    T, F = 600, 90
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 2, T, F)).astype(np.float32)
    model = DualBandCNN(out_features=54)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    ref = load_ref_module("dual_band.py")
    tm = ref.DualBandCNN((T, F), (T, F), (54,)); tm.eval()
    transplant_dual_band(tm, v)
    with torch.no_grad():
        want = tm(torch.from_numpy(x[:, 0]), torch.from_numpy(x[:, 1])).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"DualBand parity: {err:.2e}")
    assert err < atol
    return err


def transplant_ssl(tm, v):
    """Full SS_Model mapping: backbone + online head + the SimCLR projector
    (Linear-noBias + BN + ReLU + Linear-noBias + BN, SSL_model.py:40-52)."""
    p, s = v["params"], v["batch_stats"]
    _bn(tm.backbone.layer_norm, p["backbone"]["input_norm"],
        s["backbone"]["input_norm"])
    for i in range(3):
        _conv1d(getattr(tm.backbone, f"layer_cnn_1d_{i}"),
                {"conv": p["backbone"][f"conv_{i}"]["conv"]})
    _linear(tm.backbone.layer_linear, p["backbone"]["head"])
    _linear(tm.online_head, p["online_head"])
    tm.projector[0].weight.data = _t(np.asarray(p["proj_1"]["kernel"]).T)
    _bn(tm.projector[1], p["proj_bn_1"], s["proj_bn_1"])
    tm.projector[3].weight.data = _t(np.asarray(p["proj_2"]["kernel"]).T)
    _bn(tm.projector[4], p["proj_bn_2"], s["proj_bn_2"])


def check_ssl(atol=1e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.ssl import SSLModel
    T, F = 600, 90
    x = np.random.default_rng(12).normal(size=(2, T, F)).astype(np.float32)
    model = SSLModel(out_features=54)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                   jnp.asarray(x), train=False)
    ref = load_ref_module("SSL_model.py")
    tm = ref.SS_Model((T, F), (54,)); tm.eval()
    transplant_ssl(tm, v)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), inference=True).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), inference=True))
    err = float(np.abs(got - want).max())
    print(f"SSL (inference head) parity: {err:.2e}")
    assert err < atol
    return err


ALL_CHECKS.update(that_multi_head=check_that_multi_head,
                  that_count_constrained=check_that_count_constrained,
                  dual_band=check_dual_band, ssl=check_ssl)


def check_that_count(atol=2e-4):
    import jax, jax.numpy as jnp, torch
    from multi_modal_csi_tpu.models.csi.that import THATCount
    T, F = 400, 270
    x = np.random.default_rng(13).normal(size=(2, T, F)).astype(np.float32)
    model = THATCount(out_features=9)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    ref = load_ref_module("that_count_pred.py")
    tm = ref.THAT_COUNT_PRED((T, F), (9,)); tm.eval()
    transplant_that_count(tm, v)
    import torch as _torch
    with _torch.no_grad():
        want = tm(_torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    err = float(np.abs(got - want).max())
    print(f"THAT_COUNT parity: {err:.2e}")
    assert err < atol
    return err


ALL_CHECKS["that_count"] = check_that_count
