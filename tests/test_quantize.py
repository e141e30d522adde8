"""int8 post-training quantization (core/quantize.py).

The reference has no quantization — this is a TPU-native serving extension
(see BASELINE.md int8 section for the measured MXU/bandwidth motivation).
Covered here: the array-level quantizer, the _ConvCore swap-in's exactness
against flax nn.Conv (the float path must be bit-identical — every model
parity test in this suite flows through it), discovery-based hooking (only
layers that announce themselves can be quantized; unknown kernels can never
be silently corrupted), and end-to-end closeness on real CSI models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from multi_modal_csi_tpu.core import quantize as qz
from multi_modal_csi_tpu.models import csi as M
from multi_modal_csi_tpu.nn.init import torch_bias, xavier_uniform
from multi_modal_csi_tpu.nn.layers import Conv1d, Conv2d, Linear


def _paths(tree):
    return {
        "/".join(qz._dict_path(kp)): leaf
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_quantize_array_roundtrip_error_bound():
    w = np.array(jax.random.normal(jax.random.PRNGKey(0), (64, 32)))
    w[:, 3] *= 100.0   # per-channel scales must absorb a hot column
    q, scale = qz.quantize_array(jnp.asarray(w))
    assert q.dtype == jnp.int8 and scale.shape == (32,)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    # symmetric rounding: per-element error <= scale/2 of that channel
    assert np.all(np.abs(deq - w) <= np.asarray(scale) / 2 + 1e-7)
    # int8 full range is actually used
    assert np.max(np.abs(np.asarray(q))) == 127


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_conv_core_bit_exact_vs_nn_conv(dtype):
    """The nn.Conv -> _ConvCore swap must not move ANY float bit: same param
    tree (same init RNG paths), same forward, 1D and 2D, f32 and bf16."""
    x1 = jax.random.normal(jax.random.PRNGKey(1), (4, 50, 16))
    x2 = jax.random.normal(jax.random.PRNGKey(2), (2, 30, 20, 3))

    class Ref1(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (5,), strides=(2,), padding=[(2, 2)],
                           kernel_dilation=(3,), kernel_init=xavier_uniform(),
                           bias_init=torch_bias(16 * 5), dtype=dtype,
                           name="conv")(x)

    class Ref2(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (7, 7), strides=(3, 3), padding="VALID",
                           kernel_init=xavier_uniform(),
                           bias_init=torch_bias(3 * 49), dtype=dtype,
                           name="conv")(x)

    for ref, ours, x in [
        (Ref1(), Conv1d(8, 5, stride=2, padding=2, dilation=3, dtype=dtype), x1),
        (Ref2(), Conv2d(8, (7, 7), stride=(3, 3), dtype=dtype), x2),
    ]:
        p_ref, p_our = ref.init(jax.random.PRNGKey(0), x), None
        p_our = ours.init(jax.random.PRNGKey(0), x)
        ra, rb = _paths(p_ref), _paths(p_our)
        assert ra.keys() == rb.keys()
        for k in ra:
            assert np.array_equal(np.asarray(ra[k]), np.asarray(rb[k])), k
        ya = np.asarray(ref.apply(p_ref, x))
        yb = np.asarray(ours.apply(p_our, x))
        assert np.array_equal(ya, yb)


def test_w8_linear_matches_manual_dequant():
    """w8 semantics pinned: y == (x_bf16 @ q_bf16) * scale + bias exactly
    (same ops, same order)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 96))
    lin = Linear(64)
    v = lin.init(jax.random.PRNGKey(0), x)
    qv = qz.quantize_for_serving(lin, v, [x], mode="w8", min_size=1)
    p = _paths(qv["params"])
    assert p["kernel"].dtype == jnp.int8
    y = lin.apply(qv, x)
    manual = (jnp.dot(x.astype(jnp.bfloat16),
                      p["kernel"].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
              * p["kernel_scale"] + p["bias"]).astype(x.dtype)
    assert np.array_equal(np.asarray(y), np.asarray(manual))


def test_discovery_excludes_unhooked_and_small_kernels():
    """Three kernels: a hooked big Linear (quantized), a raw nn.Dense of the
    same shape (NOT hooked -> must stay float even though its leaf is named
    'kernel'), and a small head (hooked but below min_size -> stays float)."""
    class Mixed(nn.Module):
        @nn.compact
        def __call__(self, x):
            a = Linear(64, name="hooked")(x)
            b = nn.Dense(64, name="raw")(x)
            return Linear(4, name="head")(a + b)

    x = jax.random.normal(jax.random.PRNGKey(4), (4, 128))
    m = Mixed()
    v = m.init(jax.random.PRNGKey(0), x)
    qv = qz.quantize_for_serving(m, v, [x], mode="w8", min_size=4096)
    p = _paths(qv["params"])
    assert p["hooked/kernel"].dtype == jnp.int8
    assert "hooked/kernel_scale" in p
    assert p["raw/kernel"].dtype == jnp.float32
    assert "raw/kernel_scale" not in p
    assert p["head/kernel"].dtype == jnp.float32
    # quantized tree still applies (raw + head take the float path)
    np.asarray(m.apply(qv, x))


def test_normal_apply_does_not_sow():
    """The calibration sow must be dead on ordinary mutable traces
    (mutable=['batch_stats'] like every train step) and at init."""
    x = jnp.ones((2, 40, 8))
    m = Conv1d(16, 3)
    v = m.init(jax.random.PRNGKey(0), x)
    assert qz.STATS_COL not in v
    _, mut = m.apply(v, x, mutable=["batch_stats"])
    assert qz.STATS_COL not in mut


@pytest.mark.parametrize("mode", ["w8", "w8a8"])
def test_mlp_quantized_close(mode):
    """End-to-end on the real MLP (BatchNorm -> 256 -> 128 -> head): the
    quantized logits stay within a few percent of f32 — loose by design,
    int8 is an approximation; accuracy-parity claims come from the f32 path."""
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 1200))
    m = M.MLP(out_features=54)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)
    y32 = np.asarray(m.apply(v, x, train=False))
    qv = qz.quantize_for_serving(m, v, [x], mode=mode, min_size=4096,
                                 train=False)
    p = _paths(qv["params"])
    n_int8 = sum(1 for k, l in p.items()
                 if k.endswith("kernel") and l.dtype == jnp.int8)
    assert n_int8 >= 2   # the two hidden layers; the 54-wide head is small
    yq = np.asarray(jax.jit(
        lambda vv, xx: m.apply(vv, xx, train=False))(qv, x))
    rel = np.max(np.abs(yq - y32)) / (np.std(y32) + 1e-9)
    assert rel < 0.25, rel


def test_detr_quantized_forward_close():
    """DETR (the flagship): conv stem + FFN kernels go int8; aux-layer logits
    stay close to f32 at every decoder layer."""
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 600, 270))
    m = M.DETRMultiUser(num_decoder_layers=2)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)
    y32 = np.asarray(m.apply(v, x, train=False))
    qv = qz.quantize_for_serving(m, v, [x], mode="w8", train=False)
    p = _paths(qv["params"])
    int8_keys = [k for k, l in p.items() if l.dtype == jnp.int8]
    assert any("conv" in k for k in int8_keys), int8_keys
    yq = np.asarray(m.apply(qv, x, train=False))
    assert yq.shape == y32.shape
    rel = np.max(np.abs(yq - y32)) / (np.std(y32) + 1e-9)
    assert rel < 0.35, rel


def test_w8a8_requires_consistent_tree():
    """input_scale present iff mode == w8a8 (the leaf's presence selects the
    int8-activation path inside the layers)."""
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 96))
    lin = Linear(64)
    v = lin.init(jax.random.PRNGKey(0), x)
    q8 = qz.quantize_for_serving(lin, v, [x], mode="w8", min_size=1)
    qa = qz.quantize_for_serving(lin, v, [x], mode="w8a8", min_size=1)
    assert "input_scale" not in _paths(q8["params"])
    assert "input_scale" in _paths(qa["params"])
    # calibration over several batches takes the max amax
    big = x * 10.0
    qa2 = qz.quantize_for_serving(lin, v, [x, big], mode="w8a8", min_size=1)
    s1 = float(_paths(qa["params"])["input_scale"])
    s2 = float(_paths(qa2["params"])["input_scale"])
    assert s2 == pytest.approx(s1 * 10.0, rel=1e-5)


def test_resnet3d_quantized_close():
    """Video conv backbones hook through the shared Conv3D wrapper
    (models/video/resnet3d.py): ResNet3D-18 w8 stays close to f32."""
    from multi_modal_csi_tpu.models.video.resnet3d import ResNet3D18
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 32, 32, 3))
    m = ResNet3D18(out_features=9)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y32 = np.asarray(m.apply(v, x, train=False))
    qv = qz.quantize_for_serving(m, v, [x], mode="w8", train=False)
    p = _paths(qv["params"])
    int8_convs = [k for k, l in p.items()
                  if l.dtype == jnp.int8 and "conv" in k]
    assert len(int8_convs) >= 10, int8_convs   # the 3x3x3 block convs
    yq = np.asarray(m.apply(qv, x, train=False))
    rel = np.max(np.abs(yq - y32)) / (np.std(y32) + 1e-9)
    assert rel < 0.35, rel


def test_resolve_quant_defaults():
    """Per-model int8 defaults follow the measured table (BASELINE.md):
    'auto' must never quantize a model that measured flat or unmeasured."""
    from multi_modal_csi_tpu.core.config import resolve_quant
    assert resolve_quant("auto", "DETR") == "w8a8"
    assert resolve_quant("auto", "MLP") == "w8"
    assert resolve_quant("auto", "CNN-2D") is None     # measured flat
    assert resolve_quant("auto", "THAT") is None       # noise-level gains
    assert resolve_quant("auto", "ResNet") == "w8a8"   # measured +52.5%
    assert resolve_quant("auto", "Swin-T") is None     # measured flat
    assert resolve_quant("none", "DETR") is None
    assert resolve_quant("w8", "CNN-2D") == "w8"       # explicit wins


def test_mlp_fold_input_norm_exact():
    """Serving BN fold (models/csi/mlp.py::fold_input_norm): folded model
    == live-BN model to f32 dot-summation tolerance, composes with w8, and
    the folded tree has no input_norm leaves. (+63% measured on chip —
    BASELINE.md int8 section.)"""
    from multi_modal_csi_tpu.models.csi.mlp import MLP, fold_input_norm
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 600))
    m = M.MLP(out_features=9)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # non-trivial running stats (fresh init would make the fold a no-op)
    v = jax.device_get(v)
    bn = v["batch_stats"]["input_norm"]["bn"]
    bn["mean"] = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (600,))) * 0.2
    bn["var"] = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (600,))) * 0.5 + 0.75
    ref = np.asarray(m.apply(v, x, train=False))
    vf = fold_input_norm(v)
    assert "input_norm" not in vf["params"]
    assert "batch_stats" not in vf
    mf = MLP(out_features=9, fold_input_norm=True)
    got = np.asarray(mf.apply(vf, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    # composes with weight-only int8
    qv = qz.quantize_for_serving(mf, vf, [x], mode="w8", min_size=4096,
                                 train=False)
    yq = np.asarray(mf.apply(qv, x, train=False))
    rel = np.max(np.abs(yq - ref)) / (np.std(ref) + 1e-9)
    assert rel < 0.25, rel


def test_mha_weight_only_quantization():
    """MultiheadAttention packed projections are weight-only hooked: int8
    + per-output-column scales, NEVER an input_scale (cross-attention has
    two inputs), and logits stay close to float, under both w8 and w8a8."""
    from multi_modal_csi_tpu.nn.layers import MultiheadAttention

    class SelfAttn(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return MultiheadAttention(embed_dim=128, num_heads=4)(
                x, x, x, deterministic=True)

    x = jax.random.normal(jax.random.PRNGKey(10), (2, 16, 128))
    m = SelfAttn()
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))
    for mode in ("w8", "w8a8"):
        qv = qz.quantize_for_serving(m, v, [x], mode=mode, min_size=4096,
                                     train=False)
        p = _paths(qv["params"])
        mha = [k for k in p if "in_proj_weight" in k and "scale" not in k]
        assert p[mha[0]].dtype == jnp.int8, (mode, mha)
        assert any(k.endswith("in_proj_weight_scale") for k in p)
        assert any(k.endswith("out_proj_weight_scale") for k in p)
        assert not any(k.endswith("input_scale") for k in p), mode
        got = np.asarray(m.apply(qv, x))
        rel = np.max(np.abs(got - ref)) / (np.std(ref) + 1e-9)
        assert rel < 0.3, (mode, rel)


def test_that_encoder_quantized_with_attention():
    """THAT_ENCODER end-to-end with conv + FFN + attention projections all
    int8: runs and stays close."""
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 600, 270))
    m = M.THATEncoderDETR(temp_cross=2.0, num_queries=5,
                          num_decoder_layers=2)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)
    y32 = np.asarray(m.apply(v, x, train=False))
    qv = qz.quantize_for_serving(m, v, [x], mode="w8a8", train=False)
    p = _paths(qv["params"])
    assert any(k.endswith("in_proj_weight") and p[k].dtype == jnp.int8
               for k in p), [k for k in p if "in_proj" in k]
    yq = np.asarray(m.apply(qv, x, train=False))
    rel = np.max(np.abs(yq - y32)) / (np.std(y32) + 1e-9)
    assert rel < 0.5, rel


def test_percentile_calibration_robust_to_outliers():
    """stat='p999' gives an outlier-robust w8a8 scale: with one huge spike
    in the calibration data, amax stretches the int8 grid (coarse bulk
    resolution) while p999 saturates the spike and keeps the bulk fine."""
    lin = Linear(64)
    x = jax.random.normal(jax.random.PRNGKey(12), (64, 128))
    v = lin.init(jax.random.PRNGKey(0), x)
    y_ref = np.asarray(lin.apply(v, x))
    spike = np.array(x)
    spike[0, 0] = 1000.0
    calib = [jnp.asarray(spike)]
    q_amax = qz.quantize_for_serving(lin, v, calib, mode="w8a8", min_size=1)
    q_p999 = qz.quantize_for_serving(lin, v, calib, mode="w8a8", min_size=1,
                                     stat="p999")
    s_amax = float(_paths(q_amax["params"])["input_scale"])
    s_p999 = float(_paths(q_p999["params"])["input_scale"])
    assert s_p999 < s_amax / 10     # spike absorbed by the percentile
    err_amax = np.max(np.abs(np.asarray(lin.apply(q_amax, x)) - y_ref))
    err_p999 = np.max(np.abs(np.asarray(lin.apply(q_p999, x)) - y_ref))
    assert err_p999 < err_amax / 2, (err_p999, err_amax)


def test_quantized_tree_shards_under_mesh():
    """quantize.py claims sharding transparency: a quantized MLP forward
    under a batch-sharded 8-device mesh must equal the unsharded one."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x = jax.random.normal(jax.random.PRNGKey(13), (16, 1200))
    m = M.MLP(out_features=9)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    qv = qz.quantize_for_serving(m, v, [x], mode="w8a8", min_size=4096,
                                 train=False)
    ref = np.asarray(jax.jit(
        lambda vv, xx: m.apply(vv, xx, train=False))(qv, x))
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vs = jax.device_put(qv, NamedSharding(mesh, P()))
    got = np.asarray(jax.jit(
        lambda vv, xx: m.apply(vv, xx, train=False))(vs, xs))
    np.testing.assert_array_equal(got, ref)


def test_cnn2d_fold_input_norm_exact():
    """CNN-2D's scalar norm_0 folds into the space-to-depth stage-0 conv
    exactly (incl. the s2d zero-pad positions meeting only zero taps).
    (+12.3% measured on chip — BASELINE.md.)"""
    from multi_modal_csi_tpu.models.csi.cnn_2d import CNN2D, fold_input_norm
    x = jax.random.normal(jax.random.PRNGKey(14), (2, 200, 30))
    m = M.CNN2D(out_features=9)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=False)
    v = jax.device_get(v)
    bn0 = v["batch_stats"]["norm_0"]["bn"]
    bn0["mean"] = np.full_like(bn0["mean"], 0.21)
    bn0["var"] = np.full_like(bn0["var"], 0.8)
    v["params"]["norm_0"]["bn"]["scale"] = np.full_like(
        v["params"]["norm_0"]["bn"]["scale"], 1.3)
    ref = np.asarray(m.apply(v, x, train=False))
    vf = fold_input_norm(v)
    assert "norm_0" not in vf["params"]
    mf = CNN2D(out_features=9, fold_input_norm=True)
    got = np.asarray(mf.apply(vf, x, train=False))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_s3d_quantized_close():
    """S3D (a QUANT_DEFAULTS w8a8 model): the ConvBN/SepConv stack through
    the shared Conv3D wrapper quantizes and stays close at tiny dims."""
    from multi_modal_csi_tpu.models.video.s3d import S3D
    x = jax.random.normal(jax.random.PRNGKey(15), (1, 8, 32, 32, 3))
    m = S3D(out_features=9)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y32 = np.asarray(m.apply(v, x, train=False))
    qv = qz.quantize_for_serving(m, v, [x], mode="w8a8", train=False)
    p = _paths(qv["params"])
    assert sum(1 for k, l in p.items()
               if l.dtype == jnp.int8) >= 20, "separable convs must hook"
    yq = np.asarray(m.apply(qv, x, train=False))
    rel = np.max(np.abs(yq - y32)) / (np.std(y32) + 1e-9)
    assert rel < 0.6, rel   # 60+ BN layers compound int8 noise; drift
    # tool measured 7.4% at realistic dims (BASELINE.md)


def test_quantized_tree_checkpoint_roundtrip(tmp_path):
    """quantize.py claims quantized trees are checkpointable: int8 kernels
    + scale leaves must survive save_components/restore_scenario bit-exactly."""
    from multi_modal_csi_tpu.core.checkpoint import (restore_scenario,
                                                     save_components)
    x = jax.random.normal(jax.random.PRNGKey(16), (4, 1200))
    m = M.MLP(out_features=9)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    qv = qz.quantize_for_serving(m, v, [x], mode="w8a8", min_size=4096,
                                 train=False)
    path = str(tmp_path / "q_ckpt")
    save_components(path, qv["params"], qv.get("batch_stats"))
    like_p = jax.tree_util.tree_map(np.zeros_like, qv["params"])
    like_s = jax.tree_util.tree_map(np.zeros_like, qv["batch_stats"])
    rp, rs = restore_scenario(like_p, like_s, path, "full")[:2]
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(qv["params"]),
            jax.tree_util.tree_leaves_with_path(rp)):
        assert np.asarray(a).dtype == np.asarray(b).dtype, (ka,)
        assert np.array_equal(np.asarray(a), np.asarray(b)), (ka,)
    y1 = np.asarray(m.apply(qv, x, train=False))
    y2 = np.asarray(m.apply({"params": rp, "batch_stats": rs}, x,
                            train=False))
    np.testing.assert_array_equal(y1, y2)


def test_quant_defaults_task_metrics():
    """VERDICT r3 next #4 + r4 next #4: ALL five QUANT_DEFAULTS are
    task-metric-validated on TRAINED models at DECISIVE margins
    (docs/SERVING.md table) — the int8 path must measurably perturb the
    logits (proof it engaged) while every task metric stays within 0.02 of
    f32. MLP w8 here (fast, and must reach its measured acc 1.0 / PPP 100
    — a decisive margin, not the r4 0.23 near-chance one); DETR /
    THAT_ENCODER / ResNet3D / S3D w8a8 run in tools/quant_task_metrics.py
    with the same assertion class (their training loops are exercised by
    tests/test_convergence.py)."""
    from tools.quant_task_metrics import mlp_task_delta
    res = mlp_task_delta(epochs=15)
    assert res["logit_drift_max"] > 1e-4, res       # quantization engaged
    assert res["f32"]["ppp"] == 100.0, res          # decisive margin
    assert res["f32"]["accuracy"] == 1.0, res
    for k in ("accuracy", "f1"):
        assert abs(res["f32"][k] - res["int8"][k]) < 0.02, res
    assert abs(res["f32"]["ppp"] - res["int8"]["ppp"]) < 2.0, res
