"""Serving-artifact export (core/export.py): round-trip == direct apply.

The reference's serving path rebuilds the model class and reloads a .pth
(inference_only.py:11-90); here the exported StableHLO must reproduce the
live model without any model code.
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_csi_tpu.core.export import (
    export_serving, load_artifact, load_serving, save_artifact, serve_file)


def _tiny_model_and_vars():
    from multi_modal_csi_tpu.models.csi.mlp import MLP
    model = MLP(out_features=6)
    x = np.random.default_rng(0).normal(size=(4, 120)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    return model, variables, x


def test_export_roundtrip_matches_apply():
    model, variables, x = _tiny_model_and_vars()
    blob = export_serving(model, variables, x, platforms=("cpu",))
    fn = load_serving(blob)
    out = np.asarray(fn(jnp.asarray(x)))
    # oracle must be the COMPILED forward: eager op-by-op rounding differs
    ref = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables,
                                                     jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_export_bf16_serving_dtype():
    model, variables, x = _tiny_model_and_vars()
    blob = export_serving(model, variables, x, serving_dtype="bfloat16",
                          platforms=("cpu",))
    fn = load_serving(blob)
    out = fn(jnp.asarray(x))
    assert out.dtype == jnp.float32  # logits contract: always f32 out
    ref = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0.1, atol=0.15)


def test_artifact_file_roundtrip(tmp_path):
    model, variables, x = _tiny_model_and_vars()
    blob = export_serving(model, variables, x, platforms=("cpu",))
    path = str(tmp_path / "m.mmcsi")
    save_artifact(path, blob, {"model": "MLP", "batch": 4})
    blob2, meta = load_artifact(path)
    assert blob2 == blob and meta["model"] == "MLP"
    fn, meta2 = serve_file(path)
    assert meta2["batch"] == 4
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))),
                               np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_export_batch_shape_is_static():
    model, variables, x = _tiny_model_and_vars()
    fn = load_serving(export_serving(model, variables, x, platforms=("cpu",)))
    try:
        fn(jnp.zeros((2, 120), jnp.float32))
        raised = False
    except ValueError:
        raised = True
    assert raised, "exported artifact must reject a different batch shape"


def test_export_bf16_input_contract():
    """input_dtype='bfloat16': the artifact accepts bf16 inputs (halved H2D
    + first-layer HBM traffic), rejects f32, and matches the f32-input
    artifact to bf16-rounding tolerance."""
    model, variables, x = _tiny_model_and_vars()
    blob = export_serving(model, variables, x, input_dtype="bfloat16",
                          platforms=("cpu",))
    fn = load_serving(blob)
    out = fn(jnp.asarray(x, jnp.bfloat16))
    assert out.dtype == jnp.float32
    ref = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0.05, atol=0.05)
    try:
        fn(jnp.asarray(x, jnp.float32))
        raised = False
    except ValueError:
        raised = True
    assert raised, "bf16-input artifact must reject f32 input"


def _attn_model_and_vars():
    """A model whose eval path hits the flash-attention gate (seq >= 64)."""
    import flax.linen as nn

    from multi_modal_csi_tpu.nn.layers import MultiheadAttention

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return MultiheadAttention(embed_dim=32, num_heads=2)(
                x, x, x, deterministic=not train)

    model = Tiny()
    x = np.random.default_rng(0).normal(size=(2, 64, 32)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    return model, variables, x


def test_export_multiplatform_forces_xla_attention():
    """A multi-platform artifact must NOT contain a Mosaic custom call (it
    could never run on CPU); it must serve on CPU and match the XLA path."""
    model, variables, x = _attn_model_and_vars()
    blob = export_serving(model, variables, x, platforms=("tpu", "cpu"))
    assert b"tpu_custom_call" not in blob
    out = np.asarray(load_serving(blob)(jnp.asarray(x)))

    from multi_modal_csi_tpu.kernels.flash_attention import flash_mode
    with flash_mode("off"):
        ref = np.asarray(jax.jit(
            lambda v, x: model.apply(v, x, train=False))(variables,
                                                         jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_export_tpu_only_traces_mosaic_flash():
    """A TPU-only artifact exported from a CPU host must trace the COMPILED
    Pallas flash kernel (the host-keyed gate would silently drop it)."""
    model, variables, x = _attn_model_and_vars()
    blob = export_serving(model, variables, x, platforms=("tpu",))
    assert b"tpu_custom_call" in blob


def test_flash_mode_scoping():
    from multi_modal_csi_tpu.kernels.flash_attention import (flash_mode,
                                                             flash_resolved)
    assert flash_resolved(True) and not flash_resolved(False)  # auto
    with flash_mode("off"):
        assert not flash_resolved(True)
        with flash_mode("on"):
            assert flash_resolved(False)
        assert not flash_resolved(True)
    assert flash_resolved(True) and not flash_resolved(False)
    try:
        with flash_mode("sideways"):
            pass
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_export_cli_detr(tmp_path):
    """The CLI exports a DETR artifact that serves (CPU platform) correctly.

    Runs in a subprocess so the CLI picks CPU before backend init."""
    out = str(tmp_path / "detr.mmcsi")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['x','--model','DETR','--task','activity',"
        f"'--batch','2','--out',{out!r},'--dtype','float32',"
        "'--platforms','cpu'];"
        "from multi_modal_csi_tpu.cli.export_model import main; main()"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    fn, meta = serve_file(out)
    assert meta["model"] == "DETR" and meta["serving_dtype"] == "float32"
    out_arr = fn(jnp.zeros(tuple(meta["input_shape"]), jnp.float32))
    # DETR serving output: (L, B, Q, 10) per-layer class logits
    assert np.asarray(out_arr).shape[1:] == (2, 5, 10)
    assert np.all(np.isfinite(np.asarray(out_arr)))


def test_export_cli_video_resnet3d(tmp_path):
    """The CLI exports a VIDEO artifact (ResNet3D-18) that serves on CPU."""
    out = str(tmp_path / "r3d.mmcsi")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = ['x','--model','ResNet','--batch','1',"
        f"'--out',{out!r},'--dtype','float32','--platforms','cpu',"
        "'--clip-shape','8,64,64'];"
        "from multi_modal_csi_tpu.cli.export_model import main; main()"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    fn, meta = serve_file(out)
    assert meta["model"] == "ResNet" and meta["input_shape"] == [1, 8, 64, 64, 3]
    out_arr = np.asarray(fn(jnp.zeros((1, 8, 64, 64, 3), jnp.float32)))
    assert out_arr.shape == (1, 54) and np.all(np.isfinite(out_arr))


def test_export_quantized_w8():
    """int8 weight-only export: artifact runs with no model code and stays
    close to the f32 forward (MLP hidden layers go int8; head stays f32)."""
    from multi_modal_csi_tpu.models.csi.mlp import MLP
    model = MLP(out_features=6)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 1200)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), train=False)
    blob = export_serving(model, variables, x, quant="w8",
                          platforms=("cpu",))
    out = np.asarray(load_serving(blob)(jnp.asarray(x)))
    ref = np.asarray(jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(variables,
                                                       jnp.asarray(x)))
    rel = np.max(np.abs(out - ref)) / (np.std(ref) + 1e-9)
    assert rel < 0.25, rel


def test_export_quantized_w8a8_requires_calib():
    import pytest
    model, variables, x = _tiny_model_and_vars()
    with pytest.raises(ValueError):
        export_serving(model, variables, x, quant="w8a8", platforms=("cpu",))
    blob = export_serving(model, variables, x, quant="w8a8", calib_x=[x],
                          platforms=("cpu",))
    out = np.asarray(load_serving(blob)(jnp.asarray(x)))
    assert out.shape == (4, 6) and np.isfinite(out).all()


def test_export_int8_input_contract():
    """int8 input artifact: host quantizes round(x/scale), artifact
    dequantizes inline; logits stay close to the f32-input forward
    (measured +24% on the input-bound MLP — tools/exp_int8_input.py)."""
    model, variables, x = _tiny_model_and_vars()
    scale = float(np.max(np.abs(x))) / 127.0
    blob = export_serving(model, variables, x, input_dtype="int8",
                          input_scale=scale, quant="w8", platforms=("cpu",))
    x8 = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    out = np.asarray(load_serving(blob)(jnp.asarray(x8)))
    ref = np.asarray(jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(variables,
                                                       jnp.asarray(x)))
    rel = np.max(np.abs(out - ref)) / (np.std(ref) + 1e-9)
    assert rel < 0.3, rel
    # scale derivation from calib_x matches the explicit-scale artifact
    blob2 = export_serving(model, variables, x, input_dtype="int8",
                           calib_x=[x], platforms=("cpu",))
    out2 = np.asarray(load_serving(blob2)(jnp.asarray(x8)))
    assert np.isfinite(out2).all()


def test_serve_ragged():
    """The ragged-batch shim: pad/split/slice around a fixed-batch artifact,
    batch axis located by size (works for (B, C) and (L, B, Q, C) outputs)."""
    from multi_modal_csi_tpu.core.export import serve_ragged
    model, variables, x = _tiny_model_and_vars()
    blob = export_serving(model, variables, x, platforms=("cpu",))  # bs4
    fn = load_serving(blob)
    big = np.random.default_rng(3).normal(size=(10, 120)).astype(np.float32)
    got = serve_ragged(fn, 4)(big)
    ref = np.asarray(jax.jit(
        lambda v, xx: model.apply(v, xx, train=False))(variables,
                                                       jnp.asarray(big)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # non-leading batch axis: DETR-style (L, B, Q, C)
    from multi_modal_csi_tpu.models.csi.detr import DETRMultiUser
    dmodel = DETRMultiUser(num_decoder_layers=2)
    dx = np.random.default_rng(4).normal(size=(2, 600, 270)).astype(np.float32)
    dv = dmodel.init({"params": jax.random.PRNGKey(0)},
                     jnp.asarray(dx), train=False)
    dblob = export_serving(dmodel, dv, dx, platforms=("cpu",))  # bs2
    dfn = load_serving(dblob)
    dbig = np.random.default_rng(5).normal(size=(5, 600, 270)).astype(np.float32)
    # L == B here (2 decoder layers, batch 2): auto-detection must refuse
    import pytest
    with pytest.raises(ValueError):
        serve_ragged(dfn, 2)(dbig)
    dgot = serve_ragged(dfn, 2, axis=1)(dbig)
    dref = np.asarray(jax.jit(
        lambda v, xx: dmodel.apply(v, xx, train=False))(dv,
                                                        jnp.asarray(dbig)))
    assert dgot.shape == dref.shape
    np.testing.assert_allclose(dgot, dref, rtol=2e-5, atol=2e-5)
