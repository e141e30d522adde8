"""Shape/init/forward tests for every CSI model on tiny inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_csi_tpu.models import csi as M

B, T, F = 2, 200, 30   # tiny stand-in for (16, 3000, 270); T % 20 == 0


def _init_and_apply(model, x, **kw):
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)
    out = model.apply(variables, x, train=False, **kw)
    # train-mode forward with batch_stats mutation must also work
    out_t, _ = model.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"], **kw)
    return variables, out, out_t


def test_mlp_shapes():
    x = jnp.ones((B, T * F))
    _, out, out_t = _init_and_apply(M.MLP(out_features=54), x)
    assert out.shape == (B, 54) and out_t.shape == (B, 54)


def test_cnn1d_shapes():
    x = jnp.ones((B, T, F))
    _, out, _ = _init_and_apply(M.CNN1D(out_features=54), x)
    assert out.shape == (B, 54)


def test_cnn2d_shapes():
    x = jnp.ones((B, T, F))
    _, out, _ = _init_and_apply(M.CNN2D(out_features=54), x)
    assert out.shape == (B, 54)


def test_lstm_shapes():
    x = jnp.ones((B, T, F))
    _, out, _ = _init_and_apply(M.LSTMModel(out_features=54, hidden=32), x)
    assert out.shape == (B, 54)


def test_clstm_shapes():
    x = jnp.ones((B, 1800, F))   # k128/s8 -> k64/s4 -> k32/s2 needs T >= 1624
    _, out, _ = _init_and_apply(M.CLSTM(out_features=54), x)
    assert out.shape == (B, 54)


def test_ablstm_shapes():
    x = jnp.ones((B, T, F))
    _, out, _ = _init_and_apply(M.ABLSTM(out_features=54, hidden=16), x)
    assert out.shape == (B, 54)


def test_that_shapes_and_trunk_dim():
    x = jnp.ones((B, T, F))
    variables, out, _ = _init_and_apply(M.THAT(out_features=54), x)
    assert out.shape == (B, 54)
    # trunk output is 256 + 32 = 288-dim (that.py:245)
    head_kernel = variables["params"]["head"]["kernel"]
    assert head_kernel.shape == (288, 54)


def test_that_multi_head_shapes():
    x = jnp.ones((B, T, F))
    _, out, _ = _init_and_apply(M.THATMultiHead(out_features=10), x)
    assert out.shape == (B, 5, 10)


def test_that_count_shapes():
    x = jnp.ones((B, T, F))
    _, out, _ = _init_and_apply(M.THATCount(), x)
    assert out.shape == (B, 9)


def test_that_count_constrained_sums_to_five():
    x = jnp.ones((B, T, F))
    _, out, _ = _init_and_apply(M.THATCountConstrained(), x)
    assert out.shape == (B, 10)
    np.testing.assert_allclose(np.asarray(out.sum(axis=1)), 5.0, rtol=1e-5)


def test_detr_shapes():
    x = jnp.ones((B, 300, F))
    model = M.DETRMultiUser(token_length=10, num_decoder_layers=3,
                            num_queries=5, dim_feedforward=64)
    _, out, out_t = _init_and_apply(model, x)
    assert out.shape == (3, B, 5, 10)
    assert out_t.shape == (3, B, 5, 10)


def test_detr_decoder_weight_sharing():
    x = jnp.ones((B, 300, F))
    model = M.DETRMultiUser(token_length=10, num_decoder_layers=4,
                            dim_feedforward=64)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    decoder = variables["params"]["decoder"]
    # exactly ONE shared layer's parameters regardless of depth
    assert "shared_layer" in decoder
    layer_keys = [k for k in decoder if k.startswith("shared_layer")]
    assert layer_keys == ["shared_layer"]


def test_that_encoder_detr_shapes():
    x = jnp.ones((B, T, F))
    model = M.THATEncoderDETR(num_decoder_layers=2, num_queries=5)
    _, out, _ = _init_and_apply(model, x)
    # L+1 aux heads (that_encoder.py:374-380); memory tokens = T//20 + F
    assert out.shape == (3, B, 5, 10)


def test_dual_band_shapes():
    x = jnp.ones((B, 2, 1000, F))
    _, out, _ = _init_and_apply(M.DualBandCNN(out_features=54), x)
    assert out.shape == (B, 54)


def test_ssl_model_and_loss():
    x = jnp.ones((B, 1000, F))
    model = M.SSLModel(out_features=54)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, x, train=False)
    (z1, z2, logits), _ = model.apply(
        variables, x, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])
    assert z1.shape == (B, 256) and logits.shape == (B, 54)
    labels = jnp.zeros((B, 54))
    total, ssl_part = M.ssl_loss(z1, z2, logits, labels)
    assert np.isfinite(float(total))
    # inference path
    out = model.apply(variables, x, inference=True)
    assert out.shape == (B, 54)


def test_ssl_two_views_shapes_and_difference():
    x = jnp.ones((4, 64, 8))
    v1, v2 = M.two_views(jax.random.PRNGKey(0), x)
    assert v1.shape == x.shape and v2.shape == x.shape
    assert not np.allclose(np.asarray(v1), np.asarray(v2))


def test_info_nce_identity_pairs_low_loss(rng):
    z = rng.normal(size=(8, 16)).astype(np.float32) * 5
    aligned = float(M.info_nce(z, z))
    shuffled = float(M.info_nce(z, z[::-1]))
    assert aligned < shuffled


def test_strf_pipeline():
    rng = np.random.default_rng(0)
    x_train = rng.normal(size=(20, 64, 6)).astype(np.float32)
    y_train = rng.integers(0, 2, size=(20, 6, 9))
    x_test = rng.normal(size=(8, 64, 6)).astype(np.float32)
    feats = M.spectrogram_features(x_train)
    assert feats.shape == (20, 6 * 9)
    pred = M.fit_predict_strf(x_train, y_train, x_test, seed=39)
    assert pred.shape == (8, 54)


def test_cnn2d_stage0_space_to_depth_equivalence(rng):
    """The r3 TPU fast path (7x7 space-to-depth + k4x4/49ch conv) must equal
    the direct k27x27/s7 C_in=1 conv exactly (up to f32 summation order) —
    including shapes where the s2d grid needs zero-padding."""
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.models.csi.cnn_2d import _Stage0Conv
    for t, f in [(300, 270), (100, 100), (27, 27)]:
        x = jnp.asarray(rng.normal(size=(2, t, f, 1)).astype(np.float32))
        m = _Stage0Conv(32)
        v = m.init({"params": jax.random.PRNGKey(0)}, x)
        got = m.apply(v, x)
        k = v["params"]["conv"]["kernel"]
        b = v["params"]["conv"]["bias"]
        want = jax.lax.conv_general_dilated(
            x, k, (7, 7), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_cnn2d_bf16_train_grads(rng):
    """bf16 TRAINING through the space-to-depth stage-0 conv must
    differentiate: with preferred_element_type=f32 the conv transpose rule
    paired an f32 cotangent with bf16 operands and raised (r3 crash in
    tools/bench_training.py). Guards the whole bf16 train-step path for
    CNN-2D."""
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.losses.basic import bce_with_logits
    from multi_modal_csi_tpu.models.csi.cnn_2d import CNN2D
    model = CNN2D(out_features=9)
    # T=300 is the smallest round size where every conv stage stays
    # non-empty (T=100 leaves stage 1 a 0-size output -> NaN mean)
    x = rng.normal(size=(4, 300, 270)).astype(np.float32)
    y = (rng.random(size=(4, 9)) < 0.3).astype(np.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x[:2], train=False)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
    pb, bs = cast(v["params"]), v["batch_stats"]
    xb, yb = jnp.asarray(x, jnp.bfloat16), jnp.asarray(y)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, xb, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        return bce_with_logits(out, yb, 6.0)

    loss, grads = jax.value_and_grad(loss_fn)(pb)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.isfinite(a).all())
               for a in jax.tree_util.tree_leaves(grads))


def test_that_bf16_serving_close_to_f32(rng):
    """bf16 serving (params cast, flash attention in bf16 with f32 softmax
    accumulation) must stay close to the f32 forward — guards the serving
    path against dtype regressions in the attention kernel (r3)."""
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.models.csi.that import THAT
    model = THAT(out_features=54)
    x = jnp.asarray(rng.normal(size=(2, 400, 270)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out32 = np.asarray(model.apply(v, x, train=False))
    vb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v)
    outb = np.asarray(model.apply(vb, x.astype(jnp.bfloat16),
                                  train=False).astype(jnp.float32))
    # logits live in roughly [-10, 10]; bf16 end-to-end error budget
    assert np.abs(outb - out32).max() < 0.35, np.abs(outb - out32).max()
    # and the induced decisions barely move: sign agreement on confident
    # logits (|logit| > 0.5)
    confident = np.abs(out32) > 0.5
    agree = (np.sign(outb[confident]) == np.sign(out32[confident])).mean()
    assert agree > 0.99, agree
