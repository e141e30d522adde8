"""Forward-shape tests for the video model family on tiny clips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_csi_tpu.models import video as V

B, T, H, W = 1, 8, 32, 32


def _run(model, x):
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    out_t, _ = model.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)},
                           mutable=["batch_stats"])
    return variables, out, out_t


def test_resnet3d18_shapes():
    x = jnp.ones((B, T, H, W, 3))
    _, out, out_t = _run(V.ResNet3D18(out_features=54), x)
    assert out.shape == (B, 54) and out_t.shape == (B, 54)


def test_s3d_shapes():
    x = jnp.ones((B, 8, 56, 56, 3))
    _, out, _ = _run(V.S3D(out_features=54), x)
    assert out.shape == (B, 54)


def test_swin3d_t_shapes():
    x = jnp.ones((B, T, H, W, 3))
    _, out, _ = _run(V.swin3d_t(out_features=54), x)
    assert out.shape == (B, 54)


def test_swin3d_shift_mask_static():
    from multi_modal_csi_tpu.models.video.swin3d import (_shift_mask,
                                                         window_partition,
                                                         window_reverse)
    mask = _shift_mask((4, 8, 8), (2, 4, 4), (1, 2, 2))
    n_windows = (4 // 2) * (8 // 4) * (8 // 4)
    assert mask.shape == (n_windows, 32, 32)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # partition/reverse roundtrip
    x = jnp.arange(2 * 4 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 4, 8, 8, 3)
    wins = window_partition(x, (2, 4, 4))
    back = window_reverse(wins, (2, 4, 4), 2, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_mvit_v1_and_v2_shapes():
    x = jnp.ones((B, T, H, W, 3))
    _, out, _ = _run(V.mvit_v1_b(out_features=54), x)
    assert out.shape == (B, 54)
    _, out2, _ = _run(V.mvit_v2_s(out_features=54), x)
    assert out2.shape == (B, 54)


def test_mvit_resolution_schedule():
    # channel dims double per stage: 96 -> 192 -> 384 -> 768 (v1 widens in
    # the MLP of the last block of a stage; skip projected at norm2)
    x = jnp.ones((B, T, H, W, 3))
    model = V.mvit_v1_b(out_features=5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    p = variables["params"]
    assert p["block0"]["project"]["kernel"].shape == (96, 192)
    assert p["block2"]["project"]["kernel"].shape == (192, 384)
    assert p["block13"]["project"]["kernel"].shape == (384, 768)
    assert p["fc"]["kernel"].shape[0] == 768
    # pooling attention: Q pooled only at stage transitions (blocks 1/3/14)
    assert "pool_q" in p["block1"]["attn"]
    assert "pool_q" not in p["block0"]["attn"]
