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


def test_mvit_attention_flash_path_matches_xla():
    """MultiscaleAttention's eval path (tiled low-rank-bias flash kernel,
    interpret on CPU) == the train/XLA einsum path — attention itself has no
    dropout, so deterministic True/False must agree numerically."""
    import jax
    import jax.numpy as jnp
    from multi_modal_csi_tpu.models.video.mvit import MultiscaleAttention

    thw = (4, 9, 9)                       # 1 + 324 = 325 tokens (>= 256 gate)
    dim = 96
    attn = MultiscaleAttention(
        embed_dim=dim, output_dim=dim, num_heads=1, q_stride=(1, 1, 1),
        kv_stride=(1, 1, 1), has_pool_q=False, residual_pool=True,
        residual_with_cls=False, rel_pos=True)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 1 + 4 * 9 * 9, dim))
                    .astype(np.float32))
    variables = attn.init({"params": jax.random.PRNGKey(0)}, x, thw)
    out_flash, _ = attn.apply(variables, x, thw, deterministic=True)
    out_xla, _ = attn.apply(variables, x, thw, deterministic=False)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_xla),
                               atol=3e-5)
