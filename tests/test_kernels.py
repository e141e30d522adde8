"""Pallas kernel tests (interpret mode on CPU) against jnp oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_csi_tpu.kernels.csi_preprocess import (
    amplitude_phase, amplitude_phase_reference)
from multi_modal_csi_tpu.train.augment import apply_augmentation


def test_amplitude_phase_matches_reference(rng):
    re = rng.normal(size=(3, 16, 128)).astype(np.float32)
    im = rng.normal(size=(3, 16, 128)).astype(np.float32)
    amp, phase = amplitude_phase(jnp.asarray(re), jnp.asarray(im),
                                 interpret=True)
    amp_ref, phase_ref = amplitude_phase_reference(re, im)
    np.testing.assert_allclose(np.asarray(amp), np.asarray(amp_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(phase), np.asarray(phase_ref),
                               rtol=1e-5, atol=1e-6)
    # amplitude equals |complex|
    np.testing.assert_allclose(np.asarray(amp), np.abs(re + 1j * im),
                               rtol=1e-5)


def test_augmentation_shapes_and_changes(rng):
    x = jnp.asarray(rng.normal(size=(4, 16, 8)).astype(np.float32))
    out = apply_augmentation(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(out), np.asarray(x))
    # bf16 batches pass through unchanged in dtype (bf16 training path)
    xb = x.astype(jnp.bfloat16)
    outb = apply_augmentation(jax.random.PRNGKey(0), xb)
    assert outb.dtype == jnp.bfloat16


def test_augmentation_statistics(rng):
    # distribution check: ~4% zeros (bernoulli mask), mean ~1 elsewhere
    x = jnp.ones((8, 64, 128), jnp.float32)
    out = np.asarray(apply_augmentation(jax.random.PRNGKey(1), x))
    zero_frac = (out == 0).mean()
    assert 0.005 < zero_frac < 0.12
    nonzero = out[out != 0]
    assert abs(nonzero.mean() - 1.0) < 0.1


def test_flash_attention_matches_reference(rng):
    """Fused Pallas attention (r3) vs the unfused jnp oracle across the
    production shapes: THAT left (150 tok, d27), THAT right (270 tok, d15),
    THAT_ENCODER right (270 tok, d27), decoder memory (420 tok, d45),
    including non-divisible batch blocks."""
    from multi_modal_csi_tpu.kernels.flash_attention import (
        flash_attention, flash_attention_reference)
    for b, n, h, d in [(8, 150, 10, 27), (6, 270, 10, 15),
                       (4, 270, 10, 27), (2, 420, 6, 45), (3, 96, 5, 16)]:
        q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
        got = flash_attention(q, k, v, interpret=True)
        want = flash_attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_flash_attention_cross_shapes(rng):
    """Cross-attention: query and key lengths differ."""
    from multi_modal_csi_tpu.kernels.flash_attention import (
        flash_attention, flash_attention_reference)
    q = jnp.asarray(rng.normal(size=(4, 128, 6, 45)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4, 420, 6, 45)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(4, 420, 6, 45)).astype(np.float32))
    got = flash_attention(q, k, v, interpret=True)
    want = flash_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_lowrank_bias_matches_reference(rng):
    """Tiled MViT-shape kernel (q tiling + low-rank rel-pos bias + folded
    key mask) vs the unfused oracle: scaled-down MViT-v2 block families
    (cls token row/col carried as zero factor entries), plus the no-bias
    path and non-divisible Nq/Nk."""
    from multi_modal_csi_tpu.kernels.flash_attention import (
        flash_attention_lowrank_bias, flash_attention_lowrank_bias_reference)
    for b, h, nq, nk, d, m in [(2, 1, 300, 37, 16, 5), (1, 2, 513, 129, 8, 11),
                               (2, 4, 257, 128, 24, 9), (1, 8, 128, 128, 96, 0)]:
        q = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
        if m:
            r = jnp.asarray(rng.normal(size=(b, h, nq, m)).astype(np.float32))
            s = jnp.asarray(rng.normal(size=(m, nk)).astype(np.float32))
            # cls-token convention: zero bias row/col
            r = r.at[:, :, 0, :].set(0.0)
            s = s.at[:, 0].set(0.0)
        else:
            r = s = None
        got = flash_attention_lowrank_bias(q, k, v, r, s, q_tile=256,
                                           interpret=True)
        want = flash_attention_lowrank_bias_reference(q, k, v, r, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_flash_attention_lowrank_bias_trainable_grads(rng):
    """Pallas flash BACKWARD (two-kernel dQ/dR + accumulated dK/dV/dS) vs
    jax.grad of the unfused oracle — every cotangent incl. the low-rank
    bias factors, across bias/no-bias and non-divisible Nq/Nk."""
    import jax

    from multi_modal_csi_tpu.kernels.flash_attention import (
        flash_attention_lowrank_bias_reference,
        flash_attention_lowrank_bias_trainable)
    for b, h, nq, nk, d, m in [(2, 2, 300, 130, 32, 11),
                               (1, 2, 513, 129, 8, 0)]:
        q = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, nk, d)).astype(np.float32))
        if m:
            r = 0.1 * jnp.asarray(
                rng.normal(size=(b, h, nq, m)).astype(np.float32))
            s = 0.1 * jnp.asarray(rng.normal(size=(m, nk)).astype(np.float32))
        else:
            r = s = None
        seed = jnp.asarray(rng.normal(size=(b, h, nq, d)).astype(np.float32))
        args = (q, k, v) if m == 0 else (q, k, v, r, s)
        nargs = len(args)

        def loss_flash(*a):
            return jnp.sum(flash_attention_lowrank_bias_trainable(
                *a, q_tile=128, interpret=True) * seed)

        def loss_ref(*a):
            return jnp.sum(flash_attention_lowrank_bias_reference(*a) * seed)

        g_got = jax.grad(loss_flash, argnums=tuple(range(nargs)))(*args)
        g_want = jax.grad(loss_ref, argnums=tuple(range(nargs)))(*args)
        for name, a, bb in zip("qkvrs", g_got, g_want):
            scale = float(jnp.max(jnp.abs(bb))) + 1e-9
            err = float(jnp.max(jnp.abs(a - bb))) / scale
            assert err < 1e-4, (name, err, (b, h, nq, nk, d, m))


def test_flash_attention_trainable_grads(rng):
    """Batched-cell THAT-family flash backward vs jax.grad of the oracle
    (incl. the d=27 h=10 production head geometry)."""
    import jax

    from multi_modal_csi_tpu.kernels.flash_attention import (
        flash_attention_reference, flash_attention_trainable)
    for b, nq, nk, h, d in [(4, 64, 40, 10, 27), (2, 128, 128, 4, 16)]:
        q = jnp.asarray(rng.normal(size=(b, nq, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, nk, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, nk, h, d)).astype(np.float32))
        seed = jnp.asarray(rng.normal(size=(b, nq, h, d)).astype(np.float32))

        def lf(*a):
            return jnp.sum(flash_attention_trainable(*a) * seed)

        def lr(*a):
            return jnp.sum(flash_attention_reference(*a) * seed)

        g_got = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        g_want = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
        for name, a, w in zip("qkv", g_got, g_want):
            scale = float(jnp.max(jnp.abs(w))) + 1e-9
            assert float(jnp.max(jnp.abs(a - w))) / scale < 1e-5, \
                (name, (b, nq, nk, h, d))


def test_mp_dot_bf16_backward_matches_stock_vjp(rng):
    """mp_dot's custom bf16 VJP (cotangent rounded to bf16 before
    dgrad/wgrad — nn/layers.py) must match the stock dot's VJP up to one
    bf16 rounding of the cotangent, and be BIT-identical at f32.

    Guards the r3 mixed-precision backward (CLSTM bf16 16.4 -> 9.2 ms):
    the torch train-parity suite runs f32, so without this the bf16
    gradient path would be perf-tested but never numerics-tested."""
    from multi_modal_csi_tpu.nn.layers import mp_dot

    x32 = rng.normal(size=(6, 5, 48)).astype(np.float32)
    w32 = rng.normal(size=(48, 32)).astype(np.float32)

    def loss_mp(x, w):
        return jnp.sum(mp_dot(x, w) ** 2)

    def loss_stock(x, w):
        return jnp.sum(jnp.dot(
            x, w, preferred_element_type=jnp.float32) ** 2)

    # f32: custom path must not engage -> bit-identical grads
    gx_mp, gw_mp = jax.grad(loss_mp, argnums=(0, 1))(x32, w32)
    gx_st, gw_st = jax.grad(loss_stock, argnums=(0, 1))(x32, w32)
    np.testing.assert_array_equal(np.asarray(gx_mp), np.asarray(gx_st))
    np.testing.assert_array_equal(np.asarray(gw_mp), np.asarray(gw_st))

    # bf16: grads land in bf16 either way; the only difference allowed is
    # the cotangent's bf16 rounding, so compare against the stock VJP with
    # grads cast to bf16 at a tolerance of a few bf16 ulps
    x16, w16 = jnp.asarray(x32, jnp.bfloat16), jnp.asarray(w32, jnp.bfloat16)
    gx16, gw16 = jax.grad(loss_mp, argnums=(0, 1))(x16, w16)
    assert gx16.dtype == jnp.bfloat16 and gw16.dtype == jnp.bfloat16
    gx_ref, gw_ref = jax.grad(loss_stock, argnums=(0, 1))(x16, w16)
    for got, ref in ((gx16, gx_ref), (gw16, gw_ref)):
        got = np.asarray(got, np.float32)
        ref = np.asarray(ref, np.float32)
        # per-element relative bounds blow up where the reference grad
        # cancels to ~0, so bound the error against the tensor's scale
        # (observed max: ~2 bf16 ulps of the largest gradient)
        assert np.max(np.abs(got - ref)) < 0.02 * np.max(np.abs(ref))
