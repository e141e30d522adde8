"""Fused windowed-attention Pallas kernel (Swin3D's hot op).

For video Swin the attention runs over thousands of (windows x heads) batches
of N~392 tokens; unfused, the (nWB, H, N, N) logits round-trip HBM. This
kernel fuses QK^T + relative-position bias + shift mask + softmax + PV per
(window, head) grid cell entirely in VMEM: the logits never touch HBM.

The wrapper pads N up to the f32 sublane multiple (8) and masks the padded
keys with -inf before softmax. Falls back to interpret mode off-TPU; the jnp
reference below is the test oracle and the Swin module's default path (the
kernel is opt-in via use_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _window_attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *,
                        scale: float, n_valid: int):
    """One (window-batch, head) cell: q/k/v (N, D), bias (N, N), mask (N, N)."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0] + mask_ref[0]
    # mask padded keys
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, -jnp.inf)
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)
    out = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[0, 0] = (out / l).astype(out_ref.dtype)


def window_attention(q, k, v, bias, mask=None, *,
                     interpret: bool | None = None):
    """Fused attention for windowed transformers.

    q, k, v: (BW, H, N, D) — window-batches x heads x tokens x head_dim;
    bias:    (H, N, N) relative-position bias;
    mask:    (nW, N, N) additive shift mask or None; BW % nW == 0.
    Returns (BW, H, N, D).
    """
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except Exception:
            interpret = True
    bw, h, n, d = q.shape
    scale = 1.0 / (d ** 0.5)
    n_pad = _round_up(n, 8)
    d_pad = _round_up(d, 128)

    def pad(x, rows, cols):
        return jnp.pad(x, ((0, 0), (0, 0), (0, rows - x.shape[2]),
                           (0, cols - x.shape[3])))

    qp = pad(q, n_pad, d_pad)
    kp = pad(k, n_pad, d_pad)
    vp = pad(v, n_pad, d_pad)
    bias_p = jnp.pad(bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
    if mask is None:
        mask_full = jnp.zeros((1, n_pad, n_pad), q.dtype)
        nw = 1
    else:
        nw = mask.shape[0]
        mask_full = jnp.pad(mask, ((0, 0), (0, n_pad - n), (0, n_pad - n)))

    kernel = functools.partial(_window_attn_kernel, scale=scale, n_valid=n)
    grid = (bw, h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, n_pad, d_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad, d_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad, d_pad), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, n_pad), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, n_pad),
                         lambda i, j, _nw=nw: (i % _nw, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_pad, d_pad),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, h, n_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bias_p, mask_full)
    return out[:, :, :n, :d]


def window_attention_reference(q, k, v, bias, mask=None):
    """jnp oracle: plain attention with bias (+ per-window mask)."""
    bw, h, n, d = q.shape
    s = jnp.einsum("whnd,whmd->whnm", q, k,
                   preferred_element_type=jnp.float32) / (d ** 0.5)
    s = s + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        s = s.reshape(bw // nw, nw, h, n, n) + mask[None, :, None]
        s = s.reshape(bw, h, n, n)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("whnm,whmd->whnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
