"""Fused multi-head attention (QK^T -> softmax -> PV) Pallas kernel for the
THAT-family shapes: short sequences (N <= ~512), small head dim (d=27),
many heads — where XLA's unfused path materializes the (B, H, N, N)
logits/exp/weights matrices in HBM three times per layer (measured r3:
attention was 69% of THAT_ENCODER's step time).

Design notes (sized against this backend's measured ~12 us/grid-cell
overhead and VMEM tiling rules — BASELINE.md post-mortems):
  - one grid cell = BB batch elements x ALL heads, so a 256-batch call is
    only ceil(256/BB) cells; the (b, h) loop is unrolled INSIDE the cell;
  - all tensors travel in (B, H, D, N) layout: the minor-two dims (D, N)
    tile to (32, 256)-ish — benign padding. The natural (B, N, H, D) layout
    would tile (H=10, D=27) -> (16, 128), a 7.6x VMEM blowup that OOMs;
  - per-(b, h) logits are an (Nq, Nk) f32 VMEM tile, never written to HBM.

Inference path only (no mask, no dropout): the serving MHA calls this when
shapes qualify; training keeps the XLA path (exact jax.nn.softmax grads).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, bb: int,
            heads: int):
    # fori_loop over the batch block, python-unrolled over heads: Mosaic's
    # stack allocation scales with the UNROLL count (a fully unrolled
    # (b, h) loop VMEM-OOMed at some shapes), while a fully dynamic loop
    # paid ~10% in dynamic-index overhead — heads-only unroll is the
    # measured sweet spot
    def body(b, carry):
        for h in range(heads):
            qh = q_ref[b, h]                             # (D, Nq)
            kh = k_ref[b, h]                             # (D, Nk)
            vh = v_ref[b, h]                             # (D, Nk)
            # logits[qn, kn] = sum_d qh[d, qn] kh[d, kn]
            logits = jax.lax.dot_general(
                qh, kh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            unnorm = jnp.exp(logits - m)
            denom = jnp.sum(unnorm, axis=-1, keepdims=True)
            w = (unnorm / denom).astype(vh.dtype)        # (Nq, Nk)
            # out[d, qn] = sum_kn vh[d, kn] w[qn, kn]
            o_ref[b, h] = jax.lax.dot_general(
                vh, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, bb, body, 0)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    batch_block: int = 8,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Fused softmax(q k^T / sqrt(d)) v.

    q: (B, Nq, H, D); k/v: (B, Nk, H, D) — the production MHA layout.
    Returns (B, Nq, H, D) in q's dtype. Internally runs in (B, H, D, N).
    """
    if interpret is None:
        interpret = not _on_tpu()
    b, nq, h, d = q.shape
    nk = k.shape[1]

    def _pad(x, m):
        return -(-x // m) * m

    # VMEM budget: 4 HBM-transfer blocks (q, k, v, out) at Mosaic tile
    # padding + the per-(b,h) f32 logits tile, against the 16 MB scoped
    # limit with headroom
    item = jnp.dtype(q.dtype).itemsize
    sub = 8 if item == 4 else 16
    per_b = (h * _pad(d, sub) * (2 * _pad(nk, 128) + 2 * _pad(nq, 128))
             * item)
    logits_bytes = _pad(nq, 8) * _pad(nk, 128) * 4
    budget = 12 * 1024 * 1024
    while batch_block > 1 and batch_block * per_b + logits_bytes > budget:
        batch_block //= 2
    while b % batch_block:
        batch_block //= 2
    bb = max(batch_block, 1)
    scale = 1.0 / math.sqrt(d)

    qt = q.transpose(0, 2, 3, 1)                 # (B, H, D, Nq)
    kt = k.transpose(0, 2, 3, 1)
    vt = v.transpose(0, 2, 3, 1)
    kernel = functools.partial(_kernel, scale=scale, bb=bb, heads=h)
    out = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, h, d, nq), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h, d, nk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, h, d, nk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, h, d, nq), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, d, nq), q.dtype),
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(0, 3, 1, 2)             # (B, Nq, H, D)


def flash_attention_reference(q, k, v):
    """jnp oracle (same math, unfused)."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# --------------------------------------------------------------------- #
# Tiled variant for MViT pooling attention: long query axis (up to ~72k
# tokens), full-K VMEM residency, and the decomposed relative-position
# bias folded in as a LOW-RANK factor pair.
#
# Why (r3 device reasoning, mirrors the THAT finding): at MViT-v2-S
# stage-1/2 shapes the XLA path materializes (B, H, Nq, Nk) logits, the
# rel-pos bias, exp and weights in HBM — ~5 GB of matrix-shaped tensors
# per forward at bs2, several passes each. The bias is
#   bias[q, k] = r_cat[q, :] @ scatter[:, k]
# (models/video/mvit.py::_add_rel_pos) with inner dim m = k_t+k_h+k_w
# (~40-50), so the kernel can rebuild any (TQ, K) bias tile from a
# (TQ, m) strip and a tiny static (m, K) matrix — no bias-sized HBM
# tensor ever exists. Key-padding is folded into the same factors (a
# constant `ones` column in R against a 0/-1e30 mask row in S).
#
# Grid = (B*H, q-tiles), q-tiles innermost, K/V block index constant in
# the inner dim — Mosaic keeps K/V resident per (b, h) while q streams.
# --------------------------------------------------------------------- #

def _tiled_kernel(q_ref, k_ref, v_ref, r_ref, s_ref, o_ref, *, scale):
    qh = q_ref[0, 0]                                 # (D, TQ)
    kh = k_ref[0, 0]                                 # (D, K)
    vh = v_ref[0, 0]                                 # (D, K)
    logits = jax.lax.dot_general(
        qh, kh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (TQ, K)
    bias = jax.lax.dot_general(
        r_ref[0, 0], s_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TQ, K)
    logits = logits + bias
    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - m)
    w = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)).astype(vh.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        vh, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def flash_attention_lowrank_bias(q, k, v, r=None, s=None, *,
                                 scale: float | None = None,
                                 q_tile: int = 256,
                                 interpret: bool | None = None):
    """softmax(q k^T * scale + r @ s) v with the q axis tiled.

    q: (B, H, Nq, D); k/v: (B, H, Nk, D); r: (B, H, Nq, M); s: (M, Nk) —
    the additive bias is r @ s per (b, h). Pass r=None for plain attention.
    Returns (B, H, Nq, D) in q's dtype; bias math is always f32.
    """
    if interpret is None:
        interpret = not _on_tpu()
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    def _pad_to(x, m):
        return -(-x // m) * m

    nq_p = _pad_to(nq, q_tile)
    nk_p = _pad_to(nk, 128)
    if r is None:
        r = jnp.zeros((b, h, nq, 0), jnp.float32)
        s = jnp.zeros((0, nk), jnp.float32)
    # fold the key-padding mask into the factors: R gains a constant `ones`
    # column, S the matching 0 (valid) / -1e30 (padded key) row
    mask_row = jnp.concatenate(
        [jnp.zeros((1, nk), jnp.float32),
         jnp.full((1, nk_p - nk), -1e30, jnp.float32)], axis=1)
    r = jnp.concatenate(
        [r.astype(jnp.float32), jnp.ones((b, h, nq, 1), jnp.float32)],
        axis=-1)
    s = jnp.concatenate(
        [jnp.pad(s.astype(jnp.float32), ((0, 0), (0, nk_p - nk))),
         mask_row], axis=0)
    m_dim = r.shape[-1]
    m_p = _pad_to(m_dim, 8)
    r = jnp.pad(r, ((0, 0), (0, 0), (0, nq_p - nq), (0, m_p - m_dim)))
    s = jnp.pad(s, ((0, m_p - m_dim), (0, 0)))

    qt = jnp.pad(q, ((0, 0), (0, 0), (0, nq_p - nq), (0, 0)))
    kt = jnp.pad(k, ((0, 0), (0, 0), (0, nk_p - nk), (0, 0)))
    vt = jnp.pad(v, ((0, 0), (0, 0), (0, nk_p - nk), (0, 0)))
    qt = qt.transpose(0, 1, 3, 2)                    # (B, H, D, Nq_p)
    kt = kt.transpose(0, 1, 3, 2)
    vt = vt.transpose(0, 1, 3, 2)
    rt = r.transpose(0, 1, 3, 2)                     # (B, H, M', Nq_p)

    n_qt = nq_p // q_tile
    kernel = functools.partial(_tiled_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, n_qt),
        in_specs=[
            pl.BlockSpec((1, 1, d, q_tile),
                         lambda i, j: (i // h, i % h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, nk_p),
                         lambda i, j: (i // h, i % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, nk_p),
                         lambda i, j: (i // h, i % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_p, q_tile),
                         lambda i, j: (i // h, i % h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_p, nk_p), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, d, q_tile),
                               lambda i, j: (i // h, i % h, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, d, nq_p), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, rt, s)
    return out.transpose(0, 1, 3, 2)[:, :, :nq]      # (B, H, Nq, D)


def flash_attention_lowrank_bias_reference(q, k, v, r=None, s=None, *,
                                           scale: float | None = None):
    """jnp oracle for the tiled kernel (same math, unfused)."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if r is not None:
        logits = logits + jnp.einsum(
            "bhqm,mk->bhqk", r.astype(jnp.float32), s.astype(jnp.float32),
            preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
