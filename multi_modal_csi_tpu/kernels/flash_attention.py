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

import contextlib
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


# Trace-time flash override. The use-flash gates are PYTHON decisions made
# while tracing, keyed (in "auto") on the HOST platform — wrong for
# jax.export, where the artifact's target platform is not the host's:
# a CPU-host export targeting TPU must trace the Mosaic kernels ("on"),
# and a portable multi-platform artifact must trace the pure-XLA path
# ("off", since a Mosaic custom call cannot run on CPU). core/export.py
# sets this; live execution keeps "auto".
_FLASH_MODE = "auto"          # "auto" | "on" | "off"


@contextlib.contextmanager
def flash_mode(mode: str):
    """Force the flash gates for the duration: "on" traces the Pallas
    kernels with compiled (Mosaic) lowering regardless of host platform,
    "off" traces the XLA paths, "auto" restores platform-keyed gating."""
    global _FLASH_MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"flash_mode must be auto/on/off, got {mode!r}")
    prev, _FLASH_MODE = _FLASH_MODE, mode
    try:
        yield
    finally:
        _FLASH_MODE = prev


def flash_resolved(auto_decision: bool) -> bool:
    """Shape/dropout qualifications stay with the caller; this resolves
    only the platform-keyed part of a use-flash gate."""
    if _FLASH_MODE == "auto":
        return auto_decision
    return _FLASH_MODE == "on"


def _default_interpret() -> bool:
    # "on" means compiled (Mosaic) lowering even off-TPU (export tracing)
    if _FLASH_MODE == "on":
        return False
    return not _on_tpu()


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
        interpret = _default_interpret()
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


def _bwd_kernel_plain(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                      *, scale: float, bb: int, heads: int):
    """Backward for the batched-cell THAT-family kernel: N is small enough
    that each (b, h)'s full (Nq, Nk) weight tile fits VMEM, so the cell
    rebuilds softmax directly (no saved stats) and emits all three grads."""
    def body(b, carry):
        for h in range(heads):
            qh = q_ref[b, h]                         # (D, Nq)
            kh = k_ref[b, h]                         # (D, Nk)
            vh = v_ref[b, h]                         # (D, Nk)
            doh = do_ref[b, h]                       # (D, Nq)
            logits = jax.lax.dot_general(
                qh, kh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            unnorm = jnp.exp(logits - m)
            w = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)
            dw = jax.lax.dot_general(
                doh, vh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (Nq, Nk)
            dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
            dq_ref[b, h] = jax.lax.dot_general(
                kh, dl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk_ref[b, h] = jax.lax.dot_general(
                qh, dl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dv_ref[b, h] = jax.lax.dot_general(
                doh, w.astype(doh.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, bb, body, 0)


def _plain_fwd(q, k, v, batch_block, interpret):
    return flash_attention(q, k, v, batch_block=batch_block,
                           interpret=interpret), (q, k, v)


def _plain_bwd(batch_block, interpret, res, do):
    q, k, v = res
    if interpret is None:
        interpret = _default_interpret()
    b, nq, h, d = q.shape
    nk = k.shape[1]
    item = jnp.dtype(q.dtype).itemsize
    sub = 8 if item == 4 else 16
    # VMEM per batch row: inputs q/do (Nq) + k/v (Nk) at the INPUT itemsize,
    # outputs dq (Nq) + dk/dv (Nk) ALWAYS f32 (4 bytes, sublane 8). The
    # previous formula costed the outputs at the input itemsize, which
    # under-budgeted bf16 by ~2x and Mosaic stack-OOMed at THAT_ENCODER's
    # left-stream shape (bf16 (64, 10, 27, 150): 17.5M vs the 16M scoped
    # limit — observed r3 while f32, correctly shrunk to bb=4, compiled).
    nq_p, nk_p = _pad_to(nq, 128), _pad_to(nk, 128)
    per_b = (h * _pad_to(d, sub) * 2 * (nq_p + nk_p) * item
             + h * _pad_to(d, 8) * (nq_p + 2 * nk_p) * 4)
    temps = 3 * _pad_to(nq, 8) * nk_p * 4
    budget = 12 * 1024 * 1024
    bb = batch_block
    while bb > 1 and bb * per_b + temps > budget:
        bb //= 2
    while b % bb:
        bb //= 2
    bb = max(bb, 1)
    if bb * per_b + temps > budget:
        # a single batch row would still overflow scoped VMEM — take the
        # XLA oracle's VJP (same math, unfused) instead of risking the
        # Mosaic stack OOM; grads are identical up to f32 summation order
        _, vjp = jax.vjp(flash_attention_reference, q, k, v)
        return vjp(do)
    scale = 1.0 / math.sqrt(d)

    qt = q.transpose(0, 2, 3, 1)                 # (B, H, D, Nq)
    kt = k.transpose(0, 2, 3, 1)
    vt = v.transpose(0, 2, 3, 1)
    dot = do.astype(q.dtype).transpose(0, 2, 3, 1)
    kernel = functools.partial(_bwd_kernel_plain, scale=scale, bb=bb,
                               heads=h)

    def spec(n):
        return pl.BlockSpec((bb, h, d, n), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    dq_t, dk_t, dv_t = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=[spec(nq), spec(nk), spec(nk), spec(nq)],
        out_specs=[spec(nq), spec(nk), spec(nk)],
        out_shape=[jax.ShapeDtypeStruct((b, h, d, nq), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, d, nk), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, d, nk), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt, dot)
    return (dq_t.transpose(0, 3, 1, 2).astype(q.dtype),
            dk_t.transpose(0, 3, 1, 2).astype(k.dtype),
            dv_t.transpose(0, 3, 1, 2).astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_plain_diff(q, k, v, batch_block, interpret):
    return flash_attention(q, k, v, batch_block=batch_block,
                           interpret=interpret)


_flash_plain_diff.defvjp(_plain_fwd, _plain_bwd)


def flash_attention_trainable(q, k, v, *, batch_block: int = 8,
                              interpret: bool | None = None):
    """Differentiable THAT-family flash attention (custom_vjp): the Pallas
    backward rebuilds each (b, h) weight tile from VMEM (no saved stats, no
    (Nq, Nk) HBM tensors). Gradients equal jax.grad of the XLA path up to
    f32 summation order."""
    return _flash_plain_diff(q, k, v, batch_block, interpret)


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

def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _fold_pad(q, k, v, r, s, q_tile: int):
    """Shared fwd/bwd preprocessing for the tiled low-rank-bias kernels:
    normalize an absent bias to an empty factor pair, fold the key-padding
    mask into the factors (R gains a constant `ones` column, S the matching
    0 / -1e30 row), pad every axis to its tile multiple and transpose to
    the kernel's (B, H, minor, N) layouts."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    nq_p = _pad_to(nq, q_tile)
    nk_p = _pad_to(nk, 128)
    if r is None:
        r = jnp.zeros((b, h, nq, 0), jnp.float32)
        s = jnp.zeros((0, nk), jnp.float32)
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
    return qt, kt, vt, rt, s, (b, h, nq, d, nk, nq_p, nk_p, m_p)


def _tiled_kernel(q_ref, k_ref, v_ref, r_ref, s_ref, o_ref, lse_ref, *,
                  scale):
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
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    w = (unnorm / denom).astype(vh.dtype)
    o_ref[0, 0] = jax.lax.dot_general(
        vh, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)
    # per-row log-sum-exp, broadcast across the 8-sublane minor dim (the
    # (TQ, 8) layout keeps the block tiling legal) — consumed by the flash
    # backward
    lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(denom),
                                     (qh.shape[1], 8))


def flash_attention_lowrank_bias(q, k, v, r=None, s=None, *,
                                 scale: float | None = None,
                                 q_tile: int = 256,
                                 interpret: bool | None = None,
                                 return_lse: bool = False):
    """softmax(q k^T * scale + r @ s) v with the q axis tiled.

    q: (B, H, Nq, D); k/v: (B, H, Nk, D); r: (B, H, Nq, M); s: (M, Nk) —
    the additive bias is r @ s per (b, h). Pass r=None for plain attention.
    Returns (B, H, Nq, D) in q's dtype; bias math is always f32. With
    return_lse, also returns the per-row log-sum-exp in the kernel's
    (B, H, Nq_p, 8) broadcast layout (consumed by the flash backward).
    """
    if interpret is None:
        interpret = _default_interpret()
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    qt, kt, vt, rt, s, dims = _fold_pad(q, k, v, r, s, q_tile)
    b, h, nq, d, nk, nq_p, nk_p, m_p = dims

    n_qt = nq_p // q_tile
    kernel = functools.partial(_tiled_kernel, scale=scale)
    out, lse = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, 1, d, q_tile),
                         lambda i, j: (i // h, i % h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q_tile, 8),
                         lambda i, j: (i // h, i % h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, d, nq_p), q.dtype),
                   jax.ShapeDtypeStruct((b, h, nq_p, 8), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt, rt, s)
    out = out.transpose(0, 1, 3, 2)[:, :, :nq]       # (B, H, Nq, D)
    if return_lse:
        return out, lse
    return out


# --------------------------------------------------------------------- #
# Flash BACKWARD for the tiled low-rank-bias attention (r3): training-mode
# support without ever materializing an (Nq, Nk) matrix in HBM.
#
# Standard flash-backward structure, simplified by this kernel family's
# full-K softmax: the forward emits per-row LSE (no streaming stats), and
# the backward uses the delta identity
#     sum_k dW[q,k] W[q,k] = sum_d dO[q,d] O[q,d]
# so each tile needs only W = exp(logits - lse) and dL = W * (dW - delta)
# — peak two (TQ, TK) f32 temporaries. Two kernels:
#   - dQ/dR: K fully VMEM-resident per (b, h), streams q-tiles, per-tile
#     outputs;
#   - dK/dV/dS: grid (b*h, k-tiles, q-tiles) with q innermost — dK/dV/dS
#     blocks stay VMEM-resident per (b, h, k-tile) and accumulate across
#     q-tiles (init at j == 0).
# Rebuilt-tile FLOPs are ~free (VMEM-fed MXU); what this saves vs the XLA
# backward is every HBM pass over (Nq, Nk) weight/grad matrices (100s of
# MB each at MViT stage-1/2 shapes). Gradients equal the exact softmax
# math up to f32 tile-summation order.
# --------------------------------------------------------------------- #

def _bwd_tile_wdl(q_ref, k_ref, v_ref, r_ref, s_ref, do_ref, lse_ref,
                  dlt_ref, *, scale):
    """Rebuild (w, dl, doh) for one (q-tile, k-tile) from saved row stats."""
    qh = q_ref[0, 0]                                 # (D, TQ)
    kh = k_ref[0, 0]                                 # (D, TK)
    vh = v_ref[0, 0]                                 # (D, TK)
    doh = do_ref[0, 0]                               # (D, TQ)
    lse = lse_ref[0, 0][:, 0:1]                      # (TQ, 1)
    delta = dlt_ref[0, 0][:, 0:1]                    # (TQ, 1)
    logits = jax.lax.dot_general(
        qh, kh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (TQ, TK)
    logits = logits + jax.lax.dot_general(
        r_ref[0, 0], s_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    w = jnp.exp(logits - lse)                        # (TQ, TK) f32
    dw = jax.lax.dot_general(
        doh, vh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TQ, TK)
    dl = w * (dw - delta)
    return w, dl, doh, qh


def _tiled_bwd_dq_kernel(q_ref, k_ref, v_ref, r_ref, s_ref, do_ref,
                         lse_ref, dlt_ref, dq_ref, dr_ref, *, scale):
    _, dl, _, _ = _bwd_tile_wdl(q_ref, k_ref, v_ref, r_ref, s_ref, do_ref,
                                lse_ref, dlt_ref, scale=scale)
    dq_ref[0, 0] = jax.lax.dot_general(
        k_ref[0, 0], dl, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (D, TQ)
    dr_ref[0, 0] = jax.lax.dot_general(
        s_ref[...], dl, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (M', TQ)


def _tiled_bwd_dkv_kernel(q_ref, k_ref, v_ref, r_ref, s_ref, do_ref,
                          lse_ref, dlt_ref, dk_ref, dv_ref, ds_ref, *,
                          scale):
    w, dl, doh, qh = _bwd_tile_wdl(q_ref, k_ref, v_ref, r_ref, s_ref,
                                   do_ref, lse_ref, dlt_ref, scale=scale)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)
        ds_ref[...] = jnp.zeros(ds_ref.shape, ds_ref.dtype)

    dv_ref[0, 0] += jax.lax.dot_general(
        doh, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (D, TK)
    dk_ref[0, 0] += jax.lax.dot_general(
        qh, dl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (D, TK)
    ds_ref[0, 0] += jax.lax.dot_general(
        r_ref[0, 0], dl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (M', TK)


def _bwd_dq_tile(nk_p: int, d: int, m_p: int, want: int) -> int:
    """Largest q-tile (>=128, /128) for the dQ/dR kernel: resident K/V + s
    + ~2.2 (TQ, K) f32 temporaries under the VMEM budget."""
    budget = 12 * 1024 * 1024
    fixed = (2 * d * nk_p + m_p * nk_p) * 4
    tq = max(want, 128)
    while tq > 128 and fixed + 2.2 * tq * nk_p * 4 > budget:
        tq //= 2
    return tq


def _bwd_k_tile(nk_p: int, d: int, m_p: int, tq: int) -> int:
    """Largest k-tile (a /128 divisor of nk_p) for the dK/dV/dS kernel:
    resident k/v/dk/dv/s/ds per k-tile + ~2.2 (TQ, TK) temporaries."""
    budget = 12 * 1024 * 1024

    def cost(tk):
        return (4 * d * tk + 2 * m_p * tk) * 4 + 2.2 * tq * tk * 4

    for n in range(1, nk_p // 128 + 1):
        if nk_p % (n * 128) == 0:
            tk = nk_p // n
            if tk % 128 == 0 and cost(tk) <= budget:
                return tk
    return 128


def _flash_lowrank_fwd(q, k, v, r, s, scale, q_tile, interpret):
    out, lse = flash_attention_lowrank_bias(
        q, k, v, r, s, scale=scale, q_tile=q_tile, interpret=interpret,
        return_lse=True)
    return out, (q, k, v, r, s, out, lse)


def _flash_lowrank_bwd(scale, q_tile, interpret, res, do):
    q, k, v, r, s, out, lse = res
    if interpret is None:
        interpret = _default_interpret()
    b, h, nq, d = q.shape
    had_bias = r is not None
    m_orig = r.shape[-1] if had_bias else 0
    nk_orig = k.shape[2]
    m_p0 = _pad_to(m_orig + 1, 8)
    nk_p0 = _pad_to(nk_orig, 128)

    tq = _bwd_dq_tile(nk_p0, d, m_p0, q_tile)
    qt, kt, vt, rt, sp, dims = _fold_pad(q, k, v, r, s, tq)
    _, _, _, _, nk, nq_p, nk_p, m_p = dims
    dot = jnp.pad(do.astype(q.dtype),
                  ((0, 0), (0, 0), (0, nq_p - nq), (0, 0))
                  ).transpose(0, 1, 3, 2)            # (B, H, D, Nq_p)
    # delta[q] = sum_d do[q, d] * out[q, d], in the (B, H, Nq_p, 8)
    # broadcast layout the kernels read row stats in
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, nq_p - nq)))
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (8,))
    if lse.shape[2] != nq_p:      # fwd ran at a different q_tile padding
        lse = jnp.pad(lse[:, :, :min(lse.shape[2], nq_p)],
                      ((0, 0), (0, 0),
                       (0, max(0, nq_p - lse.shape[2])), (0, 0)))

    n_qt = nq_p // tq

    def qspec(minor):
        return pl.BlockSpec((1, 1, minor, tq),
                            lambda i, j: (i // h, i % h, 0, j),
                            memory_space=pltpu.VMEM)

    def rowspec():
        return pl.BlockSpec((1, 1, tq, 8),
                            lambda i, j: (i // h, i % h, j, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_tiled_bwd_dq_kernel, scale=scale)
    dq_t, dr_t = pl.pallas_call(
        kernel,
        grid=(b * h, n_qt),
        in_specs=[
            qspec(d),
            pl.BlockSpec((1, 1, d, nk_p), lambda i, j: (i // h, i % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, nk_p), lambda i, j: (i // h, i % h, 0, 0),
                         memory_space=pltpu.VMEM),
            qspec(m_p),
            pl.BlockSpec((m_p, nk_p), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            qspec(d), rowspec(), rowspec(),
        ],
        out_specs=[qspec(d), qspec(m_p)],
        out_shape=[jax.ShapeDtypeStruct((b, h, d, nq_p), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, m_p, nq_p), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt, rt, sp, dot, lse, delta)

    # dK/dV/dS: grid (b*h, k-tiles, q-tiles), q innermost so the dk/dv/ds
    # blocks stay resident per (b, h, k-tile) while q streams
    tk = _bwd_k_tile(nk_p, d, m_p, tq)
    n_kt = nk_p // tk

    def qspec3(minor):
        return pl.BlockSpec((1, 1, minor, tq),
                            lambda i, kk, j: (i // h, i % h, 0, j),
                            memory_space=pltpu.VMEM)

    def kspec3(minor):
        return pl.BlockSpec((1, 1, minor, tk),
                            lambda i, kk, j: (i // h, i % h, 0, kk),
                            memory_space=pltpu.VMEM)

    def rowspec3():
        return pl.BlockSpec((1, 1, tq, 8),
                            lambda i, kk, j: (i // h, i % h, j, 0),
                            memory_space=pltpu.VMEM)

    kernel2 = functools.partial(_tiled_bwd_dkv_kernel, scale=scale)
    dk_t, dv_t, ds_bh = pl.pallas_call(
        kernel2,
        grid=(b * h, n_kt, n_qt),
        in_specs=[
            qspec3(d), kspec3(d), kspec3(d), qspec3(m_p),
            pl.BlockSpec((m_p, tk), lambda i, kk, j: (0, kk),
                         memory_space=pltpu.VMEM),
            qspec3(d), rowspec3(), rowspec3(),
        ],
        out_specs=[kspec3(d), kspec3(d), kspec3(m_p)],
        out_shape=[jax.ShapeDtypeStruct((b, h, d, nk_p), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, d, nk_p), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, m_p, nk_p), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt, rt, sp, dot, lse, delta)

    dq = dq_t.transpose(0, 1, 3, 2)[:, :, :nq].astype(q.dtype)
    dk = dk_t.transpose(0, 1, 3, 2)[:, :, :nk_orig].astype(k.dtype)
    dv = dv_t.transpose(0, 1, 3, 2)[:, :, :nk_orig].astype(v.dtype)
    if had_bias:
        # drop the appended mask column/row and the tile padding
        dr = dr_t.transpose(0, 1, 3, 2)[:, :, :nq, :m_orig].astype(r.dtype)
        ds = jnp.sum(ds_bh, axis=(0, 1))[:m_orig, :nk_orig].astype(s.dtype)
    else:
        dr, ds = None, None
    return dq, dk, dv, dr, ds


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_lowrank_diff(q, k, v, r, s, scale, q_tile, interpret):
    return flash_attention_lowrank_bias(q, k, v, r, s, scale=scale,
                                        q_tile=q_tile, interpret=interpret)


_flash_lowrank_diff.defvjp(_flash_lowrank_fwd, _flash_lowrank_bwd)


def flash_attention_lowrank_bias_trainable(q, k, v, r=None, s=None, *,
                                           scale: float | None = None,
                                           q_tile: int = 256,
                                           interpret: bool | None = None):
    """Differentiable tiled low-rank-bias flash attention.

    Same contract as `flash_attention_lowrank_bias`, plus a flash BACKWARD
    (custom_vjp): cotangents for q/k/v and the bias factors r/s are computed
    tile-wise from VMEM-resident K/V without materializing any (Nq, Nk)
    matrix in HBM. Use in training; gradients equal jax.grad of the XLA
    reference path up to f32 tile-summation order.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_lowrank_diff(q, k, v, r, s, scale, q_tile, interpret)


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
