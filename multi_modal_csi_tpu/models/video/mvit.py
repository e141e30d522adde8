"""MViT: Multiscale Vision Transformer for video (v1 and v2 variants).

Reference wrappers: benchmark/video/model/mvit_v1.py:22-63 / mvit_v2.py:22-63
— torchvision ``mvit_v1_b``/``mvit_v2_s`` + rebuilt positional encoding sized
to the actual clip dims (v1, mvit_v1.py:36-45) + Linear(400 -> out) head.

Faithful native implementation of torchvision's module graph so Kinetics-400
checkpoints convert losslessly (tools/convert_torchvision.py):

  - conv patchify (3,7,7)/(2,4,4)/pad(1,3,3) -> class token prepended;
  - v1: absolute positional encoding split into spatial/temporal/class
    tables (sized from the traced input, reproducing the reference's
    rebuild-per-clip-size behavior);
  - 16 pooling-attention blocks in 4 stages (1,2,11,2): packed QKV, per-head
    depthwise-conv pooling (kernel 3, LayerNorm after) on Q at stage
    transitions and on K/V everywhere (stride 8/4/2/1 per stage), max-pool
    on the residual path, channel width 96->192->384->768;
  - v1 widens in the MLP of the last block of a stage (proj_after_attn
    False); v2 widens in the attention of the first block of a stage
    (proj_after_attn True), adds residual pooling (Q added back, class token
    excluded) and decomposed relative position embeddings over t/h/w;
  - final LayerNorm, class-token readout, Dropout(0.5) + Linear(400), then
    the fresh task head.

TPU notes: all pooling convs are (3,3,3) depthwise — XLA maps them to cheap
VPU ops; attention matmuls run on the MXU with f32 accumulation; every shape
is static under jit (rel-pos distance tables are trace-time numpy).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...nn.layers import Linear

THW = Tuple[int, int, int]


class BlockCfg(NamedTuple):
    in_ch: int
    out_ch: int
    heads: int
    q_stride: THW
    kv_stride: THW
    has_pool_q: bool


def _block_configs(variant: str) -> Sequence[BlockCfg]:
    """torchvision mvit_v1_b / mvit_v2_s block settings (16 blocks)."""
    stages = (1, 2, 11, 2)
    stage_heads = (1, 2, 4, 8)
    stage_kv = ((1, 8, 8), (1, 4, 4), (1, 2, 2), (1, 1, 1))
    cfgs = []
    cur = 96
    for s, (n, heads) in enumerate(zip(stages, stage_heads)):
        for b in range(n):
            first = b == 0 and s > 0
            last = b == n - 1 and s < len(stages) - 1
            in_ch = cur
            if variant == "v1":
                out_ch = cur * 2 if last else cur      # widen in MLP
            else:
                out_ch = cur * 2 if first else cur     # widen in attention
            cur = out_ch
            cfgs.append(BlockCfg(in_ch, out_ch, heads,
                                 (1, 2, 2) if first else (1, 1, 1),
                                 stage_kv[s], has_pool_q=first))
    return cfgs


def _interp_weights(src: int, dst: int):
    """torch F.interpolate(mode='linear', align_corners=False) gather plan."""
    pos = (np.arange(dst) + 0.5) * (src / dst) - 0.5
    pos = np.clip(pos, 0, src - 1)
    i0 = np.floor(pos).astype(np.int32)
    i1 = np.minimum(i0 + 1, src - 1)
    frac = (pos - i0).astype(np.float32)
    return i0, i1, frac


def interpolate_table(table, dst: int):
    """Linearly resize a (L, C) table along dim 0 (torchvision semantics)."""
    src = table.shape[0]
    if src == dst:
        return table
    i0, i1, frac = _interp_weights(src, dst)
    frac = frac[:, None]
    return table[i0] * (1.0 - frac) + table[i1] * frac


def _rel_distances(q_size: int, k_size: int) -> np.ndarray:
    """torchvision _add_rel_pos distance indices (static)."""
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    dist = (np.arange(q_size)[:, None] * q_ratio
            - np.arange(k_size)[None, :] * k_ratio
            + (k_size - 1) * k_ratio)
    return dist.astype(np.int64)       # .long() truncation, non-negative


def _rel_scatter_matrix(k_t: int, k_h: int, k_w: int) -> np.ndarray:
    """(k_t + k_h + k_w, K) 0/1 selector: row j scatters the j-th decomposed
    rel component over every key position that shares that t/h/w index."""
    kk = k_t * k_h * k_w
    s = np.zeros((k_t + k_h + k_w, kk), np.float32)
    kar = np.arange(kk)
    s[kar // (k_h * k_w), kar] = 1.0                       # t component
    s[k_t + (kar // k_w) % k_h, kar] = 1.0                 # h component
    s[k_t + k_h + kar % k_w, kar] = 1.0                    # w component
    return s


def _rel_factors(q, q_thw: THW, k_thw: THW, rel_h, rel_w, rel_t):
    """Low-rank factors of the decomposed rel-pos bias:
    bias[:, :, 1:, 1:] == r_cat @ scatter, with r_cat (B, H, qq, m) and the
    static 0/1 selector scatter (m, K), m = k_t + k_h + k_w (~40-50)."""
    q_t, q_h, q_w = q_thw
    k_t, k_h, k_w = k_thw
    Rh = interpolate_table(rel_h, 2 * max(q_h, k_h) - 1)
    Rw = interpolate_table(rel_w, 2 * max(q_w, k_w) - 1)
    Rt = interpolate_table(rel_t, 2 * max(q_t, k_t) - 1)
    Rh = Rh[_rel_distances(q_h, k_h)]          # (q_h, k_h, d)
    Rw = Rw[_rel_distances(q_w, k_w)]
    Rt = Rt[_rel_distances(q_t, k_t)]

    b, heads, _, d = q.shape
    r_q = q[:, :, 1:].reshape(b, heads, q_t, q_h, q_w, d)
    rel_h_q = jnp.einsum("bythwc,hkc->bythwk", r_q, Rh)    # (..., k_h)
    rel_w_q = jnp.einsum("bythwc,wkc->bythwk", r_q, Rw)    # (..., k_w)
    rel_t_q = jnp.einsum("bythwc,tkc->bythwk", r_q, Rt)    # (..., k_t)
    qq = q_t * q_h * q_w
    r_cat = jnp.concatenate([
        rel_t_q.reshape(b, heads, qq, k_t),
        rel_h_q.reshape(b, heads, qq, k_h),
        rel_w_q.reshape(b, heads, qq, k_w)], axis=-1)
    scatter = jnp.asarray(_rel_scatter_matrix(k_t, k_h, k_w))
    return r_cat, scatter


def _add_rel_pos(attn, q, q_thw: THW, k_thw: THW, rel_h, rel_w, rel_t):
    """Decomposed relative position bias on attn[:, :, 1:, 1:] (class token
    rows/cols excluded) — torchvision's _add_rel_pos semantics, computed as
    a one-hot-selector MATMUL instead of a broadcast-add over the 8-D
    (q_t, q_h, q_w, k_t, k_h, k_w) tensor. Reason (r3 trace): the
    broadcast-add's VJP materializes the full 8-D gradient and runs three
    reductions over non-minor axes, each behind a physical transpose —
    343 ms/step of transposes at MViT-v2's stage-1 sizes, making v2 train
    4x slower than v1. A matmul's VJP is a matmul: the scatter pattern
    becomes a static (k_t + k_h + k_w, K) 0/1 matrix contraction (a few
    GFLOP on the MXU). Numerically identical up to f32 summation order."""
    r_cat, scatter = _rel_factors(q, q_thw, k_thw, rel_h, rel_w, rel_t)
    rel = jnp.einsum("byqm,mk->byqk", r_cat, scatter,
                     preferred_element_type=jnp.float32)
    return attn.at[:, :, 1:, 1:].add(rel)


class PoolConv(nn.Module):
    """torchvision Pool with a depthwise conv: class token is split off,
    tokens conv-pooled per head, token re-attached, LayerNorm(head_dim)."""
    head_dim: int
    kernel: THW
    stride: THW

    @nn.compact
    def __call__(self, x, thw: THW):
        # x: (B, heads, 1 + T*H*W, d)
        b, heads, _, d = x.shape
        t, h, w = thw
        cls, tok = x[:, :, :1], x[:, :, 1:]
        tok = tok.reshape(b * heads, t, h, w, d)
        pad = [(k // 2, k // 2) for k in self.kernel]
        tok = nn.Conv(d, self.kernel, strides=self.stride, padding=pad,
                      feature_group_count=d, use_bias=False,
                      name="conv")(tok)
        new_thw = tok.shape[1:4]
        tok = tok.reshape(b, heads, -1, d)
        x = jnp.concatenate([cls, tok], axis=2)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x, tuple(new_thw)


def _pool_skip(x, thw: THW, stride: THW):
    """torchvision pool_skip: MaxPool3d(kernel=s+1, stride=s, pad=k//2) on
    the residual path (no params, class token preserved)."""
    b, n, c = x.shape
    t, h, w = thw
    cls, tok = x[:, :1], x[:, 1:]
    tok = tok.reshape(b, t, h, w, c)
    kernel = tuple(s + 1 if s > 1 else s for s in stride)
    pad = [(k // 2, k // 2) for k in kernel]
    tok = nn.max_pool(tok, window_shape=kernel, strides=stride, padding=pad)
    tok = tok.reshape(b, -1, c)
    return jnp.concatenate([cls, tok], axis=1)


class MultiscaleAttention(nn.Module):
    embed_dim: int
    output_dim: int
    num_heads: int
    q_stride: THW
    kv_stride: THW
    has_pool_q: bool
    residual_pool: bool
    residual_with_cls: bool
    rel_pos: bool

    @nn.compact
    def __call__(self, x, thw: THW, deterministic: bool = True):
        b, n, _ = x.shape
        heads = self.num_heads
        d = self.output_dim // heads
        qkv = Linear(3 * self.output_dim, xavier=False, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]            # (B, heads, N, d)

        # torchvision creates pool_k/pool_v whenever kernel_kv is set —
        # mvit_v1_b/mvit_v2_s set (3,3,3) on every block (stride 1 included)
        k, k_thw = PoolConv(d, (3, 3, 3), self.kv_stride,
                            name="pool_k")(k, thw)
        v, _ = PoolConv(d, (3, 3, 3), self.kv_stride, name="pool_v")(v, thw)
        q_thw = thw
        if self.has_pool_q:
            q, q_thw = PoolConv(d, (3, 3, 3), self.q_stride,
                                name="pool_q")(q, thw)

        rel_tables = None
        if self.rel_pos:
            size = max(thw[1], thw[2])
            q_sp = size // self.q_stride[1]
            kv_sp = size // self.kv_stride[1]
            rel_sp = 2 * max(q_sp, kv_sp) - 1
            init = nn.initializers.truncated_normal(0.02)
            rel_h = self.param("rel_pos_h", init, (rel_sp, d))
            rel_w = self.param("rel_pos_w", init, (rel_sp, d))
            rel_t = self.param("rel_pos_t", init, (2 * thw[0] - 1, d))
            rel_tables = (rel_h, rel_w, rel_t)

        from ...kernels.flash_attention import (
            _on_tpu, flash_attention_lowrank_bias,
            flash_attention_lowrank_bias_trainable, flash_resolved)
        nq = q.shape[2]
        # eval: flash for every qualifying stage; on CPU the interpret path
        # cross-validates the integration but is capped by nq (interpret
        # cost) — tiny-clip shapes fall through to XLA anyway.
        # TRAIN (r3): the Pallas flash BACKWARD wins 5x at the big-Nq
        # stages (stage1/2, measured tools/exp_flash_bwd.py); the small
        # late stages are sub-ms either way and keep the XLA grads.
        # flash_resolved: kernels/flash_attention.py::flash_mode export
        # override — the platform part of the gate only.
        if deterministic:
            use_flash = nq >= 256 and flash_resolved(_on_tpu() or nq <= 1024)
        else:
            use_flash = nq >= 8192 and flash_resolved(_on_tpu())
        if use_flash:
            r = s = None
            if rel_tables is not None:
                r_cat, scatter = _rel_factors(q, q_thw, k_thw, *rel_tables)
                # class-token row/col carry zero bias
                r = jnp.pad(r_cat, ((0, 0), (0, 0), (1, 0), (0, 0)))
                s = jnp.pad(scatter, ((0, 0), (1, 0)))
            fa = (flash_attention_lowrank_bias if deterministic
                  else flash_attention_lowrank_bias_trainable)
            out = fa(q, k, v, r, s)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q / math.sqrt(d), k,
                              preferred_element_type=jnp.float32)
            if rel_tables is not None:
                attn = _add_rel_pos(attn, q, q_thw, k_thw, *rel_tables)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                             preferred_element_type=jnp.float32)
        if self.residual_pool:
            if self.residual_with_cls:
                out = out + q
            else:
                out = out.at[:, :, 1:, :].add(q[:, :, 1:, :])
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.output_dim)
        out = Linear(self.output_dim, xavier=False, name="project")(out)
        return out, q_thw


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x * mask.astype(x.dtype) / keep


class MViTBlock(nn.Module):
    cfg: BlockCfg
    residual_pool: bool
    residual_with_cls: bool
    rel_pos: bool
    proj_after_attn: bool
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, thw: THW, train: bool = False):
        det = not train
        cfg = self.cfg
        attn_dim = cfg.out_ch if self.proj_after_attn else cfg.in_ch

        x_norm1 = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x_attn, new_thw = MultiscaleAttention(
            cfg.in_ch, attn_dim, cfg.heads, cfg.q_stride, cfg.kv_stride,
            cfg.has_pool_q, self.residual_pool, self.residual_with_cls,
            self.rel_pos, name="attn")(x_norm1, thw, deterministic=det)

        needs_proj = cfg.in_ch != cfg.out_ch
        if needs_proj and self.proj_after_attn:
            x = Linear(cfg.out_ch, xavier=False, name="project")(x_norm1)
        if cfg.has_pool_q:
            x = _pool_skip(x, thw, cfg.q_stride)
        x = x + DropPath(self.drop_path, name="dp1")(x_attn, det)

        x_norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = Linear(4 * attn_dim, xavier=False, name="mlp_up")(x_norm2)
        y = nn.gelu(y)
        y = Linear(cfg.out_ch, xavier=False, name="mlp_down")(y)
        if needs_proj and not self.proj_after_attn:
            x = Linear(cfg.out_ch, xavier=False, name="project")(x_norm2)
        return x + DropPath(self.drop_path, name="dp2")(y, det), new_thw


class MViT(nn.Module):
    """Multiscale ViT backbone + task head.

    v1 (mvit_v1_b): absolute pos encoding, widen-in-MLP, no residual pool;
    v2 (mvit_v2_s): decomposed rel pos, residual pool, widen-in-attention.
    Positional/rel tables are sized from the traced input — initialize at
    the clip size you train on (the reference does the same for v1,
    mvit_v1.py:36-45; converted 16x224 checkpoints are resized offline by
    tools/convert_torchvision.py).
    """
    out_features: int
    variant: str = "v1"                    # "v1" | "v2"
    embed_dim: int = 96
    patch_kernel: THW = (3, 7, 7)
    patch_stride: THW = (2, 4, 4)
    backbone_classes: int = 400
    dropout: float = 0.5
    drop_path_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, H, W, 3)
        pad = [(k // 2, k // 2) for k in self.patch_kernel]
        x = nn.Conv(self.embed_dim, self.patch_kernel,
                    strides=self.patch_stride, padding=pad,
                    name="conv_proj")(x)
        b, t, h, w, c = x.shape
        thw = (t, h, w)
        x = x.reshape(b, -1, c)

        # torchvision trunc-normals every pos_encoding param incl. the token
        cls = self.param("class_token",
                         nn.initializers.truncated_normal(0.02), (c,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c)), x], axis=1)
        if self.variant == "v1":
            sp = self.param("spatial_pos",
                            nn.initializers.truncated_normal(0.02),
                            (h * w, c))
            tp = self.param("temporal_pos",
                            nn.initializers.truncated_normal(0.02), (t, c))
            cp = self.param("class_pos",
                            nn.initializers.truncated_normal(0.02), (c,))
            pos = (jnp.repeat(tp, h * w, axis=0)
                   + jnp.tile(sp, (t, 1)))
            x = x + jnp.concatenate([cp[None], pos], axis=0)[None]

        cfgs = _block_configs(self.variant)
        rates = np.linspace(0, self.drop_path_rate, len(cfgs))
        v2 = self.variant == "v2"
        for i, cfg in enumerate(cfgs):
            x, thw = MViTBlock(cfg, residual_pool=v2,
                               residual_with_cls=False, rel_pos=v2,
                               proj_after_attn=v2,
                               drop_path=float(rates[i]),
                               name=f"block{i}")(x, thw, train)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = x[:, 0]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = Linear(self.backbone_classes, xavier=False, name="fc")(x)
        return Linear(self.out_features, xavier=False, name="head")(x)


def mvit_v1_b(out_features: int) -> MViT:
    return MViT(out_features, variant="v1")


def mvit_v2_s(out_features: int) -> MViT:
    return MViT(out_features, variant="v2")
