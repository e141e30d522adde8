"""Video Swin Transformer (Swin3D-T / Swin3D-S).

Reference wrappers: benchmark/video/model/swin_t.py:23-51 / swin_s.py:22-50 —
torchvision ``swin3d_t``/``swin3d_s`` Kinetics backbones + Linear(400 -> out)
head. Full architecture natively in JAX:

  - PatchEmbed3D: conv patchify (2,4,4) -> embed_dim, LayerNorm;
  - 4 stages of Swin blocks: 3D window attention (window (8,7,7)) with
    learned relative position bias, alternating zero-shift / half-shift
    (cyclic roll + static region mask), MLP(ratio 4, GELU), pre-LN residuals,
    stochastic depth;
  - PatchMerging between stages (2x2 spatial concat -> LayerNorm -> Linear);
  - final LayerNorm, global mean pool, fc to 400, task head.

TPU notes: window partitioning is pure reshape/transpose (free for XLA); the
(nW, win^3, C) attention batches map onto the MXU as batched matmuls. The
shift mask is computed once in numpy at trace time — no dynamic control flow.
"""

from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...nn.layers import Linear


Window = Tuple[int, int, int]


def _pad_to_multiple(x, window: Window):
    _, t, h, w, _ = x.shape
    pt = (-t) % window[0]
    ph = (-h) % window[1]
    pw = (-w) % window[2]
    if pt or ph or pw:
        x = jnp.pad(x, ((0, 0), (0, pt), (0, ph), (0, pw), (0, 0)))
    return x


def window_partition(x, window: Window):
    """(B, T, H, W, C) -> (B*nW, wt*wh*ww, C)."""
    b, t, h, w, c = x.shape
    wt, wh, ww = window
    x = x.reshape(b, t // wt, wt, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wt * wh * ww, c)


def window_reverse(windows, window: Window, b, t, h, w):
    wt, wh, ww = window
    c = windows.shape[-1]
    x = windows.reshape(b, t // wt, h // wh, w // ww, wt, wh, ww, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t, h, w, c)


def _relative_position_index(window: Window) -> np.ndarray:
    """(N, N) flat index into the bias table for every token pair."""
    coords = np.stack(np.meshgrid(*[np.arange(s) for s in window],
                                  indexing="ij"))          # (3, wt, wh, ww)
    flat = coords.reshape(3, -1)                           # (3, N)
    rel = flat[:, :, None] - flat[:, None, :]              # (3, N, N)
    rel = rel.transpose(1, 2, 0)                           # (N, N, 3)
    rel[..., 0] += window[0] - 1
    rel[..., 1] += window[1] - 1
    rel[..., 2] += window[2] - 1
    rel[..., 0] *= (2 * window[1] - 1) * (2 * window[2] - 1)
    rel[..., 1] *= 2 * window[2] - 1
    return rel.sum(-1)


def _shift_window_ids(dims: Tuple[int, int, int], window: Window,
                      shift: Window) -> np.ndarray:
    """(nW, N) int32 region ids per window token for the shifted layout.

    Pure numpy at trace time. The additive (nW, N, N) mask is derived
    ON DEVICE from these ids (see _shift_mask / SwinBlock3D) — baking the
    full float mask as a constant is ~100 MB at 224^2 resolution and
    overflows program-size limits.
    """
    t, h, w = dims
    img = np.zeros((1, t, h, w, 1))
    cnt = 0
    slices = []
    for size, win, sh in zip(dims, window, shift):
        slices.append([slice(0, -win), slice(-win, -sh), slice(-sh, None)]
                      if sh else [slice(None)])
    for st, sh_, sw in itertools.product(*slices):
        img[:, st, sh_, sw, :] = cnt
        cnt += 1
    wt, wh, ww = window
    ids = img.reshape(1, t // wt, wt, h // wh, wh, w // ww, ww, 1)
    ids = ids.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return ids.reshape(-1, wt * wh * ww).astype(np.int32)


def _shift_mask(dims: Tuple[int, int, int], window: Window,
                shift: Window) -> np.ndarray:
    """(nW, N, N) additive mask (0 same-region, -100 cross-region)."""
    win_ids = _shift_window_ids(dims, window, shift)
    mask = win_ids[:, None, :] - win_ids[:, :, None]
    return np.where(mask == 0, 0.0, -100.0).astype(np.float32)


class WindowAttention3D(nn.Module):
    dim: int
    num_heads: int
    window: Window                 # clipped to the input dims
    full_window: Window = (8, 7, 7)  # configured window (sizes the table)
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, ids=None, deterministic: bool = True):
        """ids: compact (nW, N) int32 region-id table for the shifted layout
        (None for unshifted blocks); the additive -100 mask is expanded from
        it in-graph, where XLA fuses it into the logits add."""
        bn, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = Linear(3 * c, xavier=False, name="qkv")(x)
        qkv = qkv.reshape(bn, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                    # (bn, h, n, d)
        # the table is ALWAYS sized to the full configured window and the
        # pair index subset to the clipped token count ([:n, :n]) — exactly
        # torchvision's scheme, so pretrained tables convert at any clip size
        table_size = ((2 * self.full_window[0] - 1)
                      * (2 * self.full_window[1] - 1)
                      * (2 * self.full_window[2] - 1))
        bias_table = self.param("rel_pos_bias",
                                nn.initializers.truncated_normal(0.02),
                                (table_size, h))
        idx = _relative_position_index(self.full_window)[:n, :n].reshape(-1)
        bias = bias_table[idx].reshape(n, n, h).transpose(2, 0, 1)
        # Plain XLA attention. A fused Pallas window-attention kernel was
        # built and measured in rounds 1-2 and DELETED: at d=32 the MXU runs
        # at 32/128 contraction utilization, so the batched einsum is already
        # compute-bound and its (BW, H, N, N) logits HBM traffic hides behind
        # the matmul — fusion has no headroom (BASELINE.md "Window attention
        # kernel post-mortem"). The -100 shift mask is an elementwise
        # producer XLA fuses into this add; it is never materialized.
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) / jnp.sqrt(d)
        attn = attn + bias[None]
        if ids is not None:
            nw = ids.shape[0]
            mask = jnp.where(ids[:, None, :] == ids[:, :, None],
                             0.0, -100.0)
            attn = attn.reshape(bn // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(bn, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(bn, n, c)
        out = Linear(c, xavier=False, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=deterministic)(out)


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


class SwinBlock3D(nn.Module):
    dim: int
    num_heads: int
    window: Window = (8, 7, 7)
    shifted: bool = False
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        b, t, h, w, c = x.shape
        window = tuple(min(ws, s) for ws, s in zip(self.window, (t, h, w)))
        shift = tuple(ws // 2 if self.shifted and ws < s else 0
                      for ws, s in zip(window, (t, h, w)))

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = _pad_to_multiple(x, window)
        _, tp, hp, wp, _ = x.shape
        if any(shift):
            x = jnp.roll(x, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            # keep only the small (nW, N) id table as a constant; the dense
            # additive mask is expanded on device (XLA path) or reconstructed
            # in-kernel from the ids (Pallas path) — never baked as a ~100 MB
            # trace constant
            ids = jnp.asarray(_shift_window_ids((tp, hp, wp), window, shift))
        else:
            ids = None
        windows = window_partition(x, window)
        attn = WindowAttention3D(self.dim, self.num_heads, window,
                                 full_window=self.window,
                                 name="attn")(windows, ids, det)
        x = window_reverse(attn, window, b, tp, hp, wp)
        if any(shift):
            x = jnp.roll(x, shift, axis=(1, 2, 3))
        x = x[:, :t, :h, :w]
        x = shortcut + DropPath(self.drop_path, name="dp1")(x, det)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = Linear(int(c * self.mlp_ratio), xavier=False, name="mlp_up")(y)
        y = nn.gelu(y)
        y = Linear(c, xavier=False, name="mlp_down")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, det)


class PatchMerging3D(nn.Module):
    """2x2 spatial merge: concat 4 neighbors -> LayerNorm -> Linear(2C)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            _, _, h, w, _ = x.shape
        # torchvision neighbor order: (h, w) offsets (0,0),(1,0),(0,1),(1,1)
        # (swin PatchMerging x0..x3) — weight converters depend on it
        parts = [x[:, :, i::2, j::2] for j in (0, 1) for i in (0, 1)]
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return Linear(2 * self.dim, use_bias=False, xavier=False,
                      name="reduction")(x)


class Swin3D(nn.Module):
    """Swin3D backbone + task head. T: depths (2,2,6,2); S: (2,2,18,2)."""
    out_features: int
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: Window = (8, 7, 7)
    patch: Window = (2, 4, 4)
    backbone_classes: int = 400
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # patch embed: torchvision pads T/H/W up to a patch multiple first
        # (PatchEmbed3d) — at WiMANS dims T=45 this keeps token counts equal
        pads = [(-s) % p for s, p in zip(x.shape[1:4], self.patch)]
        if any(pads):
            x = jnp.pad(x, ((0, 0), (0, pads[0]), (0, pads[1]),
                            (0, pads[2]), (0, 0)))
        x = nn.Conv(self.embed_dim, self.patch, strides=self.patch,
                    padding="VALID", name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        total = sum(self.depths)
        rates = np.linspace(0, self.drop_path_rate, total)
        k = 0
        dim = self.embed_dim
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for blk in range(depth):
                x = SwinBlock3D(dim, heads, self.window, shifted=blk % 2 == 1,
                                drop_path=float(rates[k]),
                                name=f"stage{stage}_block{blk}")(x, train)
                k += 1
            if stage < len(self.depths) - 1:
                x = PatchMerging3D(dim, name=f"merge{stage}")(x)
                dim *= 2
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2, 3))
        x = Linear(self.backbone_classes, xavier=False, name="fc")(x)
        return Linear(self.out_features, xavier=False, name="head")(x)


def swin3d_t(out_features: int) -> Swin3D:
    return Swin3D(out_features, depths=(2, 2, 6, 2))


def swin3d_s(out_features: int) -> Swin3D:
    return Swin3D(out_features, depths=(2, 2, 18, 2))
