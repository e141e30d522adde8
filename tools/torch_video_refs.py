"""Torch replicas of the torchvision video backbones the reference wraps.

The reference's video models are thin wrappers over torchvision Kinetics-400
backbones (benchmark/video/model/{s3d,swin_t,swin_s,mvit_v1,mvit_v2}.py), but
torchvision is not installed in this environment. These modules reconstruct
the torchvision architectures in plain torch — same module graph, SAME
state-dict key names and tensor shapes as torchvision's published models — so
that

  1. ``Module().state_dict()`` doubles as a synthetic torchvision state-dict
     for structurally verifying tools/convert_torchvision.py offline, and
  2. weight-transplant numerical parity proofs (flax model vs torch replica)
     can run exactly like the CSI ones in tools/parity_check.py.

Caveat (documented, unavoidable offline): the replicas are reconstructions of
torchvision's published code, not imports of it. The converter is strict
(every source key consumed, every flax leaf filled, shapes equal), so any
divergence from a REAL torchvision checkpoint is detected, not silently
mis-mapped, the moment one is supplied.

Sources reconstructed: torchvision/models/video/{s3d.py,swin_transformer.py,
mvit.py} (v0.15 line).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import torch
from torch import nn


# ---------------------------------------------------------------------------
# S3D (torchvision/models/video/s3d.py)
# ---------------------------------------------------------------------------

class Conv3dNormAct(nn.Sequential):
    """torchvision.ops.Conv3dNormActivation: Conv3d(bias=False) + BN + ReLU."""

    def __init__(self, cin, cout, kernel, stride=(1, 1, 1), padding=(0, 0, 0)):
        super().__init__(
            nn.Conv3d(cin, cout, kernel, stride, padding, bias=False),
            nn.BatchNorm3d(cout, eps=0.001, momentum=0.001),
            nn.ReLU(inplace=True),
        )


class TemporalSeparableConv(nn.Sequential):
    def __init__(self, cin, cout, kernel, stride, padding):
        super().__init__(
            Conv3dNormAct(cin, cout, (1, kernel, kernel),
                          (1, stride, stride), (0, padding, padding)),
            Conv3dNormAct(cout, cout, (kernel, 1, 1),
                          (stride, 1, 1), (padding, 0, 0)),
        )


class SepInceptionBlock3D(nn.Module):
    def __init__(self, cin, b0, b1a, b1b, b2a, b2b, b3):
        super().__init__()
        self.branch0 = Conv3dNormAct(cin, b0, (1, 1, 1))
        self.branch1 = nn.Sequential(
            Conv3dNormAct(cin, b1a, (1, 1, 1)),
            TemporalSeparableConv(b1a, b1b, 3, 1, 1),
        )
        self.branch2 = nn.Sequential(
            Conv3dNormAct(cin, b2a, (1, 1, 1)),
            TemporalSeparableConv(b2a, b2b, 3, 1, 1),
        )
        self.branch3 = nn.Sequential(
            nn.MaxPool3d((3, 3, 3), (1, 1, 1), (1, 1, 1)),
            Conv3dNormAct(cin, b3, (1, 1, 1)),
        )

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x),
                          self.branch2(x), self.branch3(x)], dim=1)


class S3DRef(nn.Module):
    """torchvision ``s3d``; input (B, 3, T, H, W), output (B, num_classes).

    The final AvgPool3d window is clipped to the feature dims so small parity
    inputs run; at 224x224 / T>=4 it is torchvision's exact (2, 7, 7).
    """

    def __init__(self, num_classes: int = 400, dropout: float = 0.2):
        super().__init__()
        self.features = nn.Sequential(
            TemporalSeparableConv(3, 64, 7, 2, 3),                 # 0
            nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),         # 1
            Conv3dNormAct(64, 64, (1, 1, 1)),                      # 2
            TemporalSeparableConv(64, 192, 3, 1, 1),               # 3
            nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),         # 4
            SepInceptionBlock3D(192, 64, 96, 128, 16, 32, 32),     # 5
            SepInceptionBlock3D(256, 128, 128, 192, 32, 96, 64),   # 6
            nn.MaxPool3d((3, 3, 3), (2, 2, 2), (1, 1, 1)),         # 7
            SepInceptionBlock3D(480, 192, 96, 208, 16, 48, 64),    # 8
            SepInceptionBlock3D(512, 160, 112, 224, 24, 64, 64),   # 9
            SepInceptionBlock3D(512, 128, 128, 256, 24, 64, 64),   # 10
            SepInceptionBlock3D(512, 112, 144, 288, 32, 64, 64),   # 11
            SepInceptionBlock3D(528, 256, 160, 320, 32, 128, 128), # 12
            nn.MaxPool3d((2, 2, 2), (2, 2, 2), (0, 0, 0)),         # 13
            SepInceptionBlock3D(832, 256, 160, 320, 32, 128, 128), # 14
            SepInceptionBlock3D(832, 384, 192, 384, 48, 128, 128), # 15
        )
        self.classifier = nn.Sequential(
            nn.Dropout(p=dropout),
            nn.Conv3d(1024, num_classes, kernel_size=1, stride=1, bias=True),
        )

    def forward(self, x):
        x = self.features(x)
        window = tuple(min(k, s) for k, s in zip((2, 7, 7), x.shape[2:]))
        x = nn.functional.avg_pool3d(x, window, stride=1)
        x = self.classifier(x)
        return torch.mean(x, dim=(2, 3, 4))


# ---------------------------------------------------------------------------
# r3d_18 (torchvision/models/video/resnet.py)
# ---------------------------------------------------------------------------

class BasicBlock3dRef(nn.Module):
    def __init__(self, cin, cout, stride=(1, 1, 1)):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv3d(cin, cout, 3, stride, 1, bias=False),
            nn.BatchNorm3d(cout), nn.ReLU(inplace=True))
        self.conv2 = nn.Sequential(
            nn.Conv3d(cout, cout, 3, 1, 1, bias=False),
            nn.BatchNorm3d(cout))
        self.downsample = None
        if stride != (1, 1, 1) or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm3d(cout))
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = self.conv2(self.conv1(x))
        return self.relu(out + identity)


class R3D18Ref(nn.Module):
    """torchvision ``r3d_18``; input (B, 3, T, H, W)."""

    def __init__(self, num_classes: int = 400):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv3d(3, 64, (3, 7, 7), (1, 2, 2), (1, 3, 3), bias=False),
            nn.BatchNorm3d(64), nn.ReLU(inplace=True))
        dims = (64, 128, 256, 512)
        cin = 64
        for i, cout in enumerate(dims):
            stride = (1, 1, 1) if i == 0 else (2, 2, 2)
            setattr(self, f"layer{i + 1}", nn.Sequential(
                BasicBlock3dRef(cin, cout, stride),
                BasicBlock3dRef(cout, cout)))
            cin = cout
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.stem(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = x.mean(dim=(2, 3, 4))
        return self.fc(x)


# ---------------------------------------------------------------------------
# Swin3D (torchvision/models/video/swin_transformer.py)
# ---------------------------------------------------------------------------

def _compute_pad3d(size, target_multiple):
    return [(-s) % m for s, m in zip(size, target_multiple)]


class PatchEmbed3d(nn.Module):
    def __init__(self, patch_size, embed_dim):
        super().__init__()
        self.patch_size = patch_size
        self.proj = nn.Conv3d(3, embed_dim, kernel_size=patch_size,
                              stride=patch_size)
        self.norm = nn.LayerNorm(embed_dim, eps=1e-5)

    def forward(self, x):  # (B, 3, T, H, W) -> (B, T', H', W', C)
        pad = _compute_pad3d(x.shape[2:], self.patch_size)
        x = nn.functional.pad(x, (0, pad[2], 0, pad[1], 0, pad[0]))
        x = self.proj(x).permute(0, 2, 3, 4, 1)
        return self.norm(x)


class ShiftedWindowAttention3d(nn.Module):
    def __init__(self, dim, window_size, shift_size, num_heads):
        super().__init__()
        self.window_size = list(window_size)
        self.shift_size = list(shift_size)
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        table = ((2 * window_size[0] - 1) * (2 * window_size[1] - 1)
                 * (2 * window_size[2] - 1))
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(table, num_heads))
        coords = torch.stack(torch.meshgrid(
            *[torch.arange(s) for s in window_size], indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[..., 0] += window_size[0] - 1
        rel[..., 1] += window_size[1] - 1
        rel[..., 2] += window_size[2] - 1
        rel[..., 0] *= (2 * window_size[1] - 1) * (2 * window_size[2] - 1)
        rel[..., 1] *= 2 * window_size[2] - 1
        self.register_buffer("relative_position_index", rel.sum(-1))

    def forward(self, x):  # (B, T, H, W, C)
        b, t, h, w, c = x.shape
        # torchvision clips the window to the input dims and zeroes the
        # shift on any axis where the whole extent fits in one window
        window = [min(ws, s) for ws, s in zip(self.window_size, (t, h, w))]
        shift = [0 if (t, h, w)[i] <= self.window_size[i]
                 else self.shift_size[i] for i in range(3)]
        pad = _compute_pad3d((t, h, w), window)
        x = nn.functional.pad(x, (0, 0, 0, pad[2], 0, pad[1], 0, pad[0]))
        _, tp, hp, wp, _ = x.shape
        if any(shift):
            x = torch.roll(x, (-shift[0], -shift[1], -shift[2]), (1, 2, 3))
        wt, wh, ww = window
        nwin = (tp // wt) * (hp // wh) * (wp // ww)
        xw = x.view(b, tp // wt, wt, hp // wh, wh, wp // ww, ww, c)
        xw = xw.permute(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b * nwin, wt * wh * ww, c)

        n = wt * wh * ww
        qkv = self.qkv(xw).reshape(b * nwin, n, 3, self.num_heads,
                                   c // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) / math.sqrt(c // self.num_heads)
        idx = self.relative_position_index[:n, :n].reshape(-1)
        bias = self.relative_position_bias_table[idx].reshape(
            n, n, self.num_heads).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if any(shift):
            mask = x.new_zeros(tp, hp, wp)
            slices = [
                (slice(0, -window[i]), slice(-window[i], -shift[i]),
                 slice(-shift[i], None)) if shift[i] else (slice(None),)
                for i in range(3)]
            cnt = 0
            for ts in slices[0]:
                for hs in slices[1]:
                    for ws_ in slices[2]:
                        mask[ts, hs, ws_] = cnt
                        cnt += 1
            mw = mask.view(tp // wt, wt, hp // wh, wh, wp // ww, ww)
            mw = mw.permute(0, 2, 4, 1, 3, 5).reshape(nwin, n)
            amask = mw.unsqueeze(1) - mw.unsqueeze(2)
            amask = amask.masked_fill(amask != 0, -100.0)
            attn = attn.view(b, nwin, self.num_heads, n, n) + \
                amask.unsqueeze(0).unsqueeze(2)
            attn = attn.reshape(b * nwin, self.num_heads, n, n)
        attn = attn.softmax(dim=-1)
        xw = (attn @ v).transpose(1, 2).reshape(b * nwin, n, c)
        xw = self.proj(xw)

        x = xw.view(b, tp // wt, hp // wh, wp // ww, wt, wh, ww, c)
        x = x.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, tp, hp, wp, c)
        if any(shift):
            x = torch.roll(x, shift, (1, 2, 3))
        return x[:, :t, :h, :w].contiguous()


class SwinBlock3dRef(nn.Module):
    def __init__(self, dim, num_heads, window_size, shift_size, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = ShiftedWindowAttention3d(dim, window_size, shift_size,
                                             num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Sequential(nn.Linear(dim, hidden), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(hidden, dim),
                                 nn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class PatchMergingRef(nn.Module):
    """torchvision order: cat([x(0::2,0::2), x(1::2,0::2), x(0::2,1::2),
    x(1::2,1::2)]) over (H, W)."""

    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim, eps=1e-5)

    def forward(self, x):  # (B, T, H, W, C)
        h, w = x.shape[2], x.shape[3]
        x = nn.functional.pad(x, (0, 0, 0, w % 2, 0, h % 2))
        x0 = x[:, :, 0::2, 0::2, :]
        x1 = x[:, :, 1::2, 0::2, :]
        x2 = x[:, :, 0::2, 1::2, :]
        x3 = x[:, :, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], dim=-1)
        return self.reduction(self.norm(x))


# ---------------------------------------------------------------------------
# MViT (torchvision/models/video/mvit.py)
# ---------------------------------------------------------------------------

def _mvit_block_settings(variant: str):
    """(in_ch, out_ch, heads, q_stride, kv_stride, has_pool_q) per block —
    torchvision mvit_v1_b / mvit_v2_s configs."""
    stages = (1, 2, 11, 2)
    stage_heads = (1, 2, 4, 8)
    stage_kv = ((1, 8, 8), (1, 4, 4), (1, 2, 2), (1, 1, 1))
    out = []
    cur = 96
    for s, (n, heads) in enumerate(zip(stages, stage_heads)):
        for b in range(n):
            first = b == 0 and s > 0
            last = b == n - 1 and s < len(stages) - 1
            in_ch = cur
            if variant == "v1":
                out_ch = cur * 2 if last else cur
            else:
                out_ch = cur * 2 if first else cur
            cur = out_ch
            out.append((in_ch, out_ch, heads,
                        (1, 2, 2) if first else (1, 1, 1),
                        stage_kv[s], first))
    return out


class PositionalEncodingRef(nn.Module):
    def __init__(self, embed_size, spatial_size, temporal_size, rel_pos):
        super().__init__()
        self.spatial_size = spatial_size
        self.temporal_size = temporal_size
        self.class_token = nn.Parameter(torch.zeros(embed_size))
        self.spatial_pos = self.temporal_pos = self.class_pos = None
        if not rel_pos:
            self.spatial_pos = nn.Parameter(torch.zeros(
                spatial_size[0] * spatial_size[1], embed_size))
            self.temporal_pos = nn.Parameter(torch.zeros(temporal_size,
                                                         embed_size))
            self.class_pos = nn.Parameter(torch.zeros(embed_size))

    def forward(self, x):
        cls = self.class_token.expand(x.size(0), -1).unsqueeze(1)
        x = torch.cat((cls, x), dim=1)
        if self.spatial_pos is not None:
            hw, embed = self.spatial_pos.shape
            pos = torch.repeat_interleave(self.temporal_pos, hw, dim=0)
            pos = pos + self.spatial_pos.unsqueeze(0).expand(
                self.temporal_size, -1, -1).reshape(-1, embed)
            pos = torch.cat((self.class_pos.unsqueeze(0), pos), dim=0)
            x = x + pos.unsqueeze(0)
        return x


class PoolRef(nn.Module):
    def __init__(self, pool, norm):
        super().__init__()
        self.pool = pool
        self.norm_act = nn.Sequential(norm) if norm is not None else None

    def forward(self, x, thw):
        # x: (B, heads, 1 + T*H*W, d)
        b, heads, _, d = x.shape
        t, h, w = thw
        cls, tok = torch.tensor_split(x, indices=(1,), dim=2)
        tok = tok.transpose(2, 3).reshape(b * heads, d, t, h, w)
        tok = self.pool(tok)
        new_thw = tuple(tok.shape[2:])
        tok = tok.reshape(b, heads, d, -1).transpose(2, 3)
        x = torch.cat((cls, tok), dim=2)
        if self.norm_act is not None:
            x = self.norm_act(x)
        return x, new_thw


def _interp_table(table, d):
    if table.shape[0] == d:
        return table
    return nn.functional.interpolate(
        table.permute(1, 0).unsqueeze(0), size=d,
        mode="linear").squeeze(0).permute(1, 0)


def _add_rel_pos_ref(attn, q, q_thw, k_thw, rel_h, rel_w, rel_t):
    q_t, q_h, q_w = q_thw
    k_t, k_h, k_w = k_thw

    def dist(qs, ks):
        q_ratio = max(ks / qs, 1.0)
        k_ratio = max(qs / ks, 1.0)
        d = (torch.arange(qs)[:, None] * q_ratio
             - torch.arange(ks)[None, :] * k_ratio + (ks - 1) * k_ratio)
        return d.long()

    Rh = _interp_table(rel_h, 2 * max(q_h, k_h) - 1)[dist(q_h, k_h)]
    Rw = _interp_table(rel_w, 2 * max(q_w, k_w) - 1)[dist(q_w, k_w)]
    Rt = _interp_table(rel_t, 2 * max(q_t, k_t) - 1)[dist(q_t, k_t)]

    b, heads, _, d = q.shape
    r_q = q[:, :, 1:].reshape(b, heads, q_t, q_h, q_w, d)
    rel_h_q = torch.einsum("bythwc,hkc->bythwk", r_q, Rh)
    rel_w_q = torch.einsum("bythwc,wkc->bythwk", r_q, Rw)
    rel_t_q = torch.einsum("bythwc,tkc->bythwk", r_q, Rt)
    rel = (rel_h_q[:, :, :, :, :, None, :, None]
           + rel_w_q[:, :, :, :, :, None, None, :]
           + rel_t_q[:, :, :, :, :, :, None, None]).reshape(
        b, heads, q_t * q_h * q_w, k_t * k_h * k_w)
    attn[:, :, 1:, 1:] += rel
    return attn


class MultiscaleAttentionRef(nn.Module):
    def __init__(self, input_size, embed_dim, output_dim, heads, q_stride,
                 kv_stride, has_pool_q, residual_pool, rel_pos):
        super().__init__()
        self.num_heads = heads
        self.output_dim = output_dim
        self.head_dim = output_dim // heads
        self.scaler = 1.0 / math.sqrt(self.head_dim)
        self.residual_pool = residual_pool
        self.qkv = nn.Linear(embed_dim, 3 * output_dim)
        self.project = nn.Sequential(nn.Linear(output_dim, output_dim))
        d = self.head_dim

        def conv(stride):
            return nn.Conv3d(d, d, (3, 3, 3), stride, (1, 1, 1), groups=d,
                             bias=False)

        self.pool_q = PoolRef(conv(q_stride), nn.LayerNorm(d, eps=1e-6)) \
            if has_pool_q else None
        self.pool_k = PoolRef(conv(kv_stride), nn.LayerNorm(d, eps=1e-6))
        self.pool_v = PoolRef(conv(kv_stride), nn.LayerNorm(d, eps=1e-6))
        self.rel_pos_h = self.rel_pos_w = self.rel_pos_t = None
        if rel_pos:
            size = max(input_size[1], input_size[2])
            q_size = size // q_stride[1]
            kv_size = size // kv_stride[1]
            rel_sp = 2 * max(q_size, kv_size) - 1
            self.rel_pos_h = nn.Parameter(torch.zeros(rel_sp, d))
            self.rel_pos_w = nn.Parameter(torch.zeros(rel_sp, d))
            self.rel_pos_t = nn.Parameter(
                torch.zeros(2 * input_size[0] - 1, d))

    def forward(self, x, thw):
        b, n, _ = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads,
                                  self.head_dim).transpose(1, 3)
        q, k, v = qkv.unbind(dim=2)
        k, k_thw = self.pool_k(k, thw)
        v, _ = self.pool_v(v, thw)
        q_thw = thw
        if self.pool_q is not None:
            q, q_thw = self.pool_q(q, thw)
        attn = torch.matmul(self.scaler * q, k.transpose(2, 3))
        if self.rel_pos_h is not None:
            attn = _add_rel_pos_ref(attn, q, q_thw, k_thw, self.rel_pos_h,
                                    self.rel_pos_w, self.rel_pos_t)
        attn = attn.softmax(dim=-1)
        x = torch.matmul(attn, v)
        if self.residual_pool:
            x = x.clone()
            x[:, :, 1:, :] += q[:, :, 1:, :]   # residual_with_cls_embed=False
        x = x.transpose(1, 2).reshape(b, -1, self.output_dim)
        return self.project(x), q_thw


class MultiscaleBlockRef(nn.Module):
    def __init__(self, input_size, cfg, residual_pool, rel_pos,
                 proj_after_attn):
        super().__init__()
        in_ch, out_ch, heads, q_stride, kv_stride, has_pool_q = cfg
        self.proj_after_attn = proj_after_attn
        attn_dim = out_ch if proj_after_attn else in_ch
        self.norm1 = nn.LayerNorm(in_ch, eps=1e-6)
        self.norm2 = nn.LayerNorm(attn_dim, eps=1e-6)
        self.attn = MultiscaleAttentionRef(input_size, in_ch, attn_dim,
                                           heads, q_stride, kv_stride,
                                           has_pool_q, residual_pool,
                                           rel_pos)
        self.mlp = nn.Sequential(nn.Linear(attn_dim, 4 * attn_dim),
                                 nn.GELU(), nn.Dropout(0.0),
                                 nn.Linear(4 * attn_dim, out_ch),
                                 nn.Dropout(0.0))
        self.project = nn.Linear(in_ch, out_ch) if in_ch != out_ch else None
        self.pool_skip = PoolRef(
            nn.MaxPool3d(tuple(s + 1 if s > 1 else s for s in q_stride),
                         stride=q_stride,
                         padding=tuple((s + 1) // 2 if s > 1 else 0
                                       for s in q_stride)), None) \
            if has_pool_q else None

    def forward(self, x, thw):
        x_norm1 = self.norm1(x)
        x_attn, thw_new = self.attn(x_norm1, thw)
        if self.project is not None and self.proj_after_attn:
            x = self.project(x_norm1)
        if self.pool_skip is not None:
            x = self.pool_skip(x.unsqueeze(1), thw)[0].squeeze(1)
        x = x + x_attn
        x_norm2 = self.norm2(x)
        x_proj = x if self.project is None or self.proj_after_attn \
            else self.project(x_norm2)
        return x_proj + self.mlp(x_norm2), thw_new


class MViTRef(nn.Module):
    """torchvision ``mvit_v1_b``/``mvit_v2_s`` (stochastic depth/dropout
    off); input (B, 3, T, H, W), output (B, num_classes)."""

    def __init__(self, variant: str = "v1", num_classes: int = 400,
                 spatial_size=(224, 224), temporal_size: int = 16):
        super().__init__()
        self.conv_proj = nn.Conv3d(3, 96, (3, 7, 7), (2, 4, 4), (1, 3, 3))
        input_size = (temporal_size // 2, spatial_size[0] // 4,
                      spatial_size[1] // 4)
        rel_pos = variant == "v2"
        self.pos_encoding = PositionalEncodingRef(
            96, input_size[1:], input_size[0], rel_pos)
        self.blocks = nn.ModuleList()
        size = list(input_size)
        for cfg in _mvit_block_settings(variant):
            self.blocks.append(MultiscaleBlockRef(
                tuple(size), cfg, residual_pool=rel_pos, rel_pos=rel_pos,
                proj_after_attn=variant == "v2"))
            if cfg[5]:
                size = [s // st for s, st in zip(size, cfg[3])]
        out_dim = 768
        self.norm = nn.LayerNorm(out_dim, eps=1e-6)
        self.head = nn.Sequential(nn.Dropout(0.0), nn.Linear(out_dim,
                                                             num_classes))

    def forward(self, x):
        x = self.conv_proj(x)
        thw = tuple(x.shape[2:])
        x = x.flatten(2).transpose(1, 2)
        x = self.pos_encoding(x)
        for block in self.blocks:
            x, thw = block(x, thw)
        x = self.norm(x)
        return self.head(x[:, 0])


class Swin3DRef(nn.Module):
    """torchvision ``swin3d_t``/``swin3d_s`` (stochastic depth off)."""

    def __init__(self, num_classes: int = 400, embed_dim: int = 96,
                 depths: Sequence[int] = (2, 2, 6, 2),
                 num_heads: Sequence[int] = (3, 6, 12, 24),
                 window_size: Sequence[int] = (8, 7, 7)):
        super().__init__()
        self.patch_embed = PatchEmbed3d((2, 4, 4), embed_dim)
        shift = [w // 2 for w in window_size]
        layers: List[nn.Module] = []
        dim = embed_dim
        for stage, (depth, heads) in enumerate(zip(depths, num_heads)):
            blocks = nn.Sequential(*[
                SwinBlock3dRef(dim, heads, window_size,
                               [0, 0, 0] if i % 2 == 0 else shift)
                for i in range(depth)])
            layers.append(blocks)
            if stage < len(depths) - 1:
                layers.append(PatchMergingRef(dim))
                dim *= 2
        self.features = nn.Sequential(*layers)
        self.norm = nn.LayerNorm(dim, eps=1e-5)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):  # (B, 3, T, H, W)
        x = self.patch_embed(x)
        x = self.features(x)
        x = self.norm(x)
        x = x.mean(dim=(1, 2, 3))
        return self.head(x)
