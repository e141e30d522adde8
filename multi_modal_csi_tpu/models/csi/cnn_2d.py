"""CNN-2D treating the CSI window as a 1-channel (time x feature) image.

Reference: benchmark/wifi_csi/model/cnn_2d.py:23-99 — per-stage BatchNorm2d,
Conv2d stages (32/k27/s7, 64/k15/s3, 128/k7/s1), LeakyReLU + Dropout(0.2),
global mean pool, Linear head; xavier weights. Trained with BCE pos_weight=6.

TPU note (r3 roofline): the single-input-channel 27x27/s7 first conv was
~100% of this model's runtime as a direct XLA conv (stage-0-only marginal ==
full-model marginal on chip) — a C_in=1 conv starves the MXU's 128-deep
contraction. `_Stage0Conv` reformulates it EXACTLY: stride 7 factors each
kernel tap dt into (qt, pt) = (dt // 7, dt % 7), so gathering the 7x7
stride phases into 49 channels (space-to-depth) turns the op into a k(4,4)
stride-1 conv with contraction 4*4*49 = 784 (the taps beyond 27 are
zero-padded kernel entries). The stored parameter keeps the reference
shape (27, 27, 1, 32) under the same tree path; the rearrangement happens
in-graph. Equivalence to the direct conv is pinned by
tests/test_csi_models.py and to the reference torch module by
tools/parity_check.py::check_cnn2d.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.init import torch_bias, xavier_uniform
from ...nn.layers import BatchNorm, Conv2d, Linear, leaky_relu


class _Stage0Params(nn.Module):
    """Declares kernel/bias with Conv2d's exact names, shapes and inits so
    the param tree is indistinguishable from Conv2d(name=...)'s nn.Conv."""
    features: int = 32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", xavier_uniform(),
                            (27, 27, 1, self.features))
        bias = self.param("bias", torch_bias(27 * 27), (self.features,))
        return kernel, bias


class _Stage0Conv(nn.Module):
    """k(27,27)/s(7,7) C_in=1 conv via 7x7 space-to-depth (see module
    docstring). Output identical to the direct conv up to f32 summation
    order."""
    features: int = 32

    @nn.compact
    def __call__(self, x):
        kernel, bias = _Stage0Params(self.features, name="conv")()
        b = x.shape[0]
        out_t = (x.shape[1] - 27) // 7 + 1
        out_f = (x.shape[2] - 27) // 7 + 1
        nt, nf = out_t + 3, out_f + 3          # s2d rows/cols needed
        # crop-or-zero-pad to the (nt*7, nf*7) s2d grid: padded positions
        # are only ever multiplied by the zero-padded kernel taps (dt > 26)
        xr = x[:, :nt * 7, :nf * 7, 0]
        pad_t, pad_f = nt * 7 - xr.shape[1], nf * 7 - xr.shape[2]
        if pad_t or pad_f:
            xr = jnp.pad(xr, ((0, 0), (0, pad_t), (0, pad_f)))
        xr = xr.reshape(b, nt, 7, nf, 7)
        xr = xr.transpose(0, 1, 3, 2, 4).reshape(b, nt, nf, 49)
        # kernel (27,27,1,C) -> pad (28,28,C) -> (4,7,4,7,C) -> (4,4,49,C)
        k = jnp.pad(kernel[:, :, 0, :], ((0, 1), (0, 1), (0, 0)))
        k = k.reshape(4, 7, 4, 7, -1).transpose(0, 2, 1, 3, 4)
        k = k.reshape(4, 4, 49, -1).astype(xr.dtype)
        # no preferred_element_type: with bf16 operands it makes the output
        # f32, and conv_general_dilated's TRANSPOSE rule then pairs the f32
        # cotangent with a bf16 operand and rejects the mixed dtypes — bf16
        # training crashed on exactly this (r3). Output in operand dtype,
        # like every _ConvCore conv; the MXU still accumulates f32.
        y = jax.lax.conv_general_dilated(
            xr, k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (y + bias).astype(x.dtype)


class CNN2D(nn.Module):
    """``fold_input_norm=True`` (serving): skips norm_0 — pair with
    ``fold_input_norm(variables)`` below, which folds the eval-mode scalar
    affine (C=1 input!) into the stage-0 kernel/bias exactly. norm_0
    materializes an ~830 MB/batch copy of the input at serving batch 256;
    folding measured **+12.3%** (23,541 -> 26,427 w/s bf16;
    tools/exp_cnn2d_bnfold.py, BASELINE.md). Training keeps the live BN."""
    out_features: int
    fold_input_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (B, T, F) -> (B, T, F, 1): NHWC with one input channel
        if x.ndim == 3:
            x = x[..., None]
        stages = [(32, (27, 27), (7, 7)), (64, (15, 15), (3, 3)),
                  (128, (7, 7), (1, 1))]
        for i, (feat, k, s) in enumerate(stages):
            if i > 0 or not self.fold_input_norm:
                x = BatchNorm(name=f"norm_{i}")(
                    x, use_running_average=not train)
            if i == 0:
                x = _Stage0Conv(feat, name=f"conv_{i}")(x)
            else:
                x = Conv2d(feat, k, stride=s, name=f"conv_{i}")(x)
            x = leaky_relu(x)
            x = nn.Dropout(0.2, deterministic=not train)(x)
        x = BatchNorm(name="norm_3")(x, use_running_average=not train)
        x = jnp.mean(x, axis=(1, 2))
        return Linear(self.out_features, name="head")(x)


def fold_input_norm(variables):
    """Fold CNN2D's eval-mode norm_0 (a SCALAR affine — C=1) into conv_0.

    BN(x) = x*a + c; conv_0(x*a + c) = conv_0'(x) with kernel' = a*kernel
    and bias' = bias + c * sum(kernel taps). Exact including the
    space-to-depth zero-pad positions: they only meet structurally-zero
    taps (see _Stage0Conv), so the constant contribution is c times the
    original 27x27 tap sum at every output position. Returns variables
    for ``CNN2D(fold_input_norm=True)``. Measured +12.3% serving
    (tools/exp_cnn2d_bnfold.py).
    """
    import numpy as np
    from flax.core import unfreeze

    params = unfreeze(jax.device_get(variables["params"]))
    stats = unfreeze(jax.device_get(variables["batch_stats"]))
    bn = params.pop("norm_0")["bn"]
    st = stats.pop("norm_0")["bn"]
    a = float(bn["scale"][0]) / np.sqrt(float(st["var"][0]) + 1e-5)
    c = float(bn["bias"][0]) - float(st["mean"][0]) * a
    k0 = np.asarray(params["conv_0"]["conv"]["kernel"], np.float64)
    b0 = np.asarray(params["conv_0"]["conv"]["bias"], np.float64)
    params = dict(params)
    params["conv_0"] = {"conv": {
        "kernel": jnp.asarray((k0 * a).astype(np.float32)),
        "bias": jnp.asarray((b0 + c * k0.sum((0, 1, 2)))
                            .astype(np.float32)),
    }}
    out = {k: v for k, v in variables.items()
           if k not in ("params", "batch_stats")}
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    out["batch_stats"] = jax.tree_util.tree_map(jnp.asarray, stats)
    return out
