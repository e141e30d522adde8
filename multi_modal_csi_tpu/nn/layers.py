"""Core flax modules with reference-matching semantics.

Everything works in channels-LAST layout — (batch, length, features) — which is
the layout XLA tiles best on TPU; the reference's channel-first permutes
(e.g. model/cnn_1d.py forward) disappear entirely.

Initialization mirrors the reference (see nn/init.py): explicit
xavier_uniform where the torch code calls it, torch layer defaults elsewhere.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .init import torch_bias, torch_linear_weight, uniform_scale, xavier_uniform
from ..core import quantize as _quant
from ..kernels.flash_attention import _on_tpu, flash_resolved


@jax.custom_vjp
def _mp_dot_bf16(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _mp_dot_bf16_fwd(x, w):
    return _mp_dot_bf16(x, w), (x, w)


def _mp_dot_bf16_bwd(res, g):
    x, w = res
    g = g.astype(w.dtype)
    dx = jnp.dot(g, w.T, preferred_element_type=jnp.float32).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    dw = jnp.dot(x2.T, g2, preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


_mp_dot_bf16.defvjp(_mp_dot_bf16_fwd, _mp_dot_bf16_bwd)


def mp_dot(x, w):
    """Mixed-precision matmul: f32 accumulation, bf16-native BACKWARD.

    Forward is always ``jnp.dot(x, w, preferred_element_type=f32)``. The
    default VJP of that dot is a bf16-training footgun measured on this
    backend (BASELINE.md r3): the f32 cotangent flowing out of the
    f32-accumulated product forces BOTH backward matmuls to run as
    f32xbf16 dots, with f32 CONVERTs of the bf16 operands materialized to
    feed them. The custom VJP rounds the cotangent to bf16 first (the
    standard mixed-precision recipe — torch.amp and cuDNN do exactly
    this), so dgrad/wgrad are bf16 MXU dots with f32 accumulation and no
    operand-sized converts. Grads land in the param dtype (bf16) either
    way, so the rounding changes nothing downstream.

    Measured effect (tools/bench_training.py, bs64 full step): CLSTM bf16
    16.36 -> 9.16 ms — the scan's per-step dots stop paying convert +
    f32-dot costs T times. MLP's bf16 regression was a SEPARATE pathology
    (the input BatchNorm's fused bf16 stats reduce — see _TorchBNCore's
    barrier and BASELINE.md's "MLP bf16 training post-mortem"); with both
    fixes MLP bf16 trains at 9.2 ms vs 13.8 f32.

    Engages only when BOTH operands are bf16; the f32 path is the stock
    dot, bit-identical to before (torch train-parity tests run f32).
    """
    if x.dtype == jnp.bfloat16 and w.dtype == jnp.bfloat16:
        return _mp_dot_bf16(x, w)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


class Linear(nn.Module):
    """Dense layer with torch-style init (optionally xavier weight).

    Equivalent of torch.nn.Linear; the reference xavier-initializes weights in
    most models (model/mlp.py:45-47) but keeps the torch-default bias.

    int8-serving hook (core/quantize.py): an int8 ``kernel`` leaf routes the
    matmul through the quantized path; otherwise the layer announces itself
    to calibration (a no-op outside calibration traces).
    """
    features: int
    use_bias: bool = True
    xavier: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w_init = xavier_uniform() if self.xavier else torch_linear_weight()
        kernel = self.param("kernel", w_init, (in_features, self.features))
        if kernel.dtype == jnp.int8:
            y = _quant.dense_forward(self, x, kernel)
        else:
            _quant.maybe_sow_amax(self, x)
            y = mp_dot(x.astype(self.dtype or x.dtype),
                       kernel.astype(self.dtype or kernel.dtype))
        if self.use_bias:
            bias = self.param("bias", torch_bias(in_features), (self.features,))
            y = y + bias
        return y.astype(x.dtype)


class _ConvCore(nn.Module):
    """Drop-in core for the Conv1d/Conv2d wrappers, replacing flax nn.Conv
    with IDENTICAL param layout (name "conv", ``kernel`` (*window, in/g, out)
    + ``bias`` (out,)), identical init RNG paths, and identical float math
    (promote to ``dtype``, lax.conv_general_dilated without
    preferred_element_type) — verified bit-exact against nn.Conv by
    tests/test_quantize.py. Exists so the int8-serving hook
    (core/quantize.py) can branch on the kernel dtype, which nn.Conv cannot:
    its promote_dtype would silently dequantize an int8 kernel WITHOUT the
    scale.
    """
    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: object
    kernel_dilation: Tuple[int, ...]
    feature_group_count: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kshape = self.kernel_size + (
            in_features // self.feature_group_count, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, jnp.float32)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           jnp.float32)
                if self.use_bias else None)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * len(self.kernel_size)
        spec = "DHW"[3 - len(self.kernel_size):]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kshape, (f"N{spec}C", f"{spec}IO", f"N{spec}C"))
        if kernel.dtype == jnp.int8:
            y = _quant.conv_forward(
                self, x, kernel, window_strides=self.strides, padding=pad,
                rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
                feature_group_count=self.feature_group_count)
            if bias is not None:
                y = y + bias
            return y.astype(x.dtype)
        _quant.maybe_sow_amax(self, x)
        from flax.linen.dtypes import promote_dtype
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=self.strides, padding=pad,
            rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
            feature_group_count=self.feature_group_count)
        if bias is not None:
            y = y + bias.reshape((1,) * (y.ndim - 1) + (-1,))
        return y


class Conv1d(nn.Module):
    """1-D convolution on (B, L, C) with torch Conv1d semantics.

    `padding` accepts an int (symmetric), "SAME", or "VALID" (torch default).
    """
    features: int
    kernel_size: int
    stride: int = 1
    padding: object = "VALID"
    dilation: int = 1
    feature_group_count: int = 1
    use_bias: bool = True
    xavier: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        fan_in = (in_features // self.feature_group_count) * self.kernel_size
        w_init = xavier_uniform() if self.xavier else torch_linear_weight()
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)]
        return _ConvCore(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=pad,
            kernel_dilation=(self.dilation,),
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            kernel_init=w_init,
            bias_init=torch_bias(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class Conv2d(nn.Module):
    """2-D convolution on (B, H, W, C) with torch Conv2d semantics."""
    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: object = "VALID"
    use_bias: bool = True
    xavier: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        fan_in = in_features * self.kernel_size[0] * self.kernel_size[1]
        w_init = xavier_uniform() if self.xavier else torch_linear_weight()
        return _ConvCore(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.stride,
            padding=self.padding,
            kernel_dilation=(1,) * len(self.kernel_size),
            feature_group_count=1,
            use_bias=self.use_bias,
            kernel_init=w_init,
            bias_init=torch_bias(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class _TorchBNCore(nn.Module):
    """torch-exact BatchNorm core (named "bn" to keep the param-tree layout).

    Differs from flax nn.BatchNorm in ONE observable way: the running-variance
    update uses the UNBIASED batch variance (×n/(n-1)) exactly as torch does
    (torch.nn.modules.batchnorm — "update the running var with unbiased var"),
    while normalization itself uses the biased variance on both sides. Eval
    reads running stats, so the reference's best-weight selection and reported
    accuracy depend on this; flax's biased update diverges ~n/(n-1) (6.7% for
    the MLP's batch-16 BatchNorm1d). Verified by the torch train-step parity
    tests (tests/test_torch_parity.py).
    """
    momentum: float = 0.1          # torch convention: new = (1-m)*old + m*cur
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        xf = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            n = math.prod(x.shape[a] for a in axes)
            if x.dtype != jnp.float32 and (x.ndim == 2 or x.shape[-1] == 1):
                # Flat (N, C) packed sub-32-bit inputs (BatchNorm1d over
                # features, the MLP/SSL-head case): XLA fuses the bf16 load
                # + convert into the batch-axis stats reduce, and with a
                # huge lane dim that fusion runs ~15 GB/s on this backend —
                # MLP bf16 training's convert_reduce_fusion was 13.9 of the
                # 19.2 ms step. Materializing the f32 convert first (one
                # extra HBM round trip) restores full-bandwidth reduction
                # (2.64 -> 0.72 ms isolated; MLP step 19.1 -> 9.2 ms, SSL
                # 14.7 -> 11.3). Also engaged for C == 1 (CNN-2D's scalar
                # norm_0 over the raw (B, 3000, 270, 1) window — its
                # convert_reduce_fusion traced at 2.84 ms/step; the full-
                # step gain is only ~0.5 ms because most of that fusion
                # overlapped other work: 22.6 -> 22.2 ms). NOT for
                # multi-channel (B, L, C) conv activations: there the
                # fused reduce was never pathological, and the barrier
                # only adds a materialized f32 copy per stage BN (CNN-1D
                # measured 8.2-9.6 ms with it vs 5.5-7.6 without, run
                # spread included). f32 inputs keep the stock fusion.
                # BASELINE.md r3 "MLP bf16 training post-mortem".
                xf = jax.lax.optimization_barrier(xf)
            mean = jnp.mean(xf, axis=axes)
            # E[x^2] - E[x]^2, like flax/torch batch stats; under a
            # batch-sharded mesh the means are global (GSPMD inserts the
            # collectives), preserving single-device numerics under DP
            # (SURVEY.md §7 hard part #5)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(jnp.result_type(x.dtype, scale.dtype))


class BatchNorm(nn.Module):
    """BatchNorm over the trailing feature axis of (B, ..., C).

    torch BatchNorm1d/2d semantics: eps 1e-5, running-stat momentum 0.1,
    affine, unbiased running-var update (see _TorchBNCore). Under jit with a
    batch-sharded mesh the batch statistics are computed over the GLOBAL
    batch automatically (GSPMD), which preserves single-device numerics under
    data parallelism (SURVEY.md §7 hard part #5).
    """
    use_running_average: Optional[bool] = None
    momentum: float = 0.9          # flax convention kept for the public knob
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        return _TorchBNCore(momentum=1.0 - self.momentum,
                            epsilon=self.epsilon, name="bn")(x, ura)


def avg_pool1d(x, kernel: int, stride: Optional[int] = None):
    """torch AvgPool1d on (B, L, C): VALID padding, floor division length."""
    stride = stride or kernel
    return nn.avg_pool(x, window_shape=(kernel,), strides=(stride,), padding="VALID")


def max_pool1d(x, kernel: int, stride: Optional[int] = None):
    stride = stride or kernel
    return nn.max_pool(x, window_shape=(kernel,), strides=(stride,), padding="VALID")


def adaptive_avg_pool1d(x, output_size: int):
    """torch AdaptiveAvgPool1d on (B, L, C).

    torch computes window i as mean over [floor(i*L/out), ceil((i+1)*L/out)).
    For the cases the reference uses (L divisible or near-divisible) this
    matches; implemented via segment means with the exact torch bounds.
    """
    b, length, c = x.shape
    starts = [math.floor(i * length / output_size) for i in range(output_size)]
    ends = [math.ceil((i + 1) * length / output_size) for i in range(output_size)]
    segs = [x[:, s:e].mean(axis=1) for s, e in zip(starts, ends)]
    return jnp.stack(segs, axis=1)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention equivalent (batch_first, same embed dim).

    Packed QKV projection with xavier-uniform init and zero biases, torch
    default init on the output projection weight with zero bias — matching
    torch's ``_reset_parameters``. ``output_scale`` implements the reference's
    TemperatureMultiheadAttention, which divides the attention OUTPUT (not the
    logits) by the temperature (model/detr.py:445-464).
    """
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    output_scale: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True,
                 mask: Optional[jnp.ndarray] = None,
                 kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 return_kv: bool = False):
        """`kv`/`return_kv` let weight-SHARED decoder stacks hoist the K/V
        projection of a static memory out of the depth loop: the shared
        layer projects the same memory with the same weights every
        iteration, and XLA does not CSE across the repeated applications
        (measured r3 — THAT_ENCODER spends ~31% of its FLOPs there).
        Numerically identical: it is the very same computation, done once."""
        e, h = self.embed_dim, self.num_heads
        assert e % h == 0, "embed_dim must divide num_heads"
        d = e // h
        in_proj_w = self.param("in_proj_weight", xavier_uniform(), (e, 3 * e))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        # int8-serving hook (core/quantize.py): the packed projections are
        # WEIGHT-ONLY quantizable (cross-attention feeds two different
        # inputs, so per-tensor activation scales do not apply); an int8
        # leaf selects the inline-dequant path, scales applied per packed
        # OUTPUT column so the slices below stay aligned.
        in_scale = out_scale = None
        if in_proj_w.dtype == jnp.int8:
            in_scale = self.param(
                "in_proj_weight_scale",
                lambda *_: jnp.ones((3 * e,), jnp.float32), (3 * e,))
        else:
            _quant.maybe_mark_weight_only(self, "in_proj_weight",
                                          "out_proj_weight")

        def proj(x, w, b, scale):
            if scale is None:
                return mp_dot(x, w) + b
            y = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return y * scale + b

        q = proj(query, in_proj_w[:, :e], in_proj_b[:e],
                 None if in_scale is None else in_scale[:e])

        def split(t):  # (B, L, E) -> (B, L, H, D); heads stay in place —
            # the einsums below contract in bqhd/bkhd layout directly, so no
            # physical (B, H, L, D) transpose is ever materialized (the r3
            # trace showed those copies costing ~0.3-0.6 ms each at THAT
            # shapes)
            return t.reshape(*t.shape[:-1], h, d)

        if kv is None:
            k = proj(key, in_proj_w[:, e:2 * e], in_proj_b[e:2 * e],
                     None if in_scale is None else in_scale[e:2 * e])
            v = proj(value, in_proj_w[:, 2 * e:], in_proj_b[2 * e:],
                     None if in_scale is None else in_scale[2 * e:])
            k, v = split(k), split(v)
        else:
            k, v = kv
        q = split(q)
        # Inference fast path (r3): fused Pallas attention keeps the
        # (N, N) matrices in VMEM — the XLA path materializes them in HBM
        # three times per layer (69% of THAT_ENCODER's step, trace r3).
        # Gated to: no mask, dropout inactive, real sequence lengths, and
        # TPU execution (CPU tests take the interpret path only when tiny).
        # q >= 64 too: few-query cross-attention (DETR's 5 decoder queries)
        # is cheaper in XLA than paying the per-cell grid overhead.
        # TRAINING (r3): the Pallas flash BACKWARD (custom_vjp, grads ==
        # jax.grad of the XLA path to ~3e-7 rel) engages on TPU when the
        # attention-probability dropout is 0 — which it is for the whole
        # THAT family (torch MultiheadAttention's default; the reference's
        # 0.1 Dropout is on the OUTPUT, reference that.py:113-117). A
        # nonzero attn-prob dropout must keep the XLA path (the kernel has
        # no in-tile RNG); CPU training also stays XLA (interpret cost).
        # flash_resolved: kernels/flash_attention.py::flash_mode export
        # override — resolves only the platform-keyed part of the gate.
        shapes_ok = (mask is None and q.shape[1] >= 64 and k.shape[1] >= 64)
        use_flash = shapes_ok and deterministic and flash_resolved(True)
        use_flash_train = (shapes_ok and not deterministic
                           and self.dropout == 0.0
                           and flash_resolved(_on_tpu()))
        # Serving dtype is signalled by the PARAM dtype (cast_for_serving):
        # activations may arrive f32 even in bf16 serving because LayerNorm
        # promotes — keying on query.dtype silently kept everything f32.
        # Under int8 weights the BIAS still carries the serving dtype.
        _w_dtype = (in_proj_b.dtype if in_proj_w.dtype == jnp.int8
                    else in_proj_w.dtype)
        act_dtype = jnp.bfloat16 if _w_dtype == jnp.bfloat16 \
            else jnp.float32
        if use_flash or use_flash_train:
            from ..kernels.flash_attention import (flash_attention,
                                                   flash_attention_trainable)
            fa = flash_attention if use_flash else flash_attention_trainable
            # the projections accumulate in f32; attention runs in the
            # serving dtype (bf16 halves VMEM + HBM traffic)
            ctx = fa(q.astype(act_dtype),
                     k.astype(act_dtype),
                     v.astype(act_dtype))
            ctx = ctx.reshape(*query.shape[:-1], e)
            out_w = self.param("out_proj_weight", torch_linear_weight(),
                               (e, e))
            out_b = self.param("out_proj_bias", nn.initializers.zeros, (e,))
            if out_w.dtype == jnp.int8:
                out_scale = self.param(
                    "out_proj_weight_scale",
                    lambda *_: jnp.ones((e,), jnp.float32), (e,))
            out = proj(ctx, out_w, out_b, out_scale)
            if self.output_scale != 1.0:
                out = out * (1.0 / self.output_scale)
            out = out.astype(query.dtype)
            if return_kv:
                return out, (k, v)
            return out

        # Attention-matrix dtype policy (r3 roofline): the (B, H, N, N)
        # logits/weights dominate HBM traffic at THAT-family shapes (the
        # right stream materializes 300 MB/step of f32 logits at bs256). In
        # bf16 serving, let the MXU round its f32-accumulated logits to bf16
        # on output and keep the weights bf16 — softmax exp/sum still run in
        # f32 INSIDE the fusion (register conversions are free; only
        # materialized buffers pay bandwidth). f32 inputs are bit-identical
        # to the previous jax.nn.softmax path.
        mat_dtype = act_dtype
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=mat_dtype) / math.sqrt(d)
        if mask is not None:
            logits = jnp.where(mask, logits,
                               jnp.asarray(-jnp.inf, logits.dtype))
        lmax = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
        # keep the (B, H, N, N) exp in mat_dtype: XLA materializes this
        # intermediate (two consumers), and an f32 copy of the right-stream
        # matrix is 298 MB/step at bs256 — the r3 trace showed that single
        # fusion costing 2.4 ms. The sum still accumulates in f32.
        unnorm = jnp.exp(logits - lmax)
        weights = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True,
                                    dtype=jnp.float32).astype(mat_dtype))
        if self.dropout > 0.0:
            weights = nn.Dropout(self.dropout, deterministic=deterministic,
                                 name="attn_drop")(weights)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(*query.shape[:-1], e)
        out_w = self.param("out_proj_weight", torch_linear_weight(), (e, e))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (e,))
        if out_w.dtype == jnp.int8:
            out_scale = self.param(
                "out_proj_weight_scale",
                lambda *_: jnp.ones((e,), jnp.float32), (e,))
        out = proj(ctx, out_w, out_b, out_scale)
        if self.output_scale != 1.0:
            out = out * (1.0 / self.output_scale)
        out = out.astype(query.dtype)
        if return_kv:
            return out, (k, v)
        return out


class LSTM(nn.Module):
    """torch.nn.LSTM equivalent (single layer, batch_first, optional bidir).

    Implemented as lax.scan over time with fused gate matmuls — the
    TPU-friendly formulation (one (B, F)x(F, 4H) and one (B, H)x(H, 4H) MXU
    matmul per step). Gate order i, f, g, o; both input and hidden biases kept
    (they fold together but keep the torch parameter count for converters).
    All params init uniform(+-1/sqrt(hidden)) per torch defaults.
    """
    hidden_size: int
    bidirectional: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = self.hidden_size
        bound_init = uniform_scale(1.0 / math.sqrt(h))
        in_features = x.shape[-1]

        def direction(name: str, xs):
            w_ih = self.param(f"w_ih_{name}", bound_init, (in_features, 4 * h))
            w_hh = self.param(f"w_hh_{name}", bound_init, (h, 4 * h))
            b_ih = self.param(f"b_ih_{name}", bound_init, (4 * h,))
            b_hh = self.param(f"b_hh_{name}", bound_init, (4 * h,))

            def step(carry, x_t):
                h_t, c_t = carry
                gates = (mp_dot(x_t, w_ih) + mp_dot(h_t, w_hh)
                         + b_ih + b_hh)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
                g = jnp.tanh(g)
                c_new = f * c_t + i * g
                h_new = o * jnp.tanh(c_new)
                # Gate math is f32 end-to-end (the dots carry
                # preferred_element_type=f32 and every downstream op inherits
                # it). The cell state c ALSO stays f32 across steps — it never
                # feeds a matmul, and rounding it to bf16 each step would
                # accumulate error in the long-term memory (ADVICE r2 #4).
                # Only h is cast to the activation dtype so the next step's
                # MXU dot runs in bf16 under mixed-precision training.
                return (h_new.astype(xs.dtype), c_new), h_new.astype(xs.dtype)

            b = xs.shape[0]
            init = (jnp.zeros((b, h), xs.dtype),
                    jnp.zeros((b, h), jnp.float32))
            # scan over time: (B, L, F) -> (L, B, F)
            _, ys = jax.lax.scan(step, init, xs.swapaxes(0, 1))
            return ys.swapaxes(0, 1)

        fwd = direction("fwd", x)
        if not self.bidirectional:
            return fwd
        bwd = direction("bwd", x[:, ::-1])[:, ::-1]
        return jnp.concatenate([fwd, bwd], axis=-1)


class LayerNorm(nn.Module):
    """torch LayerNorm over the trailing axis."""
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, name="ln")(x)


def leaky_relu(x):
    """torch default negative_slope=0.01."""
    return nn.leaky_relu(x, negative_slope=0.01)
