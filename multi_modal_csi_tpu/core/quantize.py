"""Post-training int8 quantization for serving.

The reference has no quantization; this is a TPU-native serving extension
motivated by the measured rooflines (BASELINE.md): v5e's MXU runs int8 at
~2x the bf16 rate for the compute-bound models, and int8 weights halve HBM
readback for the bandwidth-bound ones (the MLP's 830 MB f32 first-layer
weight; S3D's separable convs). Lowering was probed empirically on the real
chip (tools/exp_int8_probe.py, numbers in BASELINE.md): int8 dot 327 TOPS
vs bf16 199 TFLOP/s; the DETR dilated conv 197 vs 105; inline
``int8.astype(bf16)`` dequant FUSES into the dot's operand stream (weights
stream at 491 GB/s effective — above the bf16 readback floor), while a
mixed bf16 x int8 ``dot_general`` is 2.6x slower — hence the two
formulations below and not the mixed one.

Two modes:

  - ``"w8"`` (weight-only): hooked kernels are stored int8 in the param
    tree with a per-output-channel ``kernel_scale`` sibling; the layer
    dequantizes inline (``kernel.astype(bf16)``, fused by XLA) and applies
    the scale AFTER the matmul/conv — a cheap per-channel multiply on the
    small output instead of a full-size dequantized-weight materialization.
  - ``"w8a8"`` (full int8): additionally stores a calibration-derived
    per-tensor ``input_scale`` leaf per hooked layer; the matmul/conv runs
    int8 x int8 -> int32 on the MXU and the combined
    ``input_scale * kernel_scale[c]`` rescale folds into the output.

There is NO out-of-band mode flag: an int8 ``kernel`` leaf in the param
tree IS the signal (the same convention as bf16 serving, where
``cast_for_serving``'s param dtype keys the compute path). Quantized trees
are therefore checkpointable, exportable, and sharding-transparent as-is.

Which layers get quantized is decided by DISCOVERY, not tree-shape
heuristics: hooked layer types (nn/layers.py Linear / Conv1d / Conv2d /
the video Conv3D via _ConvCore) announce themselves by sowing their input
max-abs (and its 99.9th percentile) when the ``"quant_stats"`` collection
is mutable; MultiheadAttention announces its packed in_proj/out_proj as
WEIGHT-ONLY (``maybe_mark_weight_only`` — cross-attention feeds two
inputs, so no per-tensor activation scale applies). ``calibrate`` runs
batches with the collection mutable and returns sow paths mapped to param
paths. A param that never announced (raw ``nn.Conv`` patch embeds, LSTM
gate weights) can never be turned int8, so quantization cannot silently
corrupt an unhooked layer.

Symmetric quantization (zero-point 0) keeps conv zero-padding exact.

Usage:
    amax = calibrate(apply_fn, variables, batches)
    qparams = quantize_params(variables["params"], amax, mode="w8a8")
    logits = jax.jit(model.apply)({"params": qparams, **rest}, x)

or the one-stop ``quantize_for_serving(model, variables, batches, mode)``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Param-tree leaves smaller than this stay float: tiny layers contribute no
# bandwidth/compute yet lose the most precision (e.g. 10-class heads).
DEFAULT_MIN_WEIGHT_SIZE = 16384

STATS_COL = "quant_stats"


# ---------------------------------------------------------------------------
# array-level quantization
# ---------------------------------------------------------------------------

def quantize_array(w: jax.Array, channel_axis: int = -1
                   ) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-channel int8: returns (q, scale) with w ~ q * scale.

    ``scale`` has the length of ``channel_axis`` (the OUTPUT-channel axis:
    -1 for both dense (in, out) kernels and HIO/DHWIO conv kernels) and
    broadcasts against the layer OUTPUT, not the kernel.
    """
    w = jnp.asarray(w, jnp.float32)
    channel_axis = channel_axis % w.ndim
    axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    amax = jnp.max(jnp.abs(w), axis=axes)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / jnp.expand_dims(scale, axes)), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_activation(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Per-tensor symmetric int8 with a fixed (calibrated) scale."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


# ---------------------------------------------------------------------------
# layer hooks (called from nn/layers.py)
# ---------------------------------------------------------------------------

def maybe_sow_amax(module, x: jax.Array) -> None:
    """Announce this layer as quantizable; under calibration (the
    ``quant_stats`` collection mutable) record its input's running max-abs.

    No-op on every normal init/train/eval trace: ``init`` makes all
    collections mutable, so it is guarded separately.
    """
    if module.is_initializing() or not module.is_mutable_collection(STATS_COL):
        return
    ax = jnp.abs(x.astype(jnp.float32))
    module.sow(STATS_COL, "amax", jnp.max(ax),
               init_fn=lambda: jnp.float32(0.0),
               reduce_fn=jnp.maximum)
    # 99.9th percentile alongside: an outlier-robust w8a8 scale choice
    # (activations beyond it saturate at +-127 instead of stretching the
    # whole grid). Costs a sort per layer, calibration traces only.
    module.sow(STATS_COL, "p999", jnp.quantile(ax.ravel(), 0.999),
               init_fn=lambda: jnp.float32(0.0),
               reduce_fn=jnp.maximum)


def maybe_mark_weight_only(module, *param_names: str) -> None:
    """Announce named params (e.g. MultiheadAttention's packed
    ``in_proj_weight``) as WEIGHT-ONLY quantizable: they get int8 + a
    ``<name>_scale`` sibling under every mode, never an input_scale —
    attention projections see two different inputs under cross-attention,
    so per-tensor activation scales do not apply to them."""
    if module.is_initializing() or not module.is_mutable_collection(STATS_COL):
        return
    for name in param_names:
        module.sow(STATS_COL, f"wonly__{name}", jnp.float32(0.0),
                   init_fn=lambda: jnp.float32(0.0),
                   reduce_fn=lambda a, b: b)


def _fetch_scales(module, kernel: jax.Array):
    """Fetch the scale leaves next to an int8 kernel. ``input_scale`` is
    present only for w8a8 trees (its absence selects the w8 path)."""
    out = kernel.shape[-1]
    kernel_scale = module.param(
        "kernel_scale", lambda *_: jnp.ones((out,), jnp.float32), (out,))
    input_scale = None
    if module.has_variable("params", "input_scale"):
        input_scale = module.param(
            "input_scale", lambda *_: jnp.float32(1.0), ())
    return kernel_scale, input_scale


def dense_forward(module, x: jax.Array, kernel: jax.Array) -> jax.Array:
    """y = x @ dequant(kernel) in f32. Call when ``kernel.dtype == int8``."""
    kernel_scale, input_scale = _fetch_scales(module, kernel)
    if input_scale is None:  # w8: inline dequant fuses (probe: 491 GB/s)
        y = jnp.dot(x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return y * kernel_scale
    xq = quantize_activation(x, input_scale)
    y = jnp.dot(xq, kernel, preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (kernel_scale * input_scale)


def conv_forward(module, x: jax.Array, kernel: jax.Array, *,
                 window_strides, padding, rhs_dilation,
                 dimension_numbers, feature_group_count: int) -> jax.Array:
    """lax.conv_general_dilated with an int8 kernel; returns f32."""
    from jax import lax
    kernel_scale, input_scale = _fetch_scales(module, kernel)
    if input_scale is None:
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
            window_strides=window_strides, padding=padding,
            rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
            preferred_element_type=jnp.float32)
        return y * kernel_scale
    xq = quantize_activation(x, input_scale)
    y = lax.conv_general_dilated(
        xq, kernel, window_strides=window_strides, padding=padding,
        rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (kernel_scale * input_scale)


# ---------------------------------------------------------------------------
# calibration (doubles as hooked-layer discovery) + tree transformation
# ---------------------------------------------------------------------------

def _dict_path(keypath) -> Tuple[str, ...]:
    return tuple(k.key for k in keypath
                 if isinstance(k, jax.tree_util.DictKey))


def calibrate(apply_fn: Callable, variables: Dict, batches,
              stat: str = "amax") -> Dict[Tuple[str, ...], Optional[float]]:
    """Run batches with ``quant_stats`` mutable; return, per hooked layer,
    the calibrated input statistic keyed by the layer's KERNEL param path.
    Weight-only announcements (``maybe_mark_weight_only``) appear with
    value ``None`` keyed by their own param path.

    ``stat``: "amax" (exact range) or "p999" (99.9th percentile of |x|,
    outlier-robust — values beyond it saturate instead of stretching the
    int8 grid; reduced by max over calibration batches either way).

    ``apply_fn(variables, batch, mutable)`` must forward to module.apply
    with the mutable list passed through — typically
    ``lambda v, b, mutable: model.apply(v, b, mutable=mutable)``. One batch
    suffices for w8 (the values are unused, only the key set matters).
    """
    if stat not in ("amax", "p999"):
        raise ValueError(f"unknown calibration stat {stat!r}")
    params = variables["params"] if "params" in variables else variables
    amax: Dict[Tuple[str, ...], Optional[float]] = {}
    # jit the calibration forward: an eager model.apply is hundreds of
    # per-op dispatches — tens of seconds per batch over a remote/tunneled
    # backend; one compiled (and persistently cacheable) program instead.
    # The single device_get below fetches the whole stats tree in one
    # round trip rather than one per hooked layer.
    jitted = jax.jit(lambda v, b: apply_fn(v, b, mutable=[STATS_COL])[1])
    for batch in batches:
        aux = jax.device_get(dict(jitted(variables, batch)))
        for keypath, val in jax.tree_util.tree_flatten_with_path(
                aux.get(STATS_COL, {}))[0]:
            names = _dict_path(keypath)
            if names and names[-1].startswith("wonly__"):
                path = names[:-1] + (names[-1][len("wonly__"):],)
                amax.setdefault(path, None)
                continue
            if names and names[-1] in ("amax", "p999"):
                if names[-1] != stat:
                    continue
                names = names[:-1]
            path = names + ("kernel",)
            vmax = float(np.max(np.asarray(val)))
            amax[path] = max(amax.get(path) or 0.0, vmax)
    for path in amax:
        node: Any = params
        for key in path:
            node = node[key]  # raises KeyError loudly on a mapping bug
        if not (hasattr(node, "ndim") and node.ndim >= 2):
            raise ValueError(f"hooked path {'/'.join(path)} is not a kernel")
    return amax


def quantize_params(params: Dict, amax: Dict[Tuple[str, ...], float],
                    mode: str = "w8",
                    min_size: int = DEFAULT_MIN_WEIGHT_SIZE) -> Dict:
    """Return a param tree with the discovered kernels int8 + scale leaves.

    ``amax`` comes from ``calibrate`` — it is both the hooked-layer set and
    (for w8a8) the activation scales. Kernels smaller than ``min_size``
    elements stay float (their layers take the normal path).
    """
    if mode not in ("w8", "w8a8"):
        raise ValueError(f"unknown quant mode {mode!r}")
    import flax
    params = flax.core.unfreeze(params)

    def walk(tree: Dict, prefix: Tuple[str, ...]) -> Dict:
        out = {}
        for key, val in tree.items():
            path = prefix + (key,)
            if isinstance(val, dict):
                out[key] = walk(val, path)
            elif (path in amax and val.size >= min_size
                  and jnp.issubdtype(val.dtype, jnp.floating)):
                q, scale = quantize_array(val)
                out[key] = q
                if key == "kernel":
                    out["kernel_scale"] = scale
                    if mode == "w8a8" and amax[path] is not None:
                        out["input_scale"] = jnp.float32(
                            max(amax[path], 1e-12) / 127.0)
                else:     # weight-only named param (e.g. in_proj_weight)
                    out[f"{key}_scale"] = scale
            else:
                out[key] = val
        return out

    # One compiled program for the whole tree transform: the per-kernel
    # round/clip/cast ops are trivially cheap but an eager walk dispatches
    # each one individually — ~100 remote round trips on a tunneled
    # backend. All branch decisions (paths, sizes, dtypes) are static, so
    # the jit traces the identical tree.
    return jax.jit(lambda p: walk(p, ()))(params)


def quantize_for_serving(model, variables: Dict, batches, mode: str = "w8",
                         min_size: int = DEFAULT_MIN_WEIGHT_SIZE,
                         stat: str = "amax", **apply_kwargs) -> Dict:
    """One-stop: discover + calibrate + quantize. Returns new ``variables``
    (params swapped; batch_stats etc. untouched). ``apply_kwargs`` are
    forwarded to ``model.apply`` (e.g. ``train=False``)."""
    def apply_fn(v, b, mutable):
        return model.apply(v, b, mutable=mutable, **apply_kwargs)

    amax = calibrate(apply_fn, variables, batches, stat=stat)
    out = dict(variables)
    out["params"] = quantize_params(variables["params"], amax,
                                    mode=mode, min_size=min_size)
    return out
