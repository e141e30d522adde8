"""Serving artifacts: export the compiled forward as portable StableHLO.

The reference's serving story (inference_only.py:11-90) re-imports the model
code, rebuilds the torch module, strips `torch.compile`'s '_orig_mod.'
prefixes, and reloads a .pth state dict. The TPU-native equivalent exports
the jitted forward ONCE via `jax.export`: the artifact is a self-contained,
versioned StableHLO module with the weights baked in as constants and the
target platforms recorded — serving deserializes and calls it with NO model
code, NO Python class, and NO retracing, and the same artifact runs on TPU
and CPU (multi-platform lowering).

Serving precision: pass `serving_dtype` (or resolve it per model via
core.config.resolve_serving_dtype) — weights are cast once at export and the
input is cast in-graph, logits always return float32, matching
train/loop.py::eval_dataset's serving contract.

Kernel gating: the models' use-flash gates are trace-time Python decisions
keyed on the HOST platform, which is wrong under export (the artifact's
target is `platforms`, not the host). export_serving forces them via
kernels.flash_attention.flash_mode: a TPU-only artifact traces the Mosaic
flash kernels even from a CPU host; a multi-platform (or CPU) artifact
traces the pure-XLA attention path, since a Mosaic custom call cannot run
on CPU.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"MMCSI-SERVE\x00"


def export_serving(model, variables: Any, example_x,
                   *,
                   serving_dtype: Optional[str] = None,
                   input_dtype: Optional[str] = None,
                   quant: Optional[str] = None,
                   calib_x: Optional[Sequence] = None,
                   calib_stat: str = "amax",
                   input_scale: Optional[float] = None,
                   platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Export `model.apply(variables, x, train=False)` as a serving artifact.

    example_x: array or ShapeDtypeStruct fixing the serving batch shape
    (static shapes — one artifact per batch size, as XLA wants).
    input_dtype: dtype the artifact ACCEPTS (default: example_x's dtype).
    A bfloat16 input contract halves host->device transfer and the
    first-layer HBM read — the dominant cost for input-bandwidth-bound
    models (MLP reads 3.24 MB/window of f32 input; BASELINE.md) — at the
    cost of the caller quantizing on the host.
    quant: None | "w8" | "w8a8" — int8 post-training quantization
    (core/quantize.py; applied AFTER the serving-dtype cast so the rescale
    leaves stay f32). "w8a8" needs real `calib_x` batches to calibrate the
    activation scales; "w8" only discovers the hooked layers, so a zero
    batch suffices and calib_x may be omitted.
    input_dtype="int8": the artifact accepts host-quantized int8 inputs
    and dequantizes inline (x * input_scale as the first op) — quarters
    H2D + first-layer HBM read vs f32 (measured +24% on the input-bound
    MLP over even the bf16 contract, tools/exp_int8_input.py).
    `input_scale` is required then (or derived as amax/127 from calib_x);
    the host quantizes as round(x / input_scale).clip(-127, 127).
    Returns the serialized bytes (see save_artifact/load_serving).
    """
    from jax import export as jax_export

    if serving_dtype and serving_dtype != "float32":
        from ..train.loop import cast_for_serving
        dtype = jnp.dtype(serving_dtype)
        variables = cast_for_serving(variables, dtype)
    else:
        dtype = None

    if quant:
        from .quantize import quantize_for_serving
        if calib_x is None:
            if quant != "w8":
                raise ValueError("w8a8 export needs calib_x batches")
            calib_x = [np.zeros(np.shape(example_x), np.float32)]
        variables = quantize_for_serving(model, variables, calib_x,
                                         mode=quant, stat=calib_stat,
                                         train=False)

    in_dtype = (jnp.dtype(input_dtype) if input_dtype
                else jnp.dtype(getattr(example_x, "dtype", np.float32)))
    if in_dtype == jnp.int8:
        if input_scale is None:
            if not calib_x:
                raise ValueError("input_dtype='int8' needs input_scale "
                                 "or calib_x to derive it")
            input_scale = max(float(max(np.max(np.abs(np.asarray(b)))
                                        for b in calib_x)), 1e-12) / 127.0
        input_scale = float(input_scale)

    def forward(x):
        if x.dtype == jnp.int8:
            x = x.astype(dtype or jnp.float32) * jnp.asarray(
                input_scale, dtype or jnp.float32)
        elif dtype is not None:
            x = x.astype(dtype)
        out = model.apply(variables, x, train=False)
        return jax.tree_util.tree_map(
            lambda o: o.astype(jnp.float32), out)

    spec = jax.ShapeDtypeStruct(np.shape(example_x), in_dtype)
    from ..kernels.flash_attention import flash_mode
    mode = "on" if tuple(platforms) == ("tpu",) else "off"
    with flash_mode(mode):
        exported = jax_export.export(jax.jit(forward),
                                     platforms=tuple(platforms))(spec)
    return exported.serialize()


def save_artifact(path: str, blob: bytes, meta: Optional[dict] = None) -> None:
    """Write `blob` with a small JSON header (model/task/batch/dtype...)."""
    header = json.dumps(meta or {}).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)


def load_artifact(path: str) -> Tuple[bytes, dict]:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a serving artifact")
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        return f.read(), meta


def load_serving(blob: bytes) -> Callable:
    """Deserialize an artifact into a callable (runs via jax.jit; the
    embedded module must list the current backend in its platforms)."""
    from jax import export as jax_export
    exported = jax_export.deserialize(blob)
    return exported.call


def serve_file(path: str) -> Tuple[Callable, dict]:
    blob, meta = load_artifact(path)
    return load_serving(blob), meta


def serve_ragged(fn: Callable, batch: int,
                 axis: Optional[int] = None) -> Callable:
    """Wrap an artifact callable (fixed batch `batch`) to accept ragged
    request sizes: splits into full batches, zero-pads the remainder, and
    concatenates the un-padded outputs. The reference's inference path has
    no equivalent (it forwards the whole test set in one variable-size
    batch — inference_only.py:60-66); a static-shape artifact needs this
    shim once requests stop aligning to the export batch.

    The output batch axis is located by size (the unique axis of length
    `batch` — DETR artifacts return (L, B, Q, C), MLP (B, C)); when the
    shape is ambiguous (another axis happens to equal `batch`) it raises
    instead of guessing — pass `axis` explicitly then.
    """
    def call(x, axis=axis):
        x = np.asarray(x)
        outs = []
        for start in range(0, x.shape[0], batch):
            chunk = x[start:start + batch]
            pad = batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)], axis=0)
            out = np.asarray(fn(chunk))
            if axis is None:
                axes = [i for i, s in enumerate(out.shape) if s == batch]
                if len(axes) != 1:
                    raise ValueError("cannot identify the batch axis in "
                                     f"output shape {out.shape}")
                axis = axes[0]
            if pad:
                sl = [slice(None)] * out.ndim
                sl[axis] = slice(0, batch - pad)
                out = out[tuple(sl)]
            outs.append(out)
        return np.concatenate(outs, axis=axis)

    return call
