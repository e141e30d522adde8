"""Pallas TPU kernels for the CSI preprocessing front-end.

The reference preprocesses on host: a Python loop computing |CSI| per packet
(wifi_csi/preprocess.py:14-31) and a numpy left-pad per sample
(load_data.py:70-72). On TPU this whole chain — amplitude from (re, im),
per-subcarrier standardization, left-pad to the fixed window — is one
bandwidth-bound elementwise pass, fused into a single Pallas kernel so the
data crosses HBM exactly once (SURVEY.md §2.1 "TPU-native equivalent").

All kernels operate on flattened (T, F=270) windows, tiled to the VPU's
(8, 128) lanes. A jnp reference implementation backs every kernel for
CPU tests and as the interpret-mode oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ------------------------------------------------------------------ #
# amplitude + phase
# ------------------------------------------------------------------ #

def _amp_kernel(re_ref, im_ref, amp_ref):
    re = re_ref[:]
    im = im_ref[:]
    amp_ref[:] = jnp.sqrt(re * re + im * im)


def amplitude_phase(re: jnp.ndarray, im: jnp.ndarray, *,
                    interpret: bool | None = None):
    """|CSI| and phase from real/imag parts.

    re/im: (..., T, F) float32. Returns (amp, phase) of the same shape.
    Amplitude is a Pallas VPU kernel; phase stays an XLA arctan2 (Pallas TPU
    has no atan/atan2 lowering — XLA fuses the elementwise op natively).
    """
    if interpret is None:
        interpret = not _on_tpu()
    shape = re.shape
    re2 = re.reshape(-1, shape[-1])
    im2 = im.reshape(-1, shape[-1])
    amp = pl.pallas_call(
        _amp_kernel,
        out_shape=jax.ShapeDtypeStruct(re2.shape, re2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(re2, im2)
    phase = jnp.arctan2(im, re)
    return amp.reshape(shape), phase


def amplitude_phase_reference(re, im):
    return jnp.sqrt(re * re + im * im), jnp.arctan2(im, re)


# ------------------------------------------------------------------ #
# fused left-pad + standardize
# ------------------------------------------------------------------ #

def pad_normalize(x: jnp.ndarray, lengths: jnp.ndarray,
                  mean: jnp.ndarray | None = None,
                  std: jnp.ndarray | None = None, *,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Fused left-pad + per-feature standardization.

    x: (B, T, F) where each sample's first `lengths[b]` rows are valid data
       (already right-aligned raw windows are NOT required — data sits at the
       top, pad goes in front, matching load_data.py:70-72 semantics);
    lengths: (B,) int32 valid lengths; mean/std: (1, F) or None.
    """
    if interpret is None:
        interpret = not _on_tpu()
    b, t, f = x.shape
    normalize = mean is not None
    if mean is None:
        mean = jnp.zeros((1, f), x.dtype)
        std = jnp.ones((1, f), x.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, f), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, f), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kernel_3d(len_all_ref, x_ref, mean_ref, std_ref, out_ref):
        i = pl.program_id(0)
        valid = len_all_ref[i]
        pad = t - valid
        xs = x_ref[0]
        # dynamic rotate: row t takes x[t - pad] (wrapped rows masked below).
        # A per-row gather does not lower in Mosaic; a dynamic roll does.
        shifted = pltpu.roll(xs, pad, 0)
        t_idx = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 0)
        mask = (t_idx >= pad).astype(xs.dtype)
        if normalize:
            shifted = (shifted - mean_ref[:]) / std_ref[:]
        out_ref[0] = shifted * mask

    return pl.pallas_call(
        kernel_3d,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, f), x.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), x, mean.astype(x.dtype), std.astype(x.dtype))


def pad_normalize_reference(x, lengths, mean=None, std=None):
    """jnp oracle for pad_normalize."""
    b, t, f = x.shape
    t_idx = jnp.arange(t)[None, :, None]
    pad = (t - lengths)[:, None, None]
    src = jnp.clip(t_idx - pad, 0, t - 1)
    shifted = jnp.take_along_axis(x, jnp.broadcast_to(src, x.shape), axis=1)
    mask = (t_idx >= pad).astype(x.dtype)
    if mean is not None:
        shifted = (shifted - mean[None]) / std[None]
    return shifted * mask
