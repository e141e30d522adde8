"""Pallas TPU kernels for the CSI preprocessing front-end.

The reference preprocesses on host: a Python loop computing |CSI| per packet
(wifi_csi/preprocess.py:14-31) and a numpy left-pad per sample
(load_data.py:70-72). The amplitude/phase extraction runs as a Pallas VPU
kernel in the offline cache CLI. Left-pad stays on HOST by design: the
native C++ loader pads for free during the pread (zeroed buffer, write at
the tail), and a device-side pad cannot reduce H2D bytes under jit's static
shapes — see the r3 pad_normalize post-mortem in BASELINE.md (the fused
pad+normalize kernel was deleted per win-or-delete).

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


