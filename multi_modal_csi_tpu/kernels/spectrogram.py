"""Spectrogram features on-device (ST-RF front-end).

The reference computes scipy spectrograms on host (model/strf.py:55-56,
nperseg=16, noverlap=8, nfft=16) as the ST-RF feature pipeline. This module
reproduces scipy.signal.spectrogram's exact semantics in jnp — framing,
Tukey(0.25) window, per-segment constant detrend, density scaling, one-sided
doubling — so the feature extraction can run batched on TPU (the forest
itself stays sklearn on host).

The framing is a reshape + gather and the FFT is jnp.fft.rfft — XLA maps both
well; for the 16-point transforms used here the whole pipeline is one fused
batched kernel.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def tukey_window(m: int, alpha: float = 0.25, periodic: bool = False) -> np.ndarray:
    """scipy.signal.windows.tukey(m, alpha); periodic=True gives the
    'tukey_periodic' variant that scipy>=1.15's spectrogram defaults to
    (tukey(m+1, sym=True)[:-1])."""
    if periodic:
        return tukey_window(m + 1, alpha, periodic=False)[:-1]
    if alpha <= 0:
        return np.ones(m)
    n = np.arange(m)
    width = int(np.floor(alpha * (m - 1) / 2.0))
    w = np.ones(m)
    left = n[:width + 1]
    w[:width + 1] = 0.5 * (1 + np.cos(np.pi * (-1 + 2.0 * left / alpha / (m - 1))))
    right = n[-(width + 1):]
    w[-(width + 1):] = 0.5 * (1 + np.cos(
        np.pi * (-2.0 / alpha + 1 + 2.0 * right / alpha / (m - 1))))
    return w


def spectrogram(x: jnp.ndarray, nperseg: int = 16, noverlap: int = 8,
                nfft: int = 16, fs: float = 1.0) -> jnp.ndarray:
    """Batched one-sided PSD spectrogram over the LAST axis.

    x: (..., T). Returns (..., nfft//2 + 1, n_frames), matching
    scipy.signal.spectrogram(x)[2] with default window ('tukey', 0.25),
    detrend='constant', scaling='density', mode='psd'.
    """
    hop = nperseg - noverlap
    t = x.shape[-1]
    n_frames = (t - nperseg) // hop + 1
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(nperseg)[None, :])
    frames = x[..., idx]                                  # (..., F, nperseg)
    frames = frames - frames.mean(axis=-1, keepdims=True)  # constant detrend
    win_np = tukey_window(nperseg, periodic=True)
    frames = frames * jnp.asarray(win_np, x.dtype)
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    psd = (spec.real ** 2 + spec.imag ** 2)
    # scale from the HOST window so the whole function stays jittable
    scale = 1.0 / (fs * float((win_np ** 2).sum()))
    psd = psd * scale
    # one-sided doubling for all bins except DC and (even-nfft) Nyquist
    last = psd.shape[-1] - 1
    mult = np.full(psd.shape[-1], 2.0, np.float32)
    mult[0] = 1.0
    if nfft % 2 == 0:
        mult[last] = 1.0
    psd = psd * jnp.asarray(mult, psd.dtype)
    return jnp.swapaxes(psd, -1, -2)                      # (..., freq, frames)


def strf_features(x: jnp.ndarray) -> jnp.ndarray:
    """Full ST-RF feature pipeline on device (model/strf.py:42-62):
    per-sample per-channel centering -> spectrogram over time -> mean over
    frames -> flatten. x: (N, T, C) -> (N, C * (nfft//2+1))."""
    x = x - x.mean(axis=1, keepdims=True)
    xt = jnp.swapaxes(x, -1, -2)                          # (N, C, T)
    ft = spectrogram(xt)                                  # (N, C, 9, frames)
    ft = ft.mean(axis=-1)
    return ft.reshape(ft.shape[0], -1)
