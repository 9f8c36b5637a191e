"""Polyphase windowed-sinc resampler (torchaudio.functional.resample parity).

The reference resamples on-the-fly in the dataset (reference: data.py:82,105)
and inside the codec (soundstream.py:787-788). Here the kernel is built once
on host (numpy) and applied as a strided conv — one MXU-friendly op.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["resample"]


@lru_cache(maxsize=None)
def _sinc_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int,
                 rolloff: float):
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * base_freq / orig_freq
    # cache NUMPY (a jnp constant created during tracing is a tracer and
    # would leak out of the jit scope via this cache)
    return np.ascontiguousarray(kernel[:, None, :], np.float32), width  # (new_freq, 1, K)


def resample(x, orig_freq: int, new_freq: int, *, lowpass_filter_width: int = 6,
             rolloff: float = 0.99):
    """x: (..., L) -> (..., ceil(L*new/orig))."""
    if orig_freq == new_freq:
        return x
    g = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // g, int(new_freq) // g
    kernel, width = _sinc_kernel(orig, new, lowpass_filter_width, rolloff)

    shape = x.shape
    length = shape[-1]
    xf = x.reshape(-1, 1, length).astype(jnp.float32)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + orig)))
    # conv over ('NCH','OIH','NCH'): out (B, new, frames)
    y = lax.conv_general_dilated(
        xf, kernel.astype(xf.dtype), (orig,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    y = jnp.swapaxes(y, 1, 2).reshape(xf.shape[0], -1)
    target_len = int(math.ceil(new_freq * length / orig_freq))
    y = y[:, :target_len]
    return y.reshape(*shape[:-1], target_len).astype(x.dtype)
