"""STFT / mel-spectrogram DSP, matching torch.stft / torchaudio.MelSpectrogram
semantics (the reference uses these at soundstream.py:278-286 and :662-669).

Framing is a strided gather over a reflect-padded signal; the spectrum is
computed either with XLA's native FFT or — for small n_fft — a DFT matmul
that rides the MXU. Mel projection is a matmul with an HTK filterbank
(torchaudio defaults: htk scale, no norm, power 2).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hann_window", "frame_signal", "stft", "spectrogram", "mel_filterbank",
           "melspectrogram"]


def hann_window(win_length: int, dtype=jnp.float32):
    # torch.hann_window: periodic=True
    n = np.arange(win_length)
    return jnp.asarray(0.5 - 0.5 * np.cos(2 * np.pi * n / win_length), dtype)


def frame_signal(x, n_fft: int, hop_length: int, center: bool = True,
                 pad_mode: str = "reflect"):
    """x: (..., L) -> frames (..., n_frames, n_fft)."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :])
    return x[..., idx]


def _dft_matrices(n_fft: int, dtype=np.float32):
    k = np.arange(n_fft // 2 + 1)[None, :]
    n = np.arange(n_fft)[:, None]
    ang = -2 * np.pi * k * n / n_fft
    return jnp.asarray(np.cos(ang), dtype), jnp.asarray(np.sin(ang), dtype)


def stft(x, n_fft: int, hop_length: int | None = None, win_length: int | None = None,
         window=None, center: bool = True, pad_mode: str = "reflect",
         normalized: bool = False, use_fft: bool = False):
    """Returns complex64 (..., n_fft//2+1, n_frames) — torch.stft layout."""
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:  # center-pad window to n_fft, like torch.stft
        lp = (n_fft - win_length) // 2
        window = jnp.pad(window, (lp, n_fft - win_length - lp))
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop_length, center, pad_mode)
    frames = frames * window
    if use_fft:
        spec = jnp.fft.rfft(frames, axis=-1)
    else:
        cos_m, sin_m = _dft_matrices(n_fft)
        spec = jax.lax.complex(frames @ cos_m, frames @ sin_m)
    if normalized:
        spec = spec / math.sqrt(n_fft)
    return jnp.swapaxes(spec, -1, -2)


def spectrogram(x, n_fft: int, hop_length: int | None = None,
                win_length: int | None = None, power: float = 2.0,
                normalized: bool = False, center: bool = True):
    s = stft(x, n_fft, hop_length, win_length, center=center, normalized=False)
    if normalized:  # torchaudio window-normalizes (window.pow(2).sum().sqrt())
        win = hann_window(win_length or n_fft)
        s = s / jnp.sqrt(jnp.sum(win ** 2))
    return jnp.abs(s) ** power


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   f_min: float = 0.0, f_max: float | None = None):
    """(n_mels, n_fft//2+1) triangular HTK filterbank (torchaudio melscale_fbanks
    defaults: mel_scale='htk', norm=None)."""
    f_max = f_max or sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (n_freqs, n_mels)
    # cache NUMPY, not a jax array: a jnp constant created while tracing is a
    # tracer, and caching it across jit boundaries leaks it
    return np.ascontiguousarray(fb.T, np.float32)


def melspectrogram(x, sample_rate: int, n_fft: int, hop_length: int | None = None,
                   win_length: int | None = None, n_mels: int = 128,
                   power: float = 2.0, normalized: bool = False):
    """(..., n_mels, n_frames) — torchaudio.transforms.MelSpectrogram parity."""
    spec = spectrogram(x, n_fft, hop_length, win_length, power=power,
                       normalized=normalized)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    return jnp.einsum("mf,...ft->...mt", fb, spec)
