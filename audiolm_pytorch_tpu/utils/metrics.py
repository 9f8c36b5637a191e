"""Audio quality metrics for codec evaluation (BASELINE.md quality targets).

The reference ships no metrics; upstream papers report ViSQOL/MUSHRA
(perceptual, external tooling). SI-SNR and multi-scale mel distance are the
standard proxy metrics and run on-device.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["si_snr", "mel_distance"]


def si_snr(est, ref, eps: float = 1e-8):
    """Scale-invariant SNR in dB. est/ref: (..., T). Higher is better."""
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    proj = (jnp.sum(est * ref, -1, keepdims=True) /
            (jnp.sum(ref * ref, -1, keepdims=True) + eps)) * ref
    noise = est - proj
    ratio = (jnp.sum(proj * proj, -1) + eps) / (jnp.sum(noise * noise, -1) + eps)
    return 10.0 * jnp.log10(ratio)


def mel_distance(est, ref, sample_rate: int, n_fft: int = 1024,
                 hop_length: int = 256, n_mels: int = 64, eps: float = 1e-5):
    """L1 log-mel spectrogram distance (lower is better)."""
    from ..ops.stft import melspectrogram
    me = melspectrogram(est, sample_rate, n_fft, hop_length, n_mels=n_mels)
    mr = melspectrogram(ref, sample_rate, n_fft, hop_length, n_mels=n_mels)
    return jnp.mean(jnp.abs(jnp.log(me + eps) - jnp.log(mr + eps)))
