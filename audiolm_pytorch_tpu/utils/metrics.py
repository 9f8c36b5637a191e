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


def stoi(est, ref, sample_rate: int):
    """Short-Time Objective Intelligibility (Taal et al. 2011), host-side
    numpy. Returns a scalar in ~[0, 1]; higher is better. The perceptual
    complement to SI-SNR/mel-distance for codec evaluation (BASELINE.md
    quality target row asks for a perceptual metric; ViSQOL needs external
    tooling, STOI is self-contained).

    est/ref: (T,) or (B, T) arrays at `sample_rate` (internally resampled to
    10 kHz, the metric's native rate).
    """
    import math

    import numpy as np
    from scipy.signal import resample_poly

    FS = 10000
    N_FRAME = 256          # 25.6 ms window, 50% overlap
    N_FFT = 512
    NUM_BANDS = 15
    MIN_FREQ = 150.0
    SEG = 30               # 384 ms analysis segments
    BETA = -15.0           # lower SDR clip bound (dB)
    DYN_RANGE = 40.0       # silent-frame removal threshold (dB)

    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    if est.ndim == 2:
        return float(np.mean([stoi(e, r, sample_rate)
                              for e, r in zip(est, ref)]))
    if sample_rate != FS:
        g = math.gcd(int(sample_rate), FS)
        est = resample_poly(est, FS // g, sample_rate // g)
        ref = resample_poly(ref, FS // g, sample_rate // g)

    # remove frames where the clean signal is silent
    win = np.hanning(N_FRAME + 2)[1:-1]
    hop = N_FRAME // 2
    n_frames = (len(ref) - N_FRAME) // hop + 1
    if n_frames < SEG:
        return float("nan")
    idx = np.arange(N_FRAME)[None, :] + hop * np.arange(n_frames)[:, None]
    ref_f = ref[idx] * win
    est_f = est[idx] * win
    energy = 20 * np.log10(np.linalg.norm(ref_f, axis=1) + 1e-12)
    keep = energy > (energy.max() - DYN_RANGE)
    ref_f, est_f = ref_f[keep], est_f[keep]
    if ref_f.shape[0] < SEG:
        return float("nan")

    X = np.abs(np.fft.rfft(ref_f, N_FFT, axis=1)) ** 2
    Y = np.abs(np.fft.rfft(est_f, N_FFT, axis=1)) ** 2

    # 1/3-octave band matrix
    cf = MIN_FREQ * 2.0 ** (np.arange(NUM_BANDS) / 3.0)
    lo = cf * 2 ** (-1 / 6)
    hi = cf * 2 ** (1 / 6)
    freqs = np.fft.rfftfreq(N_FFT, 1.0 / FS)
    bands = np.stack([(freqs >= l) & (freqs < h) for l, h in zip(lo, hi)])

    Xb = np.sqrt(X @ bands.T + 1e-12)  # (frames, bands)
    Yb = np.sqrt(Y @ bands.T + 1e-12)

    scores = []
    clip = 10 ** (-BETA / 20.0)
    for m in range(SEG, Xb.shape[0] + 1):
        x = Xb[m - SEG: m]  # (SEG, bands)
        y = Yb[m - SEG: m]
        alpha = np.linalg.norm(x, axis=0) / (np.linalg.norm(y, axis=0) + 1e-12)
        y = np.minimum(y * alpha, x * (1 + clip))
        xn = x - x.mean(0)
        yn = y - y.mean(0)
        num = np.sum(xn * yn, axis=0)
        den = np.linalg.norm(xn, axis=0) * np.linalg.norm(yn, axis=0) + 1e-12
        scores.append(np.mean(num / den))
    return float(np.mean(scores))
