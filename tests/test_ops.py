import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from audiolm_pytorch_tpu.ops.conv import causal_conv1d, causal_conv_transpose1d
from audiolm_pytorch_tpu.ops.resample import resample
from audiolm_pytorch_tpu.ops.sampling import (
    append_eos_id, batch_unique_consecutive, curtail_to_multiple, get_embeds,
    mask_out_after_eos_id, top_k, all_rows_have_eos_id, generate_mask_with_prob,
)
from audiolm_pytorch_tpu.ops.stft import hann_window, melspectrogram, stft


@pytest.mark.parametrize("k,stride,dilation", [(7, 1, 1), (7, 1, 3), (7, 1, 9), (4, 2, 1), (10, 5, 1), (16, 8, 1), (1, 1, 1)])
def test_causal_conv1d_parity_vs_torch(k, stride, dilation):
    rng = np.random.default_rng(0)
    b, t, cin, cout = 2, 80, 3, 5
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.1
    bias = rng.standard_normal((cout,)).astype(np.float32)

    y = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
                      stride=stride, dilation=dilation)

    # reference semantics: left reflect-pad dilation*(k-1)+(1-stride), then conv
    xt = torch.from_numpy(x).permute(0, 2, 1)
    pad = dilation * (k - 1) + (1 - stride)
    if pad > 0:
        xt = F.pad(xt, (pad, 0), mode="reflect")
    elif pad < 0:
        xt = xt[..., -pad:]
    wt = torch.from_numpy(w).permute(2, 1, 0)  # (cout, cin, k)
    yt = F.conv1d(xt, wt, torch.from_numpy(bias), stride=stride, dilation=dilation)
    yt = yt.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,stride", [(4, 2), (8, 4), (10, 5), (16, 8)])
def test_causal_conv_transpose1d_parity_vs_torch(k, stride):
    rng = np.random.default_rng(1)
    b, t, cin, cout = 2, 12, 3, 5
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.1
    bias = rng.standard_normal((cout,)).astype(np.float32)

    y = causal_conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias), stride=stride)
    assert y.shape == (b, t * stride, cout)

    xt = torch.from_numpy(x).permute(0, 2, 1)
    wt = torch.from_numpy(w).permute(1, 2, 0)  # (cin, cout, k)
    yt = F.conv_transpose1d(xt, wt, torch.from_numpy(bias), stride=stride)
    yt = yt[..., : t * stride].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)


def test_stft_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    n_fft, hop = 256, 64
    s = stft(jnp.asarray(x), n_fft, hop)
    # manual: reflect pad, frame, window, rfft
    xp = np.pad(x, [(0, 0), (n_fft // 2, n_fft // 2)], mode="reflect")
    win = np.asarray(hann_window(n_fft))
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop
    frames = np.stack([xp[:, i * hop: i * hop + n_fft] for i in range(n_frames)], 1)
    ref = np.fft.rfft(frames * win, axis=-1).transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(s), ref, rtol=1e-3, atol=1e-3)


def test_melspectrogram_shape_and_energy():
    sr = 16000
    t = np.linspace(0, 1, sr, endpoint=False)
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
    m = melspectrogram(jnp.asarray(x), sr, n_fft=1024, hop_length=256, n_mels=64)
    assert m.shape[1] == 64
    # energy concentrated near 440 Hz mel bin
    peak_bin = int(jnp.argmax(jnp.sum(m[0], axis=-1)))
    assert 2 <= peak_bin <= 12


def test_resample_sine_preserves_frequency():
    sr_in, sr_out, f = 24000, 16000, 300.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f * t).astype(np.float32)[None]
    y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    assert y.shape[-1] == sr_out
    # dominant DFT bin should be at f
    spec = np.abs(np.fft.rfft(y[0, 1000:-1000]))
    freq = np.fft.rfftfreq(y.shape[-1] - 2000, 1 / sr_out)
    assert abs(freq[np.argmax(spec)] - f) < 5
    # amplitude preserved
    assert 0.9 < np.max(np.abs(y[0, 1000:-1000])) < 1.1


def test_top_k():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0, 0.0, -1.0, 2.5, 0.1, 0.2]])
    out = top_k(logits, thres=0.9)  # keep top 1
    assert jnp.isfinite(out).sum() == 1 and out[0, 1] == 5.0
    out = top_k(logits, thres=0.7)  # keep top 3
    assert jnp.isfinite(out).sum() == 3


def test_eos_helpers():
    t = jnp.asarray([[1, 2, 9, 3, 4], [1, 2, 3, 4, 9]])
    m = mask_out_after_eos_id(t, 9, mask_value=-1, keep_eos=True)
    np.testing.assert_array_equal(np.asarray(m), [[1, 2, 9, -1, -1], [1, 2, 3, 4, 9]])
    m2 = mask_out_after_eos_id(t, 9, mask_value=-1, keep_eos=False)
    np.testing.assert_array_equal(np.asarray(m2), [[1, 2, -1, -1, -1], [1, 2, 3, 4, -1]])
    assert bool(all_rows_have_eos_id(t, 9))
    assert not bool(all_rows_have_eos_id(t, 7))
    a = append_eos_id(jnp.asarray([[1, 2]]), 9)
    np.testing.assert_array_equal(np.asarray(a), [[1, 2, 9]])


def test_batch_unique_consecutive():
    t = jnp.asarray([[1, 1, 2, 2, 3, 1, 1], [4, 4, 4, 4, 4, 4, 4]])
    out = np.asarray(batch_unique_consecutive(t, pad_value=-1))
    np.testing.assert_array_equal(out[0], [1, 2, 3, 1, -1, -1, -1])
    np.testing.assert_array_equal(out[1], [4, -1, -1, -1, -1, -1, -1])
    # already-padded values are dropped
    t2 = jnp.asarray([[1, 2, -1, -1, 2, 2, -1]])
    out2 = np.asarray(batch_unique_consecutive(t2, pad_value=-1))
    np.testing.assert_array_equal(out2[0], [1, 2, 2, -1, -1, -1, -1])


def test_get_embeds_pad_handling():
    table = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    codes = jnp.asarray([[0, 2, -1]])
    emb, mask = get_embeds(table, codes, pad_id=-1, return_mask=True)
    np.testing.assert_array_equal(np.asarray(emb[0, 2]), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(mask[0]), [True, True, False])


def test_generate_mask_with_prob():
    key = jax.random.PRNGKey(0)
    mask = generate_mask_with_prob(key, (4, 100), 0.3)
    keep_frac = float(jnp.mean(mask))
    assert abs(keep_frac - 0.7) < 1e-6
    assert bool(jnp.all(mask[:, 0]))  # first position always kept


def test_curtail_to_multiple():
    x = jnp.arange(10)[None]
    assert curtail_to_multiple(x, 4).shape[-1] == 8


def test_si_snr_and_mel_distance():
    from audiolm_pytorch_tpu.utils.metrics import mel_distance, si_snr
    t = np.arange(8000) / 16000.0
    ref = jnp.asarray(np.sin(2 * np.pi * 440 * t), jnp.float32)[None]
    # identical signals: very high SI-SNR, ~zero mel distance
    assert float(si_snr(ref, ref)[0]) > 50
    assert float(mel_distance(ref, ref, 16000)) < 1e-5
    # scaled copy: SI-SNR is scale-invariant
    assert float(si_snr(0.3 * ref, ref)[0]) > 50
    # noisy signal scores worse
    noisy = ref + 0.1 * jax.random.normal(jax.random.PRNGKey(0), ref.shape)
    snr = float(si_snr(noisy, ref)[0])
    assert 5 < snr < 30
    assert float(mel_distance(noisy, ref, 16000)) > 0.01


def test_stoi_monotone_in_noise():
    """Perceptual metric sanity: identical -> ~1, degrading with noise."""
    from audiolm_pytorch_tpu.utils.metrics import stoi
    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(sr * 2) / sr
    x = sum(np.sin(2 * np.pi * 150 * h * t + h) / h
            * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t)) for h in range(1, 10))
    x = (x / np.abs(x).max()).astype(np.float32)
    s_id = stoi(x, x, sr)
    s_lo = stoi(x + 0.05 * rng.normal(size=x.shape), x, sr)
    s_hi = stoi(x + 1.0 * rng.normal(size=x.shape), x, sr)
    assert s_id > 0.99
    assert s_id > s_lo > s_hi
    assert s_hi < 0.5
