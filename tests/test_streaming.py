"""Streaming codec decode: chunked outputs must equal the offline decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolm_pytorch_tpu.serving import (StreamingCodecDecoder,
                                         StreamingCodecEncoder,
                                         decode_lookback_frames,
                                         encode_lookback)
from tests.test_soundstream import tiny_soundstream

KEY = jax.random.PRNGKey(0)


def _codes_for(codec, n_frames, key=KEY):
    x = 0.3 * jax.random.normal(key, (2, n_frames * codec.seq_len_multiple_of))
    return codec(x, return_codes_only=True)  # (G, B, N, Q)


def test_lookback_is_finite_and_reasonable():
    codec = tiny_soundstream()
    lb = decode_lookback_frames(codec)
    assert 0 < lb < 1000


def test_streaming_decode_no_attn_exact():
    codec = tiny_soundstream(attn_window_size=None, use_local_attn=False)
    codes = _codes_for(codec, 96)
    full = np.asarray(codec.decode_from_codebook_indices(codes))

    dec = StreamingCodecDecoder(codec, chunk_frames=8)
    outs = []
    codes_np = np.asarray(codes)
    for i in range(0, codes_np.shape[2], 5):  # push in uneven bites of 5
        outs.append(dec.push(codes_np[:, :, i:i + 5]))
    outs.append(dec.flush())
    stream = np.concatenate(outs, axis=-1)
    assert stream.shape == full.shape
    np.testing.assert_array_equal(stream, full)  # causal => bit-exact


def test_streaming_decode_with_local_attn_close():
    codec = tiny_soundstream()  # attn_window_size=16
    codes = _codes_for(codec, 96, key=jax.random.PRNGKey(1))
    full = np.asarray(codec.decode_from_codebook_indices(codes))

    dec = StreamingCodecDecoder(codec, chunk_frames=16)
    outs = [dec.push(np.asarray(codes))]
    outs.append(dec.flush())
    stream = np.concatenate(outs, axis=-1)
    assert stream.shape == full.shape
    # xpos scales are relative only up to float assoc; windows re-bucket
    np.testing.assert_allclose(stream, full, rtol=1e-4, atol=1e-5)


def test_streaming_flat_layout_and_empty_push():
    codec = tiny_soundstream(attn_window_size=None, use_local_attn=False)
    codes = _codes_for(codec, 24)
    g, b, n, q = codes.shape
    flat = np.asarray(codes).transpose(1, 2, 0, 3).reshape(b, n, g * q)
    full = np.asarray(codec.decode_from_codebook_indices(codes))

    dec = StreamingCodecDecoder(codec, chunk_frames=64)  # bigger than stream
    out = dec.push(flat)
    assert out.shape[-1] == 0  # nothing ready yet
    tail = dec.flush()
    np.testing.assert_array_equal(tail, full)


def test_streaming_buffer_is_bounded():
    """Long-running stream: internal buffer must hold O(context + chunk)
    frames, not the whole history (regression: _append grew unboundedly)."""
    codec = tiny_soundstream(attn_window_size=None, use_local_attn=False)
    codes = np.asarray(_codes_for(codec, 200))
    full = np.asarray(codec.decode_from_codebook_indices(jnp.asarray(codes)))

    dec = StreamingCodecDecoder(codec, chunk_frames=8)
    outs = []
    for i in range(0, codes.shape[2], 5):
        outs.append(dec.push(codes[:, :, i:i + 5]))
    # buffered window never exceeds context + chunk + push-bite + alignment
    held = dec._codes.shape[2]
    assert held <= dec.context + dec.chunk + 5 + dec.align, held
    assert dec.buffered_frames == codes.shape[2]  # absolute count preserved
    outs.append(dec.flush())
    stream = np.concatenate(outs, axis=-1)
    np.testing.assert_array_equal(stream, full)  # trimming is still bit-exact


# --- streaming ENCODE (round 3: the encode-side twin) -----------------------

def test_encode_lookback_is_finite_and_reasonable():
    codec = tiny_soundstream()
    conv_lb, attn_lb = encode_lookback(codec)
    assert 0 < conv_lb < 10000   # samples
    assert attn_lb == 2 * 16 * len(codec.encoder_attn.layers)


def test_streaming_encode_no_attn_exact():
    codec = tiny_soundstream(attn_window_size=None, use_local_attn=False)
    n_frames = 96
    x = 0.3 * jax.random.normal(KEY, (2, n_frames * codec.seq_len_multiple_of))
    full = np.asarray(codec.tokenize(x))  # (G, B, N, Q)

    enc = StreamingCodecEncoder(codec, chunk_frames=8)
    xs = np.asarray(x)
    outs = []
    step = 5 * codec.seq_len_multiple_of + 3  # uneven, non-frame-aligned bites
    for i in range(0, xs.shape[1], step):
        outs.append(enc.push(xs[:, i:i + step]))
    outs.append(enc.flush())
    stream = np.concatenate(outs, axis=2)
    assert stream.shape == full.shape
    np.testing.assert_array_equal(stream, full)


def test_streaming_encode_with_local_attn_exact():
    codec = tiny_soundstream()  # attn_window_size=16
    n_frames = 96
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(3),
                                (2, n_frames * codec.seq_len_multiple_of))
    full = np.asarray(codec.tokenize(x))

    enc = StreamingCodecEncoder(codec, chunk_frames=16)
    outs = [enc.push(np.asarray(x)), enc.flush()]
    stream = np.concatenate(outs, axis=2)
    assert stream.shape == full.shape
    # discrete argmin codes absorb float reordering noise -> exact match
    np.testing.assert_array_equal(stream, full)


def test_streaming_encode_buffer_is_bounded_and_roundtrips():
    codec = tiny_soundstream(attn_window_size=None, use_local_attn=False)
    n_frames = 200
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(4),
                                (1, n_frames * codec.seq_len_multiple_of))
    full = np.asarray(codec.tokenize(x))

    enc = StreamingCodecEncoder(codec, chunk_frames=8)
    xs = np.asarray(x)
    outs = []
    step = 7 * codec.seq_len_multiple_of
    for i in range(0, xs.shape[1], step):
        outs.append(enc.push(xs[:, i:i + step]))
    held_frames = enc._wave.shape[1] // codec.seq_len_multiple_of
    assert held_frames <= enc.context + enc.pad_frames + enc.chunk + 7 + enc.align, held_frames
    outs.append(enc.flush())
    stream = np.concatenate(outs, axis=2)
    np.testing.assert_array_equal(stream, full)
    # chain into the streaming decoder: full streaming round trip
    dec = StreamingCodecDecoder(codec, chunk_frames=8)
    wave = np.concatenate([dec.push(stream), dec.flush()], axis=-1)
    offline = np.asarray(codec.decode_from_codebook_indices(jnp.asarray(full)))
    np.testing.assert_array_equal(wave, offline)


def test_streaming_encode_bounded_compile_count():
    """Irregular push sizes must NOT grow the jitted-shape set without bound:
    in steady state every _encode window is pad+context+chunk frames — one
    compiled shape (ADVICE r3)."""
    codec = tiny_soundstream()
    enc = StreamingCodecEncoder(codec, chunk_frames=8)
    ds = codec.seq_len_multiple_of
    rng = np.random.default_rng(0)
    x = 0.3 * rng.standard_normal((1, 400 * ds)).astype(np.float32)
    full = np.asarray(codec.tokenize(jnp.asarray(x)))
    outs, i = [], 0
    while i < x.shape[1]:
        step = int(rng.integers(1, 30)) * ds + int(rng.integers(0, ds))
        outs.append(enc.push(x[:, i:i + step]))
        i += step
    outs.append(enc.flush())
    stream = np.concatenate(outs, axis=2)
    np.testing.assert_array_equal(stream, full)
    # warm-up passes through <= (context+pad)/chunk clamped-start shapes,
    # then ONE steady-state shape, plus at most one flush-tail shape — the
    # count must NOT grow with the number of (irregular) pushes
    warmup = (enc.context + enc.pad_frames) // enc.chunk + 2
    n_shapes = enc._encode._cache_size()
    assert n_shapes <= warmup + 2, (n_shapes, warmup)
