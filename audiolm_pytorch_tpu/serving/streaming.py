"""Streaming (chunked) codec decode for serving.

The SoundStream decoder is causal end to end (causal convs, causal transpose
convs, causal windowed attention — reference architecture at
soundstream.py:362-460), so the waveform for token frames [a, b) can be
reproduced exactly from a bounded window of past tokens. `StreamingCodecDecoder`
exploits this: push acoustic-token frames incrementally, receive waveform
chunks identical to the corresponding slice of a full offline decode, with
O(context + chunk) work per chunk instead of O(T) re-decode.

The required context is computed analytically from the decoder architecture
(`decode_lookback_frames`) by walking the module chain backwards and
accumulating causal receptive fields through upsampling stages.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.soundstream import DecoderBlock, EncoderBlock, SoundStream
from ..nn.layers import exists

__all__ = ["StreamingCodecDecoder", "StreamingCodecEncoder",
           "decode_lookback_frames", "encode_lookback"]


def decode_lookback_frames(codec: SoundStream) -> int:
    """Causal lookback of the decode path, in token frames.

    Walks the decode chain in reverse, tracking how many PAST samples each
    stage needs at its operating rate:
      - causal conv (k, d): need += (k-1)*d
      - causal transpose conv (k, stride s): need_in = ceil((need + k-1)/s)
      - local attention layer (window w): lookback ≤ 2w frames per layer
        (each query sees its own and the previous window)
    GateLoop layers (associative scan over the whole history) have unbounded
    lookback; returns -1 in that case (caller must fall back to full-prefix
    decode).
    """
    need = codec.decoder_final.weight.shape[0] - 1  # final conv, sample rate
    for block in reversed(codec.decoder_blocks):
        if not isinstance(block, DecoderBlock):
            return -1  # GateLoop: unbounded
        for res in (block.res3, block.res2, block.res1):
            k1 = res.conv1.weight.shape[0]
            need += (k1 - 1) * res.conv1.dilation
            need += res.conv2.weight.shape[0] - 1
            if res.se is not None:
                return -1  # squeeze-excite cumulative mean: unbounded
        k = block.up.weight.shape[0]
        s = block.up.stride
        need = math.ceil((need + k - 1) / s)
    need += codec.decoder_init.weight.shape[0] - 1  # init conv, frame rate
    if codec.decoder_attn is not None:
        need += 2 * codec.decoder_attn.window_size * len(codec.decoder_attn.layers)
    return int(need)


def encode_lookback(codec: SoundStream) -> tuple:
    """Causal lookback of the encode path: ``(conv_samples, attn_frames)``.

    ``conv_samples`` is how many PAST raw samples the conv stack
    (encoder_init -> blocks -> encoder_final) needs so that a frame's
    pre-attention embedding is exact; ``attn_frames`` is the additional
    frame-level lookback of the bottleneck local transformer (2w per layer).
    Returns ``(-1, -1)`` when the path has unbounded lookback (GateLoop
    blocks or squeeze-excite cumulative means).
    """
    need = codec.encoder_final.weight.shape[0] - 1  # frame rate
    for block in reversed(codec.encoder_blocks):
        if not isinstance(block, EncoderBlock):
            return -1, -1  # GateLoop: unbounded
        k = block.down.weight.shape[0]
        need = need * block.down.stride + (k - 1)
        for res in (block.res3, block.res2, block.res1):
            if res.se is not None:
                return -1, -1  # cumulative-mean squeeze-excite: unbounded
            need += (res.conv1.weight.shape[0] - 1) * res.conv1.dilation
            need += res.conv2.weight.shape[0] - 1
    need += codec.encoder_init.weight.shape[0] - 1  # sample rate
    attn = (2 * codec.encoder_attn.window_size * len(codec.encoder_attn.layers)
            if codec.encoder_attn is not None else 0)
    return int(need), int(attn)


class StreamingCodecEncoder:
    """Stateful chunked tokenizer over raw waveform samples (the encode-side
    twin of `StreamingCodecDecoder` — together they give end-to-end streaming
    serving: mic in -> tokens -> tokens -> speaker out).

    >>> enc = StreamingCodecEncoder(codec, chunk_frames=16)
    >>> for samples in wave_stream:          # (B, n) any n
    ...     codes = enc.push(samples)        # (G, B, m, Q) newly ready frames
    >>> codes = enc.flush()                  # remaining complete frames

    Emitted codes are exactly `codec.tokenize(full_wave)` for the
    corresponding frame slice. Two context levels are maintained:
    `encode_lookback` samples of raw audio make the conv-stack embeddings
    exact, and the local-attention context (window-bucket aligned, matching
    the offline bucketing which starts at absolute frame 0) makes the
    bottleneck transformer exact; conv frames recomputed from the padded
    window edge are trimmed BEFORE attention so they never contaminate
    attention keys. Trailing samples short of a full frame are dropped at
    flush, matching the offline `curtail_to_multiple` contract
    (reference data handling: soundstream.py:771-773).
    """

    def __init__(self, codec: SoundStream, *, chunk_frames: int = 16,
                 context_frames: int | None = None):
        self.codec = codec
        self.ds = codec.seq_len_multiple_of
        conv_lb, attn_lb = encode_lookback(codec)
        if conv_lb < 0:
            raise ValueError(
                "codec encode path has unbounded lookback (gateloop or "
                "squeeze-excite); streaming encode unavailable — use "
                "tokenize on the full waveform")
        align = codec.encoder_attn.window_size \
            if codec.encoder_attn is not None else 1
        self.align = align
        self.context = int(math.ceil((attn_lb if context_frames is None
                                      else context_frames) / align) * align)
        self.pad_frames = int(math.ceil(conv_lb / self.ds))
        # chunk is rounded UP to the attention-window alignment so that in
        # steady state every _encode window has the SAME length
        # (pad + context + chunk): one compiled shape, however irregular the
        # push sizes (ADVICE r3 — variable windows triggered a fresh XLA
        # compile per distinct length). Warm-up (emitted < context) passes
        # through at most context/chunk distinct shapes, each compiled once.
        self.chunk = int(math.ceil(chunk_frames / align) * align)
        self._wave = None    # (B, n) buffered recent raw samples
        self._base = 0       # absolute FRAME index of self._wave[:, 0]
        self._emitted = 0    # frames already emitted

        def _window_codes(codec, x, trim):
            x = x.astype(jnp.dtype(codec.compute_dtype))
            h = codec.encoder_init(x[..., None])
            for block in codec.encoder_blocks:
                h = block(h)
            h = codec.encoder_final(h)
            h = h[:, trim:]  # drop frames contaminated by the window edge
            if codec.encoder_attn is not None:
                h = codec.encoder_attn(h)
            _, indices, _, _ = codec.rq(h, train=False)
            return indices

        self._encode = jax.jit(_window_codes, static_argnums=2)

    @property
    def buffered_frames(self) -> int:
        """Complete frames pushed so far (absolute count)."""
        if self._wave is None:
            return self._base
        return self._base + self._wave.shape[1] // self.ds

    def push(self, samples) -> np.ndarray:
        """Append raw samples (B, n) or (n,); return newly ready codes
        (G, B, m, Q). Emits in fixed `chunk_frames` chunks (bounded
        jit-compile count)."""
        samples = np.asarray(samples)
        if samples.ndim == 1:
            samples = samples[None]
        self._wave = samples if self._wave is None else \
            np.concatenate([self._wave, samples], axis=1)
        ready = (self.buffered_frames // self.chunk) * self.chunk
        return self._emit(ready)

    def flush(self) -> np.ndarray:
        """Tokenize any remaining complete frames (sub-frame tail dropped)."""
        return self._emit(self.buffered_frames)

    def _emit(self, upto: int):
        """Emit frames up to `upto`, one fixed-size chunk per _encode call
        (bounded jit-compile count; see __init__ chunk note)."""
        if upto <= self._emitted:
            b = 1 if self._wave is None else self._wave.shape[0]
            return np.zeros((self.codec.rq_groups, b, 0,
                             self.codec.rq.num_quantizers), np.int32)
        outs = []
        while self._emitted < upto:
            outs.append(self._emit_one(min(self._emitted + self.chunk, upto)))
        return np.concatenate(outs, axis=2)

    def _emit_one(self, upto: int):
        start = max(0, self._emitted - self.context)
        start = (start // self.align) * self.align  # attention-bucket aligned
        conv_start = max(0, start - self.pad_frames)
        window = jnp.asarray(self._wave[:, (conv_start - self._base) * self.ds:
                                        (upto - self._base) * self.ds])
        idx = np.asarray(self._encode(self.codec, window, start - conv_start))
        out = idx[:, :, self._emitted - start:]
        self._emitted = upto
        # drop samples no future decode window can reach
        keep_from = max(0, (max(0, self._emitted - self.context)
                            // self.align) * self.align - self.pad_frames)
        if keep_from > self._base and self._wave is not None:
            self._wave = self._wave[:, (keep_from - self._base) * self.ds:]
            self._base = keep_from
        return out


class StreamingCodecDecoder:
    """Stateful chunked decoder over acoustic token frames.

    >>> dec = StreamingCodecDecoder(codec, chunk_frames=16)
    >>> for codes in token_stream:          # codes: (G, B, n, Q)
    ...     audio = dec.push(codes)         # (B, m*DS) newly decoded samples
    >>> audio = dec.flush()                 # remaining tail

    Emitted samples are exactly the corresponding slice of
    `codec.decode_from_codebook_indices(all_codes)`. When the codec has a
    bottleneck local transformer, windows are aligned to its attention window
    so bucketing matches the offline decode (xpos is relative, so alignment
    plus lookback gives float-exact parity up to reordering noise).
    """

    def __init__(self, codec: SoundStream, *, chunk_frames: int = 16,
                 context_frames: int | None = None):
        self.codec = codec
        self.ds = codec.seq_len_multiple_of
        lb = decode_lookback_frames(codec) if context_frames is None \
            else context_frames
        if lb < 0:
            raise ValueError(
                "codec decode path has unbounded lookback (gateloop or "
                "squeeze-excite); streaming decode unavailable — use "
                "decode_from_codebook_indices on the full sequence")
        align = codec.decoder_attn.window_size if codec.decoder_attn is not None else 1
        self.context = int(math.ceil(lb / align) * align)
        self.align = align
        self.chunk = chunk_frames
        self._codes = None   # buffered (G, B, n, Q) numpy (recent frames only)
        self._base = 0       # absolute frame index of self._codes[:, :, 0]
        self._emitted = 0    # frames already emitted
        self._decode = jax.jit(
            lambda codec, idx: codec.decode_from_codebook_indices(idx))

    @property
    def buffered_frames(self) -> int:
        """Total frames pushed so far (absolute count)."""
        return self._base + (0 if self._codes is None else self._codes.shape[2])

    def _append(self, codes):
        codes = np.asarray(codes)
        if codes.ndim == 3:  # (B, n, G*Q) flat layout
            b, n, gq = codes.shape
            g = self.codec.rq_groups
            codes = codes.reshape(b, n, g, gq // g).transpose(2, 0, 1, 3)
        assert codes.ndim == 4, "codes must be (G, B, n, Q) or (B, n, G*Q)"
        self._codes = codes if self._codes is None else \
            np.concatenate([self._codes, codes], axis=2)

    def _emit(self, upto: int):
        """Decode and return frames [self._emitted, upto)."""
        if upto <= self._emitted:
            b = 1 if self._codes is None else self._codes.shape[1]
            return np.zeros((b, 0), np.float32)
        start = max(0, self._emitted - self.context)
        start = (start // self.align) * self.align  # window-bucket alignment
        window = jnp.asarray(self._codes[:, :, start - self._base:
                                         upto - self._base])
        wave = np.asarray(self._decode(self.codec, window))
        out = wave[:, (self._emitted - start) * self.ds:
                   (upto - start) * self.ds]
        self._emitted = upto
        # drop frames older than any future decode window can reach, so a
        # long-running stream holds O(context + chunk) frames, not the whole
        # history
        keep_from = (max(0, self._emitted - self.context)
                     // self.align) * self.align
        if keep_from > self._base and self._codes is not None:
            self._codes = self._codes[:, :, keep_from - self._base:]
            self._base = keep_from
        return out

    def push(self, codes) -> np.ndarray:
        """Append token frames; return newly ready waveform samples (B, m*DS).
        Emits in fixed `chunk_frames` chunks (bounded jit-compile count)."""
        self._append(codes)
        ready = (self.buffered_frames // self.chunk) * self.chunk
        return self._emit(ready)

    def flush(self) -> np.ndarray:
        """Decode any remaining buffered frames (possibly a short tail)."""
        return self._emit(self.buffered_frames)
