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

from ..models.soundstream import DecoderBlock, SoundStream
from ..nn.layers import exists

__all__ = ["StreamingCodecDecoder", "decode_lookback_frames"]


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
