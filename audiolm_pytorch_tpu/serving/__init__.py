from .streaming import StreamingCodecDecoder, decode_lookback_frames

__all__ = ["StreamingCodecDecoder", "decode_lookback_frames"]
