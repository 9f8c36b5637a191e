"""Host-side audio file IO (the reference uses torchaudio's C++ backends,
reference: data.py:72, trainer.py:688). Pure-python WAV parsing keeps the
device compute path dependency-free; FLAC/MP3 decode is delegated to the
native dataloader extension when built (see native/)."""
from __future__ import annotations

import struct
import wave
from pathlib import Path

import numpy as np

__all__ = ["load_audio", "save_audio", "SUPPORTED_EXTENSIONS",
           "FFMPEG_EXTENSIONS"]

SUPPORTED_EXTENSIONS = (".wav", ".flac")
# lossy container formats decoded through the FFmpeg-backed native library
# (native/ffdecode.cpp) — matching the reference's torchaudio path for its
# mp3/webm glob (reference: data.py:49-52, 72)
FFMPEG_EXTENSIONS = (".mp3", ".webm", ".ogg", ".opus", ".m4a", ".mp4", ".aac")


def load_audio(path):
    """Returns (waveform float32 (channels, T) in [-1, 1], sample_rate).

    WAV decodes in-process; FLAC goes through the native C++ decoder
    (native/audioload.cpp), which returns a mono downmix — matching the
    dataset's downstream mono handling."""
    path = Path(path)
    if path.suffix.lower() == ".wav":
        return _load_wav(path)
    if path.suffix.lower() == ".flac":
        from ..data import native_loader
        if not native_loader.native_available():
            raise RuntimeError(
                "FLAC decode requires the native loader (g++ build of "
                "native/audioload.cpp failed or toolchain missing)")
        length, rate, _ = native_loader.probe(path)
        out, _, _ = native_loader.load_batch([path], length)
        return out[:1], rate  # already mono-downmixed, shape (1, T)
    if path.suffix.lower() in FFMPEG_EXTENSIONS:
        from ..data import native_loader
        if not native_loader.ff_available():
            raise RuntimeError(
                f"{path.suffix} decode requires the FFmpeg-backed native "
                "library (g++ build of native/ffdecode.cpp against "
                "libavformat/libavcodec failed or FFmpeg dev libs missing)")
        mono, rate = native_loader.ff_decode(path)
        return mono[None], rate  # mono downmix, shape (1, T)
    raise ValueError(
        f"unsupported audio format {path.suffix} "
        f"(supported: {SUPPORTED_EXTENSIONS + FFMPEG_EXTENSIONS})")


def _load_wav(path):
    with wave.open(str(path), "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        data = ((a[:, 0].astype(np.int32)) | (a[:, 1].astype(np.int32) << 8)
                | (a[:, 2].astype(np.int32) << 16))
        data = (data - (data >> 23 << 24)).astype(np.float32) / 8388608.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    data = data.reshape(-1, ch).T  # (channels, T)
    return data, sr


def save_audio(path, wave_data, sample_rate: int):
    """wave_data: (T,) or (channels, T) float in [-1, 1] -> 16-bit PCM WAV."""
    wave_data = np.asarray(wave_data, np.float32)
    if wave_data.ndim == 1:
        wave_data = wave_data[None]
    ch, _ = wave_data.shape
    pcm = np.clip(wave_data.T * 32767.0, -32768, 32767).astype("<i2")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
