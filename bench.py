"""Benchmark: SoundStream codec encode+decode real-time factor on one chip.

Workload: the reference's AudioLM codec preset (320x downsample @16 kHz,
12 quantizers, codebook 1024 — soundstream.py:999-1010) on a batch of 2 s
clips. Metric = seconds of audio processed per wall second through the full
tokenize -> decode_from_codebook_indices round trip (both directions jitted).

Target from BASELINE.md: > 50x real-time per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from audiolm_pytorch_tpu.models.soundstream import AudioLMSoundStream

    codec = AudioLMSoundStream(codebook_size=1024, compute_dtype="bfloat16",
                               key=jax.random.PRNGKey(0))

    batch = 8
    seconds = 2.0
    sr = codec.target_sample_hz
    n = int(seconds * sr)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n), jnp.float32) * 0.1

    @jax.jit
    def roundtrip(codec, x):
        codes = codec(x, return_codes_only=True)
        return codec.decode_from_codebook_indices(codes)

    # warmup / compile
    roundtrip(codec, x).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = roundtrip(codec, x)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    audio_seconds = batch * seconds * iters
    rtf = audio_seconds / elapsed
    print(json.dumps({
        "metric": "codec_encode_decode_rtf_2s_16khz",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
