"""`audiolm` command line — the CLI the reference lists as an unshipped TODO
(reference: README.md:394 "audiolm generate" checkbox).

Subcommands:
  audiolm generate  — run the 3-stage pipeline from saved checkpoints
  audiolm tokenize  — waveform -> codec codes (npz)
  audiolm decode    — codec codes (npz) -> waveform
  audiolm info      — inspect a checkpoint
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _load_codec(path, key):
    from .models.soundstream import SoundStream
    return SoundStream.init_and_load_from(path)


def cmd_info(args):
    from .training.checkpoint import load_checkpoint
    pkg = load_checkpoint(args.checkpoint)
    print(json.dumps({"kind": pkg["kind"], "version": pkg["version"],
                      "config": {k: str(v) for k, v in pkg["config"].items()}},
                     indent=2))


def cmd_tokenize(args):
    import jax.numpy as jnp
    from .utils.audio_io import load_audio
    codec = _load_codec(args.codec, None)
    wav, sr = load_audio(args.audio)
    codes = codec.tokenize(jnp.asarray(wav.mean(0))[None], input_sample_hz=sr)
    np.savez(args.output, codes=np.asarray(codes))
    print(f"wrote codes {codes.shape} to {args.output}")


def cmd_decode(args):
    import jax.numpy as jnp
    from .utils.audio_io import save_audio
    codec = _load_codec(args.codec, None)
    codes = jnp.asarray(np.load(args.codes)["codes"])
    wav = codec.decode_from_codebook_indices(codes)
    save_audio(args.output, np.asarray(wav[0]), codec.target_sample_hz)
    print(f"wrote {args.output}")


def cmd_generate(args):
    import jax
    import jax.numpy as jnp
    from .models.audiolm import AudioLM
    from .models.hubert import HubertWithKmeans
    from .models.lm import (CoarseTransformer, FineTransformer,
                            SemanticTransformer)
    from .training.checkpoint import load_checkpoint
    from .utils.audio_io import save_audio

    key = jax.random.PRNGKey(args.seed)
    codec = _load_codec(args.codec, key)
    wav2vec = HubertWithKmeans(checkpoint_path=args.hubert_checkpoint,
                               kmeans_path=args.hubert_kmeans)

    def load_lm(cls, path):
        pkg = load_checkpoint(path)
        cfg = pkg["config"]
        model = cls(**cfg, key=jax.random.PRNGKey(0))
        return pkg["restore"](model)

    semantic = load_lm(SemanticTransformer, args.semantic)
    coarse = load_lm(CoarseTransformer, args.coarse)
    fine = load_lm(FineTransformer, args.fine)

    audiolm = AudioLM(wav2vec=wav2vec, codec=codec,
                      semantic_transformer=semantic,
                      coarse_transformer=coarse, fine_transformer=fine)
    wave = audiolm(batch_size=args.batch_size,
                   text=[args.text] * args.batch_size if args.text else None,
                   prime_wave_path=args.prime_wave,
                   max_length=args.max_length, key=key)
    waves = wave if isinstance(wave, list) else list(wave)
    out = Path(args.output)
    for i, w in enumerate(waves):
        if w is None:
            continue
        path = out if len(waves) == 1 else out.with_stem(f"{out.stem}_{i}")
        save_audio(path, np.asarray(w), codec.target_sample_hz)
        print(f"wrote {path}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="audiolm",
                                description="TPU-native AudioLM CLI")
    sub = p.add_subparsers(dest="cmd", required=True)

    gi = sub.add_parser("info", help="inspect a checkpoint")
    gi.add_argument("checkpoint")
    gi.set_defaults(fn=cmd_info)

    gt = sub.add_parser("tokenize", help="waveform -> codec codes")
    gt.add_argument("--codec", required=True)
    gt.add_argument("--audio", required=True)
    gt.add_argument("--output", default="codes.npz")
    gt.set_defaults(fn=cmd_tokenize)

    gd = sub.add_parser("decode", help="codec codes -> waveform")
    gd.add_argument("--codec", required=True)
    gd.add_argument("--codes", required=True)
    gd.add_argument("--output", default="decoded.wav")
    gd.set_defaults(fn=cmd_decode)

    gg = sub.add_parser("generate", help="3-stage text/prime-conditioned generation")
    gg.add_argument("--codec", required=True, help="SoundStream checkpoint (.npz)")
    gg.add_argument("--semantic", required=True)
    gg.add_argument("--coarse", required=True)
    gg.add_argument("--fine", required=True)
    gg.add_argument("--hubert-checkpoint", default=None)
    gg.add_argument("--hubert-kmeans", default=None)
    gg.add_argument("--text", default=None)
    gg.add_argument("--prime-wave", default=None)
    gg.add_argument("--max-length", type=int, default=2048)
    gg.add_argument("--batch-size", type=int, default=1)
    gg.add_argument("--seed", type=int, default=0)
    gg.add_argument("--output", default="generated.wav")
    gg.set_defaults(fn=cmd_generate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
