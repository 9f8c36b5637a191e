"""Shrink a trainer checkpoint into a committable model-only artifact.

Round-3→4 lesson: every trained artifact (72k-step codec, full 3-stage LM
chain) lived only in gitignored trainer checkpoints and was wiped by a VM
restart. This CLI re-saves just the model (or EMA) leaves as bf16 +
zip-compressed — small enough to commit — so training progress survives the
machine.

    python tools/persist_ckpt.py results_quality/results/soundstream.12000.ckpt.npz \
        persist/soundstream_r4.npz --prefix "['ema'].shadow"

Restore with `SoundStream.init_and_load_from(out)` when config metadata is
present, else build the model with its run args and call `.load(out)`.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from audiolm_pytorch_tpu.training.checkpoint import persist_model_from


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--prefix", default="['model']",
                    help="keystr prefix of the subtree to keep "
                         "(EMA codec weights: \"['ema'].shadow\")")
    ap.add_argument("--fp32", action="store_true",
                    help="keep float32 (default casts to bf16)")
    args = ap.parse_args()
    out = persist_model_from(args.src, args.dst, prefix=args.prefix,
                             bf16=not args.fp32)
    src_mb = Path(args.src).stat().st_size / 1e6
    dst_mb = Path(out).stat().st_size / 1e6
    print(f"{args.src} ({src_mb:.1f} MB) -> {out} ({dst_mb:.1f} MB)")


if __name__ == "__main__":
    main()
