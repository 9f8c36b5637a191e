"""Per-category held-out SI-SNR for the corpus codec (NOTES round-3 item 4).

The synthetic corpus mixes speech-like clips (80%) with chirps (10%),
chords (5%) and shaped noise (5%). Noise is waveform-incompressible at the
codec's 4 kbps (8 x 10-bit codes at 50 Hz), so the *mean* held-out SI-SNR
is structurally dragged below what the codec achieves on speech. This
script regroups the held-out set by category so the headline number can be
interpreted (reference quality targets are speech codecs: SoundStream paper
via reference README.md:409-416).

Clip categories are re-derived exactly by replaying the corpus PRNG stream
(build_corpus uses default_rng(0) and one synth_clip call per clip); the
valid split replays the trainer's deterministic split (seed 42,
training/trainer.py:98-107).

    python examples/eval_codec_categories.py --ckpt results_quality/results/soundstream.45000.ckpt.npz
"""
from __future__ import annotations

import argparse
import random
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SR = 16000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="results_quality/results/soundstream.45000.ckpt.npz")
    ap.add_argument("--data", default="results_quality/data")
    ap.add_argument("--clips", type=int, default=1300)
    ap.add_argument("--max-length", type=int, default=16000)
    ap.add_argument("--valid-frac", type=float, default=0.02)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--ema", action="store_true", help="evaluate the EMA shadow")
    ap.add_argument("--both", action="store_true",
                    help="evaluate raw AND EMA weights in one process — the "
                         "jitted forward takes the model as an argument, so "
                         "the second pass reuses the compiled executable "
                         "(a fresh process pays 5-20 min TPU compile)")
    ap.add_argument("--channels", type=int, default=32,
                    help="fallback encoder/decoder base width for legacy "
                         "checkpoints without an embedded config (newer "
                         "trainer ckpts are self-describing — ADVICE r4)")
    ap.add_argument("--save-samples", type=int, default=0, metavar="N",
                    help="save ref/recon wav pairs for the first N held-out "
                         "speech clips under results_quality/samples/")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from audiolm_pytorch_tpu import SoundStream, SoundStreamTrainer
    from audiolm_pytorch_tpu.utils.metrics import si_snr, stoi
    from examples.train_codec_corpus import synth_clip

    # replay the corpus PRNG stream to recover each clip's category and its
    # breath-noise SI-SNR ceiling (see synth_clip)
    rng = np.random.default_rng(0)
    meta = [synth_clip(rng, return_label=True)[1:] for _ in range(args.clips)]
    labels = [m[0] for m in meta]
    ceilings = [m[1] for m in meta]

    # prefer the config embedded in the checkpoint (self-describing trainer
    # ckpts, round 4); fall back to --channels for legacy artifacts
    from examples.train_audiolm_stages import build_codec
    ss = build_codec(jax, ckpt=args.ckpt, channels=args.channels)
    trainer = SoundStreamTrainer(
        ss, folder=args.data, batch_size=8, grad_accum_every=1,
        data_max_length=args.max_length, num_train_steps=1,
        save_results_every=10 ** 9, save_model_every=10 ** 9,
        results_folder="results_quality/results", use_ema=True,
        bf16_compute=True, data_parallel=False, valid_frac=args.valid_frac)
    trainer.load(Path(args.ckpt))

    # replay the trainer's deterministic valid split over the sorted file list
    n = len(trainer.ds) + len(trainer.valid_ds)
    idx = list(range(n))
    random.Random(42).shuffle(idx)
    valid_idx = idx[: max(1, int(n * args.valid_frac))]

    fwd = jax.jit(lambda m, x: m(x, return_recons_only=True))
    if args.save_samples:
        from audiolm_pytorch_tpu.utils.audio_io import save_audio
        samples_dir = Path("results_quality/samples")
        samples_dir.mkdir(parents=True, exist_ok=True)

    def run_eval(model, tag, save_samples):
        by_cat = defaultdict(list)
        rows = []
        saved = 0
        for j in range(len(trainer.valid_ds)):
            x = trainer.valid_ds[j][: args.max_length]
            xj = jnp.asarray(x)[None]
            recon = fwd(model, xj)
            snr = float(si_snr(recon, xj)[0])
            st = stoi(np.asarray(recon[0]), np.asarray(x), SR)
            lab = labels[valid_idx[j]]
            by_cat[lab].append(snr)
            rows.append((valid_idx[j], lab, snr, st, ceilings[valid_idx[j]]))
            if save_samples and lab == "speech" and saved < save_samples:
                save_audio(samples_dir / f"clip{valid_idx[j]:05d}_ref.wav",
                           np.asarray(x, np.float32), SR)
                save_audio(samples_dir / f"clip{valid_idx[j]:05d}_recon.wav",
                           np.asarray(recon[0], np.float32), SR)
                saved += 1

        print(f"checkpoint: {args.ckpt}  ({tag})")
        for i, lab, snr, st, ceil in rows:
            c = f"  ceiling={ceil:6.1f}" if ceil is not None else ""
            print(f"  clip {i:5d} [{lab:6s}] si_snr={snr:7.3f}  stoi={st:.4f}{c}")
        allv = [s for v in by_cat.values() for s in v]
        print(f"overall mean si_snr = {np.mean(allv):7.3f}  (n={len(allv)})")
        for lab in ("speech", "chirp", "chord", "noise"):
            if by_cat[lab]:
                print(f"  {lab:6s} mean si_snr = {np.mean(by_cat[lab]):7.3f}  "
                      f"(n={len(by_cat[lab])})")
        sp_ceil = [c for _, lab, _, _, c in rows
                   if lab == "speech" and c is not None]
        if sp_ceil:
            print(f"  speech breath-noise SI-SNR ceiling: mean "
                  f"{np.mean(sp_ceil):6.1f} dB, min {np.min(sp_ceil):6.1f} "
                  f"(a perfect 4 kbps codec cannot exceed these per clip)")

    have_ema = trainer.ema_state is not None
    if args.both:
        run_eval(trainer.model, "raw", args.save_samples)
        if have_ema:
            print()
            run_eval(trainer.ema_state.shadow, "EMA", 0)
    else:
        model = (trainer.ema_state.shadow
                 if args.ema and have_ema else trainer.model)
        run_eval(model, "EMA" if args.ema else "raw", args.save_samples)


if __name__ == "__main__":
    main()
