"""At-scale codec quality run (VERDICT r1 next-step 8): train SoundStream on
a >1 h synthetic multi-speaker corpus with the full GAN stack (bf16 compute,
gradient penalty on its reference cadence, EMA) and report held-out SI-SNR +
mel-distance curves.

The corpus is synthesized speech-like audio: per-"speaker" fundamentals
(80-300 Hz) with drift+vibrato, 2-3 random formant resonances shaping a
harmonic stack, syllabic amplitude modulation, breath noise, plus a slice of
chirps/chords/noise for diversity. No real speech exists in this offline
image; the point is codec-training dynamics at dataset scale rather than
4-clip overfit (reference quality targets: SoundStream paper via reference
README.md:409-416).

    python examples/train_codec_corpus.py --steps 2000
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SR = 16000


def synth_clip(rng, seconds=3.0, return_label=False):
    n = int(seconds * SR)
    t = np.arange(n) / SR
    kind = rng.random()
    if kind < 0.8:  # speech-like
        f0 = rng.uniform(80, 300)
        drift = f0 * 0.1 * np.cumsum(rng.normal(0, 1e-3, n))
        vibrato = f0 * 0.02 * np.sin(2 * np.pi * rng.uniform(4, 7) * t)
        inst_f0 = f0 + drift + vibrato
        phase = 2 * np.pi * np.cumsum(inst_f0) / SR
        n_harm = int(rng.integers(8, 20))
        formants = rng.uniform(300, 3500, size=rng.integers(2, 4))
        bws = rng.uniform(80, 300, size=formants.shape)
        sig = np.zeros(n)
        for h in range(1, n_harm + 1):
            fh = f0 * h
            if fh > SR / 2 - 200:
                break
            amp = np.sum(np.exp(-0.5 * ((fh - formants) / bws) ** 2)) + 0.03
            amp /= h ** 0.5
            sig += amp * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
        # syllabic AM + pauses
        am = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(2, 6) * t
                                  + rng.uniform(0, 2 * np.pi))
        gate = (np.sin(2 * np.pi * rng.uniform(0.3, 1.0) * t
                       + rng.uniform(0, 2 * np.pi)) > -0.85).astype(float)
        gate = np.convolve(gate, np.ones(320) / 320, mode="same")
        sig = sig * am * gate
        noise = rng.normal(0, 0.01, n)  # breath noise
        hnr_db = 10 * np.log10(np.mean(sig ** 2) / np.mean(noise ** 2) + 1e-12)
        sig = sig + noise
    elif kind < 0.9:  # chirp
        f_start, f_end = rng.uniform(100, 2000, 2)
        phase = 2 * np.pi * np.cumsum(np.linspace(f_start, f_end, n)) / SR
        sig = np.sin(phase)
    elif kind < 0.95:  # chord
        sig = sum(np.sin(2 * np.pi * rng.uniform(150, 1500) * t
                         + rng.uniform(0, 2 * np.pi)) for _ in range(4))
    else:  # shaped noise
        sig = rng.normal(0, 1, n)
        k = np.hanning(int(rng.integers(8, 64)))
        sig = np.convolve(sig, k / k.sum(), mode="same")
    sig = sig / (np.abs(sig).max() + 1e-7) * rng.uniform(0.3, 0.8)
    if return_label:
        label = ("speech" if kind < 0.8 else "chirp" if kind < 0.9
                 else "chord" if kind < 0.95 else "noise")
        # per-clip SI-SNR ceiling: the additive breath noise is waveform-
        # incompressible at 4 kbps, so a codec that perfectly reconstructs
        # the harmonic part scores SI-SNR ~= this harmonic-to-noise ratio
        # (None for noiseless categories)
        return sig.astype(np.float32), label, (hnr_db if kind < 0.8 else None)
    return sig.astype(np.float32)


def build_corpus(folder: Path, n_clips: int, seed=0):
    from audiolm_pytorch_tpu.utils.audio_io import save_audio
    folder.mkdir(parents=True, exist_ok=True)
    existing = len(list(folder.glob("*.wav"))) + len(list(folder.glob("*.flac")))
    if existing >= n_clips:
        print(f"corpus already has {existing} clips")
        return
    rng = np.random.default_rng(seed)
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from flac_writer import write_flac
    t0 = time.time()
    for i in range(n_clips):
        clip = synth_clip(rng)
        if i % 60 == 0 and i > 0:  # sprinkle FLACs to exercise that decoder
            ints = np.clip(np.round(clip * 32767), -32768, 32767).astype(np.int64)
            write_flac(folder / f"clip_{i:05d}.flac", ints, SR, subframe="fixed",
                       blocksize=4096)
        else:
            save_audio(folder / f"clip_{i:05d}.wav", clip, SR)
        if i % 200 == 0:
            print(f"synth {i}/{n_clips} ({time.time()-t0:.0f}s)", flush=True)
    print(f"corpus: {n_clips} clips = {n_clips*3/3600:.2f} h of audio")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--clips", type=int, default=1300)  # ~1.08 h at 3 s
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-length", type=int, default=16000)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=50)
    ap.add_argument("--out", default="results_quality")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no-gp", action="store_true", help="disable the gradient penalty (stability at demo scale; see NOTES)")
    ap.add_argument("--adv-weight", type=float, default=1.0)
    ap.add_argument("--feat-weight", type=float, default=10.0)
    ap.add_argument("--recon-weight", type=float, default=10.0)
    ap.add_argument("--commit-weight", type=float, default=1.0, help="rq commitment weight (0 disables the encoder-collapsing pull during cold start - see NOTES silence-equilibrium item)")
    ap.add_argument("--no-rotation", action="store_true", help="plain STE instead of the rotation trick (see NOTES: with degenerate early codes the per-vector rotation scrambles the recon gradient direction and the commit loss collapses the encoder)")
    ap.add_argument("--mel-weight", type=float, default=1e-5, help="multi-scale mel recon weight (reference default 1e-5 is effectively off)")
    ap.add_argument("--stft-weight", type=float, default=0.0, help="multi-resolution complex-STFT (phase-aware) recon weight — round-4 lever for the pitch-phase tracking error on speech clips")
    ap.add_argument("--si-snr-weight", type=float, default=0.0,
                    help="negative per-clip SI-SNR loss weight — round-5 "
                         "lever: trains the scale-invariant, phase-sensitive "
                         "held-out metric directly (MSE is energy-weighted "
                         "and phase-tolerant; NOTES r3 diagnosis)")
    ap.add_argument("--stft-terms", default="1,1,1", help="comma weights for the (spectral-convergence, log-magnitude, complex/phase) terms; the phase-blind first two can create a magnitude-only attractor early in training")
    ap.add_argument("--dead-code-threshold", type=float, default=0.25, help="0 disables dead-code expiry entirely (with batch*frames << codebook_size ANY nonzero threshold reseeds the sub-threshold majority of codes EVERY step: a reseeded code gets cluster_size=threshold, decays below it next step, and is reseeded again - permanent codebook churn)")
    ap.add_argument("--channels", type=int, default=32, help="encoder/decoder base width (reference default 32; round-3 diagnosis: the autoencoder, not the quantizer, is the capacity bottleneck)")
    ap.add_argument("--resume", default=None, help="'latest' or a checkpoint path; loads model+opts+ema before training")
    ap.add_argument("--init-model", default=None,
                    help="model-only persisted npz (tools/persist_ckpt.py "
                         "output) to initialize weights from — the recovery "
                         "path after a VM wipe where only persist/ survives; "
                         "optimizer/EMA start fresh, step counter resumes "
                         "from the artifact's recorded step")
    ap.add_argument("--cosine", action="store_true", help="cosine LR decay to 0 over --steps")
    ap.add_argument("--curve", default="quality_curve.jsonl", help="curve filename under --out")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from audiolm_pytorch_tpu import SoundStream, SoundStreamTrainer
    from audiolm_pytorch_tpu.data.dataset import SoundDataset
    from audiolm_pytorch_tpu.utils.audio_io import save_audio
    from audiolm_pytorch_tpu.utils.metrics import mel_distance, si_snr, stoi

    out = Path(args.out)
    data = out / "data"
    build_corpus(data, args.clips)

    # real reference architecture at reduced width (reference defaults:
    # soundstream.py:351-420 — channels 32, strides (2,4,5,8), 8 quantizers)
    # demo-scale discriminators: at this short training horizon the full-size
    # default discriminators race ahead of the generator and the adversarial +
    # feature-matching terms explode (measured: g-loss 4e2..1e6 by step 750-
    # 3000 at lr 1e-3, GP on or off). The proven overfit recipe's smaller
    # discriminators keep the game balanced; all generator defaults stay at
    # reference values (soundstream.py:351-420).
    ss = SoundStream(
        channels=args.channels, strides=(2, 4, 5, 8), channel_mults=(2, 4, 8, 16),
        codebook_dim=512, codebook_size=1024, rq_num_quantizers=8,
        attn_window_size=64, attn_heads=8, attn_dim_head=64,
        multi_scale_discr_kwargs=dict(channels=8, layers=3, groups=(1, 2, 4),
                                      chan_max=64),
        complex_stft_discr_kwargs=dict(channels=8),
        # short-horizon loss balance: at reference weights (recon 1 /
        # feat-match 100) the feature-matching term supplies ~90% of the
        # generator gradient (measured step-999 breakdown: 152 of 173) and
        # SI-SNR never leaves the near-silent regime in <10k steps. The demo
        # rebalances toward reconstruction; reference weights remain the
        # defaults (soundstream.py:379-382).
        recon_loss_weight=args.recon_weight,
        adversarial_loss_weight=args.adv_weight,
        feature_loss_weight=args.feat_weight,
        multi_spectral_recon_loss_weight=args.mel_weight,
        multi_stft_recon_loss_weight=args.stft_weight,
        multi_stft_term_weights=tuple(float(x) for x in
                                      args.stft_terms.split(",")),
        si_snr_loss_weight=args.si_snr_weight,
        # batch*frames (400/step) < codebook_size (1024): the reference's
        # threshold_ema_dead_code=2.0 then re-seeds most codes every step
        # (measured: 12 unique codes across 8 quantizers after 4k steps,
        # decoder collapsed to silence). 0.25 keeps once-in-a-while-used
        # codes alive (see quantize.py expiry note).
        rq_kwargs=dict(threshold_ema_dead_code=args.dead_code_threshold),
        rq_rotation_trick=not args.no_rotation,
        rq_commitment_weight=args.commit_weight,
        key=jax.random.PRNGKey(0))
    trainer = SoundStreamTrainer(
        ss, folder=str(data), batch_size=args.batch, grad_accum_every=1,
        data_max_length=args.max_length, num_train_steps=args.steps,
        lr=args.lr, warmup_steps=args.warmup,
        apply_grad_penalty_every=10 ** 9 if args.no_gp else 4,
        scheduler_cosine_decay=args.cosine,
        save_results_every=10 ** 9, save_model_every=1000,
        results_folder=str(out / "results"), use_ema=True,
        bf16_compute=not args.fp32, data_parallel=False, valid_frac=0.02,
        train_discriminators=not (args.adv_weight == 0 and args.feat_weight == 0))
    if args.resume == "latest":
        trainer.resume_latest()
    elif args.resume:
        trainer.load(Path(args.resume))
    if args.init_model:
        from audiolm_pytorch_tpu.training.checkpoint import load_pytree_into
        from audiolm_pytorch_tpu.training.ema import ema_init
        meta = json.loads(bytes(np.load(args.init_model)["__meta__"]
                                .tobytes()).decode())
        trainer.model = load_pytree_into(args.init_model, trainer.model)
        if trainer.ema_state is not None:
            trainer.ema_state = ema_init(trainer.model)
        trainer.steps = int(meta.get("steps", 0) or 0)
        print(f"initialized model from {args.init_model} "
              f"(step {trainer.steps}); fresh optimizer/EMA", flush=True)

    # fixed held-out eval batch
    val_items = [trainer.valid_ds[i] for i in range(min(8, len(trainer.valid_ds)))]
    val = jnp.asarray(np.stack([v[: args.max_length] for v in val_items]))

    @jax.jit
    def eval_model(model, x):
        recon = model(x, return_recons_only=True)
        return si_snr(recon, x), recon

    # record the run config in the curve file — the round-3→4 VM wipe showed
    # that an unrecorded command line makes a curve unreproducible
    with open(out / args.curve, "a") as f:
        f.write(json.dumps({"run_args": vars(args)}) + "\n")

    curve = []
    t0 = time.time()
    start = int(trainer.steps)
    n_todo = max(0, args.steps - start)
    for i in range(n_todo):
        logs = trainer.train_step()
        if i % args.eval_every == 0 or i == n_todo - 1:
            snrs, recon = eval_model(trainer.model, val)
            snr = float(jnp.mean(snrs))
            md = float(mel_distance(recon, val, SR))
            # STOI is the metric the phase-aware loss work targets (round-4
            # verdict weak #1: the curve never logged it) — host-side numpy
            st = float(np.mean(stoi(np.asarray(recon), np.asarray(val), SR)))
            row = dict(step=int(trainer.steps), si_snr=round(snr, 3),
                       stoi=round(st, 4),
                       mel_dist=round(md, 4),
                       recon=round(logs["recon_loss"], 5),
                       g=round(logs["loss"], 3), d=round(logs["discr_loss"], 3),
                       wall_s=round(time.time() - t0, 1))
            if trainer.ema_state is not None:
                ema_snrs, _ = eval_model(trainer.ema_state.shadow, val)
                row["ema_si_snr"] = round(float(jnp.mean(ema_snrs)), 3)
            curve.append(row)
            print(json.dumps(row), flush=True)
            with open(out / args.curve, "a") as f:
                f.write(json.dumps(row) + "\n")
    best = trainer.ema_state.shadow if trainer.ema_state is not None else trainer.model
    snrs, recon = eval_model(best, val)
    save_audio(out / "heldout_recon.wav", np.asarray(recon[0]), SR)
    save_audio(out / "heldout_ref.wav", np.asarray(val[0]), SR)
    print("final held-out SI-SNR (ema):", float(jnp.mean(snrs)))


if __name__ == "__main__":
    main()
