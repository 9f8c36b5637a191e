"""Overfit a small SoundStream on a few sines with the full GAN trainer and
report reconstruction SI-SNR — the quality smoke number for BASELINE.md.

    python examples/overfit_codec_quality.py --steps 300
"""
from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from audiolm_pytorch_tpu import SoundStream, SoundStreamTrainer
    from audiolm_pytorch_tpu.utils.audio_io import save_audio
    from audiolm_pytorch_tpu.utils.metrics import mel_distance, si_snr

    out = Path(args.out) if args.out else Path(tempfile.mkdtemp(prefix="codec_q_"))
    data = out / "data"
    data.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        freq = rng.uniform(220, 880)
        t = np.arange(8192) / 16000.0
        wav = 0.6 * np.sin(2 * np.pi * freq * t).astype(np.float32)
        save_audio(data / f"sine_{i}.wav", wav, 16000)

    ss = SoundStream(
        channels=16, strides=(4, 4, 5), channel_mults=(2, 4, 8),
        codebook_dim=64, codebook_size=256, rq_num_quantizers=8,
        attn_window_size=32, attn_heads=4, attn_dim_head=16,
        multi_spectral_window_powers_of_two=(6, 8),
        multi_scale_discr_kwargs=dict(channels=8, layers=3, groups=(1, 2, 4),
                                      chan_max=64),
        key=jax.random.PRNGKey(0))
    trainer = SoundStreamTrainer(
        ss, folder=str(data), batch_size=4, grad_accum_every=1,
        data_max_length=4800, num_train_steps=args.steps, lr=args.lr,
        warmup_steps=10, save_results_every=10 ** 9, save_model_every=10 ** 9,
        # gradient penalty destabilizes this short overfit run (NOTES.md);
        # disable it for the quality smoke number
        apply_grad_penalty_every=10 ** 9,
        results_folder=str(out / "results"), use_ema=False,
        bf16_compute=args.bf16)

    from audiolm_pytorch_tpu.utils.audio_io import load_audio
    ref, _ = load_audio(data / "sine_0.wav")
    ref = jnp.asarray(ref[0][:4800])[None]

    recon0 = trainer.model(ref, return_recons_only=True)
    print(f"before: si_snr={float(si_snr(recon0, ref)[0]):.2f} dB "
          f"mel_dist={float(mel_distance(recon0, ref, 16000)):.3f}", flush=True)

    import time
    t0 = time.time()
    for i in range(args.steps):
        logs = trainer.train_step()
        if i % 50 == 0:
            print(f"step {i}: recon {logs['recon_loss']:.5f} "
                  f"g {logs['loss']:.3f} d {logs['discr_loss']:.3f} "
                  f"({(time.time()-t0):.0f}s)", flush=True)

    recon = trainer.model(ref, return_recons_only=True)
    snr = float(si_snr(recon, ref)[0])
    md = float(mel_distance(recon, ref, 16000))
    print(f"after {args.steps} steps: si_snr={snr:.2f} dB mel_dist={md:.3f}",
          flush=True)
    save_audio(out / "recon.wav", np.asarray(recon[0]), 16000)
    print(f"wrote {out}/recon.wav")


if __name__ == "__main__":
    main()
