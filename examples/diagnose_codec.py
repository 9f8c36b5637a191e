"""Diagnose the corpus-codec SI-SNR plateau (VERDICT r2 Missing #1).

Loads a SoundStreamTrainer checkpoint from the round-2 corpus run and
isolates where reconstruction quality is lost:
  - held-out SI-SNR of the raw model vs the EMA shadow
  - SI-SNR with quantization BYPASSED (decoder fed pre-VQ latents)
  - per-quantizer relative quantization error and codebook utilization
  - train-batch SI-SNR (overfit gap)

    python examples/diagnose_codec.py --ckpt results_quality/results/soundstream.9000.ckpt.npz
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SR = 16000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="results_quality/results/soundstream.9000.ckpt.npz")
    ap.add_argument("--data", default="results_quality/data")
    ap.add_argument("--max-length", type=int, default=16000)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from audiolm_pytorch_tpu import SoundStream, SoundStreamTrainer
    from audiolm_pytorch_tpu.utils.metrics import mel_distance, si_snr, stoi

    # exact architecture from examples/train_codec_corpus.py
    ss = SoundStream(
        channels=32, strides=(2, 4, 5, 8), channel_mults=(2, 4, 8, 16),
        codebook_dim=512, codebook_size=1024, rq_num_quantizers=8,
        attn_window_size=64, attn_heads=8, attn_dim_head=64,
        multi_scale_discr_kwargs=dict(channels=8, layers=3, groups=(1, 2, 4),
                                      chan_max=64),
        complex_stft_discr_kwargs=dict(channels=8),
        recon_loss_weight=10.0, adversarial_loss_weight=1.0,
        feature_loss_weight=10.0,
        rq_kwargs=dict(threshold_ema_dead_code=0.25),
        rq_commitment_weight=0.0,
        key=jax.random.PRNGKey(0))
    trainer = SoundStreamTrainer(
        ss, folder=args.data, batch_size=8, grad_accum_every=1,
        data_max_length=args.max_length, num_train_steps=1,
        save_results_every=10 ** 9, save_model_every=10 ** 9,
        results_folder="results_quality/results", use_ema=True,
        bf16_compute=True, data_parallel=False, valid_frac=0.02)
    trainer.load(Path(args.ckpt))
    model = trainer.model
    ema = trainer.ema_state.shadow if trainer.ema_state is not None else None

    val_items = [trainer.valid_ds[i] for i in range(min(8, len(trainer.valid_ds)))]
    val = jnp.asarray(np.stack([v[: args.max_length] for v in val_items]))
    trn_items = [trainer.ds[i] for i in range(8)]
    trn = jnp.asarray(np.stack([v[: args.max_length] for v in trn_items]))

    def report(tag, m, x):
        recon = m(x, return_recons_only=True)
        print(f"{tag:28s} si_snr={float(jnp.mean(si_snr(recon, x))):7.3f}  "
              f"mel={float(mel_distance(recon, x, SR)):.4f}  "
              f"stoi={stoi(np.asarray(recon), np.asarray(x), SR):.4f}")

    report("heldout raw", model, val)
    if ema is not None:
        report("heldout EMA", ema, val)
        recon = ema(val, return_recons_only=True)
        per = si_snr(recon, val)
        for i in range(val.shape[0]):
            print(f"  heldout clip {i}: si_snr={float(per[i]):7.3f}  "
                  f"stoi={stoi(np.asarray(recon[i]), np.asarray(val[i]), SR):.4f}")
    report("train raw", model, trn)

    # quantization bypass: decoder fed the encoder's pre-VQ latents directly
    h = model.encode_frames(val)
    recon_nq = model.decode(h)
    print(f"{'heldout NO-QUANT (bypass VQ)':28s} "
          f"si_snr={float(jnp.mean(si_snr(recon_nq, val))):7.3f}  "
          f"mel={float(mel_distance(recon_nq, val, SR)):.4f}")

    hq, idx, _, _ = model.rq(h, train=False)
    h32, hq32 = h.astype(jnp.float32), hq.astype(jnp.float32)
    rel = float(jnp.linalg.norm(hq32 - h32) / (jnp.linalg.norm(h32) + 1e-9))
    print(f"quantization relative error ||q-z||/||z|| = {rel:.4f}")
    # latent time-variance share (0 => constant encoder output, NOTES item 4)
    tvar = jnp.var(h32, axis=1).mean()
    allvar = jnp.var(h32) + 1e-9
    print(f"latent time-variance share = {float(tvar / allvar):.4f}")

    g, b, n, q = idx.shape
    for qi in range(q):
        u = len(np.unique(np.asarray(idx[:, :, :, qi])))
        print(f"quantizer {qi}: {u} unique codes in heldout batch "
              f"(of {model.rq.codebook_size})")


if __name__ == "__main__":
    main()
