"""End-to-end demo: synthesize a sine-wave dataset, train all four stages for
a few steps, then run full 3-stage AudioLM generation.

This mirrors the reference's demo notebook (audiolm_pytorch_demo.ipynb,
cells 6-18) as an executable script — the de-facto integration test.

    python examples/train_audiolm_demo.py --steps 9 --out /tmp/audiolm_demo
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_sine_dataset(folder: Path, n: int = 8, length: int = 10240,
                      sr: int = 16000):
    from audiolm_pytorch_tpu.utils.audio_io import save_audio
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        freq = rng.uniform(200, 900)
        t = np.arange(length) / sr
        wav = 0.6 * np.sin(2 * np.pi * freq * t).astype(np.float32)
        save_audio(folder / f"sine_{i}.wav", wav, sr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=9)
    ap.add_argument("--out", default="/tmp/audiolm_demo")
    ap.add_argument("--data-max-length", type=int, default=2560)
    args = ap.parse_args()

    import jax
    from audiolm_pytorch_tpu import (
        AudioLM, CoarseTransformer, CoarseTransformerTrainer, FineTransformer,
        FineTransformerTrainer, HubertWithKmeans, SemanticTransformer,
        SemanticTransformerTrainer, SoundStream, SoundStreamTrainer)
    from audiolm_pytorch_tpu.utils.audio_io import save_audio

    key = jax.random.PRNGKey(0)
    out = Path(args.out)
    data = out / "data"
    make_sine_dataset(data)

    # --- stage 0: codec -----------------------------------------------------
    soundstream = SoundStream(
        channels=16, strides=(4, 4, 5), channel_mults=(2, 4, 8),
        codebook_dim=64, codebook_size=256, rq_num_quantizers=8,
        attn_window_size=32, attn_heads=4, attn_dim_head=16,
        multi_spectral_window_powers_of_two=(6, 7),
        multi_scale_discr_kwargs=dict(channels=8, layers=3, groups=(1, 2, 4),
                                      chan_max=64),
        key=key)
    SoundStreamTrainer(
        soundstream, folder=str(data), batch_size=2, grad_accum_every=2,
        data_max_length=args.data_max_length, num_train_steps=args.steps,
        save_results_every=max(args.steps, 1), save_model_every=max(args.steps, 1),
        results_folder=str(out / "codec"), warmup_steps=1).train()

    # --- semantic tokenizer (random-init HuBERT shapes; swap in a converted
    #     fairseq checkpoint for real runs) -----------------------------------
    wav2vec = HubertWithKmeans(dim=96, num_layers=2, heads=4, output_layer=2,
                               codebook_size=64, key=key)

    lm_kwargs = dict(dim=64, depth=2, heads=4, dim_head=16, flash_attn=False)

    semantic = SemanticTransformer(num_semantic_tokens=wav2vec.codebook_size,
                                   key=key, **lm_kwargs)
    sem_trainer = SemanticTransformerTrainer(
        semantic, wav2vec, folder=str(data), batch_size=2,
        data_max_length=args.data_max_length, num_train_steps=args.steps,
        results_folder=str(out / "semantic"))
    sem_trainer.train()

    coarse = CoarseTransformer(num_semantic_tokens=wav2vec.codebook_size,
                               codebook_size=256, num_coarse_quantizers=3,
                               key=key, **lm_kwargs)
    coarse_trainer = CoarseTransformerTrainer(
        coarse, codec=soundstream, wav2vec=wav2vec, folder=str(data),
        batch_size=2, data_max_length=args.data_max_length,
        num_train_steps=args.steps, results_folder=str(out / "coarse"))
    coarse_trainer.train()

    fine = FineTransformer(num_coarse_quantizers=3, num_fine_quantizers=5,
                           codebook_size=256, key=key, **lm_kwargs)
    fine_trainer = FineTransformerTrainer(
        fine, codec=soundstream, folder=str(data), batch_size=2,
        data_max_length=args.data_max_length, num_train_steps=args.steps,
        results_folder=str(out / "fine"))
    fine_trainer.train()

    # --- end-to-end generation ----------------------------------------------
    audiolm = AudioLM(wav2vec=wav2vec, codec=soundstream,
                      semantic_transformer=sem_trainer.wrapper.transformer,
                      coarse_transformer=coarse_trainer.wrapper.transformer,
                      fine_transformer=fine_trainer.wrapper.transformer)
    wave = audiolm(batch_size=1, max_length=32, max_coarse_time_steps=16,
                   key=jax.random.PRNGKey(42))
    waves = wave if isinstance(wave, list) else list(wave)
    for i, w in enumerate(waves):
        if w is None:
            continue
        save_audio(out / f"generated_{i}.wav", np.asarray(w),
                   soundstream.target_sample_hz)
        print(f"wrote {out}/generated_{i}.wav ({np.asarray(w).shape[0]} samples)")
    print("demo complete")


if __name__ == "__main__":
    main()
