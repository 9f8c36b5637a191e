"""Train the full 3-stage AudioLM chain on corpus codec tokens and generate
end-to-end (VERDICT r2 next-step 4; reference flagship artifact:
audiolm_pytorch.py:2141-2254).

Pipeline:
  1. Load the trained corpus SoundStream (EMA weights) from the round-3
     quality run (examples/train_codec_corpus.py checkpoints).
  2. Build a small HubertWithKmeans semantic tokenizer and FIT its kmeans
     codebook on encoder features over the corpus (no pretrained fairseq
     weights exist in this offline image; a fitted kmeans over the conv+
     transformer features still yields a deterministic, spectrally meaningful
     token stream — the full reference capability surface is exercised).
  3. Train SemanticTransformer -> CoarseTransformer -> FineTransformer with
     the real trainers (bf16 compute, checkpoints + resume).
  4. Run AudioLM end-to-end, save the generated wav + timing.

    python examples/train_audiolm_stages.py --steps 1500
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


def build_codec(jax, ckpt=None, channels=32):
    """Architecture from examples/train_codec_corpus.py. Prefers the config
    embedded in the checkpoint (round-4 trainer ckpts are self-describing);
    falls back to the run defaults + --codec-channels for older ckpts."""
    from audiolm_pytorch_tpu import SoundStream
    if ckpt is not None:
        import json as _json
        with np.load(ckpt) as d:
            meta = _json.loads(bytes(d["__meta__"].tobytes()).decode())
        cfg = meta.get("config") or {}
        if cfg:
            cfg = {k: (tuple(v) if isinstance(v, list) else v)
                   for k, v in cfg.items()}
            cfg["compute_dtype"] = "bfloat16"
            return SoundStream(**cfg, key=jax.random.PRNGKey(0))
    return SoundStream(
        channels=channels, strides=(2, 4, 5, 8), channel_mults=(2, 4, 8, 16),
        codebook_dim=512, codebook_size=1024, rq_num_quantizers=8,
        attn_window_size=64, attn_heads=8, attn_dim_head=64,
        multi_scale_discr_kwargs=dict(channels=8, layers=3, groups=(1, 2, 4),
                                      chan_max=64),
        complex_stft_discr_kwargs=dict(channels=8),
        rq_kwargs=dict(threshold_ema_dead_code=0.25),
        rq_commitment_weight=0.0, compute_dtype="bfloat16",
        key=jax.random.PRNGKey(0))


def fit_kmeans(w2v, data_dir: Path, *, n_clips: int, k: int, iters: int,
               jax, jnp):
    """Lloyd's algorithm over HuBERT features of corpus clips."""
    from audiolm_pytorch_tpu.utils.audio_io import load_audio
    files = sorted(data_dir.glob("*.wav"))[:n_clips]
    feats = []
    extract = jax.jit(lambda w: w2v.encoder.extract_features(
        w, w2v.output_layer))
    for f in files:
        wav, _ = load_audio(f)
        x = jnp.asarray(wav[:, :SR])  # 1 s per clip
        feats.append(np.asarray(extract(x)[0], np.float32))
    feats = np.concatenate(feats, axis=0)
    print(f"kmeans: {feats.shape[0]} frames x {feats.shape[1]} dims", flush=True)
    rng = np.random.default_rng(0)
    centers = feats[rng.choice(len(feats), k, replace=False)].copy()
    for it in range(iters):
        d = ((feats[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(k):
            sel = feats[assign == c]
            if len(sel):
                centers[c] = sel.mean(0)
        if it % 5 == 0:
            print(f"kmeans iter {it}: inertia {d.min(1).mean():.4f}, "
                  f"{len(np.unique(assign))}/{k} used", flush=True)
    return centers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--codec-ckpt", default=None,
                    help="default: newest soundstream ckpt in results_quality/results")
    ap.add_argument("--codec-channels", type=int, default=32,
                    help="fallback width for ckpts without embedded config")
    ap.add_argument("--data", default="results_quality/data")
    ap.add_argument("--out", default="results_quality/audiolm")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--sem-vocab", type=int, default=100)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--gen-seconds", type=float, default=3.0)
    ap.add_argument("--seconds", type=float, default=1.0,
                    help="training clip length. Round-3 trained on 1 s crops "
                         "of the 3 s corpus clips, so semantic learned to "
                         "emit EOS at ~1 s and generation EOS-truncated at "
                         "0.9 s; train on the full 3 s for full-length "
                         "generation (reference trains on full clips, "
                         "audiolm_pytorch.py:2141-2254)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--codec-raw", action="store_true",
                    help="load the codec's RAW trainer weights instead of the "
                         "EMA shadow (mid-anneal snapshots: EMA lags by "
                         "several dB — NOTES round-3/4)")
    ap.add_argument("--skip-train", action="store_true",
                    help="resume checkpoints and only generate")
    ap.add_argument("--stages", default="semantic,coarse,fine,generate",
                    help="comma-separated subset of semantic,coarse,fine,"
                         "generate,spec_bench — lets independent stages run on different "
                         "hosts (e.g. semantic on CPU while the codec trains "
                         "on TPU); stages not listed are loaded from their "
                         "latest checkpoint when needed")
    args = ap.parse_args()
    stages = set(args.stages.split(","))
    if args.skip_train:
        stages = {"generate"}

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from audiolm_pytorch_tpu import (AudioLM, CoarseTransformer,
                                     CoarseTransformerTrainer, FineTransformer,
                                     FineTransformerTrainer, HubertWithKmeans,
                                     SemanticTransformer,
                                     SemanticTransformerTrainer)
    from audiolm_pytorch_tpu.utils.audio_io import save_audio

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    data = Path(args.data)

    # 1. trained codec (EMA weights preferred by SoundStream.load) — only
    # needed by the acoustic stages; the semantic stage can run without it
    codec = None
    if stages & {"coarse", "fine", "generate"}:
        ckpt = args.codec_ckpt
        if ckpt is None:
            cands = sorted(Path("results_quality/results").glob("soundstream.*.ckpt.npz"),
                           key=lambda p: int(p.stem.split(".")[1]))
            assert cands, "no codec checkpoint found — run train_codec_corpus.py first"
            ckpt = cands[-1]
        codec = build_codec(jax, ckpt=ckpt,
                            channels=args.codec_channels).load(
                                ckpt, prefer_ema=not args.codec_raw)
        print(f"codec loaded from {ckpt}", flush=True)

    # 2. semantic tokenizer: small HuBERT + corpus-fitted kmeans
    w2v = HubertWithKmeans(dim=256, num_layers=3, heads=4, output_layer=3,
                           codebook_size=args.sem_vocab,
                           key=jax.random.PRNGKey(1))
    km_path = out / "kmeans.npy"
    if km_path.exists():
        centers = np.load(km_path)
    else:
        centers = fit_kmeans(w2v, data, n_clips=120, k=args.sem_vocab,
                             iters=20, jax=jax, jnp=jnp)
        np.save(km_path, centers)
    from audiolm_pytorch_tpu.nn.module import evolve
    w2v = evolve(w2v, cluster_centers=jnp.asarray(centers))

    lm_kw = dict(dim=args.dim, depth=args.depth, heads=4, dim_head=64,
                 num_residual_streams=1)
    semantic = SemanticTransformer(num_semantic_tokens=args.sem_vocab,
                                   key=jax.random.PRNGKey(2), **lm_kw)
    coarse = CoarseTransformer(num_semantic_tokens=args.sem_vocab,
                               codebook_size=1024, num_coarse_quantizers=3,
                               key=jax.random.PRNGKey(3), **lm_kw)
    fine = FineTransformer(num_coarse_quantizers=3, num_fine_quantizers=5,
                           codebook_size=1024, key=jax.random.PRNGKey(4),
                           **lm_kw)

    t0 = time.time()
    trainer_kw = dict(folder=str(data), batch_size=args.batch,
                      grad_accum_every=1, num_train_steps=args.steps,
                      lr=args.lr, data_max_length=int(SR * args.seconds),
                      save_results_every=250, save_model_every=500,
                      data_parallel=False, bf16_compute=True, valid_frac=0.02)

    def run_stage(name, trainer):
        trainer.resume_latest()
        start = int(trainer.steps)
        losses = []
        for i in range(max(0, args.steps - start)):
            logs = trainer.train_step()
            losses.append(logs["loss"])
            if i % 100 == 0 or "valid_loss" in logs:
                row = dict(stage=name, step=int(trainer.steps),
                           loss=round(float(np.mean(losses[-100:])), 4),
                           wall_s=round(time.time() - t0, 1))
                if "valid_loss" in logs:
                    row["valid_loss"] = round(logs["valid_loss"], 4)
                print(json.dumps(row), flush=True)
                with open(out / "stages_log.jsonl", "a") as f:
                    f.write(json.dumps(row) + "\n")
        # hand the chain the best-valid weights, not the (noisy) last step
        best = trainer.results_folder / f"{trainer.name}.transformer.best.ckpt.npz"
        m = trainer.wrapper.transformer
        return m.load(best) if best.exists() else m

    def load_latest(name, m, required):
        best = out / name / f"{name}.transformer.best.ckpt.npz"
        if best.exists():  # quality-picked over newest (VERDICT r4 #8)
            return m.load(best)
        cks = sorted((p for p in (out / name).glob("*.ckpt.npz")
                      if ".best." not in p.name),
                     key=lambda p: int(p.stem.split(".")[-2]))
        if not cks:
            assert not required, f"no checkpoint for {name}"
            return m
        return m.load(cks[-1])

    if "semantic" in stages:
        semantic = run_stage("semantic", SemanticTransformerTrainer(
            semantic, w2v, results_folder=str(out / "semantic"),
            **trainer_kw))
    else:
        semantic = load_latest("semantic", semantic, "generate" in stages)
    if "coarse" in stages:
        coarse = run_stage("coarse", CoarseTransformerTrainer(
            coarse, codec=codec, wav2vec=w2v,
            results_folder=str(out / "coarse"), **trainer_kw))
    else:
        coarse = load_latest("coarse", coarse, "generate" in stages)
    if "fine" in stages:
        fine = run_stage("fine", FineTransformerTrainer(
            fine, codec=codec, results_folder=str(out / "fine"),
            **trainer_kw))
    else:
        fine = load_latest("fine", fine, "generate" in stages)

    if "generate" not in stages:
        return

    # 4. end-to-end generation through the trained chain
    audiolm = AudioLM(wav2vec=w2v, codec=codec, semantic_transformer=semantic,
                      coarse_transformer=coarse, fine_transformer=fine,
                      unique_consecutive=False)
    frames = int(args.gen_seconds * 50)
    tgen = time.time()
    wave = audiolm(batch_size=1, max_length=frames,
                   max_coarse_time_steps=frames, key=jax.random.PRNGKey(7))
    wave = np.asarray(wave, np.float32)
    dt = time.time() - tgen
    save_audio(out / "generated.wav", wave[0] if wave.ndim > 1 else wave, SR)
    secs = (wave.shape[-1] / SR)
    row = dict(stage="generate", audio_seconds=round(secs, 2),
               wall_s=round(dt, 2), rtf=round(secs / dt, 3),
               peak=round(float(np.abs(wave).max()), 4))
    print(json.dumps(row), flush=True)
    with open(out / "stages_log.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")

    # speculative decode on the TRAINED chain (VERDICT r3 weak #4): the
    # random-weights bench is acceptance-rate-bound; trained peaked
    # distributions are the claimed win condition — measure it honestly here.
    # Opt-in via --stages ...,spec_bench: it adds six full-chain generations
    # plus a stats pass, which is expensive over the tunnel (ADVICE r4).
    if "spec_bench" not in stages:
        return
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    sem_ids = audiolm.semantic.generate(batch_size=1, max_length=frames, key=k1)
    co, cs = audiolm.coarse.generate(
        semantic_token_ids=sem_ids, max_time_steps=frames,
        reconstruct_wave=False, speculative=True, return_spec_stats=True,
        key=k2)
    _, fs = audiolm.fine.generate(
        coarse_token_ids=co, reconstruct_wave=False, speculative=True,
        return_spec_stats=True, key=k3)
    acc = ((int(cs["accepted"]) + int(fs["accepted"]))
           / max(int(cs["steps"]) * cs["num_q"]
                 + int(fs["steps"]) * fs["num_q"], 1))

    def timed(spec):
        best = float("inf")
        for i in range(3):  # min-of-3 (tunnel jitter, NOTES)
            t0 = time.time()
            w = audiolm(batch_size=1, max_length=frames,
                        max_coarse_time_steps=frames, speculative=spec,
                        key=jax.random.PRNGKey(20 + i))
            n = int(np.asarray(w).shape[-1])
            best = min(best, time.time() - t0)
        return n / SR / best

    row = dict(stage="spec_bench", acceptance=round(acc, 4),
               seq_rtf=round(timed(False), 3), spec_rtf=round(timed(True), 3))
    print(json.dumps(row), flush=True)
    with open(out / "stages_log.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
