"""Trainer smoke tests mirroring the reference demo notebook: synthetic
sine-wave dataset on disk, a few steps of each of the four trainers
(reference test strategy: SURVEY.md §4, audiolm_pytorch_demo.ipynb cells 6-16)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiolm_pytorch_tpu import (CoarseTransformer, CoarseTransformerTrainer,
                                 FineTransformer, FineTransformerTrainer,
                                 HubertWithKmeans, SemanticTransformer,
                                 SemanticTransformerTrainer, SoundStreamTrainer)
from audiolm_pytorch_tpu.utils.audio_io import save_audio
from tests.test_soundstream import tiny_soundstream

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def sine_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("sines")
    rng = np.random.default_rng(0)
    for i in range(4):
        freq = rng.uniform(200, 800)
        t = np.arange(2048) / 16000.0
        wav = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
        save_audio(folder / f"sine_{i}.wav", wav, 16000)
    return folder


@pytest.fixture(scope="module")
def tiny_wav2vec():
    return HubertWithKmeans(dim=48, num_layers=1, heads=4, output_layer=1,
                            codebook_size=20, key=KEY)


def test_soundstream_trainer(sine_folder, tmp_path):
    ss = tiny_soundstream()
    trainer = SoundStreamTrainer(
        ss, folder=str(sine_folder), batch_size=2, grad_accum_every=2,
        num_train_steps=2, data_max_length=1024, save_results_every=2,
        save_model_every=2, results_folder=str(tmp_path / "results"),
        warmup_steps=1, apply_grad_penalty_every=2, data_parallel=False)
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"]) and np.isfinite(logs["discr_loss"])
    logs2 = trainer.train_step()  # hits grad-penalty + save cadence
    assert trainer.steps == 2
    ckpts = list((tmp_path / "results").glob("soundstream.*.ckpt.npz"))
    assert len(ckpts) == 1
    samples = list((tmp_path / "results").glob("sample.*.wav"))
    assert len(samples) >= 1
    # resume round-trip
    trainer.load(ckpts[0])
    assert trainer.steps == 3


def test_resume_latest(sine_folder, tmp_path, tiny_wav2vec):
    st = SemanticTransformer(num_semantic_tokens=tiny_wav2vec.codebook_size,
                             dim=32, depth=1, heads=2, dim_head=16,
                             num_residual_streams=1, key=KEY)
    trainer = SemanticTransformerTrainer(
        st, tiny_wav2vec, folder=str(sine_folder), batch_size=2,
        grad_accum_every=1, num_train_steps=1, data_max_length=2048,
        save_model_every=1, results_folder=str(tmp_path / "results"),
        data_parallel=False)
    assert not trainer.resume_latest()  # nothing yet
    trainer.train_step()
    trainer2 = SemanticTransformerTrainer(
        st, tiny_wav2vec, folder=str(sine_folder), batch_size=2,
        grad_accum_every=1, num_train_steps=1, data_max_length=2048,
        results_folder=str(tmp_path / "results"), data_parallel=False)
    assert trainer2.resume_latest()
    assert trainer2.steps == 2


def test_best_valid_checkpoint(sine_folder, tmp_path, tiny_wav2vec):
    """A `.best.ckpt.npz` is written whenever the valid loss improves, is
    excluded from resume_latest (it is quality-picked, not the newest state),
    and restores its best_valid + step metadata (VERDICT r4 #8)."""
    st = SemanticTransformer(num_semantic_tokens=tiny_wav2vec.codebook_size,
                             dim=32, depth=1, heads=2, dim_head=16,
                             num_residual_streams=1, key=KEY)

    def make(folder):
        return SemanticTransformerTrainer(
            st, tiny_wav2vec, folder=str(sine_folder), batch_size=2,
            grad_accum_every=1, num_train_steps=4, data_max_length=2048,
            save_results_every=1, save_model_every=3,
            results_folder=str(folder), data_parallel=False)

    trainer = make(tmp_path / "results")
    for _ in range(3):
        trainer.train_step()
    best = tmp_path / "results" / "semantic.transformer.best.ckpt.npz"
    assert best.exists()
    assert np.isfinite(trainer.best_valid)
    # resume_latest picks the newest NUMBERED checkpoint, not best...
    trainer2 = make(tmp_path / "results")
    assert trainer2.resume_latest()
    assert trainer2.steps == 4
    # ...but carries best_valid forward so tracking continues across resume
    assert trainer2.best_valid == trainer.best_valid
    # loading the best checkpoint restores its own (meta) step count
    trainer3 = make(tmp_path / "results2")
    trainer3.load(best)
    assert trainer3.best_valid == trainer.best_valid
    assert trainer3.steps >= 1


def test_semantic_trainer(sine_folder, tmp_path, tiny_wav2vec):
    st = SemanticTransformer(num_semantic_tokens=tiny_wav2vec.codebook_size,
                             dim=32, depth=1, heads=2, dim_head=16,
                             num_residual_streams=1, key=KEY)
    trainer = SemanticTransformerTrainer(
        st, tiny_wav2vec, folder=str(sine_folder), batch_size=2,
        grad_accum_every=2, num_train_steps=2, data_max_length=2048,
        save_results_every=2, save_model_every=2,
        results_folder=str(tmp_path / "results"), data_parallel=False)
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"])
    trainer.train_step()
    assert (tmp_path / "results" / "metrics.jsonl").exists()


def test_coarse_trainer(sine_folder, tmp_path, tiny_wav2vec):
    codec = tiny_soundstream()
    ct = CoarseTransformer(num_semantic_tokens=tiny_wav2vec.codebook_size,
                           codebook_size=codec.codebook_size,
                           num_coarse_quantizers=3, dim=32, depth=1, heads=2,
                           dim_head=16, num_residual_streams=1, key=KEY)
    trainer = CoarseTransformerTrainer(
        ct, codec=codec, wav2vec=tiny_wav2vec, folder=str(sine_folder),
        batch_size=2, grad_accum_every=1, num_train_steps=1,
        data_max_length=1024, results_folder=str(tmp_path / "results"),
        data_parallel=False)
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"])


def test_fine_trainer(sine_folder, tmp_path):
    codec = tiny_soundstream()
    ft = FineTransformer(num_coarse_quantizers=3, num_fine_quantizers=1,
                         codebook_size=codec.codebook_size, dim=32, depth=1,
                         heads=2, dim_head=16, num_residual_streams=1, key=KEY)
    trainer = FineTransformerTrainer(
        ft, codec=codec, folder=str(sine_folder), batch_size=2,
        grad_accum_every=1, num_train_steps=1, data_max_length=1024,
        results_folder=str(tmp_path / "results"), data_parallel=False)
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"])


class MockTextAudioDataset:
    """Text-conditioned dataset contract (reference README.md:306-336):
    returns (caption, audio) tuples; the trainer routes fields by type."""

    def __init__(self, length=4, audio_len=2048):
        self.length = length
        self.audio_len = audio_len

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.default_rng(idx)
        audio = rng.uniform(-0.5, 0.5, self.audio_len).astype(np.float32)
        return f"a caption number {idx}", audio


def test_semantic_trainer_text_conditioned(tmp_path, tiny_wav2vec):
    st = SemanticTransformer(num_semantic_tokens=tiny_wav2vec.codebook_size,
                             dim=32, depth=1, heads=2, dim_head=16,
                             has_condition=True, cond_dim=512,
                             t5_name="google/t5-v1_1-small",
                             num_residual_streams=1, key=KEY)
    trainer = SemanticTransformerTrainer(
        st, tiny_wav2vec, dataset=MockTextAudioDataset(), batch_size=2,
        grad_accum_every=2, num_train_steps=1,
        results_folder=str(tmp_path / "results"), data_parallel=False)
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"])


def test_semantic_trainer_data_parallel(sine_folder, tmp_path, tiny_wav2vec):
    """DP over the 8-device CPU mesh: grads pmean'd via shard_map."""
    st = SemanticTransformer(num_semantic_tokens=tiny_wav2vec.codebook_size,
                             dim=32, depth=1, heads=2, dim_head=16,
                             num_residual_streams=1, key=KEY)
    trainer = SemanticTransformerTrainer(
        st, tiny_wav2vec, folder=str(sine_folder), batch_size=8,
        grad_accum_every=1, num_train_steps=1, data_max_length=2048,
        results_folder=str(tmp_path / "results"), data_parallel=True)
    assert trainer.mesh is not None
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"])


def test_soundstream_trainer_data_parallel(sine_folder, tmp_path):
    """DP GAN training over the 8-device mesh: one full G+D step runs, and the
    psum'd VQ-EMA statistics keep every replica's codebook bit-identical
    (reference: accelerate DDP + vq lib all_reduce; SURVEY.md §2.4)."""
    ss = tiny_soundstream()
    trainer = SoundStreamTrainer(
        ss, folder=str(sine_folder), batch_size=8, grad_accum_every=1,
        num_train_steps=1, data_max_length=1024, save_results_every=100,
        save_model_every=100, results_folder=str(tmp_path / "results"),
        warmup_steps=1, apply_grad_penalty_every=100, data_parallel=True)
    assert trainer.mesh is not None
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"]) and np.isfinite(logs["discr_loss"])
    # every VQ buffer (codebook, EMA stats, kmeans init flags) must hold the
    # same value on all 8 devices after the psum'd update
    from audiolm_pytorch_tpu.nn.module import partition_buffers
    bufs, _ = partition_buffers(trainer.model.rq)
    checked = 0
    for leaf in jax.tree_util.tree_leaves(bufs):
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = leaf.addressable_shards
        if len(shards) < 2:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            np.testing.assert_array_equal(np.asarray(s.data), ref)
        checked += 1
    assert checked >= 2, "expected replicated VQ buffers to compare"


def test_gan_grad_accum_chains_vq_ema(sine_folder, tmp_path):
    """With grad_accum_every=2 the carried VQ buffers must thread through the
    scan: the result equals two sequential train-mode forwards, not just the
    last micro-batch's update (reference: vq lib updates EMA on every
    forward; ADVICE r1 medium finding)."""
    from audiolm_pytorch_tpu.nn.module import partition_buffers, \
        partition_trainable_where
    from audiolm_pytorch_tpu.training.trainer import _discr_path

    ss = tiny_soundstream()
    trainer = SoundStreamTrainer(
        ss, folder=str(sine_folder), batch_size=2, grad_accum_every=2,
        num_train_steps=1, data_max_length=1024,
        results_folder=str(tmp_path / "results"), data_parallel=False)
    rng = np.random.default_rng(3)
    waves = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 2, 1024)), jnp.float32)
    key = jax.random.PRNGKey(11)

    gen_params, gen_rest = partition_trainable_where(
        trainer.model, lambda p: not _discr_path(p))
    new_model, _, _, _, _ = trainer._g_step(
        gen_params, gen_rest, trainer.gen_opt_state, trainer.ema_state,
        waves, key)
    got, _ = partition_buffers(new_model.rq)

    # reference: two sequential train forwards threading the VQ buffers,
    # params held fixed (exactly what the scan body should compute). Jitted
    # as one program so kmeans/argmin tie-breaks see the same fused numerics
    # as the scan inside _g_step (eager vs jit can flip near-tie argmins).
    @jax.jit
    def two_forwards(m, waves, key):
        for i, k in enumerate(jax.random.split(key, 2)):
            _, _, m = m(waves[i], key=k, train=True, return_loss_breakdown=True)
        return m

    m = two_forwards(trainer.model, waves, key)
    expected, _ = partition_buffers(m.rq)

    for g, e in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e),
                                   rtol=2e-4, atol=1e-5)  # jit-vs-eager noise


def test_soundstream_trainer_bf16(sine_folder, tmp_path):
    """bf16 GAN step (fp32 masters, bf16 conv/discriminator compute, fp32
    loss aggregation; GP step stays fp32). NOTES r1 item 2."""
    ss = tiny_soundstream()
    trainer = SoundStreamTrainer(
        ss, folder=str(sine_folder), batch_size=2, grad_accum_every=2,
        num_train_steps=2, data_max_length=1024, save_results_every=100,
        save_model_every=100, results_folder=str(tmp_path / "results"),
        warmup_steps=1, apply_grad_penalty_every=2, data_parallel=False,
        bf16_compute=True)
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"]) and np.isfinite(logs["discr_loss"])
    logs2 = trainer.train_step()  # grad-penalty cadence -> fp32 D step
    assert np.isfinite(logs2["discr_loss"])
    # masters stay fp32
    leaf = trainer.model.encoder_init.weight
    assert leaf.dtype == jnp.float32


def test_d_step_does_not_mutate_vq_state(sine_folder, tmp_path):
    """Pin the D-phase VQ-EMA cadence decision (PARITY.md deviation #5):
    the discriminator step must not advance EMA codebook state — EMA updates
    happen exactly once per consumed batch, in the G phase."""
    ss = tiny_soundstream()
    trainer = SoundStreamTrainer(
        ss, folder=str(sine_folder), batch_size=2, grad_accum_every=1,
        num_train_steps=2, data_max_length=1024, save_results_every=100,
        save_model_every=100, results_folder=str(tmp_path / "results"),
        warmup_steps=1, apply_grad_penalty_every=100, data_parallel=False)
    from audiolm_pytorch_tpu.nn.module import combine, partition_buffers
    from audiolm_pytorch_tpu.training.trainer import _discr_path, \
        partition_trainable_where

    waves = trainer._stack_accum(trainer.dl_iter)
    waves = trainer._device_put_batch(waves)
    before = jax.tree_util.tree_leaves(partition_buffers(trainer.model.rq)[0])

    key = jax.random.PRNGKey(0)
    discr_params, discr_rest = partition_trainable_where(trainer.model, _discr_path)
    new_dparams, _, d_loss = trainer._d_step[False](
        discr_params, discr_rest, trainer.discr_opt_state, waves, key)
    model_after = combine(new_dparams, discr_rest)
    after = jax.tree_util.tree_leaves(partition_buffers(model_after.rq)[0])
    assert np.isfinite(float(d_loss))
    assert len(before) == len(after) > 0
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
