"""Training runtime: SoundStreamTrainer + the three transformer trainers.

TPU-native re-design of the reference trainers (reference: audiolm_pytorch/
trainer.py:212-1605). The reference wraps torch DDP via HF accelerate; here
every train step is ONE jitted SPMD program over a jax.sharding.Mesh:

  * data parallel: batch sharded over the `data` axis via shard_map, gradients
    psum-averaged over ICI — and the RVQ EMA codebook statistics psum with
    them (SURVEY.md §2.4 correctness note).
  * grad accumulation: lax.scan over a (accum, micro_batch, ...) stack inside
    the same jitted step — the explicit-sync equivalent of accelerate's
    `no_sync` dance (reference: trainer.py:570-580).
  * GAN training (SoundStreamTrainer): generator and discriminator parameter
    groups are separate partitions of one model pytree with separate optax
    states; Adam state is per-parameter, so one chain over all discriminators
    is mathematically identical to the reference's per-discriminator
    optimizers (reference: trainer.py:314-330).
  * checkpoints: self-describing npz (model + opt state + step), step count
    recoverable from the filename (reference: trainer.py:150-161).
  * metrics: results_folder/metrics.jsonl always; wandb if available and
    enabled (reference: trainer.py:521-537).
"""
from __future__ import annotations

import json
import re
import time
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.layers import default, exists
from ..nn.module import (combine, evolve, partition_buffers,
                         partition_trainable_where)
from ..data.dataset import SoundDataset, get_dataloader
from ..models.soundstream import SoundStream
from ..models.wrappers import (CoarseTransformerWrapper, FineTransformerWrapper,
                               SemanticTransformerWrapper)
from ..parallel.mesh import data_axis_name, make_mesh
from ..utils.audio_io import save_audio
from .checkpoint import load_pytree_into, save_pytree
from .ema import EMAState, ema_init, ema_update
from .optimizer import get_optimizer

__all__ = ["SoundStreamTrainer", "SemanticTransformerTrainer",
           "CoarseTransformerTrainer", "FineTransformerTrainer"]


def _none_leaf(x):
    return x is None


def _tree_zeros_like(tree):
    return jax.tree_util.tree_map(
        lambda p: None if p is None else jnp.zeros_like(p), tree,
        is_leaf=_none_leaf)


def _tree_acc(acc, grads, scale):
    return jax.tree_util.tree_map(
        lambda a, g: a if g is None else a + g * scale, acc, grads,
        is_leaf=_none_leaf)


def checkpoint_num_steps(path) -> int:
    """Parse the step count from a checkpoint filename
    (reference: trainer.py:150-161)."""
    nums = re.findall(r"\d+", str(Path(path).name))
    return int(nums[-1]) if nums else 0


def _frozen_path(p: str) -> bool:
    return p.startswith(("wav2vec", "codec", "audio_conditioner"))


def _discr_path(p: str) -> bool:
    return p.startswith(("discriminators", "stft_discriminator"))


class _Subset:
    def __init__(self, ds, indices):
        self.ds = ds
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.ds[self.indices[i]]


def split_dataset(ds, valid_frac: float, seed: int = 0):
    """Random train/valid split (reference: trainer.py:360-380 random_split)."""
    import random as _random
    n = len(ds)
    n_valid = max(1, int(n * valid_frac)) if valid_frac > 0 else 0
    idx = list(range(n))
    _random.Random(seed).shuffle(idx)
    if n_valid == 0 or n_valid >= n:
        return ds, ds
    return _Subset(ds, idx[n_valid:]), _Subset(ds, idx[:n_valid])


def barrier(tag: str = "checkpoint"):
    """Cross-host sync (reference: accelerator.wait_for_everyone,
    trainer.py:661-702)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


class _MetricWriter:
    def __init__(self, folder: Path, use_wandb: bool = False):
        self.path = Path(folder) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.wandb_run = None
        if use_wandb:
            try:
                import wandb
                self.wandb_run = wandb
            except Exception:
                self.wandb_run = None

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.wandb_run is not None:
            self.wandb_run.log(metrics, step=step)

    def save_artifact(self, path):
        """Upload a checkpoint to wandb when tracking (reference:
        trainer.py:991-992 wandb.save)."""
        if self.wandb_run is not None:
            try:
                self.wandb_run.save(str(path))
            except Exception:
                pass


class _TrainerBase:
    """Shared infra: mesh, step loop, checkpoint cadence, logging
    (reference: trainer.py:60-210)."""

    def __init__(self, *, results_folder, num_train_steps, batch_size,
                 grad_accum_every=1, save_results_every=100, save_model_every=1000,
                 use_wandb_tracking=False, data_parallel=True, force_clear_prev_results=None):
        self.results_folder = Path(results_folder)
        if force_clear_prev_results and self.results_folder.exists():
            # non-interactive analog of the reference's yes_or_no prompt
            # (reference: trainer.py:423-424)
            import shutil
            shutil.rmtree(self.results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.num_train_steps = num_train_steps
        self.batch_size = batch_size
        self.grad_accum_every = grad_accum_every
        self.save_results_every = save_results_every
        self.save_model_every = save_model_every
        self.steps = 0
        # best-held-out-loss tracking: the banked artifact should be the best
        # checkpoint, not whatever noisy step training stopped at (the
        # reference only checkpoints periodically, trainer.py:988-993)
        self.best_valid = float("inf")
        self.metrics = _MetricWriter(self.results_folder, use_wandb_tracking)
        n_dev = len(jax.devices())
        self.mesh = make_mesh() if (data_parallel and n_dev > 1) else None
        if self.mesh is not None:
            assert batch_size % self.mesh.shape[data_axis_name] == 0, \
                f"batch_size {batch_size} not divisible by data-parallel size"

    def resume_latest(self, pattern: str = "*.ckpt.npz"):
        """Resume from the newest checkpoint in results_folder, if any —
        recovery story for preempted jobs (the reference requires a manual
        trainer.load(path), SURVEY.md §5 failure-detection note)."""
        ckpts = sorted((p for p in self.results_folder.glob(pattern)
                        if ".best." not in p.name),  # best is quality-picked,
                       key=checkpoint_num_steps)     # not the newest state
        if not ckpts:
            return False
        self.load(ckpts[-1])
        self.print(f"resumed from {ckpts[-1]} at step {self.steps}")
        return True

    @property
    def is_main(self):
        return jax.process_index() == 0

    @property
    def is_distributed(self):
        return self.mesh is not None or jax.process_count() > 1

    def print(self, *args):
        if self.is_main:
            print(*args)

    def _device_put_batch(self, batch):
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, batch)
        def put(x):
            x = np.asarray(x)
            spec = [None] * x.ndim
            spec[1] = data_axis_name  # (accum, batch, ...) — shard batch dim
            return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))
        return jax.tree_util.tree_map(put, batch)

    def _stack_accum(self, dl_iter, fields: int | None = None):
        """Pull grad_accum_every batches and stack: (accum, B, ...)."""
        batches = [next(dl_iter) for _ in range(self.grad_accum_every)]
        first = batches[0]
        if isinstance(first, tuple):
            out = []
            for i in range(len(first)):
                col = [b[i] for b in batches]
                if isinstance(col[0], list):  # text strings: flatten
                    out.append([s for c in col for s in c])
                else:
                    width = max(c.shape[-1] for c in col)
                    col = [np.pad(c, ((0, 0), (0, width - c.shape[-1]))) for c in col]
                    out.append(np.stack(col))
            return tuple(out)
        width = max(b.shape[-1] for b in batches)
        batches = [np.pad(b, ((0, 0), (0, width - b.shape[-1]))) for b in batches]
        return np.stack(batches)

    def wandb_tracker(self, *, project: str, run: str | None = None,
                      hps: dict | None = None):
        """Context manager enabling wandb tracking for the enclosed training
        (API parity: reference trainer.py:521-537)."""
        import contextlib

        @contextlib.contextmanager
        def cm():
            try:
                import wandb
            except Exception as e:  # pragma: no cover
                raise RuntimeError("wandb not available") from e
            wandb.init(project=project, name=run, config=hps or {})
            self.metrics.wandb_run = wandb
            try:
                yield self
            finally:
                self.metrics.wandb_run = None
                wandb.finish()
        return cm()

    def train(self):
        from ..utils.profiling import StepTimer
        timer = StepTimer()
        while self.steps < self.num_train_steps:
            with timer:
                logs = self.train_step()
            logs.update(timer.summary())
            self.print(f"{self.steps}: " + " | ".join(
                f"{k} {v:.4f}" for k, v in logs.items() if isinstance(v, float)))
        self.print("training complete")


# ---------------------------------------------------------------------------
# SoundStream GAN trainer
# ---------------------------------------------------------------------------

class SoundStreamTrainer(_TrainerBase):
    """(reference: trainer.py:212-713)."""

    def __init__(self, soundstream: SoundStream, *, num_train_steps: int,
                 batch_size: int, folder: Optional[str] = None, dataset=None,
                 val_dataset=None, data_max_length: Optional[int] = None,
                 data_max_length_seconds: Optional[float] = None,
                 lr: float = 2e-4, grad_accum_every: int = 4, wd: float = 0.0,
                 warmup_steps: int = 1000, scheduler_cosine_decay: bool = False,
                 discr_warmup_steps: Optional[int] = None,
                 max_grad_norm: float = 0.5, discr_max_grad_norm: Optional[float] = None,
                 apply_grad_penalty_every: int = 4,
                 ema_beta: float = 0.995, ema_update_after_step: int = 500,
                 ema_update_every: int = 10, save_results_every: int = 100,
                 save_model_every: int = 1000, results_folder: str = "./results",
                 use_ema: bool = True, use_wandb_tracking: bool = False,
                 data_parallel: bool = True, seed: int = 42,
                 valid_frac: float = 0.05, bf16_compute: bool = False,
                 train_discriminators: bool = True, **kwargs):
        super().__init__(results_folder=results_folder,
                         num_train_steps=num_train_steps, batch_size=batch_size,
                         grad_accum_every=grad_accum_every,
                         save_results_every=save_results_every,
                         save_model_every=save_model_every,
                         use_wandb_tracking=use_wandb_tracking,
                         data_parallel=data_parallel)
        self.model = soundstream
        self.bf16_compute = bf16_compute
        self.apply_grad_penalty_every = apply_grad_penalty_every
        # recon-pretrain phases train no discriminators (the G loss also skips
        # their forwards when adv/feat weights are 0 — see SoundStream.__call__)
        self.train_discriminators = train_discriminators
        self.use_ema = use_ema
        self.ema_kwargs = dict(beta=ema_beta, update_after_step=ema_update_after_step,
                               update_every=ema_update_every)

        if exists(data_max_length_seconds):
            assert not exists(data_max_length)
            data_max_length = int(data_max_length_seconds * soundstream.target_sample_hz)

        if dataset is None:
            assert exists(folder), "pass either folder= or dataset="
            dataset = SoundDataset(
                folder, target_sample_hz=soundstream.target_sample_hz,
                max_length=data_max_length,
                seq_len_multiple_of=soundstream.seq_len_multiple_of, seed=seed)
        if val_dataset is not None:
            self.ds, self.valid_ds = dataset, val_dataset
        else:
            self.ds, self.valid_ds = split_dataset(dataset, valid_frac, seed)
        self.dl_iter = iter(get_dataloader(self.ds, batch_size=batch_size))
        self.valid_dl_iter = iter(get_dataloader(self.valid_ds, batch_size=batch_size))

        self.gen_tx = get_optimizer(lr, wd, warmup_steps=warmup_steps,
                                    total_steps=num_train_steps,
                                    cosine_decay=scheduler_cosine_decay,
                                    max_grad_norm=max_grad_norm)
        self.discr_tx = get_optimizer(
            lr, wd, warmup_steps=default(discr_warmup_steps, warmup_steps),
            total_steps=num_train_steps, cosine_decay=scheduler_cosine_decay,
            max_grad_norm=default(discr_max_grad_norm, max_grad_norm))

        gen_params, _ = partition_trainable_where(
            self.model, lambda p: not _discr_path(p))
        discr_params, _ = partition_trainable_where(self.model, _discr_path)
        self.gen_opt_state = self.gen_tx.init(gen_params)
        self.discr_opt_state = self.discr_tx.init(discr_params)
        self.ema_state = ema_init(self.model) if use_ema else None
        self.key = jax.random.PRNGKey(seed)

        self._g_step = self._build_g_step()
        self._d_step = {True: self._build_d_step(True), False: self._build_d_step(False)}

    # -- jitted steps --------------------------------------------------------
    def _build_g_step(self):
        tx = self.gen_tx
        accum = self.grad_accum_every
        axis = data_axis_name if self.mesh is not None else None

        bf16 = self.bf16_compute

        def one_micro(params, rest, bufs, wave, key):
            def loss_fn(p):
                if bf16:
                    # fp32 masters, bf16 activations/weights in the conv and
                    # discriminator stacks; loss terms aggregate in fp32
                    # (soundstream loss sites upcast)
                    from ..nn.module import cast_floats
                    p = cast_floats(p, jnp.bfloat16)
                    wave_ = wave.astype(jnp.bfloat16)
                else:
                    wave_ = wave
                model = combine(p, rest)
                # chain the VQ EMA/kmeans buffers across micro-batches: the
                # carried bufs (not the stale ones inside `rest`) feed this
                # forward, so grad_accum_every=N accumulates N EMA updates
                # sequentially (reference vq lib updates on every forward)
                _, rq_nonbuf = partition_buffers(model.rq)
                model = evolve(model, rq=combine(bufs, rq_nonbuf))
                total, breakdown, new_model = model(
                    wave_, key=key, train=True, return_loss_breakdown=True,
                    axis_name=axis)
                new_bufs, _ = partition_buffers(new_model.rq)
                if bf16:
                    # buffers are fp32 masters: restore their dtype after the
                    # bf16 forward so EMA state never accumulates in bf16
                    new_bufs = jax.tree_util.tree_map(
                        lambda n, o: n.astype(o.dtype)
                        if hasattr(o, "dtype") else n, new_bufs, bufs)
                return total, (jnp.stack(list(breakdown)), new_bufs)
            (loss, (bd, new_bufs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return loss, bd, new_bufs, grads

        def step(params, rest, opt_state, ema_state, waves, key):
            def scan_body(carry, inp):
                gacc, bufs = carry
                wave, k = inp
                loss, bd, new_bufs, grads = one_micro(params, rest, bufs, wave, k)
                gacc = _tree_acc(gacc, grads, 1.0 / accum)
                return (gacc, new_bufs), (loss, bd)

            zero_grads = _tree_zeros_like(params)
            bufs0, _ = partition_buffers(combine(params, rest).rq)
            keys = jax.random.split(key, accum)
            (grads, bufs), (losses, bds) = jax.lax.scan(
                scan_body, (zero_grads, bufs0), (waves, keys))
            if axis is not None:
                grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # merge EMA'd VQ buffers (already psum'd inside the quantizer)
            model = combine(params, rest)
            _, rq_nonbuf = partition_buffers(model.rq)
            model = evolve(model, rq=combine(bufs, rq_nonbuf))
            if ema_state is not None:
                ema_state = ema_update(ema_state, model, **self.ema_kwargs)
            return model, opt_state, ema_state, jnp.mean(losses), jnp.mean(bds, 0)

        if self.mesh is not None:
            step = jax.shard_map(
                step, mesh=self.mesh,
                in_specs=(P(), P(), P(), P(), P(None, data_axis_name), P()),
                out_specs=P(), check_vma=False)
        return jax.jit(step)

    def _build_d_step(self, apply_gp: bool):
        tx = self.discr_tx
        accum = self.grad_accum_every
        axis = data_axis_name if self.mesh is not None else None
        # keep the grad-penalty step in fp32: GP is grad-of-grad through the
        # discriminators and bf16 second derivatives are numerically fragile
        bf16 = self.bf16_compute and not apply_gp

        def step(params, rest, opt_state, waves, key):
            def scan_body(gacc, inp):
                wave, k = inp
                def loss_fn(p):
                    if bf16:
                        from ..nn.module import cast_floats
                        p = cast_floats(p, jnp.bfloat16)
                        wave_ = wave.astype(jnp.bfloat16)
                    else:
                        wave_ = wave
                    model = combine(p, rest)
                    return model(wave_, key=k, return_discr_loss=True,
                                 apply_grad_penalty=apply_gp, axis_name=axis)
                loss, grads = jax.value_and_grad(loss_fn)(params)
                gacc = _tree_acc(gacc, grads, 1.0 / accum)
                return gacc, loss

            zero_grads = _tree_zeros_like(params)
            keys = jax.random.split(key, accum)
            grads, losses = jax.lax.scan(scan_body, zero_grads, (waves, keys))
            if axis is not None:
                grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, jnp.mean(losses)

        if self.mesh is not None:
            step = jax.shard_map(
                step, mesh=self.mesh,
                in_specs=(P(), P(), P(), P(None, data_axis_name), P()),
                out_specs=P(), check_vma=False)
        return jax.jit(step)

    # -- public step ----------------------------------------------------------
    def train_step(self):
        self.key, kg, kd = jax.random.split(self.key, 3)
        waves = self._stack_accum(self.dl_iter)
        waves = self._device_put_batch(waves)

        gen_params, gen_rest = partition_trainable_where(
            self.model, lambda p: not _discr_path(p))
        self.model, self.gen_opt_state, self.ema_state, g_loss, bd = self._g_step(
            gen_params, gen_rest, self.gen_opt_state, self.ema_state, waves, kg)

        if self.train_discriminators:
            apply_gp = (self.steps % self.apply_grad_penalty_every) == 0
            discr_params, discr_rest = partition_trainable_where(self.model, _discr_path)
            new_dparams, self.discr_opt_state, d_loss = self._d_step[apply_gp](
                discr_params, discr_rest, self.discr_opt_state, waves, kd)
            self.model = combine(new_dparams, discr_rest)
        else:
            d_loss = 0.0

        recon, mel, mstft, sisnr, adv, feat, commit = (float(x) for x in bd)
        logs = dict(loss=float(g_loss), recon_loss=recon, multi_spectral=mel,
                    multi_stft=mstft, si_snr_loss=sisnr, adversarial=adv,
                    feature_loss=feat, commit=commit, discr_loss=float(d_loss))
        self.metrics.log(self.steps, **logs)
        self.steps += 1

        if self.is_main and self.steps % self.save_results_every == 0:
            self._dump_samples()
        if self.steps % self.save_model_every == 0:
            barrier("pre-save")
            if self.is_main:
                self.save(self.results_folder / f"soundstream.{self.steps}.ckpt.npz")
            barrier("post-save")
        return logs

    def _dump_samples(self):
        """Periodic reconstruction dumps (reference: trainer.py:670-690 saves
        .flac via torchaudio; we write .wav)."""
        batch = next(self.valid_dl_iter)
        wave = jnp.asarray(batch[:1])
        models = [("", self.model)]
        if self.ema_state is not None:
            models.append(("ema.", self.ema_state.shadow))
        for prefix, m in models:
            recon = m(wave, return_recons_only=True)
            save_audio(self.results_folder / f"sample.{prefix}{self.steps}.wav",
                       np.asarray(recon[0]), m.target_sample_hz)

    def save(self, path):
        state = {"model": self.model, "gen_opt": self.gen_opt_state,
                 "discr_opt": self.discr_opt_state, "ema": self.ema_state}
        # embed the constructor config so a model-only persisted copy
        # (checkpoint.persist_model_from) stays self-describing
        save_pytree(path, state, extra_meta={"steps": self.steps,
                                             "kind": "SoundStreamTrainer",
                                             "config": dict(self.model.configs)})
        self.metrics.save_artifact(path)
        self.print(f"saved checkpoint to {path}")

    def load(self, path):
        state = {"model": self.model, "gen_opt": self.gen_opt_state,
                 "discr_opt": self.discr_opt_state, "ema": self.ema_state}
        state = load_pytree_into(path, state)
        self.model = state["model"]
        self.gen_opt_state = state["gen_opt"]
        self.discr_opt_state = state["discr_opt"]
        self.ema_state = state["ema"]
        self.steps = checkpoint_num_steps(path) + 1


# ---------------------------------------------------------------------------
# Transformer trainers (shared skeleton, reference: trainer.py:717-1605)
# ---------------------------------------------------------------------------

class _TransformerTrainerBase(_TrainerBase):
    wrapper_field_order = ("raw_wave",)

    def __init__(self, wrapper, *, num_train_steps, batch_size, dataset=None,
                 folder=None, lr=3e-4, wd=0.0, max_grad_norm=0.5,
                 grad_accum_every=1, warmup_steps=0, cosine_decay=False,
                 save_results_every=100, save_model_every=1000,
                 results_folder="./results", use_wandb_tracking=False,
                 data_parallel=True, seed=42, valid_frac=0.05,
                 bf16_compute=False, dataset_kwargs=None, name="lm"):
        super().__init__(results_folder=results_folder,
                         num_train_steps=num_train_steps, batch_size=batch_size,
                         grad_accum_every=grad_accum_every,
                         save_results_every=save_results_every,
                         save_model_every=save_model_every,
                         use_wandb_tracking=use_wandb_tracking,
                         data_parallel=data_parallel)
        self.wrapper = wrapper
        self.name = name
        self.bf16_compute = bf16_compute
        if dataset is None:
            assert exists(folder)
            dataset = self._build_dataset(folder, **(dataset_kwargs or {}))
        self.ds, self.valid_ds = split_dataset(dataset, valid_frac, seed)
        self.dl_iter = iter(get_dataloader(self.ds, batch_size=batch_size))
        self.valid_dl_iter = iter(get_dataloader(self.valid_ds, batch_size=batch_size))

        self.tx = get_optimizer(lr, wd, warmup_steps=warmup_steps,
                                total_steps=num_train_steps,
                                cosine_decay=cosine_decay,
                                max_grad_norm=max_grad_norm)
        params, _ = partition_trainable_where(
            self.wrapper, lambda p: not _frozen_path(p))
        self.opt_state = self.tx.init(params)
        self.key = jax.random.PRNGKey(seed)
        self._step_cache = {}
        self._valid_step = self._build_valid_step()

    def _build_dataset(self, folder, **kwargs):
        raise NotImplementedError

    def _batch_to_kwargs(self, batch):
        """Route dataset tuple fields to wrapper kwargs by runtime type,
        like the reference's DATASET_FIELD_TYPE_CONFIG routing
        (reference: trainer.py:79-89, 902-907): string fields -> `text`,
        array fields -> the declared wave/token fields in order."""
        if not isinstance(batch, tuple):
            batch = (batch,)
        kwargs = {}
        wave_fields = iter(self.wrapper_field_order)
        for field in batch:
            if isinstance(field, list) and field and isinstance(field[0], str):
                kwargs["text"] = field
            else:
                kwargs[next(wave_fields)] = field
        return kwargs

    def _get_step(self, batch_keys):
        key = tuple(sorted(batch_keys))
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(key)
        return self._step_cache[key]

    def _build_step(self, batch_keys):
        tx = self.tx
        accum = self.grad_accum_every
        axis = data_axis_name if self.mesh is not None else None
        bf16 = self.bf16_compute

        def step(params, rest, opt_state, batch, key):
            def scan_body(gacc, inp):
                micro, k = inp
                def loss_fn(p):
                    if bf16:
                        # fp32 masters, bf16 compute (fp32 softmax/norms inside)
                        from ..nn.module import cast_floats
                        p = cast_floats(p, jnp.bfloat16)
                    wrapper = combine(p, rest)
                    return wrapper(**micro, return_loss=True, train=True, key=k)
                loss, grads = jax.value_and_grad(loss_fn)(params)
                gacc = _tree_acc(gacc, grads, 1.0 / accum)
                return gacc, loss

            zero = _tree_zeros_like(params)
            keys = jax.random.split(key, accum)
            grads, losses = jax.lax.scan(scan_body, zero, (batch, keys))
            if axis is not None:
                grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, jnp.mean(losses)

        if self.mesh is not None:
            batch_spec = {k: P(None, data_axis_name) for k in batch_keys}
            step = jax.shard_map(
                step, mesh=self.mesh,
                in_specs=(P(), P(), P(), batch_spec, P()),
                out_specs=P(), check_vma=False)
        return jax.jit(step)

    def _build_valid_step(self):
        def step(wrapper, batch, key):
            return wrapper(**batch, return_loss=True, train=False, key=key)
        return jax.jit(step)

    def _embed_text_batch(self, texts):
        """Host-side frozen T5 encode of (accum*B) captions -> (accum, B, L, D)."""
        embeds = self.wrapper.transformer.embed_text(texts)
        a = self.grad_accum_every
        return np.asarray(embeds).reshape(a, len(texts) // a, *embeds.shape[1:])

    def train_step(self):
        self.key, k1 = jax.random.split(self.key)
        batch = self._stack_accum(self.dl_iter)
        kwargs = self._batch_to_kwargs(batch)
        texts = kwargs.pop("text", None)
        if texts is not None:
            kwargs["text_embeds"] = self._embed_text_batch(texts)
        batch_dev = self._device_put_batch(tuple(kwargs.values()))
        batch_kwargs = dict(zip(kwargs.keys(), batch_dev))

        params, rest = partition_trainable_where(
            self.wrapper, lambda p: not _frozen_path(p))
        self._step = self._get_step(batch_kwargs.keys())
        params, self.opt_state, loss = self._step(
            params, rest, self.opt_state, batch_kwargs, k1)
        self.wrapper = combine(params, rest)

        logs = {"loss": float(loss)}
        self.metrics.log(self.steps, **logs)
        self.steps += 1

        if self.is_main and self.steps % self.save_results_every == 0:
            # average the valid loss over grad_accum_every batches, matching
            # the reference (trainer.py:968-984 runs grad_accum_every valid
            # forwards and averages)
            vlosses = []
            for _ in range(self.grad_accum_every):
                self.key, kv = jax.random.split(self.key)
                vbatch = next(self.valid_dl_iter)
                vkwargs = self._batch_to_kwargs(vbatch)
                vtexts = vkwargs.pop("text", None)
                if vtexts is not None:
                    vkwargs["text_embeds"] = np.asarray(
                        self.wrapper.transformer.embed_text(vtexts))
                vkwargs = {k: jnp.asarray(v) for k, v in vkwargs.items()}
                vlosses.append(float(self._valid_step(self.wrapper, vkwargs, kv)))
            vloss = float(np.mean(vlosses))
            logs["valid_loss"] = vloss
            self.metrics.log(self.steps, valid_loss=vloss)
            self.print(f"{self.steps}: valid loss {vloss:.4f}")
            if vloss < self.best_valid:
                self.best_valid = vloss
                self.save(self.results_folder /
                          f"{self.name}.transformer.best.ckpt.npz")
        if self.steps % self.save_model_every == 0:
            barrier("pre-save")
            if self.is_main:
                self.save(self.results_folder /
                          f"{self.name}.transformer.{self.steps}.ckpt.npz")
            barrier("post-save")
        return logs

    def save(self, path):
        state = {"model": self.wrapper.transformer, "opt": self.opt_state}
        save_pytree(path, state,
                    extra_meta={"steps": self.steps, "kind": self.name,
                                "best_valid": self.best_valid,
                                "config": dict(getattr(
                                    self.wrapper.transformer, "configs", ()))})
        self.metrics.save_artifact(path)
        self.print(f"saved checkpoint to {path}")

    def load(self, path):
        state = {"model": self.wrapper.transformer, "opt": self.opt_state}
        state = load_pytree_into(path, state)
        self.wrapper = evolve(self.wrapper, transformer=state["model"])
        self.opt_state = state["opt"]
        self.steps = checkpoint_num_steps(path) + 1
        with np.load(path) as d:  # keep best-valid tracking across resume
            meta = json.loads(bytes(d["__meta__"].tobytes()).decode())
        self.best_valid = float(meta.get("best_valid", float("inf")))
        if ".best." in Path(path).name and "steps" in meta:
            self.steps = int(meta["steps"]) + 1  # no step count in the name

    def generate(self, *args, **kwargs):
        return self.wrapper.generate(*args, **kwargs)


class SemanticTransformerTrainer(_TransformerTrainerBase):
    """(reference: trainer.py:717-1006)."""
    wrapper_field_order = ("raw_wave",)

    def __init__(self, transformer, wav2vec=None, *, audio_conditioner=None,
                 data_max_length=None, data_max_length_seconds=None,
                 folder=None, dataset=None, **kwargs):
        wrapper = SemanticTransformerWrapper(
            transformer=transformer, wav2vec=wav2vec,
            audio_conditioner=audio_conditioner)
        self._wav2vec = wav2vec
        if exists(data_max_length_seconds):
            data_max_length = int(data_max_length_seconds * wav2vec.target_sample_hz)
        self._data_max_length = data_max_length
        super().__init__(wrapper, folder=folder, dataset=dataset,
                         name="semantic", **kwargs)

    def _build_dataset(self, folder, **kwargs):
        return SoundDataset(
            folder, target_sample_hz=self._wav2vec.target_sample_hz,
            max_length=self._data_max_length,
            seq_len_multiple_of=self._wav2vec.seq_len_multiple_of, **kwargs)


class CoarseTransformerTrainer(_TransformerTrainerBase):
    """(reference: trainer.py:1010-1308). Dataset yields two differently
    resampled waves — one for wav2vec, one for the codec
    (reference: trainer.py:1092-1103)."""
    wrapper_field_order = ("raw_wave", "raw_wave_for_codec")

    def __init__(self, transformer, codec=None, wav2vec=None, *,
                 audio_conditioner=None, data_max_length=None,
                 data_max_length_seconds=None, folder=None, dataset=None, **kwargs):
        wrapper = CoarseTransformerWrapper(
            transformer=transformer, codec=codec, wav2vec=wav2vec,
            audio_conditioner=audio_conditioner)
        self._wav2vec = wav2vec
        self._codec = codec
        if exists(data_max_length_seconds):
            data_max_length = tuple(
                int(data_max_length_seconds * hz)
                for hz in (wav2vec.target_sample_hz, codec.target_sample_hz))
        self._data_max_length = data_max_length
        super().__init__(wrapper, folder=folder, dataset=dataset,
                         name="coarse", **kwargs)

    def _build_dataset(self, folder, **kwargs):
        max_len = self._data_max_length
        if isinstance(max_len, tuple):
            max_len = max(max_len)
        return SoundDataset(
            folder,
            target_sample_hz=(self._wav2vec.target_sample_hz,
                              self._codec.target_sample_hz),
            max_length=max_len,
            seq_len_multiple_of=(self._wav2vec.seq_len_multiple_of,
                                 self._codec.seq_len_multiple_of), **kwargs)


class FineTransformerTrainer(_TransformerTrainerBase):
    """(reference: trainer.py:1312-1605)."""
    wrapper_field_order = ("raw_wave",)

    def __init__(self, transformer, codec=None, *, audio_conditioner=None,
                 data_max_length=None, data_max_length_seconds=None,
                 folder=None, dataset=None, **kwargs):
        wrapper = FineTransformerWrapper(
            transformer=transformer, codec=codec,
            audio_conditioner=audio_conditioner)
        self._codec = codec
        if exists(data_max_length_seconds):
            data_max_length = int(data_max_length_seconds * codec.target_sample_hz)
        self._data_max_length = data_max_length
        super().__init__(wrapper, folder=folder, dataset=dataset,
                         name="fine", **kwargs)

    def _build_dataset(self, folder, **kwargs):
        return SoundDataset(
            folder, target_sample_hz=self._codec.target_sample_hz,
            max_length=self._data_max_length,
            seq_len_multiple_of=self._codec.seq_len_multiple_of, **kwargs)
