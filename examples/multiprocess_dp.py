"""Real multi-process data parallelism (VERDICT r2 next-step 5).

Launches 2 OS processes, each owning 4 virtual CPU devices, joined into one
8-device mesh via `jax.distributed.initialize` — the same code path a real
multi-host TPU pod uses (reference equivalent: accelerate DDP,
reference trainer.py:252-280). Each process runs the SAME deterministic
global batch; `jax.device_put` with a global NamedSharding places only the
locally-addressable shards. Exercises:

  * cross-process mesh construction (trainer's make_mesh over global devices)
  * pmean'd gradients across process boundaries
  * `process_index == 0` checkpoint gating + sync_global_devices barriers
  * resume_latest() on both processes from the proc-0-written checkpoint

and verifies per-step losses match a single-process 8-device run of the
identical configuration.

    python examples/multiprocess_dp.py            # launcher (runs both modes)
    python examples/multiprocess_dp.py --worker N # internal
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PORT = 12995
STEPS = 3


def build_data(folder: Path):
    import numpy as np
    from audiolm_pytorch_tpu.utils.audio_io import save_audio
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(16):
        freq = rng.uniform(200, 800)
        t = np.arange(2048) / 16000.0
        wav = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
        save_audio(folder / f"sine_{i}.wav", wav, 16000)


def run_training(pid: int, num_procs: int, data: Path, out: Path):
    """Build the tiny semantic stack and train STEPS steps + save/resume."""
    import jax
    import numpy as np
    from audiolm_pytorch_tpu.models.hubert import HubertWithKmeans
    from audiolm_pytorch_tpu.models.lm import SemanticTransformer
    from audiolm_pytorch_tpu.training.trainer import SemanticTransformerTrainer

    key = jax.random.PRNGKey(0)
    w2v = HubertWithKmeans(dim=48, num_layers=1, heads=4, output_layer=1,
                           codebook_size=20, key=key)
    st = SemanticTransformer(num_semantic_tokens=20, dim=32, depth=1, heads=2,
                             dim_head=16, num_residual_streams=1, key=key)
    results = out / "results"
    trainer = SemanticTransformerTrainer(
        st, w2v, folder=str(data), batch_size=8, grad_accum_every=1,
        num_train_steps=STEPS + 1, data_max_length=2048, valid_frac=0.25,
        results_folder=str(results), data_parallel=True, seed=7,
        save_model_every=2, save_results_every=10 ** 9)
    assert trainer.mesh is not None
    assert trainer.mesh.devices.size == 8, trainer.mesh.devices.shape
    losses = [float(trainer.train_step()["loss"]) for _ in range(STEPS)]

    # both processes resume from the checkpoint written by process 0 at step 2
    st2 = SemanticTransformer(num_semantic_tokens=20, dim=32, depth=1, heads=2,
                              dim_head=16, num_residual_streams=1, key=key)
    trainer2 = SemanticTransformerTrainer(
        st2, w2v, folder=str(data), batch_size=8, grad_accum_every=1,
        num_train_steps=STEPS + 1, data_max_length=2048, valid_frac=0.25,
        results_folder=str(results), data_parallel=True, seed=7,
        save_model_every=10 ** 9, save_results_every=10 ** 9)
    trainer2.resume_latest()
    assert trainer2.steps == 3, trainer2.steps
    resumed_loss = float(trainer2.train_step()["loss"])

    row = dict(procs=num_procs, pid=pid, process_index=jax.process_index(),
               devices=jax.device_count(),
               local_devices=len(jax.local_devices()),
               losses=[round(l, 6) for l in losses],
               resumed_loss=round(resumed_loss, 6))
    if jax.process_index() == 0:
        (out / f"losses_p{num_procs}.json").write_text(json.dumps(row))
    print(json.dumps(row), flush=True)


def worker_main(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{PORT}",
                               num_processes=args.procs,
                               process_id=args.worker)
    run_training(args.worker, args.procs, Path(args.data), Path(args.out))


def launcher(out: Path):
    import numpy as np
    data = out / "data"
    build_data(data)

    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               JAX_PLATFORMS="cpu")
    t0 = time.time()
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(i), "--procs", "2",
         "--data", str(data), "--out", str(out / "mp")],
        env=env) for i in range(2)]
    codes = [p.wait(timeout=900) for p in procs]
    assert codes == [0, 0], f"worker exit codes {codes}"
    print(f"2-process run finished in {time.time() - t0:.0f}s", flush=True)

    # single-process baseline: 8 local devices, identical config
    env1 = dict(os.environ,
                XLA_FLAGS="--xla_force_host_platform_device_count=8",
                JAX_PLATFORMS="cpu")
    code = subprocess.call(
        [sys.executable, __file__, "--worker", "0", "--procs", "1",
         "--data", str(data), "--out", str(out / "sp"), "--no-distributed"],
        env=env1)
    assert code == 0

    mp = json.loads((out / "mp" / "losses_p2.json").read_text())
    sp = json.loads((out / "sp" / "losses_p1.json").read_text())
    print("2-process losses:", mp["losses"], "resumed:", mp["resumed_loss"])
    print("1-process losses:", sp["losses"], "resumed:", sp["resumed_loss"])
    np.testing.assert_allclose(mp["losses"], sp["losses"], rtol=0, atol=2e-5)
    np.testing.assert_allclose(mp["resumed_loss"], sp["resumed_loss"],
                               rtol=0, atol=2e-5)
    print("OK: multi-process losses match single-process to 2e-5")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--data", default=None)
    ap.add_argument("--out", default="/tmp/audiolm_mp_dp")
    ap.add_argument("--no-distributed", action="store_true")
    args = ap.parse_args()
    if args.worker is None:
        launcher(Path(args.out))
    elif args.no_distributed:
        import jax
        jax.config.update("jax_platforms", "cpu")
        run_training(0, 1, Path(args.data), Path(args.out))
    else:
        worker_main(args)


if __name__ == "__main__":
    main()
