"""Real multi-process `jax.distributed` data parallelism (VERDICT r2 #5).

Runs examples/multiprocess_dp.py: two OS processes × 4 virtual CPU devices
each, one global 8-device mesh, pmean'd grads across the process boundary,
process-0 checkpoint gating with barriers, resume on both processes — and
loss parity vs a single-process 8-device run (reference equivalent:
accelerate DDP, reference trainer.py:252-280)."""
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_two_process_distributed_dp_matches_single_process(tmp_path):
    res = subprocess.run(
        [sys.executable, str(ROOT / "examples" / "multiprocess_dp.py"),
         "--out", str(tmp_path / "mp_dp")],
        capture_output=True, text=True, timeout=900, cwd=str(ROOT))
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    assert "OK: multi-process losses match single-process" in res.stdout
