"""Driver contract: bench.py prints one JSON line ALWAYS (budget/signal
proof); __graft_entry__ exposes entry() and dryrun_multichip(n), and the
dryrun parent NEVER touches a jax backend (a hung TPU tunnel in round 3
hung the parent's jax.devices() call before the CPU child ever ran)."""
import importlib.util
import inspect
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _load(name):
    spec = importlib.util.spec_from_file_location(name, ROOT / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_graft_entry_surface():
    mod = _load("__graft_entry__")
    assert callable(mod.entry)
    sig = inspect.signature(mod.dryrun_multichip)
    assert list(sig.parameters) == ["n_devices"]


def test_bench_has_main_and_json_contract():
    src = (ROOT / "bench.py").read_text()
    assert "json.dumps" in src
    for field in ('"metric"', '"value"', '"unit"', '"vs_baseline"'):
        assert field in src


def test_dryrun_multichip_executes():
    """Run the actual mesh/TP dryrun body in-process (8 virtual CPU devices
    from conftest) by flagging ourselves as the child."""
    mod = _load("__graft_entry__")
    os.environ["_GRAFT_DRYRUN_CHILD"] = "1"
    try:
        mod.dryrun_multichip(8)
    finally:
        del os.environ["_GRAFT_DRYRUN_CHILD"]


class _PoisonedJax:
    """Stand-in for a jax module backed by a DEAD tunnel: any attribute
    access (jax.devices, jax.config, ...) would hang forever in real life;
    here it fails the test instantly."""

    def __getattr__(self, name):
        raise AssertionError(
            f"dryrun parent touched jax.{name} — on a hung TPU tunnel this "
            "blocks forever (round-3 MULTICHIP failure mode)")


def test_dryrun_parent_survives_hung_backend(monkeypatch):
    """VERDICT r3 #1b: the parent must complete the dryrun even when the
    process-local jax backend is unusable (simulated by poisoning the jax
    module). The CPU child is a fresh process and is unaffected."""
    mod = _load("__graft_entry__")
    monkeypatch.delenv("_GRAFT_DRYRUN_CHILD", raising=False)
    monkeypatch.setitem(sys.modules, "jax", _PoisonedJax())
    mod.dryrun_multichip(8)  # raises if the parent touches jax at all


def _run_bench(env_extra, sig_after=None, timeout=120):
    env = dict(os.environ)
    env.update(env_extra)
    ready = None
    if sig_after is not None:
        # handshake: wait until bench has installed its signal handlers —
        # on this saturated single-core host interpreter startup alone can
        # exceed any fixed sleep, and a SIGTERM before the handler exists
        # kills the process with default action (observed suite flake)
        import tempfile
        ready = Path(tempfile.mkdtemp()) / "bench_ready"
        env["BENCH_READY_FILE"] = str(ready)
    proc = subprocess.Popen(
        [sys.executable, str(ROOT / "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=ROOT)
    if sig_after is not None:
        deadline = time.time() + 90
        while not ready.exists() and time.time() < deadline \
                and proc.poll() is None:
            time.sleep(0.1)
        time.sleep(sig_after)
        proc.send_signal(signal.SIGTERM)
    out, err = proc.communicate(timeout=timeout)
    return proc.returncode, out, err


def test_bench_zero_budget_still_emits_one_json_line():
    """With no runway, every section is skipped but the ONE JSON line with
    the full key schema is still printed and rc=0 (round-3 rc=124 defense)."""
    rc, out, err = _run_bench({"BENCH_BUDGET_S": "5"})
    assert rc == 0, err[-2000:]
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, out
    rec = json.loads(lines[0])
    assert rec["metric"] == "codec_encode_decode_rtf_2s_16khz"
    assert "value" in rec and "unit" in rec and "vs_baseline" in rec
    assert any("skipped" in e for e in rec["bench_errors"])
    assert rec["gen_3stage_headline_mode"] == "sequential"


def test_bench_sigterm_emits_one_json_line():
    """GNU timeout sends SIGTERM: bench must flush its partial line before
    dying, even while the worker thread is mid-compile."""
    rc, out, err = _run_bench({"BENCH_BUDGET_S": "600"}, sig_after=3.0)
    assert rc == 0, err[-2000:]
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, out
    rec = json.loads(lines[0])
    assert any("signal" in e for e in rec["bench_errors"])
