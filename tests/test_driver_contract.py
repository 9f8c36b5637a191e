"""Driver contract: bench.py prints one JSON line; __graft_entry__ exposes
entry() and dryrun_multichip(n). Import-level checks only (the driver runs
them on real hardware)."""
import importlib.util
import inspect
import json
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
    mod = _load("__graft_entry__")
    import jax
    n = len(jax.devices())
    assert n == 8
    mod.dryrun_multichip(n)
