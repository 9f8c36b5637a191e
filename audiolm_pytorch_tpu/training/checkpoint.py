"""Self-describing checkpoints: model config + version + every pytree leaf in
one .npz file, so `init_and_load_from(path)` can rebuild the exact architecture
(reference behavior: soundstream.py:503-506, 711-733 pickles constructor kwargs
into the torch checkpoint). JSON replaces pickle — portable and safe to load.

`bf16=True` stores float leaves as bfloat16 bit-viewed to uint16 (npz cannot
hold ml_dtypes natively) and `compress=True` uses zip deflate — together ~4x
smaller. Small persisted artifacts are what survives a VM wipe: the round-3
72k-step codec and the whole trained 3-stage chain were lost to one restart
because only gitignored full trainer checkpoints existed.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import ml_dtypes
import numpy as np
from jax import tree_util

__all__ = ["save_checkpoint", "load_checkpoint", "save_pytree",
           "load_pytree_into", "persist_model_from"]


def _leaves_with_names(tree):
    keyed, treedef = tree_util.tree_flatten_with_path(tree)
    names, leaves = [], []
    for path, leaf in keyed:
        names.append(jax.tree_util.keystr(path))
        leaves.append(leaf)
    return names, leaves, treedef


def _to_jsonable(v):
    if isinstance(v, (list, tuple)):
        return [_to_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _to_jsonable(x) for k, x in v.items()}
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


def save_pytree(path, tree, extra_meta: dict | None = None, *,
                bf16: bool = False, compress: bool = False):
    names, leaves, _ = _leaves_with_names(tree)
    arrays, bf16_names = {}, []
    for i, x in enumerate(leaves):
        a = np.asarray(x)
        if bf16 and a.dtype in (np.float32, np.float64):
            a = a.astype(ml_dtypes.bfloat16).view(np.uint16)
            bf16_names.append(names[i])
        elif str(a.dtype) == "bfloat16":
            a = a.view(np.uint16)
            bf16_names.append(names[i])
        arrays[f"leaf_{i}"] = a
    meta = dict(extra_meta or {})
    meta["leaf_names"] = names
    if bf16_names:
        meta["bf16_u16_leaves"] = bf16_names
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    saver = np.savez_compressed if compress else np.savez
    with open(path, "wb") as f:
        saver(f, __meta__=np.frombuffer(
            json.dumps(_to_jsonable(meta)).encode(), dtype=np.uint8), **arrays)


def load_pytree_into(path, tree, prefix: str = ""):
    """Load leaves saved by save_pytree into the structure of `tree`
    (shapes/dtypes must match; names are checked). With `prefix`, only saved
    leaves under that key-path prefix are used (e.g. load just the model out
    of a trainer checkpoint saved as {'model': ..., 'opt': ...})."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        saved_names = meta["leaf_names"]
        bf16_names = set(meta.get("bf16_u16_leaves", ()))
        if prefix:
            sel = [(i, n[len(prefix):]) for i, n in enumerate(saved_names)
                   if n.startswith(prefix)]
        else:
            sel = list(enumerate(saved_names))
        saved = {}
        for i, n in sel:
            a = data[f"leaf_{i}"]
            if saved_names[i] in bf16_names:
                a = a.view(ml_dtypes.bfloat16)
            saved[n] = a
    names, leaves, treedef = _leaves_with_names(tree)
    if sorted(names) != sorted(saved.keys()):
        missing = set(names) - set(saved.keys())
        extra = set(saved.keys()) - set(names)
        raise ValueError(
            f"checkpoint structure mismatch (prefix={prefix!r}): "
            f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}")
    new_leaves = [jax.numpy.asarray(saved[n], dtype=l.dtype)
                  for n, l in zip(names, leaves)]
    return tree_util.tree_unflatten(treedef, new_leaves)


def persist_model_from(in_path, out_path, prefix: str = "['model']",
                       bf16: bool = True):
    """Rewrite a (large, gitignored) trainer checkpoint as a small committable
    model-only artifact: keep only leaves under `prefix` (re-rooted so
    `load_pytree_into(out_path, model)` works directly), cast floats to bf16
    bit-views, zip-compress, and carry all non-leaf metadata (config/kind/
    steps) through. ~8x smaller than a full fp32 trainer checkpoint."""
    with np.load(in_path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        names = meta["leaf_names"]
        bf16_old = set(meta.get("bf16_u16_leaves", ()))
        sel = [(i, n[len(prefix):]) for i, n in enumerate(names)
               if n.startswith(prefix)]
        if not sel:
            raise ValueError(f"no leaves under prefix {prefix!r} in {in_path}")
        arrays, new_names, bf16_names = {}, [], []
        for j, (i, n) in enumerate(sel):
            a = data[f"leaf_{i}"]
            if names[i] in bf16_old:
                a = a.view(ml_dtypes.bfloat16)
            if bf16 and a.dtype in (np.float32, np.float64):
                a = a.astype(ml_dtypes.bfloat16)
            if str(a.dtype) == "bfloat16":
                a = a.view(np.uint16)
                bf16_names.append(n)
            arrays[f"leaf_{j}"] = a
            new_names.append(n)
    new_meta = {k: v for k, v in meta.items()
                if k not in ("leaf_names", "bf16_u16_leaves")}
    new_meta["leaf_names"] = new_names
    new_meta["persisted_from"] = str(in_path)
    if bf16_names:
        new_meta["bf16_u16_leaves"] = bf16_names
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "wb") as f:
        np.savez_compressed(f, __meta__=np.frombuffer(
            json.dumps(_to_jsonable(new_meta)).encode(), dtype=np.uint8),
            **arrays)
    return out_path


def save_checkpoint(path, model, *, config: dict | None = None,
                    version: str | None = None, kind: str | None = None,
                    extra: dict | None = None, bf16: bool = False,
                    compress: bool = False):
    meta = {"config": _to_jsonable(config or {}), "version": version, "kind": kind}
    if extra:
        meta["extra"] = _to_jsonable(extra)
    save_pytree(path, model, extra_meta=meta, bf16=bf16, compress=compress)


def load_checkpoint(path):
    """Returns {'config', 'version', 'kind', 'restore'} where restore(model)
    loads the saved leaves into a freshly-constructed model."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
    config = meta.get("config", {})
    # JSON turns tuples into lists; constructors normalize via tuple(...) where needed
    def restore(model):
        return load_pytree_into(path, model)
    return {"config": {k: (tuple(v) if isinstance(v, list) else v)
                       for k, v in config.items()},
            "version": meta.get("version"), "kind": meta.get("kind"),
            "extra": meta.get("extra"), "restore": restore}
