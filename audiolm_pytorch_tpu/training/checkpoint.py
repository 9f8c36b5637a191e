"""Self-describing checkpoints: model config + version + every pytree leaf in
one .npz file, so `init_and_load_from(path)` can rebuild the exact architecture
(reference behavior: soundstream.py:503-506, 711-733 pickles constructor kwargs
into the torch checkpoint). JSON replaces pickle — portable and safe to load.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
from jax import tree_util

__all__ = ["save_checkpoint", "load_checkpoint", "save_pytree", "load_pytree_into"]


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


def save_pytree(path, tree, extra_meta: dict | None = None):
    names, leaves, _ = _leaves_with_names(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = dict(extra_meta or {})
    meta["leaf_names"] = names
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, __meta__=np.frombuffer(
            json.dumps(_to_jsonable(meta)).encode(), dtype=np.uint8), **arrays)


def load_pytree_into(path, tree, prefix: str = ""):
    """Load leaves saved by save_pytree into the structure of `tree`
    (shapes/dtypes must match; names are checked). With `prefix`, only saved
    leaves under that key-path prefix are used (e.g. load just the model out
    of a trainer checkpoint saved as {'model': ..., 'opt': ...})."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        saved_names = meta["leaf_names"]
        if prefix:
            sel = [(i, n[len(prefix):]) for i, n in enumerate(saved_names)
                   if n.startswith(prefix)]
        else:
            sel = list(enumerate(saved_names))
        saved = {n: data[f"leaf_{i}"] for i, n in sel}
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


def save_checkpoint(path, model, *, config: dict | None = None,
                    version: str | None = None, kind: str | None = None,
                    extra: dict | None = None):
    meta = {"config": _to_jsonable(config or {}), "version": version, "kind": kind}
    if extra:
        meta["extra"] = _to_jsonable(extra)
    save_pytree(path, model, extra_meta=meta)


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
