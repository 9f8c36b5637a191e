"""Functional pytree module system — the foundation of the framework.

Modules are immutable pytrees: array-valued attributes (and containers of
them / sub-modules) are pytree children; everything else (ints, floats,
strings, callables, shape tuples) is static auxiliary data that keys jit
caches. This gives equinox-style ergonomics with zero dependencies:

    model = SoundStream(..., key=key)      # constructor-style init (reference API shape)
    y = model(x)                           # pure call
    grads = jax.grad(loss)(params)         # differentiate a partition of the model

Non-differentiable state (EMA codebooks, cluster counts) is wrapped in
`Buffer`, excluded from the trainable partition, and updated functionally
by returning a new module (`evolve`).

Replaces the reference's torch.nn.Module state (reference:
audiolm_pytorch/audiolm_pytorch.py, soundstream.py) with a functional
design that jit/scan/shard_map compose with directly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import numpy as np
from jax import tree_util

__all__ = [
    "Module",
    "Buffer",
    "buffer",
    "evolve",
    "partition",
    "combine",
    "partition_trainable",
    "is_inexact_array",
    "tree_size",
]


def is_inexact_array(x: Any) -> bool:
    return isinstance(x, (jax.Array, np.ndarray)) and np.issubdtype(x.dtype, np.inexact)


def _is_array(x: Any) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


def _contains_arrays(v: Any) -> bool:
    if _is_array(v) or isinstance(v, (Module, Buffer)):
        return True
    if isinstance(v, (list, tuple)):
        return any(_contains_arrays(x) for x in v)
    if isinstance(v, dict):
        return any(_contains_arrays(x) for x in v.values())
    return False


def _is_dynamic(v: Any) -> bool:
    """A value is a pytree child if it is (or contains) arrays / modules, or is
    None at the attribute level (None = optional submodule slot; an empty
    subtree in JAX). The classification is made ONCE, when the attribute is
    first assigned, and stored on the instance — so partition/combine (which
    substitute None into array slots) can never flip a child back to static.
    """
    return v is None or _contains_arrays(v)


def _hashable(v: Any) -> Any:
    if isinstance(v, (list, tuple)):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    return v


class _Static:
    """Hashable wrapper for static aux data (keeps original values for rebuild)."""

    __slots__ = ("names", "values", "_hash")

    def __init__(self, names, values):
        self.names = names
        self.values = values
        self._hash = hash((names, tuple(_hashable(v) for v in values)))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (
            isinstance(other, _Static)
            and self.names == other.names
            and all(_hashable(a) == _hashable(b) for a, b in zip(self.values, other.values))
        )


@tree_util.register_pytree_node_class
class Buffer:
    """Marks an array as non-trainable state (EMA stats, codebooks, step counters)."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def tree_flatten(self):
        return (self.value,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def __repr__(self):
        return f"Buffer({self.value!r})"


def buffer(value) -> Buffer:
    return Buffer(value)


class Module:
    """Base class. Subclasses write a normal ``__init__`` that sets attributes;
    registration as a pytree happens automatically per subclass."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        tree_util.register_pytree_with_keys(
            cls,
            flatten_with_keys=cls._flatten_with_keys,
            flatten_func=cls._flatten,
            unflatten_func=cls._unflatten,
        )

    def __setattr__(self, name, value):
        # classify child-vs-static on every assignment (an attribute can be
        # promoted to dynamic, e.g. re-assigned from a placeholder to a
        # module list); unflatten/evolve bypass this via object.__setattr__,
        # so partition/combine's None substitution can't flip a child back
        dyn = self.__dict__.get("_dyn_names")
        if dyn is None:
            dyn = set()
            object.__setattr__(self, "_dyn_names", dyn)
        if _is_dynamic(value):
            dyn.add(name)
        else:
            dyn.discard(name)
        object.__setattr__(self, name, value)

    # -- pytree protocol ---------------------------------------------------
    def _split_fields(self):
        dyn = self.__dict__.get("_dyn_names", set())
        dyn_names, dyn_vals, st_names, st_vals = [], [], [], []
        for name in sorted(self.__dict__):
            if name == "_dyn_names":
                continue
            v = self.__dict__[name]
            # re-check staticness at flatten time: a list assigned empty in
            # __init__ and then .append()ed (torch ModuleList idiom) never
            # re-enters __setattr__, yet MUST be a pytree child — classifying
            # it static would silently freeze its parameters (the round-1 bug
            # that froze every Transformer.layers stack)
            if name in dyn or _contains_arrays(v):
                dyn_names.append(name)
                dyn_vals.append(v)
            else:
                st_names.append(name)
                st_vals.append(v)
        return tuple(dyn_names), tuple(dyn_vals), tuple(st_names), tuple(st_vals)

    def _flatten(self):
        dn, dv, sn, sv = self._split_fields()
        return dv, (dn, _Static(sn, sv))

    def _flatten_with_keys(self):
        dn, dv, sn, sv = self._split_fields()
        keyed = tuple((tree_util.GetAttrKey(n), v) for n, v in zip(dn, dv))
        return keyed, (dn, _Static(sn, sv))

    @classmethod
    def _unflatten(cls, aux, children):
        dn, static = aux
        obj = object.__new__(cls)
        object.__setattr__(obj, "_dyn_names", set(dn))
        for n, v in zip(dn, children):
            object.__setattr__(obj, n, v)
        for n, v in zip(static.names, static.values):
            object.__setattr__(obj, n, v)
        return obj

    # -- conveniences ------------------------------------------------------
    def __repr__(self):
        cls = type(self).__name__
        parts = []
        for name in sorted(self.__dict__):
            v = self.__dict__[name]
            if _is_array(v):
                parts.append(f"{name}={v.dtype}{list(v.shape)}")
            elif isinstance(v, Module):
                parts.append(f"{name}={type(v).__name__}(...)")
            elif isinstance(v, (int, float, str, bool)):
                parts.append(f"{name}={v!r}")
        return f"{cls}({', '.join(parts)})"


def evolve(module: Module, **changes) -> Module:
    """Functional attribute update (dataclasses.replace for Modules)."""
    obj = object.__new__(type(module))
    for n, v in module.__dict__.items():
        object.__setattr__(obj, n, set(v) if n == "_dyn_names" else v)
    for n, v in changes.items():
        if n not in module.__dict__:
            raise AttributeError(f"{type(module).__name__} has no attribute {n!r}")
        object.__setattr__(obj, n, v)
    return obj


# ---------------------------------------------------------------------------
# Partition / combine (equinox-style filtering)
# ---------------------------------------------------------------------------

def _none_leaf(x):
    return x is None


def partition(tree, pred: Callable[[Any], bool]):
    """Split a pytree into (matching, rest); non-selected positions become None."""
    leaves, treedef = tree_util.tree_flatten(tree)
    a = [x if pred(x) else None for x in leaves]
    b = [None if pred(x) else x for x in leaves]
    return tree_util.tree_unflatten(treedef, a), tree_util.tree_unflatten(treedef, b)


def combine(*trees):
    """Inverse of partition: first non-None leaf wins."""

    def pick(*xs):
        for x in xs:
            if x is not None:
                return x
        return None

    return tree_util.tree_map(pick, *trees, is_leaf=_none_leaf)


def _trainable_leaf_flags(tree, in_buffer=False, out=None):
    if out is None:
        out = []
    if isinstance(tree, Buffer):
        _trainable_leaf_flags(tree.value, True, out)
    elif isinstance(tree, Module):
        dn, dv, _, _ = tree._split_fields()
        for v in dv:
            _trainable_leaf_flags(v, in_buffer, out)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            _trainable_leaf_flags(v, in_buffer, out)
    elif isinstance(tree, dict):
        for k in sorted(tree):
            _trainable_leaf_flags(tree[k], in_buffer, out)
    elif tree is None:
        pass
    else:  # leaf
        out.append((not in_buffer) and is_inexact_array(tree))
    return out


def partition_trainable(module):
    """Split a module into (trainable params, static remainder).

    Trainable = inexact arrays not under a Buffer. Use with jax.grad:

        params, rest = partition_trainable(model)
        def loss(params):
            model = combine(params, rest)
            ...
    """
    flags = _trainable_leaf_flags(module)
    leaves, treedef = tree_util.tree_flatten(module)
    assert len(flags) == len(leaves), (len(flags), len(leaves))
    a = [x if f else None for f, x in zip(flags, leaves)]
    b = [None if f else x for f, x in zip(flags, leaves)]
    return tree_util.tree_unflatten(treedef, a), tree_util.tree_unflatten(treedef, b)


def _buffer_leaf_flags(tree, in_buffer=False, out=None):
    if out is None:
        out = []
    if isinstance(tree, Buffer):
        _buffer_leaf_flags(tree.value, True, out)
    elif isinstance(tree, Module):
        _, dv, _, _ = tree._split_fields()
        for v in dv:
            _buffer_leaf_flags(v, in_buffer, out)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            _buffer_leaf_flags(v, in_buffer, out)
    elif isinstance(tree, dict):
        for k in sorted(tree):
            _buffer_leaf_flags(tree[k], in_buffer, out)
    elif tree is None:
        pass
    else:
        out.append(in_buffer)
    return out


def partition_buffers(module):
    """Split into (buffer leaves, everything else) — for merging functional
    state updates (VQ-EMA codebooks) back into an optimizer-updated model."""
    flags = _buffer_leaf_flags(module)
    leaves, treedef = tree_util.tree_flatten(module)
    assert len(flags) == len(leaves)
    a = [x if f else None for f, x in zip(flags, leaves)]
    b = [None if f else x for f, x in zip(flags, leaves)]
    return tree_util.tree_unflatten(treedef, a), tree_util.tree_unflatten(treedef, b)


def partition_trainable_where(module, path_pred):
    """Like partition_trainable, but a leaf is only trainable when
    `path_pred(path_str)` is also True, where path_str is the dotted attribute
    path (e.g. "discrs.stft.layers.0.weight"). Used to split GAN generator vs
    discriminator parameter groups."""
    flags = _trainable_leaf_flags(module)
    keyed, treedef = tree_util.tree_flatten_with_path(module)
    assert len(flags) == len(keyed)
    a, b = [], []
    for f, (path, leaf) in zip(flags, keyed):
        path_str = ".".join(str(getattr(p, "name", getattr(p, "idx", getattr(p, "key", p))))
                            for p in path)
        sel = f and path_pred(path_str)
        a.append(leaf if sel else None)
        b.append(None if sel else leaf)
    return tree_util.tree_unflatten(treedef, a), tree_util.tree_unflatten(treedef, b)


def tree_size(tree) -> int:
    """Total number of array elements in a pytree."""
    return sum(x.size for x in tree_util.tree_leaves(tree) if _is_array(x))


def cast_floats(tree, dtype):
    """Cast float32 leaves to `dtype` (e.g. bf16 for inference: layers upcast
    through fp32 accumulation/softmax internally, so this halves HBM weight
    traffic in decode loops without touching the math-sensitive paths)."""
    import jax.numpy as jnp

    def cast(x):
        if _is_array(x) and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x

    return tree_util.tree_map(cast, tree)
