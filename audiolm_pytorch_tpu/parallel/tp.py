"""Tensor-parallel sharding rules for the LM transformers.

Megatron-style layout over the mesh's `model` axis (the scaling-book recipe:
annotate shardings, let GSPMD insert the collectives over ICI):

  * attention `to_q`: column-parallel — inner (heads*dim_head) dim sharded, so
    each device computes its own heads. `to_kv` stays replicated (MQA: one
    shared KV head — sharding a dim of size 2*dim_head is not profitable).
  * attention `to_out`: row-parallel — input dim sharded to match `to_q`'s
    output; GSPMD inserts one psum after the projection.
  * feed-forward `proj_in`: column-parallel (inner*2 dim), `proj_out`:
    row-parallel (inner dim) — one psum per FF.
  * token embeddings / logit heads: sharded over the vocab dim (the logit
    psum/all-gather rides ICI).

Everything else (norms, biases, rel-pos MLP) is replicated. These rules are
path-pattern based, so they apply to SemanticTransformer, CoarseTransformer,
FineTransformer and the bare Transformer alike.

The reference scales with DDP only (reference: trainer.py accelerate
integration); tensor parallelism is part of this framework's TPU-first design
(SURVEY.md §2.4).
"""
from __future__ import annotations

import re

import jax
import numpy as np
from jax import tree_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import model_axis_name

__all__ = ["tp_rules_for_lm", "apply_tp_sharding", "shard_by_rules"]

# pattern -> preferred shard dims, tried in order (first divisible wins).
# Matched against jax keystr paths like ".transformer.layers[0][1].to_q.weight".
_LM_TP_RULES = (
    (re.compile(r"\.to_q\.weight$"), (1,)),          # column parallel
    (re.compile(r"\.to_out\.weight$"), (0,)),        # row parallel
    (re.compile(r"\.proj_in\.weight$"), (1,)),       # FF column parallel
    (re.compile(r"\.proj_out\.weight$"), (0,)),      # FF row parallel
    # vocab-sharded when the vocab divides; else shard the feature dim (the
    # reference vocab 501 divides by nothing useful — feature-dim sharding
    # still all-gathers only a (N, D/m) slice per device)
    (re.compile(r"embedding\]?$|embedding\.weight$"), (0, 1)),
    (re.compile(r"\.to_logits\.weight$"), (1, 0)),
    (re.compile(r"logit_weights\]?$"), (1, 2)),      # per-q heads (Q, C, D)
)


def tp_rules_for_lm(model, num_model: int):
    """Return {keystr: PartitionSpec} for every leaf of `model`. Leaves with
    no matched divisible dim stay replicated."""
    rules = {}
    keyed, _ = tree_util.tree_flatten_with_path(model)
    for path, leaf in keyed:
        name = tree_util.keystr(path)
        spec = P()
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            for pat, dims in _LM_TP_RULES:
                if not pat.search(name):
                    continue
                for dim in dims:
                    if leaf.ndim > dim and leaf.shape[dim] % num_model == 0 \
                            and leaf.shape[dim] >= 2 * num_model:
                        parts = [None] * leaf.ndim
                        parts[dim] = model_axis_name
                        spec = P(*parts)
                        break
                break  # first matching pattern owns the leaf
        rules[name] = spec
    return rules


def shard_by_rules(model, mesh: Mesh, rules: dict):
    """device_put every leaf according to its rule (replicated when absent)."""
    def place(path, x):
        if not hasattr(x, "shape"):
            return x
        spec = rules.get(tree_util.keystr(path), P())
        return jax.device_put(x, NamedSharding(mesh, spec))
    return tree_util.tree_map_with_path(place, model)


def apply_tp_sharding(model, mesh: Mesh):
    """One-call tensor-parallel placement of an LM (or param partition) over
    `mesh`'s model axis. Returns the sharded pytree."""
    num_model = mesh.shape[model_axis_name]
    return shard_by_rules(model, mesh, tp_rules_for_lm(model, num_model))
