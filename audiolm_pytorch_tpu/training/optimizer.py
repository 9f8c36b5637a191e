"""Optimizer factory + warmup schedules (optax).

Mirrors the reference's optimizer surface (reference: audiolm_pytorch/
optimizer.py:1-37 and trainer.py:165-208): Adam/AdamW with weight decay
applied only to parameters with ndim >= 2, linear warmup, optional cosine
schedule, global-norm clipping folded into the chain.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["get_optimizer", "separate_weight_decayable_params"]


def separate_weight_decayable_params(params):
    """Mask pytree: True where weight decay applies (ndim >= 2)
    (reference: optimizer.py:3-8 splits by p.ndim < 2)."""
    return jax.tree_util.tree_map(
        lambda p: hasattr(p, "ndim") and p.ndim >= 2, params,
        is_leaf=lambda x: x is None)


def get_optimizer(lr: float = 1e-4, wd: float = 0.0, betas=(0.9, 0.99),
                  eps: float = 1e-8, *, warmup_steps: int = 0,
                  total_steps: Optional[int] = None, cosine_decay: bool = False,
                  max_grad_norm: Optional[float] = None,
                  filter_by_requires_grad: bool = False) -> optax.GradientTransformation:
    """(reference: optimizer.py:10-37 + trainer.py:165-208 warmup wrapper)."""
    if warmup_steps > 0:
        if cosine_decay and total_steps:
            schedule = optax.warmup_cosine_decay_schedule(
                0.0, lr, warmup_steps, total_steps)
        else:
            schedule = optax.linear_schedule(0.0, lr, max(warmup_steps, 1))
    else:
        schedule = lr

    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if wd > 0:
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        chain.append(optax.add_decayed_weights(
            wd, mask=separate_weight_decayable_params))
        chain.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*chain)
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)
