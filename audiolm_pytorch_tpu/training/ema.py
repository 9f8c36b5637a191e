"""Exponential moving average of a model pytree, fully functional — lives
inside the jitted train step (replacing `ema-pytorch`, reference:
trainer.py:34, 284-286: beta 0.995, update_after_step 500, update_every 10).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["EMAState", "ema_init", "ema_update"]


class EMAState(NamedTuple):
    shadow: object  # pytree matching the model
    step: jax.Array


def ema_init(model) -> EMAState:
    return EMAState(shadow=jax.tree_util.tree_map(
        lambda x: x.copy() if hasattr(x, "copy") else x, model),
        step=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, model, *, beta: float = 0.995,
               update_after_step: int = 500, update_every: int = 10) -> EMAState:
    step = state.step + 1
    should = (step > update_after_step) & (step % update_every == 0)
    warm = step <= update_after_step  # during warmup, copy the online model

    def upd(s, m):
        if not hasattr(m, "dtype") or not jnp.issubdtype(m.dtype, jnp.floating):
            return m  # ints/bools track the online model
        new = beta * s + (1.0 - beta) * m
        return jnp.where(warm, m, jnp.where(should, new, s))

    shadow = jax.tree_util.tree_map(upd, state.shadow, model)
    return EMAState(shadow=shadow, step=step)
