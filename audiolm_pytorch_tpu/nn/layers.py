"""Core neural-net layers (TPU-first: fp32 params, bf16-friendly compute).

Covers the reference's L0 primitives (reference: audiolm_pytorch/audiolm_pytorch.py:191-260):
bias-less LayerNorm, Linear, Embedding, GEGLU feed-forward.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .module import Module

__all__ = ["Linear", "Embedding", "LayerNorm", "RMSNorm", "GEGLU", "FeedForward", "default", "exists"]


def exists(v):
    return v is not None


def default(v, d):
    return v if exists(v) else d


class Linear(Module):
    def __init__(self, dim_in: int, dim_out: int, *, use_bias: bool = True, key: jax.Array,
                 init_scale: float = 1.0):
        lim = init_scale / math.sqrt(dim_in)
        self.weight = jax.random.uniform(key, (dim_in, dim_out), jnp.float32, -lim, lim)
        self.bias = jnp.zeros((dim_out,), jnp.float32) if use_bias else None

    def __call__(self, x):
        w = self.weight.astype(x.dtype)
        y = x @ w
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y


class Embedding(Module):
    def __init__(self, num_embeddings: int, dim: int, *, key: jax.Array, init_std: float = 0.02):
        self.weight = init_std * jax.random.normal(key, (num_embeddings, dim), jnp.float32)

    def __call__(self, ids):
        return jnp.take(self.weight, ids, axis=0)


class LayerNorm(Module):
    """γ-only layernorm, β fixed at zero (reference: audiolm_pytorch.py:191-198)."""

    def __init__(self, dim: int):
        self.gamma = jnp.ones((dim,), jnp.float32)

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * self.gamma
        return out.astype(x.dtype)


class RMSNorm(Module):
    def __init__(self, dim: int, *, scale: bool = True):
        self.gamma = jnp.ones((dim,), jnp.float32) if scale else None
        self.dim = dim

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        out = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + 1e-8)
        if self.gamma is not None:
            out = out * self.gamma
        return out.astype(x.dtype)


class GEGLU(Module):
    """Gated GELU (reference: audiolm_pytorch.py:246-249)."""

    def __init__(self):
        pass

    def __call__(self, x):
        x, gate = jnp.split(x, 2, axis=-1)
        # exact (erf) gelu — torch F.gelu's default, reference-parity
        return jax.nn.gelu(gate, approximate=False) * x


class FeedForward(Module):
    """Prenorm GEGLU MLP with post-activation LayerNorm
    (reference: audiolm_pytorch.py:251-260 — Sequential(LayerNorm, Linear,
    GEGLU, LayerNorm, Dropout, Linear)).

    Inner dim = int(dim * 2 * mult / 3) to keep params comparable to a ReLU MLP.
    """

    def __init__(self, dim: int, mult: float = 4.0, *, key: jax.Array):
        inner = int(dim * 2 * mult / 3)
        k1, k2 = jax.random.split(key)
        self.pre_norm = LayerNorm(dim)
        self.proj_in = Linear(dim, inner * 2, use_bias=False, key=k1)
        self.norm = LayerNorm(inner)
        self.proj_out = Linear(inner, dim, use_bias=False, key=k2)

    def __call__(self, x):
        h = GEGLU()(self.proj_in(self.pre_norm(x)))
        h = self.norm(h)
        return self.proj_out(h)
