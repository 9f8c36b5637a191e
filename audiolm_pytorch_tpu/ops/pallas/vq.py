"""Fused codebook-distance + argmin Pallas kernel for VQ encode.

The bit-exactness-critical nearest-code search (BASELINE.md: fp32 distances).
One program handles a block of vectors: the (BN, C) distance tile lives only
in VMEM — the full (N, C) distance matrix never touches HBM (the XLA graph
materializes it). x·Eᵀ rides the MXU; the norm/argmin epilogue is VPU work in
the same kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["vq_nearest_code"]


def _kernel(x_ref, cb_ref, e2_ref, idx_ref, *, block_n: int):
    x = x_ref[:].astype(jnp.float32)          # (BN, D)
    cb = cb_ref[:].astype(jnp.float32)        # (C, D)
    # ||x-e||^2 = ||x||^2 - 2 x.e + ||e||^2 ; ||x||^2 is constant per row for
    # the argmin, so skip it: minimize (-2 x.e + ||e||^2)
    scores = -2.0 * jax.lax.dot_general(
        x, cb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    scores = scores + e2_ref[:].reshape(1, -1)
    idx_ref[:] = jnp.argmin(scores, axis=-1).astype(jnp.int32).reshape(block_n, 1)


def vq_nearest_code(x, codebook, *, block_n: int = 512,
                    interpret: bool | None = None):
    """x: (N, D); codebook: (C, D) -> int32 (N,) nearest-code indices."""
    if interpret is None:
        from . import on_tpu
        interpret = not on_tpu()
    n, d = x.shape
    c = codebook.shape[0]
    block_n = min(block_n, max(8, 1 << (n - 1).bit_length()))
    pad = (-n) % block_n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    np_ = n + pad
    e2 = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)

    out = pl.pallas_call(
        functools.partial(_kernel, block_n=block_n),
        grid=(np_ // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        interpret=interpret,
    )(xp, codebook, e2)
    return out[:n, 0]
