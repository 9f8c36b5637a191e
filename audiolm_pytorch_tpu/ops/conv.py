"""Causal 1-D convolutions, channels-last (B, T, C) — the codec's hot path.

Semantics match the reference exactly (reference: audiolm_pytorch/soundstream.py:332-360):
  - CausalConv1d left-pads `dilation*(k-1) + (1-stride)` samples (reflect by default)
    so output frames depend only on past inputs; output length = ceil(T/stride) when
    T is a multiple of stride.
  - CausalConvTranspose1d upsamples by `stride` and crops the tail to exactly
    `T*stride` samples.

Layout is (batch, time, channel) with weights (kernel, in, out): XLA maps this
directly onto MXU tiles without the NCHW transposes a torch port would carry.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from ..nn.module import Module

__all__ = ["causal_conv1d", "causal_conv_transpose1d", "CausalConv1d", "CausalConvTranspose1d"]

_DIMS = ("NHC", "HIO", "NHC")


def _pet(x):
    """preferred_element_type: fp32 accumulation for fp32 inputs; None for
    bf16 (the MXU accumulates bf16 x bf16 in fp32 natively, and a widening
    preferred type breaks jax's conv VJP under mixed dtypes)."""
    return jnp.float32 if x.dtype == jnp.float32 else None


def causal_conv1d(x, weight, bias=None, *, stride: int = 1, dilation: int = 1,
                  pad_mode: str = "reflect"):
    """x: (B, T, Cin); weight: (K, Cin, Cout). Returns (B, T', Cout)."""
    k = weight.shape[0]
    pad = dilation * (k - 1) + (1 - stride)
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)), mode=pad_mode)
    elif pad < 0:
        x = x[:, -pad:, :]
    y = lax.conv_general_dilated(
        x, weight.astype(x.dtype), (stride,), "VALID",
        rhs_dilation=(dilation,), dimension_numbers=_DIMS,
        preferred_element_type=_pet(x),
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def causal_conv_transpose1d(x, weight, bias=None, *, stride: int):
    """x: (B, T, Cin); weight: (K, Cin, Cout). Returns (B, T*stride, Cout).

    Implemented as an input-dilated convolution with a flipped kernel (the exact
    transpose of a strided conv), then cropped to T*stride — matching the
    reference's `out[..., :n*stride]` (reference: soundstream.py:347-360).
    """
    n = x.shape[1]
    k = weight.shape[0]
    y = lax.conv_general_dilated(
        x, jnp.flip(weight, 0).astype(x.dtype), (1,), [(k - 1, k - 1)],
        lhs_dilation=(stride,), dimension_numbers=_DIMS,
        preferred_element_type=_pet(x),
    ).astype(x.dtype)
    y = y[:, : n * stride, :]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class CausalConv1d(Module):
    def __init__(self, chan_in: int, chan_out: int, kernel_size: int, *,
                 stride: int = 1, dilation: int = 1, pad_mode: str = "reflect",
                 use_bias: bool = True, key: jax.Array):
        lim = 1.0 / math.sqrt(chan_in * kernel_size)
        self.weight = jax.random.uniform(key, (kernel_size, chan_in, chan_out),
                                         jnp.float32, -lim, lim)
        self.bias = jnp.zeros((chan_out,), jnp.float32) if use_bias else None
        self.stride = stride
        self.dilation = dilation
        self.pad_mode = pad_mode

    def __call__(self, x):
        return causal_conv1d(x, self.weight, self.bias, stride=self.stride,
                             dilation=self.dilation, pad_mode=self.pad_mode)


class CausalConvTranspose1d(Module):
    def __init__(self, chan_in: int, chan_out: int, kernel_size: int, *,
                 stride: int, use_bias: bool = True, key: jax.Array):
        lim = 1.0 / math.sqrt(chan_in * kernel_size)
        self.weight = jax.random.uniform(key, (kernel_size, chan_in, chan_out),
                                         jnp.float32, -lim, lim)
        self.bias = jnp.zeros((chan_out,), jnp.float32) if use_bias else None
        self.stride = stride

    def __call__(self, x):
        return causal_conv_transpose1d(x, self.weight, self.bias, stride=self.stride)
