"""Blocked causal local attention as a single-pass Pallas kernel.

The codec bottleneck attends within a window plus one look-back window
(reference capability: local_attention.LocalMHA at soundstream.py:397-440).
Each grid program computes one (window, 2*window) attention tile: with the
default window 128 and dim_head 64 the s/p matrices are (128, 256) — exact
MXU/VPU tile shapes, one softmax, no online rescaling needed (the full key
range of a query fits in the tile).

Backward runs through the XLA blocked implementation via custom VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["local_attention_pallas"]

_NEG_INF = -1e30


def _kernel(q_ref, kp_ref, kc_ref, vp_ref, vc_ref, bias_ref, mp_ref, mc_ref,
            o_ref, *, scale: float, window: int):
    wi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale           # (w, d)
    k2 = jnp.concatenate([kp_ref[0], kc_ref[0]], axis=0).astype(jnp.float32)  # (2w, d)
    v2 = jnp.concatenate([vp_ref[0], vc_ref[0]], axis=0).astype(jnp.float32)

    s = jax.lax.dot_general(q, k2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (w, 2w)
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)

    qpos = jax.lax.broadcasted_iota(jnp.int32, (window, 2 * window), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (window, 2 * window), 1)
    allowed = kpos <= qpos + window            # causal within the band
    allowed &= jnp.logical_or(wi > 0, kpos >= window)  # first window: no look-back
    if mp_ref is not None:
        kvalid = jnp.concatenate([mp_ref[0], mc_ref[0]], axis=0) != 0  # (2w,)
        allowed &= kvalid[None, :]
    s = jnp.where(allowed, s, _NEG_INF)

    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jax.lax.dot_general(p, v2, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)


def _dispatch(*refs, has_bias, has_mask, **kw):
    idx = 5
    bias_ref = refs[idx] if has_bias else None
    idx += 1 if has_bias else 0
    mp_ref = refs[idx] if has_mask else None
    mc_ref = refs[idx + 1] if has_mask else None
    idx += 2 if has_mask else 0
    _kernel(refs[0], refs[1], refs[2], refs[3], refs[4], bias_ref, mp_ref,
            mc_ref, refs[idx], **kw)


def _forward(q, k, v, *, window: int, bias=None, key_mask=None,
             scale: float, interpret: bool):
    """q, k, v: (B, H, T, D) with T % window == 0; bias: (H, w, 2w);
    key_mask: (B, T) int8."""
    b, h, t, d = q.shape
    nw = t // window
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)

    def idx_cur(bh, i):
        return (bh, i, 0)

    def idx_prev(bh, i):
        return (bh, jnp.maximum(i - 1, 0), 0)

    specs = [
        pl.BlockSpec((1, window, d), idx_cur, memory_space=pltpu.VMEM),   # q
        pl.BlockSpec((1, window, d), idx_prev, memory_space=pltpu.VMEM),  # k prev
        pl.BlockSpec((1, window, d), idx_cur, memory_space=pltpu.VMEM),   # k cur
        pl.BlockSpec((1, window, d), idx_prev, memory_space=pltpu.VMEM),  # v prev
        pl.BlockSpec((1, window, d), idx_cur, memory_space=pltpu.VMEM),   # v cur
    ]
    args = [qf, kf, kf, vf, vf]
    if bias is not None:
        specs.append(pl.BlockSpec((1, window, 2 * window),
                                  lambda bh, i: (bh % h, 0, 0),
                                  memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32))
    if key_mask is not None:
        km = key_mask.astype(jnp.int8)
        specs.append(pl.BlockSpec((1, window), lambda bh, i: (bh // h, jnp.maximum(i - 1, 0)),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, window), lambda bh, i: (bh // h, i),
                                  memory_space=pltpu.VMEM))
        args.extend([km, km])

    kernel = functools.partial(_dispatch, has_bias=bias is not None,
                               has_mask=key_mask is not None, scale=scale,
                               window=window)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, nw),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, window, d), idx_cur, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, t, d)


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(window, scale, interpret, has_bias, has_mask):
    from ..attention import local_attention as xla_local

    @jax.custom_vjp
    def f(q, k, v, bias, key_mask):
        return _forward(q, k, v, window=window, bias=bias, key_mask=key_mask,
                        scale=scale, interpret=interpret)

    def fwd(q, k, v, bias, key_mask):
        return f(q, k, v, bias, key_mask), (q, k, v, bias, key_mask)

    def bwd(res, g):
        q, k, v, bias, key_mask = res
        diff = (q, k, v) if bias is None else (q, k, v, bias)

        def ref(*args):
            if bias is None:
                qq, kk, vv = args
                bb = None
            else:
                qq, kk, vv, bb = args
            m = key_mask.astype(bool) if key_mask is not None else None
            return xla_local(qq, kk, vv, window_size=window, mask=m,
                             attn_bias=bb, scale=scale)

        _, vjp = jax.vjp(ref, *diff)
        grads = vjp(g)
        if bias is None:
            dq, dk, dv = grads
            dbias = None
        else:
            dq, dk, dv, dbias = grads
        return dq, dk, dv, dbias, None

    f.defvjp(fwd, bwd)
    return f


def local_attention_pallas(q, k, v, *, window_size: int, mask=None,
                           attn_bias=None, scale: float | None = None,
                           interpret: bool | None = None):
    """Same contract as ops.attention.local_attention. Pads T to a multiple of
    the window (padded keys masked, padded queries sliced off)."""
    b, h, t, d = q.shape
    scale = scale if scale is not None else d ** -0.5
    if interpret is None:
        from . import on_tpu
        interpret = not on_tpu()

    pad = (-t) % window_size
    if pad:
        cfg = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(x, cfg) for x in (q, k, v))
        if mask is None:
            mask = jnp.ones((b, t), bool)
        mask = jnp.pad(mask, ((0, 0), (0, pad)))

    fn = _make_vjp_fn(window_size, float(scale), interpret,
                      attn_bias is not None, mask is not None)
    out = fn(q, k, v, attn_bias, mask)
    return out[:, :, :t]
