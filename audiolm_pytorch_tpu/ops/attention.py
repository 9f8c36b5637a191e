"""Attention ops: masked SDPA (the math path of the reference's `Attend`,
reference: attend.py:98-146) and blocked causal local attention (the
`local_attention` LocalMHA capability at the codec bottleneck, reference:
soundstream.py:397-440).

TPU-first notes:
  * softmax statistics in fp32, matmuls bf16-in/fp32-accumulate on the MXU.
  * local attention is blocked: queries attend within their window block plus
    one look-back block, so compute is O(T·w) and the (w, 2w) tiles map onto
    MXU/VPU tiles directly. A fused Pallas kernel can swap in behind the same
    signature (see ops/pallas/).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..nn.layers import Linear, LayerNorm
from ..nn.module import Module

__all__ = ["attend", "local_attention", "rotary_xpos", "LocalMHA", "LocalTransformer"]

_NEG_INF = -1e9  # finite mask value: keeps softmax NaN-free on fully-masked rows


def attend(q, k, v, *, mask=None, attn_bias=None, causal: bool = False,
           scale: float | None = None, dropout_rate: float = 0.0,
           dropout_key=None):
    """q: (B, H, N, D); k, v: (B, Hk, M, D) with Hk in {1, H} (MQA broadcast).

    mask: broadcastable to (B, H, N, M), True = attend. attn_bias: additive
    (H, N, M) or (B, H, N, M). dropout applies to the attention weights
    (reference: attend.py:127 drops the post-softmax matrix). Returns
    (B, H, N, D).
    """
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    # matmuls run in the INPUT dtype on the MXU with fp32 accumulation
    # (bf16-in/fp32-acc is 2x the fp32 MXU rate and halves HBM traffic for
    # the attention matrix under bf16 compute); softmax statistics stay fp32.
    # The softmax scale is applied to the fp32 sim output — free, and under
    # bf16 inputs it avoids rounding the scale to ~3 decimal digits
    # (ADVICE r2: scaling bf16 q perturbed logit temperature by up to ~0.4%)
    sim = jnp.einsum("bhnd,bkmd->bhnm", q, k,
                     preferred_element_type=jnp.float32) \
        if k.shape[1] != q.shape[1] and k.shape[1] == 1 \
        else jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    sim = sim * scale
    if attn_bias is not None:
        sim = sim + attn_bias.astype(sim.dtype)
    if causal:
        n, m = sim.shape[-2], sim.shape[-1]
        causal_mask = jnp.tril(jnp.ones((n, m), bool), k=m - n)
        sim = jnp.where(causal_mask, sim, _NEG_INF)
    if mask is not None:
        sim = jnp.where(mask, sim, _NEG_INF)
    attn = jax.nn.softmax(sim, axis=-1)
    if dropout_rate > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    attn = attn.astype(v.dtype)
    out = jnp.einsum("bhnm,bkmd->bhnd", attn, v,
                     preferred_element_type=jnp.float32) \
        if v.shape[1] != q.shape[1] and v.shape[1] == 1 \
        else jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                        preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def rotary_xpos(t, *, scale_base: float | None = 512.0, invert_scale: bool = False,
                pos_offset: int = 0):
    """Rotary embedding with optional xpos length-extrapolating scale.
    t: (..., N, D). Applies rotation over the last dim pairs."""
    d = t.shape[-1]
    n = t.shape[-2]
    half = d // 2
    freqs = 1.0 / (10000 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    pos = jnp.arange(n, dtype=jnp.float32) + pos_offset
    ang = pos[:, None] * freqs[None, :]  # (N, half)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    if scale_base is not None:
        power = (pos - n // 2) / scale_base
        xpos_scale = ((jnp.arange(0, half, dtype=jnp.float32) + 0.4 * half) / (1.4 * half))
        scale = xpos_scale[None, :] ** power[:, None]
        if invert_scale:
            scale = 1.0 / scale
    else:
        scale = jnp.ones_like(cos)
    t1, t2 = t[..., :half], t[..., half:]
    tf1, tf2 = t1.astype(jnp.float32), t2.astype(jnp.float32)
    out1 = (tf1 * cos - tf2 * sin) * scale
    out2 = (tf2 * cos + tf1 * sin) * scale
    return jnp.concatenate([out1, out2], axis=-1).astype(t.dtype)


def local_attention(q, k, v, *, window_size: int, mask=None, attn_bias=None,
                    scale: float | None = None):
    """Causal blocked local attention. q, k, v: (B, H, N, D); each query sees
    its own window block plus the previous block (look_backward=1), causally.

    mask: (B, N) True = valid key position. attn_bias: (H, w, 2w) additive bias
    over (query-in-window, key-in-2-windows) relative positions.
    """
    b, h, n, d = q.shape
    w = window_size
    pad = (-n) % w
    if pad:
        padcfg = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(t, padcfg) for t in (q, k, v))
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, pad)))
        else:
            mask = jnp.pad(jnp.ones((b, n), bool), ((0, 0), (0, pad)))
    nt = q.shape[2]
    nw = nt // w
    scale = scale if scale is not None else d ** -0.5

    qw = q.reshape(b, h, nw, w, d) * jnp.asarray(scale, q.dtype)
    kw = k.reshape(b, h, nw, w, d)
    vw = v.reshape(b, h, nw, w, d)
    # keys/values for window i: windows [i-1, i]
    k_prev = jnp.pad(kw, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))[:, :, :-1]
    v_prev = jnp.pad(vw, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))[:, :, :-1]
    k2 = jnp.concatenate([k_prev, kw], axis=3)  # (B,H,nw,2w,D)
    v2 = jnp.concatenate([v_prev, vw], axis=3)

    # input-dtype matmul, fp32 accumulation/softmax (see attend())
    sim = jnp.einsum("bhgqd,bhgkd->bhgqk", qw, k2,
                     preferred_element_type=jnp.float32)  # (B,H,nw,w,2w)
    if attn_bias is not None:
        sim = sim + attn_bias[None, :, None].astype(sim.dtype)

    # causal mask over relative positions: query j (abs pos g*w+j) may attend
    # key position g*w - w + i for i in [0, 2w): allowed iff i <= j + w
    qpos = jnp.arange(w)[:, None]
    kpos = jnp.arange(2 * w)[None, :]
    causal_ok = kpos <= qpos + w
    # first window has no previous block: mask padded keys
    win_idx = jnp.arange(nw)[:, None, None]
    first_ok = (win_idx > 0) | (kpos[None] >= w)
    allowed = causal_ok[None] & first_ok  # (nw, w, 2w)

    if mask is not None:
        mw = mask.reshape(b, nw, w)
        m_prev = jnp.pad(mw, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        key_valid = jnp.concatenate([m_prev, mw], axis=2)  # (B, nw, 2w)
        allowed = allowed[None] & key_valid[:, :, None, :]
        sim = jnp.where(allowed[:, None], sim, _NEG_INF)
    else:
        sim = jnp.where(allowed[None, None], sim, _NEG_INF)

    attn = jax.nn.softmax(sim, axis=-1).astype(v2.dtype)
    out = jnp.einsum("bhgqk,bhgkd->bhgqd", attn, v2,
                     preferred_element_type=jnp.float32)
    out = out.reshape(b, h, nt, d).astype(q.dtype)
    return out[:, :, :n]


class LocalMHA(Module):
    """Windowed causal multi-head attention with xpos rotary, qk-rmsnorm and
    per-head value gates (reference capability: local_attention.LocalMHA as
    configured at soundstream.py:412-424)."""

    def __init__(self, *, dim: int, heads: int = 8, dim_head: int = 64,
                 window_size: int = 128, qk_rmsnorm: bool = True,
                 use_xpos: bool = True, xpos_scale_base: float | None = None,
                 gate_values_per_head: bool = True, prenorm: bool = True,
                 key: jax.Array):
        inner = heads * dim_head
        k1, k2, k3, k4 = jax.random.split(key, 4)
        self.norm = LayerNorm(dim) if prenorm else None
        self.to_qkv = Linear(dim, inner * 3, use_bias=False, key=k1)
        self.to_out = Linear(inner, dim, use_bias=False, key=k2)
        self.to_gate = Linear(dim, heads, use_bias=False, key=k3) if gate_values_per_head else None
        if qk_rmsnorm:
            self.q_scale = jnp.ones((dim_head,), jnp.float32)
            self.k_scale = jnp.ones((dim_head,), jnp.float32)
        else:
            self.q_scale = None
            self.k_scale = None
        self.heads = heads
        self.dim_head = dim_head
        self.window_size = window_size
        self.use_xpos = use_xpos
        self.xpos_scale_base = xpos_scale_base if xpos_scale_base is not None else window_size // 2
        self.qk_rmsnorm = qk_rmsnorm

    def __call__(self, x, *, mask=None, attn_bias=None):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        inp = self.norm(x) if self.norm is not None else x
        qkv = self.to_qkv(inp)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (t.reshape(b, n, h, dh).transpose(0, 2, 1, 3) for t in (q, k, v))

        scale = dh ** -0.5
        if self.qk_rmsnorm:
            q = _rms(q) * self.q_scale.astype(q.dtype)
            k = _rms(k) * self.k_scale.astype(k.dtype)
            scale = 8.0 / dh  # cosine-sim attention temperature
        if self.use_xpos:
            sb = self.xpos_scale_base
            q = rotary_xpos(q, scale_base=sb)
            k = rotary_xpos(k, scale_base=sb, invert_scale=True)

        out = local_attention(q, k, v, window_size=self.window_size, mask=mask,
                              attn_bias=attn_bias, scale=scale)
        if self.to_gate is not None:
            gates = jax.nn.sigmoid(self.to_gate(inp))  # (B, N, H)
            out = out * gates.transpose(0, 2, 1)[..., None]
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
        return self.to_out(out)


def _rms(t, eps: float = 1e-8):
    tf = t.astype(jnp.float32)
    return (tf * jax.lax.rsqrt(jnp.mean(tf * tf, -1, keepdims=True) + eps)).astype(t.dtype)


class LocalTransformer(Module):
    """Stack of (LocalMHA, FeedForward) residual pairs at the codec bottleneck
    (reference: soundstream.py:397-440)."""

    def __init__(self, *, dim: int, depth: int, heads: int, window_size: int,
                 dim_head: int = 64, xpos_scale_base: float | None = None,
                 dynamic_pos_bias: bool = False, key: jax.Array, **kwargs):
        from ..nn.layers import FeedForward
        keys = jax.random.split(key, depth * 2 + 1)
        self.layers = []
        for i in range(depth):
            self.layers.append((
                LocalMHA(dim=dim, heads=heads, dim_head=dim_head,
                         window_size=window_size, qk_rmsnorm=True,
                         use_xpos=not dynamic_pos_bias,
                         xpos_scale_base=xpos_scale_base,
                         gate_values_per_head=True, prenorm=True,
                         key=keys[2 * i]),
                FeedForward(dim, key=keys[2 * i + 1]),
            ))
        self.pos_bias = DynamicPositionBias(dim=dim // 2, heads=heads,
                                            key=keys[-1]) if dynamic_pos_bias else None
        self.window_size = window_size

    def __call__(self, x, *, mask=None):
        w = self.window_size
        attn_bias = self.pos_bias(w, 2 * w) if self.pos_bias is not None else None
        for attn, ff in self.layers:
            x = attn(x, mask=mask, attn_bias=attn_bias) + x
            x = ff(x) + x
        return x


class DynamicPositionBias(Module):
    """MLP over relative distance -> per-head additive bias for local attention
    (reference capability: local_attention.DynamicPositionBias)."""

    def __init__(self, *, dim: int, heads: int, key: jax.Array):
        k1, k2, k3 = jax.random.split(key, 3)
        self.l1 = Linear(1, dim, key=k1)
        self.l2 = Linear(dim, dim, key=k2)
        self.l3 = Linear(dim, heads, key=k3)

    def __call__(self, window_size: int, total_size: int):
        # relative positions of (query j in [0,w), key i in [-w, w))
        rel = (jnp.arange(total_size, dtype=jnp.float32) - (total_size - window_size))
        qpos = jnp.arange(window_size, dtype=jnp.float32)
        dist = qpos[:, None] - rel[None, :] + (total_size - window_size)  # >= 0
        inp = dist.reshape(-1, 1)
        h = jax.nn.silu(self.l1(inp))
        h = jax.nn.silu(self.l2(h))
        bias = self.l3(h).reshape(window_size, total_size, -1)
        return bias.transpose(2, 0, 1)  # (H, w, 2w)
