"""Decoder-only transformer stack for the three AudioLM language models.

Re-designs the reference transformer (reference: audiolm_pytorch/
audiolm_pytorch.py:191-560) for TPU:

  * multi-query attention (per-head Q, one shared K/V head — reference
    audiolm_pytorch.py:294) with softmax in fp32; matmuls hit the MXU in the
    input dtype (bf16 in production configs).
  * KV caches are PREALLOCATED fixed-size buffers written with
    dynamic_update_slice, so the whole autoregressive sampling loop lives in
    one jitted lax.while_loop — the reference instead re-dispatches Python
    per token and concatenates caches (audiolm_pytorch.py:362-370, 489-496).
  * hyper-connections (arXiv:2409.19606; reference wraps every branch,
    audiolm_pytorch.py:444-455) implemented as learned static stream-mixing
    matrices over an (S, B, N, D) stream stack.
  * continuous relative-position bias MLP (Swin-v2 style, reference
    audiolm_pytorch.py:202-242); unlike the reference, our flash-attention
    path can keep the bias (reference drops rel-pos when flash is on,
    audiolm_pytorch.py:430-431).
  * value-residual learning (reference audiolm_pytorch.py:355-358) and
    grad_shrink on the input embedding (audiolm_pytorch.py:478).
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..nn.layers import FeedForward, LayerNorm, Linear, default, exists
from ..nn.module import Module
from ..ops.attention import attend
from ..ops.sampling import grad_shrink

__all__ = ["RelativePositionBias", "Attention", "Transformer", "KVCache"]


# flash-vs-math crossover, measured on v5e with a TRAINED rel-pos bias (full
# fwd+bwd incl. the fused dbias pass, b8 h8 d128 MQA causal, min-of-3
# fetch-timed, examples/bench_flash_crossover.py):
#   seq  512: math 3.4 ms, flash 4.4 ms   (math wins — XLA's materialized
#   seq 1024: math 7.8 ms, flash 4.9 ms    path is fine when N^2 is small)
#   seq 2048: math 20.9 ms, flash 10.3 ms
_FLASH_AUTO_MIN_SEQ = 1024


def maybe_dropout(x, rate: float, key):
    if rate <= 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# re-exported for existing call sites/tests; implementation lives in
# ops/relpos.py so the pallas flash kernel can share it without a circular
# import (round 5: per-delta-block bias path)
from ..ops.relpos import toeplitz_expand  # noqa: E402


class RelPosTable(NamedTuple):
    """Lazy rel-pos bias: the (2n-1, H) distance table, expanded per-delta
    inside the flash path (O(L·B) memory) or fully by the math path. Passed
    through `attn_bias` so Attention can pick the cheapest expansion for the
    kernel it dispatches to."""
    tab: jax.Array  # (2n-1, H)


class RelativePositionBias(Module):
    """Continuous rel-pos bias: MLP over signed distance -> per-head bias
    (reference: audiolm_pytorch.py:202-242)."""

    def __init__(self, *, dim: int, heads: int, layers: int = 3, key: jax.Array):
        keys = jax.random.split(key, layers + 1)
        self.in_layer = Linear(1, dim, key=keys[0])
        self.mid_layers = [Linear(dim, dim, key=keys[i + 1]) for i in range(layers - 1)]
        self.out_layer = Linear(dim, heads, key=keys[-1])

    def table(self, j: int):
        """All 2j-1 relative distances -> (2j-1, heads)."""
        x = jnp.arange(-j + 1, j, dtype=jnp.float32)[:, None]
        h = jax.nn.silu(self.in_layer(x))
        for l in self.mid_layers:
            h = jax.nn.silu(l(h))
        return self.out_layer(h)

    def __call__(self, i: int, j: int):
        """(heads, i, j) bias for i queries (suffix) over j keys."""
        assert j >= i
        return toeplitz_expand(self.table(j), i, j)


class KVCache(NamedTuple):
    """Fixed-size per-layer cache: k, v of shape (L, B, max_len, dim_head),
    plus the current fill position (scalar int32)."""
    k: jax.Array
    v: jax.Array
    pos: jax.Array

    @classmethod
    def create(cls, layers: int, batch: int, max_len: int, dim_head: int,
               dtype=jnp.float32):
        return cls(
            k=jnp.zeros((layers, batch, max_len, dim_head), dtype),
            v=jnp.zeros((layers, batch, max_len, dim_head), dtype),
            pos=jnp.zeros((), jnp.int32),
        )


class Attention(Module):
    """Multi-query attention with null-KV (CFG cross-attn), prefix-context
    self-attention (VALL-E conditioning) and value residuals
    (reference: audiolm_pytorch.py:264-406)."""

    def __init__(self, dim: int, *, causal: bool = False, dim_head: int = 64,
                 dim_context: Optional[int] = None, heads: int = 8,
                 norm_context: bool = False, num_null_kv: int = 0,
                 dropout: float = 0.0, flash: "bool | str" = "auto",
                 key: jax.Array):
        inner = dim_head * heads
        dim_context = default(dim_context, dim)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        self.norm = LayerNorm(dim)
        self.context_norm = LayerNorm(dim_context) if norm_context else None
        self.num_null_kv = num_null_kv
        self.null_kv = 0.02 * jax.random.normal(k4, (2, num_null_kv, dim_head)) \
            if num_null_kv > 0 else None
        self.to_q = Linear(dim, inner, use_bias=False, key=k1)
        self.to_kv = Linear(dim_context, dim_head * 2, use_bias=False, key=k2)
        self.to_out = Linear(inner, dim, use_bias=False, key=k3)
        self.heads = heads
        self.dim_head = dim_head
        self.causal = causal
        self.dropout = dropout
        self.flash = flash

    def __call__(self, x, *, context=None, mask=None, attn_bias=None,
                 prefix_context=None, prefix_context_mask=None,
                 value_residual=None, cache_kv=None, cache_pos=None,
                 return_kv=False, return_values=False, key=None):
        """x: (B, N, D). cache_kv: (2, B, max_len, dim_head) preallocated; with
        cache_pos set, new K/V are written at [pos:pos+N] and attention runs
        over the full buffer with position masking.

        Returns out [, new_cache_kv] [, orig_values].
        """
        b, n, _ = x.shape

        if exists(context) and self.context_norm is not None:
            context = self.context_norm(context)
        kv_input = default(context, x)

        # VALL-E-style prefix conditioning on self attention
        # (reference: audiolm_pytorch.py:330-343)
        n_prefix = 0
        if exists(prefix_context):
            n_prefix = prefix_context.shape[1]
            kv_input = jnp.concatenate([prefix_context.astype(x.dtype), x], axis=1)
            base_mask = mask if exists(mask) else jnp.ones((b, n), bool)
            pmask = prefix_context_mask if exists(prefix_context_mask) \
                else jnp.ones((b, n_prefix), bool)
            mask = jnp.concatenate([pmask, base_mask], axis=-1)
            if exists(attn_bias):
                attn_bias = jnp.pad(attn_bias, ((0, 0), (0, 0), (n_prefix, 0)))

        # prenorm applies to queries only; K/V project from the raw kv input —
        # matching the reference exactly (audiolm_pytorch.py:346-351, where
        # kv_input binds x before the prenorm)
        xn = self.norm(x)
        q = self.to_q(xn).reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        kv = self.to_kv(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)  # (B, M, dh) single shared head
        orig_v = v

        if exists(value_residual):
            v = 0.5 * (v + value_residual)

        new_cache = None
        causal = self.causal
        if cache_kv is not None:
            # fixed-size cache path (jitted sampling)
            ck, cv = cache_kv[0], cache_kv[1]
            max_len = ck.shape[1]
            ck = lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_pos, 0))
            cv = lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_pos, 0))
            new_cache = jnp.stack([ck, cv])
            k, v = ck, cv
            q_pos = cache_pos + jnp.arange(n)
            k_pos = jnp.arange(max_len)
            valid = k_pos[None, :] <= q_pos[:, None]  # causal + not-yet-written
            pos_mask = valid[None, None]  # (1, 1, n, max_len)
            if exists(mask):
                mask = mask[:, None, None, :] & pos_mask
            else:
                mask = pos_mask
            causal = False  # already handled by position mask
            if exists(attn_bias) and attn_bias.shape[1] != n:
                # slice bias rows for current positions: (H, n, max_len).
                # Pre-sliced (H, n, max_len) biases (the Transformer's O(L)
                # table-row path) pass through untouched.
                attn_bias = lax.dynamic_slice(
                    attn_bias, (0, cache_pos, 0),
                    (attn_bias.shape[0], n, max_len))
        else:
            key_mask = mask  # (B, M) or None; kept flat for the flash path
            mask = None

        # null key/values for classifier-free guidance
        # (reference: audiolm_pytorch.py:374-377)
        if self.num_null_kv > 0:
            nk = jnp.broadcast_to(self.null_kv[0].astype(k.dtype),
                                  (b, self.num_null_kv, self.dim_head))
            nv = jnp.broadcast_to(self.null_kv[1].astype(v.dtype),
                                  (b, self.num_null_kv, self.dim_head))
            k = jnp.concatenate([nk, k], axis=1)
            v = jnp.concatenate([nv, v], axis=1)
            if cache_kv is not None:
                if exists(mask):
                    mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 0),
                                          (self.num_null_kv, 0)),
                                   constant_values=True)
            elif exists(key_mask):
                key_mask = jnp.pad(key_mask, ((0, 0), (self.num_null_kv, 0)),
                                   constant_values=True)
            if exists(attn_bias):
                attn_bias = jnp.pad(attn_bias, ((0, 0), (0, 0), (self.num_null_kv, 0)))

        flash = self.flash
        if flash == "auto":
            # flash wins from moderate sequence lengths on TPU (see
            # BASELINE.md flash rows); tiny shapes and CPU take the math path
            from ..ops.pallas import on_tpu
            flash = on_tpu() and min(n, k.shape[1]) >= _FLASH_AUTO_MIN_SEQ
        if flash and self.dropout > 0.0 and key is not None:
            # dropout applies to the attention WEIGHTS (reference
            # attend.py:127); only the math path can do that, so a training
            # step with dropout>0 must not silently change semantics
            flash = False
        bias_tab = None
        if isinstance(attn_bias, RelPosTable):
            # lazy rel-pos: the flash kernel expands the table per-delta in
            # O(L·B); every other path materializes the full bias here
            assert k.shape[1] == n, "RelPosTable path is plain self-attention"
            if cache_kv is None and flash:
                bias_tab = attn_bias.tab
                attn_bias = None
            else:
                attn_bias = toeplitz_expand(attn_bias.tab, n, n)
        if cache_kv is None and flash:
            # pallas flash kernel: O(N) memory, keeps the additive bias
            # (the reference must drop rel-pos bias under flash, attend.py:112)
            from ..ops.pallas.flash_attention import flash_attention
            out = flash_attention(q, k[:, None], v[:, None], bias=attn_bias,
                                  bias_tab=bias_tab, key_mask=key_mask,
                                  causal=causal)
        else:
            if cache_kv is None and exists(key_mask):
                mask = key_mask[:, None, None, :]
            out = attend(q, k[:, None], v[:, None], mask=mask,
                         attn_bias=attn_bias, causal=causal,
                         dropout_rate=self.dropout, dropout_key=key)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
        out = self.to_out(out)

        rets = (out,)
        if return_kv:
            rets = rets + (new_cache,)
        if return_values:
            rets = rets + (orig_v,)
        return rets[0] if len(rets) == 1 else rets


class HyperConnection(Module):
    """Dynamic hyper-connection wrapping one branch over S residual streams
    (arXiv:2409.19606; reference: hyper-connections lib at
    audiolm_pytorch.py:444-455).

    Static init is the paper's residual-equivalent one: the branch reads
    stream (layer_index % S), stream mixing is identity, and the branch
    output is written to ALL streams (beta = ones) — with expand-by-copy and
    reduce-by-sum the streams stay identical at init, and the final
    scale-invariant LayerNorm makes the S-stream net equal the plain
    residual net. The dynamic (DHC) components follow the paper:
    tanh(rmsnorm(x) @ W) * scale, zero-initialized so they contribute
    nothing at init and are learned during training.
    Validated at S=4 against a faithful torch oracle of the same math
    (tests/test_reference_parity.py)."""

    def __init__(self, *, dim: int, num_streams: int, layer_index: int,
                 dynamic: bool = True):
        s = num_streams
        onehot = jnp.zeros((s,)).at[layer_index % s].set(1.0)
        self.alpha_in = onehot  # static branch-read weights over streams
        self.alpha_mix = jnp.eye(s)  # static stream-to-stream mixing
        self.beta = jnp.ones((s,))  # static write: ALL streams (paper init)
        if dynamic:
            self.dyn_alpha_w = jnp.zeros((dim, s + 1))
            self.dyn_alpha_scale = jnp.asarray(1e-2)
            self.dyn_beta_w = jnp.zeros((dim,))
            self.dyn_beta_scale = jnp.asarray(1e-2)
        else:
            self.dyn_alpha_w = None
            self.dyn_alpha_scale = None
            self.dyn_beta_w = None
            self.dyn_beta_scale = None
        self.num_streams = s

    def __call__(self, streams, branch_fn):
        """streams: (S, B, N, D)."""
        dt = streams.dtype
        a_in = self.alpha_in.astype(dt)      # (S,)
        a_mix = self.alpha_mix.astype(dt)    # (S, T)
        beta = self.beta.astype(dt)          # (S,)
        if self.dyn_alpha_w is not None:
            s = self.num_streams
            # rmsnorm statistics in fp32, but NO (S,B,N,D)-sized fp32 tensor is
            # ever materialized (the round-4 version's fp32 xbar copy cost
            # ~15 ms of HBM traffic per b8xs512 train step — round-5 MFU fix).
            # tanh(rmsnorm(x) @ W) == tanh((x @ W) * rsqrt(ms)): the per-
            # position scalar factors out of the matmul exactly.
            ms = jnp.mean(jnp.square(streams.astype(jnp.float32)), axis=-1,
                          keepdims=True)
            inv = jax.lax.rsqrt(ms + 1e-6)               # (S, B, N, 1) fp32
            w = jnp.concatenate([self.dyn_alpha_w,
                                 self.dyn_beta_w[:, None]], axis=1)  # (D, S+2)
            proj = jnp.einsum("sbnd,dt->sbnt", streams, w.astype(dt),
                              preferred_element_type=jnp.float32)
            proj = jnp.tanh(proj * inv)                  # (S, B, N, S+2) fp32
            dyn_a = (proj[..., : s + 1] * self.dyn_alpha_scale).astype(dt)
            dyn_b = (proj[..., s + 1] * self.dyn_beta_scale).astype(dt)
            # one fused pass over the streams for branch input + stream
            # mixing: output slot 0 is the branch input, slots 1..S the mix
            coef = jnp.concatenate([
                (a_in[:, None, None] + dyn_a[..., 0])[..., None],
                a_mix[:, None, None, :] + dyn_a[..., 1:]], axis=-1)
            both = jnp.einsum("sbnt,sbnd->tbnd", coef, streams)
            branch_in, mixed = both[0], both[1:]
            beta_eff = beta[:, None, None] + dyn_b       # (S, B, N)
        else:
            branch_in = jnp.einsum("s,sbnd->bnd", a_in, streams)
            mixed = jnp.einsum("st,sbnd->tbnd", a_mix, streams)
            beta_eff = jnp.broadcast_to(beta[:, None, None],
                                        (self.num_streams, *streams.shape[1:3]))
        out = branch_fn(branch_in)
        rest = None
        if isinstance(out, tuple):
            out, *rest = out
        streams = mixed + beta_eff[..., None] * out[None]
        if rest:
            return (streams, *rest)
        return streams


class Transformer(Module):
    """(reference: audiolm_pytorch.py:410-560)."""

    def __init__(self, *, dim: int, depth: int, heads: int,
                 dim_context: Optional[int] = None, cross_attend: bool = False,
                 attn_dropout: float = 0.0, ff_dropout: float = 0.0,
                 grad_shrink_alpha: float = 0.1,
                 cond_as_self_attn_prefix: bool = False, rel_pos_bias: bool = True,
                 flash_attn: "bool | str" = "auto", add_value_residual: bool = True,
                 num_residual_streams: int = 4, dim_head: int = 64,
                 key: jax.Array):
        assert not (cross_attend and cond_as_self_attn_prefix)
        # NOTE: unlike the reference (audiolm_pytorch.py:430), flash does not
        # force NoPE — our kernel supports additive bias. Parity of defaults is
        # kept: rel_pos_bias=False still yields NoPE.
        keys = jax.random.split(key, depth * 3 + 2)
        self.dim = dim
        self.dim_context = default(dim_context, dim)
        self.cond_as_self_attn_prefix = cond_as_self_attn_prefix
        self.grad_shrink_alpha = grad_shrink_alpha
        self.ff_dropout = ff_dropout
        self.depth = depth
        self.heads = heads
        self.dim_head = dim_head
        self.add_value_residual = add_value_residual
        self.num_residual_streams = num_residual_streams

        self.rel_pos_bias = RelativePositionBias(dim=dim // 2, heads=heads,
                                                 key=keys[-1]) if rel_pos_bias else None
        self.layers = []
        s = num_residual_streams
        for d in range(depth):
            attn = Attention(dim, heads=heads, dim_head=dim_head, causal=True,
                             dropout=attn_dropout, flash=flash_attn,
                             key=keys[3 * d])
            cross = Attention(dim, heads=heads, dim_head=dim_head,
                              dim_context=self.dim_context, num_null_kv=1,
                              norm_context=True, dropout=attn_dropout,
                              flash=flash_attn, key=keys[3 * d + 1]) \
                if cross_attend else None
            ff = FeedForward(dim, key=keys[3 * d + 2])
            if s > 1:
                self.layers.append((
                    HyperConnection(dim=dim, num_streams=s, layer_index=3 * d),
                    attn,
                    HyperConnection(dim=dim, num_streams=s, layer_index=3 * d + 1)
                    if cross_attend else None,
                    cross,
                    HyperConnection(dim=dim, num_streams=s, layer_index=3 * d + 2),
                    ff,
                ))
            else:
                self.layers.append((None, attn, None, cross, None, ff))
        self.final_norm = LayerNorm(dim)

    def _expand(self, x):
        if self.num_residual_streams > 1:
            return jnp.broadcast_to(x[None], (self.num_residual_streams, *x.shape))
        return x

    def _reduce(self, x):
        if self.num_residual_streams > 1:
            return jnp.sum(x, axis=0)
        return x

    def __call__(self, x, *, self_attn_mask=None, context=None, context_mask=None,
                 attn_bias=None, kv_cache: Optional[KVCache] = None,
                 return_kv_cache: bool = False, key=None):
        """x: (B, N, D) — with kv_cache, ONLY the new suffix tokens (the caller
        slices; the reference instead slices internally at audiolm_pytorch.py:489-496).

        Returns logits-input embedding (B, N, D) [, new KVCache].
        """
        assert not (self.cond_as_self_attn_prefix and not exists(context))
        b, n, _ = x.shape

        x = grad_shrink(x, self.grad_shrink_alpha)

        use_cache = kv_cache is not None and not self.cond_as_self_attn_prefix
        cache_pos = kv_cache.pos if use_cache else None

        if exists(attn_bias):
            rel_bias = attn_bias
        elif self.rel_pos_bias is not None:
            if use_cache:
                # O(L) decode-time bias (NOTES r2 #5): keep only the
                # (2L-1, H) distance table resident and materialize the rows
                # for the current positions. For the 1-token decode step the
                # row over keys 0..L-1 is rel = p - k + (L-1) — a REVERSED
                # contiguous slice of the table starting at p. The full
                # (H, L, L) table (134 MB at 2k ctx, 8 heads) never exists.
                max_len = kv_cache.k.shape[2]
                tab = self.rel_pos_bias.table(max_len)  # (2L-1, H)
                if n == 1:
                    row = lax.dynamic_slice(tab, (cache_pos, 0),
                                            (max_len, tab.shape[1]))
                    rel_bias = jnp.flip(row, axis=0).T[:, None, :]  # (H, 1, L)
                else:
                    idx = (cache_pos + jnp.arange(n)[:, None]
                           - jnp.arange(max_len)[None, :] + (max_len - 1))
                    rel_bias = tab[idx].transpose(2, 0, 1)  # (H, n, L)
            else:
                # flash layers expand the table per-delta inside the kernel
                # path (O(L·B), ops/relpos); materialize the (H, n, n) bias
                # only when the math path will be taken (mirrors Attention's
                # dispatch so the expansion isn't repeated per layer)
                use_tab = False
                if not self.cond_as_self_attn_prefix and self.layers:
                    fl = self.layers[0][1].flash
                    if fl == "auto":
                        from ..ops.pallas import on_tpu
                        fl = on_tpu() and n >= _FLASH_AUTO_MIN_SEQ
                    use_tab = bool(fl) and (self.layers[0][1].dropout == 0.0
                                            or key is None)
                rel_bias = (RelPosTable(self.rel_pos_bias.table(n)) if use_tab
                            else self.rel_pos_bias(n, n))
        else:
            rel_bias = None

        self_attn_kwargs = {}
        if self.cond_as_self_attn_prefix:
            self_attn_kwargs = dict(prefix_context=context,
                                    prefix_context_mask=context_mask)

        h = self._expand(x)
        new_k, new_v = [], []
        self_vr = None
        cross_vr = None
        for li, (hc_a, attn, hc_c, cross, hc_f, ff) in enumerate(self.layers):
            akey = ckey = fkey = None
            if key is not None:
                key, akey, ckey, fkey = jax.random.split(key, 4)

            layer_cache = jnp.stack([kv_cache.k[li], kv_cache.v[li]]) if use_cache else None

            def attn_branch(inp, _cache=layer_cache, _akey=akey, _vr=self_vr):
                return attn(inp, mask=self_attn_mask, attn_bias=rel_bias,
                            value_residual=_vr, cache_kv=_cache,
                            cache_pos=cache_pos, return_kv=True,
                            return_values=True, key=_akey, **self_attn_kwargs)

            if hc_a is not None:
                h, cache_out, values = hc_a(h, attn_branch)
            else:
                h_out, cache_out, values = attn_branch(h)
                h = h_out + h
            if self.add_value_residual and self_vr is None:
                self_vr = values
            if use_cache:
                new_k.append(cache_out[0])
                new_v.append(cache_out[1])

            if cross is not None:
                assert exists(context)

                def cross_branch(inp, _ckey=ckey, _vr=cross_vr):
                    return cross(inp, context=context, mask=context_mask,
                                 return_values=True, key=_ckey, value_residual=_vr)

                if hc_c is not None:
                    h, values = hc_c(h, cross_branch)
                else:
                    h_out, values = cross_branch(h)
                    h = h_out + h
                if self.add_value_residual and cross_vr is None:
                    cross_vr = values

            def ff_branch(inp, _fkey=fkey):
                out = ff(inp)
                return maybe_dropout(out, self.ff_dropout, _fkey)

            if hc_f is not None:
                h = hc_f(h, ff_branch)
            else:
                h = ff_branch(h) + h

        h = self._reduce(h)
        out = self.final_norm(h)

        if not return_kv_cache:
            return out
        if use_cache:
            new_cache = KVCache(k=jnp.stack(new_k), v=jnp.stack(new_v),
                                pos=kv_cache.pos + n)
        else:
            new_cache = None
        return out, new_cache
