"""The three hierarchical AudioLM language models: Semantic, Coarse, Fine.

TPU-native re-design of the reference LMs (reference: audiolm_pytorch/
audiolm_pytorch.py:564-1368):

  * classifier-free guidance runs cond + uncond as ONE batched forward
    (`forward_with_cond_scale` stacks the batch) instead of the reference's
    two sequential passes with two KV caches (audiolm_pytorch.py:640-668) —
    same math, half the kernel launches, one cache.
  * per-quantizer logit projections are a single einsum over static shapes
    (reference splits groupable/remainder, audiolm_pytorch.py:965-983 — we do
    the same split since sequence length % quantizers is static under jit).
  * coarse embedding offsets use a (codebook_size + 1) stride so each
    quantizer's EOS row is distinct (the reference strides by codebook_size,
    audiolm_pytorch.py:904, which aliases quantizer q's EOS with quantizer
    q+1's code 0 — we keep the capability, minus the collision).
  * randomness (cond-drop) is explicit via PRNG keys.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import LayerNorm, Linear, default, exists
from ..nn.module import Module
from ..ops.sampling import ceil_div, get_embeds, prob_mask_like, round_down_nearest_multiple
from .t5 import DEFAULT_T5_NAME, get_encoded_dim, t5_encode_text
from .transformer import KVCache, Transformer

__all__ = ["SemanticTransformer", "CoarseTransformer", "FineTransformer"]


def _process_text_condition(text, text_embeds, text_mask, proj, has_condition,
                            cond_drop_prob, key, t5_name, batch):
    """Shared text-conditioning preamble (reference: audiolm_pytorch.py:688-704)."""
    has_text = exists(text) or exists(text_embeds)
    assert not (has_condition ^ has_text), \
        "has_condition and presence of text/text_embeds must agree"
    if not exists(text_embeds) and exists(text):
        text_embeds = t5_encode_text(text, name=t5_name)
    if exists(text_embeds) and not exists(text_mask):
        text_mask = jnp.any(text_embeds != 0, axis=-1)
    if exists(text_embeds) and proj is not None:
        text_embeds = proj(text_embeds)
    if exists(text_mask) and cond_drop_prob > 0:
        if cond_drop_prob >= 1:
            text_mask = jnp.zeros_like(text_mask)
        else:
            assert key is not None, "cond_drop_prob in (0,1) requires a PRNG key"
            keep = prob_mask_like(key, (batch,), 1 - cond_drop_prob)
            text_mask = keep[:, None] & text_mask
    return text_embeds, text_mask


def _concrete_cache_pos(kv_cache):
    """LM-level kv_cache slicing is an EAGER convenience (reference parity:
    audiolm_pytorch.py:489-496 slices x[:, cache_len:] in python). Under jit
    the position is a tracer and data-dependent slicing is impossible — the
    jitted fast path is the wrapper samplers, which drive the Transformer
    directly with suffix-only tokens and a preallocated KVCache."""
    if isinstance(kv_cache.pos, jax.core.Tracer):
        raise TypeError(
            "kv_cache on the LM-level forward is an eager-only convenience; "
            "under jit, use the wrapper samplers (models/wrappers.py) or call "
            "the Transformer directly with suffix-only tokens")
    return int(kv_cache.pos)


def _load_lm(model, path):
    """Load a saved LM checkpoint into `model`, returning the new module
    (functional analog of reference .load, audiolm_pytorch.py:627-638; accepts
    both bare-model checkpoints and trainer checkpoints {'model':..., 'opt':...})."""
    from ..training.checkpoint import load_checkpoint, load_pytree_into
    from ..version import __version__
    pkg = load_checkpoint(path)
    if pkg.get("version") and pkg["version"] != __version__:
        print(f"model checkpoint was written by version {pkg['version']} "
              f"(current {__version__})")
    try:
        return load_pytree_into(path, model)
    except ValueError:
        return load_pytree_into(path, model, prefix="['model']")


def _tile_offsets(num_q: int, length: int, stride: int):
    """[0, stride, 2*stride, ...] cycling over quantizers, length `length`."""
    reps = ceil_div(length, num_q)
    return np.tile(np.arange(num_q) * stride, reps)[:length]


def _per_quantizer_logits(tokens, logit_weights, num_q: int):
    """tokens: (B, N, D); logit_weights: (Q, C, D) -> (B, N, C) using head
    (position % Q) per position (reference: audiolm_pytorch.py:965-983)."""
    b, n, d = tokens.shape
    nq = round_down_nearest_multiple(n, num_q)
    group, rem = tokens[:, :nq], tokens[:, nq:]
    group = group.reshape(b, nq // num_q if num_q else 0, num_q, d)
    lg = jnp.einsum("qcd,bnqd->bnqc", logit_weights.astype(tokens.dtype), group)
    lg = lg.reshape(b, nq, -1)
    r = rem.shape[1]
    if r > 0:
        lr = jnp.einsum("qcd,bqd->bqc", logit_weights[:r].astype(tokens.dtype), rem)
        return jnp.concatenate([lg, lr], axis=1)
    return lg


class SemanticTransformer(Module):
    """LM over semantic token ids + EOS (reference: audiolm_pytorch.py:564-724)."""

    def __init__(self, *, dim: int, depth: int, num_semantic_tokens: int,
                 heads: int = 8, attn_dropout: float = 0.0, ff_dropout: float = 0.0,
                 t5_name: str = DEFAULT_T5_NAME, cond_dim: Optional[int] = None,
                 has_condition: bool = False, audio_text_condition: bool = False,
                 cond_as_self_attn_prefix: bool = False, cond_drop_prob: float = 0.5,
                 grad_shrink_alpha: float = 0.1, rel_pos_bias: bool = True,
                 flash_attn: "bool | str" = "auto", key: jax.Array, **kwargs):
        cfg = {k: v for k, v in locals().items() if k not in ("self", "key", "kwargs", "__class__")}
        cfg.update(kwargs)
        self.configs = tuple(sorted(cfg.items()))

        if audio_text_condition:
            has_condition = True
            cond_dim = default(cond_dim, dim)

        keys = jax.random.split(key, 5)
        self.num_semantic_tokens = num_semantic_tokens
        self.eos_id = num_semantic_tokens
        self.has_condition = has_condition
        self.cond_drop_prob = cond_drop_prob
        self.t5_name = t5_name
        self.dim = dim

        self.start_token = jax.random.normal(keys[0], (dim,))
        self.semantic_embedding = 0.02 * jax.random.normal(
            keys[1], (num_semantic_tokens + 1, dim))
        text_dim = default(cond_dim, get_encoded_dim(t5_name))
        self.proj_text_embed = Linear(text_dim, dim, use_bias=False, key=keys[2]) \
            if text_dim != dim else None
        self.transformer = Transformer(
            dim=dim, depth=depth, heads=heads, attn_dropout=attn_dropout,
            ff_dropout=ff_dropout,
            cross_attend=has_condition and not cond_as_self_attn_prefix,
            cond_as_self_attn_prefix=cond_as_self_attn_prefix,
            grad_shrink_alpha=grad_shrink_alpha, rel_pos_bias=rel_pos_bias,
            flash_attn=flash_attn, key=keys[3], **kwargs)
        self.to_logits = Linear(dim, num_semantic_tokens + 1, key=keys[4])

    def embed_text(self, text):
        return t5_encode_text(text, name=self.t5_name)

    def load(self, path):
        """Return a new module with weights loaded from `path`."""
        return _load_lm(self, path)

    def _proj_text(self, t):
        return self.proj_text_embed(t) if self.proj_text_embed is not None else t

    def embed_ids(self, ids, prepend_start: bool = True):
        """ids (B, N) [pad=-1 embeds to 0] -> (B, N(+1), D)."""
        tokens = get_embeds(self.semantic_embedding, ids)
        if prepend_start:
            b = ids.shape[0]
            start = jnp.broadcast_to(self.start_token.astype(tokens.dtype),
                                     (b, 1, tokens.shape[-1]))
            tokens = jnp.concatenate([start, tokens], axis=1)
        return tokens

    def __call__(self, *, ids, return_loss: bool = False, text=None,
                 text_embeds=None, text_mask=None, self_attn_mask=None,
                 cond_drop_prob=None, key=None, kv_cache: Optional[KVCache] = None,
                 return_kv_cache: bool = False):
        b = ids.shape[0]
        cond_drop_prob = default(cond_drop_prob, self.cond_drop_prob)
        text_embeds, text_mask = _process_text_condition(
            text, text_embeds, text_mask, self._proj_text, self.has_condition,
            cond_drop_prob, key, self.t5_name, b)

        if return_loss:
            ids = ids[:, :-1]

        tokens = self.embed_ids(ids)
        if exists(self_attn_mask):
            self_attn_mask = jnp.pad(self_attn_mask, ((0, 0), (1, 0)),
                                     constant_values=True)

        if kv_cache is not None:
            pos = _concrete_cache_pos(kv_cache)
            tokens = tokens[:, pos:]
            if exists(self_attn_mask):
                self_attn_mask = self_attn_mask  # key-side mask stays full

        out, new_cache = self.transformer(
            tokens, self_attn_mask=self_attn_mask, context=text_embeds,
            context_mask=text_mask, kv_cache=kv_cache, return_kv_cache=True)
        logits = self.to_logits(out)
        if return_kv_cache:
            return logits, new_cache
        return logits

    def forward_with_cond_scale(self, *, cond_scale: float = 3.0,
                                kv_cache: Optional[KVCache] = None,
                                return_kv_cache: bool = False, text_embeds=None,
                                text_mask=None, ids=None, **kwargs):
        """Batched CFG: [cond | uncond] in one forward. A provided kv_cache must
        be sized for batch 2B (use `make_cfg_cache`)."""
        if cond_scale == 1 or not self.has_condition:
            out = self(ids=ids, text_embeds=text_embeds, text_mask=text_mask,
                       cond_drop_prob=0.0, kv_cache=kv_cache,
                       return_kv_cache=True, **kwargs)
            logits, cache = out
            return (logits, cache) if return_kv_cache else logits

        if text_mask is None and text_embeds is not None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)
        ids2 = jnp.concatenate([ids, ids], axis=0)
        te2 = jnp.concatenate([text_embeds, text_embeds], axis=0)
        tm2 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0)
        sam = kwargs.pop("self_attn_mask", None)
        if exists(sam):
            kwargs["self_attn_mask"] = jnp.concatenate([sam, sam], axis=0)
        logits2, cache = self(ids=ids2, text_embeds=te2, text_mask=tm2,
                              cond_drop_prob=0.0, kv_cache=kv_cache,
                              return_kv_cache=True, **kwargs)
        cond, null = jnp.split(logits2, 2, axis=0)
        scaled = null + (cond - null) * cond_scale
        return (scaled, cache) if return_kv_cache else scaled


class CoarseTransformer(Module):
    """Joint LM over [sem_start, semantic, coarse_start, coarse] with
    per-quantizer embeddings/heads (reference: audiolm_pytorch.py:726-990)."""

    def __init__(self, *, codebook_size: int, num_coarse_quantizers: int,
                 dim: int, depth: int, num_semantic_tokens: int, heads: int = 8,
                 attn_dropout: float = 0.0, ff_dropout: float = 0.0,
                 t5_name: str = DEFAULT_T5_NAME, has_condition: bool = False,
                 cond_dim: Optional[int] = None, audio_text_condition: bool = False,
                 cond_as_self_attn_prefix: bool = False, cond_drop_prob: float = 0.5,
                 grad_shrink_alpha: float = 0.1, project_semantic_logits: bool = True,
                 rel_pos_bias: bool = True, flash_attn: "bool | str" = "auto",
                 key: jax.Array, **kwargs):
        cfg = {k: v for k, v in locals().items() if k not in ("self", "key", "kwargs", "__class__")}
        cfg.update(kwargs)
        self.configs = tuple(sorted(cfg.items()))

        if audio_text_condition:
            has_condition = True
            cond_dim = default(cond_dim, dim)

        keys = jax.random.split(key, 10)
        self.num_semantic_tokens = num_semantic_tokens
        self.semantic_eos_id = num_semantic_tokens
        self.coarse_eos_id = codebook_size
        self.codebook_size = codebook_size
        self.num_coarse_quantizers = num_coarse_quantizers
        self.has_condition = has_condition
        self.cond_drop_prob = cond_drop_prob
        self.t5_name = t5_name
        self.dim = dim
        self.heads = heads

        cb_eos = codebook_size + 1
        self.semantic_start_token = jax.random.normal(keys[0], (dim,))
        self.coarse_start_token = jax.random.normal(keys[1], (dim,))
        self.semantic_embedding = 0.02 * jax.random.normal(
            keys[2], (num_semantic_tokens + 1, dim))
        self.coarse_embedding = 0.02 * jax.random.normal(
            keys[3], (num_coarse_quantizers * cb_eos, dim))
        self.coarse_quantize_embedding = 0.02 * jax.random.normal(
            keys[4], (num_coarse_quantizers, dim))
        text_dim = default(cond_dim, get_encoded_dim(t5_name))
        self.proj_text_embed = Linear(text_dim, dim, use_bias=False, key=keys[5]) \
            if text_dim != dim else None
        self.cross_attn_bias = jnp.zeros((heads, 1, 1)) if rel_pos_bias else None
        self.transformer = Transformer(
            dim=dim, depth=depth, heads=heads, attn_dropout=attn_dropout,
            ff_dropout=ff_dropout,
            cross_attend=has_condition and not cond_as_self_attn_prefix,
            cond_as_self_attn_prefix=cond_as_self_attn_prefix,
            grad_shrink_alpha=grad_shrink_alpha, rel_pos_bias=rel_pos_bias,
            flash_attn=flash_attn, key=keys[6], **kwargs)
        self.to_semantic_logits = Linear(dim, num_semantic_tokens + 1, key=keys[7]) \
            if project_semantic_logits else None
        self.coarse_logit_weights = 0.02 * jax.random.normal(
            keys[8], (num_coarse_quantizers, cb_eos, dim))

    def embed_text(self, text):
        return t5_encode_text(text, name=self.t5_name)

    def load(self, path):
        """Return a new module with weights loaded from `path`."""
        return _load_lm(self, path)

    def _proj_text(self, t):
        return self.proj_text_embed(t) if self.proj_text_embed is not None else t

    def embed_coarse(self, coarse_token_ids):
        """(B, Nc) -> (B, Nc, D) with per-quantizer offsets + quantizer embeds."""
        n = coarse_token_ids.shape[-1]
        offsets = jnp.asarray(_tile_offsets(self.num_coarse_quantizers, n,
                                            self.codebook_size + 1))
        safe = jnp.where(coarse_token_ids < 0, 0, coarse_token_ids)
        emb = jnp.take(self.coarse_embedding, safe + offsets, axis=0)
        emb = jnp.where((coarse_token_ids < 0)[..., None], 0.0, emb)
        qpos = jnp.asarray(_tile_offsets(self.num_coarse_quantizers, n, 1))
        emb = emb + jnp.take(self.coarse_quantize_embedding, qpos, axis=0)
        return emb

    def build_attn_bias(self, semantic_seq_len: int, total_len: int):
        """Rel-pos bias with the learned scalar replacing positions across the
        semantic/coarse boundary (reference: audiolm_pytorch.py:926-936)."""
        if self.transformer.rel_pos_bias is None:
            return None
        bias = self.transformer.rel_pos_bias(total_len, total_len)
        is_semantic = np.arange(total_len) < (semantic_seq_len + 1)
        is_cross = is_semantic[:, None] ^ is_semantic[None, :]
        return jnp.where(jnp.asarray(is_cross)[None], self.cross_attn_bias, bias)

    def __call__(self, *, semantic_token_ids, coarse_token_ids, self_attn_mask=None,
                 text=None, text_embeds=None, text_mask=None, cond_drop_prob=None,
                 return_only_coarse_logits: bool = False, key=None,
                 kv_cache: Optional[KVCache] = None, return_kv_cache: bool = False):
        b = semantic_token_ids.shape[0]
        cond_drop_prob = default(cond_drop_prob, self.cond_drop_prob)
        text_embeds, text_mask = _process_text_condition(
            text, text_embeds, text_mask, self._proj_text, self.has_condition,
            cond_drop_prob, key, self.t5_name, b)

        semantic_token_ids = semantic_token_ids.reshape(b, -1)
        coarse_token_ids = coarse_token_ids.reshape(b, -1)

        semantic_tokens = get_embeds(self.semantic_embedding, semantic_token_ids)
        coarse_tokens = self.embed_coarse(coarse_token_ids)
        sem_len = semantic_tokens.shape[1]

        start_s = jnp.broadcast_to(self.semantic_start_token.astype(semantic_tokens.dtype),
                                   (b, 1, self.dim))
        start_c = jnp.broadcast_to(self.coarse_start_token.astype(coarse_tokens.dtype),
                                   (b, 1, self.dim))
        tokens = jnp.concatenate([start_s, semantic_tokens, start_c, coarse_tokens], axis=1)
        seq_len = tokens.shape[1]

        bias_len = kv_cache.k.shape[2] if kv_cache is not None else seq_len
        attn_bias = self.build_attn_bias(sem_len, bias_len)

        if kv_cache is not None:
            pos = _concrete_cache_pos(kv_cache)
            tokens = tokens[:, pos:]

        out, new_cache = self.transformer(
            tokens, context=text_embeds, attn_bias=attn_bias,
            self_attn_mask=self_attn_mask, context_mask=text_mask,
            kv_cache=kv_cache, return_kv_cache=True)

        if kv_cache is not None:
            # cached step: only suffix embeddings produced; logits heads below
            # need absolute positions — handled by wrapper step fns. Here we
            # return the raw suffix outputs with caches for API completeness.
            offset = _concrete_cache_pos(kv_cache)
        else:
            offset = 0

        # segment: semantic predictions from positions [0, sem_len),
        # coarse predictions from positions [sem_len+1, ...)
        full = out
        if offset:  # rebuild alignment for suffix-only outputs
            pad = jnp.zeros((b, offset, out.shape[-1]), out.dtype)
            full = jnp.concatenate([pad, out], axis=1)

        pred_semantic = full[:, :sem_len]
        pred_coarse = full[:, sem_len + 1:]

        semantic_logits = None
        if not return_only_coarse_logits and self.to_semantic_logits is not None:
            semantic_logits = self.to_semantic_logits(pred_semantic)
        coarse_logits = _per_quantizer_logits(pred_coarse, self.coarse_logit_weights,
                                              self.num_coarse_quantizers)
        logits = (semantic_logits, coarse_logits)
        if return_kv_cache:
            return logits, new_cache
        return logits

    def forward_with_cond_scale(self, *, cond_scale: float = 3.0,
                                kv_cache: Optional[KVCache] = None,
                                return_kv_cache: bool = False,
                                semantic_token_ids=None, coarse_token_ids=None,
                                text_embeds=None, text_mask=None, **kwargs):
        if cond_scale == 1 or not self.has_condition:
            logits, cache = self(semantic_token_ids=semantic_token_ids,
                                 coarse_token_ids=coarse_token_ids,
                                 text_embeds=text_embeds, text_mask=text_mask,
                                 cond_drop_prob=0.0, kv_cache=kv_cache,
                                 return_kv_cache=True, **kwargs)
            return (logits, cache) if return_kv_cache else logits

        if text_mask is None and text_embeds is not None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)
        sem2 = jnp.concatenate([semantic_token_ids] * 2, axis=0)
        co2 = jnp.concatenate([coarse_token_ids] * 2, axis=0)
        te2 = jnp.concatenate([text_embeds] * 2, axis=0)
        tm2 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0)
        sam = kwargs.pop("self_attn_mask", None)
        if exists(sam):
            kwargs["self_attn_mask"] = jnp.concatenate([sam, sam], axis=0)
        (sl2, cl2), cache = self(semantic_token_ids=sem2, coarse_token_ids=co2,
                                 text_embeds=te2, text_mask=tm2,
                                 cond_drop_prob=0.0, kv_cache=kv_cache,
                                 return_kv_cache=True, **kwargs)
        scaled_sem = None
        if sl2 is not None:
            c, n = jnp.split(sl2, 2, axis=0)
            scaled_sem = n + (c - n) * cond_scale
        c, n = jnp.split(cl2, 2, axis=0)
        scaled_coarse = n + (c - n) * cond_scale
        logits = (scaled_sem, scaled_coarse)
        return (logits, cache) if return_kv_cache else logits


class FineTransformer(Module):
    """Joint LM over [coarse_start, coarse, fine_start, fine] with a 2-D
    (time, quantizer) MLP positional bias (reference: audiolm_pytorch.py:992-1368)."""

    def __init__(self, *, num_coarse_quantizers: int, num_fine_quantizers: int,
                 codebook_size: int, dim: int, depth: int, heads: int = 8,
                 attn_dropout: float = 0.0, ff_dropout: float = 0.0,
                 t5_name: str = DEFAULT_T5_NAME, has_condition: bool = False,
                 cond_dim: Optional[int] = None, audio_text_condition: bool = False,
                 cond_as_self_attn_prefix: bool = False, cond_drop_prob: float = 0.5,
                 grad_shrink_alpha: float = 0.1, project_coarse_logits: bool = True,
                 pad_id: int = -1, rel_pos_bias: bool = True, flash_attn: "bool | str" = "auto",
                 key: jax.Array, **kwargs):
        cfg = {k: v for k, v in locals().items() if k not in ("self", "key", "kwargs", "__class__")}
        cfg.update(kwargs)
        self.configs = tuple(sorted(cfg.items()))

        if audio_text_condition:
            has_condition = True
            cond_dim = default(cond_dim, dim)

        keys = jax.random.split(key, 14)
        self.num_coarse_quantizers = num_coarse_quantizers
        self.num_fine_quantizers = num_fine_quantizers
        self.codebook_size = codebook_size
        self.pad_id = pad_id
        self.eos_id = codebook_size
        self.has_condition = has_condition
        self.cond_drop_prob = cond_drop_prob
        self.t5_name = t5_name
        self.dim = dim
        self.heads = heads

        self.coarse_start_token = jax.random.normal(keys[0], (dim,))
        self.fine_start_token = jax.random.normal(keys[1], (dim,))
        self.coarse_embedding = 0.02 * jax.random.normal(
            keys[2], (num_coarse_quantizers * codebook_size, dim))
        self.fine_embedding = 0.02 * jax.random.normal(
            keys[3], (num_fine_quantizers * codebook_size, dim))
        self.coarse_quantize_embedding = 0.02 * jax.random.normal(
            keys[4], (num_coarse_quantizers, dim))
        self.fine_quantize_embedding = 0.02 * jax.random.normal(
            keys[5], (num_fine_quantizers, dim))
        text_dim = default(cond_dim, get_encoded_dim(t5_name))
        self.proj_text_embed = Linear(text_dim, dim, use_bias=False, key=keys[6]) \
            if text_dim != dim else None
        self.transformer = Transformer(
            dim=dim, depth=depth, heads=heads, attn_dropout=attn_dropout,
            ff_dropout=ff_dropout,
            cross_attend=has_condition and not cond_as_self_attn_prefix,
            cond_as_self_attn_prefix=cond_as_self_attn_prefix,
            rel_pos_bias=False, grad_shrink_alpha=grad_shrink_alpha,
            flash_attn=flash_attn, key=keys[7], **kwargs)
        if rel_pos_bias:
            self.null_pos_bias = jax.random.normal(keys[8], (heads, 1, 1))
            pd = dim // 2
            self.pos_bias_l1 = Linear(2, pd, key=keys[9])
            self.pos_bias_l2 = Linear(pd, pd, key=keys[10])
            self.pos_bias_l3 = Linear(pd, heads, key=keys[11])
        else:
            self.null_pos_bias = None
            self.pos_bias_l1 = None
            self.pos_bias_l2 = None
            self.pos_bias_l3 = None
        self.project_coarse_logits = project_coarse_logits
        self.coarse_logit_weights = 0.02 * jax.random.normal(
            keys[12], (num_coarse_quantizers, codebook_size, dim)) \
            if project_coarse_logits else None
        self.fine_logit_weights = 0.02 * jax.random.normal(
            keys[13], (num_fine_quantizers, codebook_size, dim))

    def embed_text(self, text):
        return t5_encode_text(text, name=self.t5_name)

    def load(self, path):
        """Return a new module with weights loaded from `path`."""
        return _load_lm(self, path)

    def _proj_text(self, t):
        return self.proj_text_embed(t) if self.proj_text_embed is not None else t

    def _pos_bias_mlp(self, x):
        h = jax.nn.silu(self.pos_bias_l1(x))
        h = jax.nn.silu(self.pos_bias_l2(h))
        return self.pos_bias_l3(h)

    def build_attn_bias(self, coarse_len: int, fine_len: int):
        """2-D (rel time-step, rel quantizer) MLP bias over the joint layout
        [coarse_start, coarse, fine_start, fine]
        (reference: audiolm_pytorch.py:1229-1298)."""
        if self.pos_bias_l1 is None:
            return None
        qc, qf = self.num_coarse_quantizers, self.num_fine_quantizers
        coarse_seq = ceil_div(coarse_len, qc)
        fine_seq = ceil_div(fine_len, qf) if fine_len else 0
        max_seq = max(coarse_seq, fine_seq, 1)
        num_offsets = qc + qf

        coarse_pos = np.repeat(np.arange(coarse_seq), qc)[:coarse_len]
        fine_pos = np.repeat(np.arange(max(fine_seq, 1)), qf)[:fine_len]
        coarse_pos = np.concatenate([[-1], coarse_pos])
        fine_pos = np.concatenate([[-1], fine_pos])
        seq_positions = np.concatenate([coarse_pos, fine_pos])

        coarse_off = _tile_offsets(qc, coarse_len, 1)
        fine_off = _tile_offsets(qf, fine_len, 1) + qc
        coarse_off = np.concatenate([[0], coarse_off])
        fine_off = np.concatenate([[0], fine_off])
        seq_offsets = np.concatenate([coarse_off, fine_off])

        pos_inp = np.stack([np.maximum(seq_positions, 0), seq_offsets], axis=-1)

        rel_seq_len = 2 * max_seq - 1
        rel_offsets = 2 * num_offsets - 1
        rel_seq_range = np.repeat(np.arange(rel_seq_len), rel_offsets)
        rel_off_range = np.tile(np.arange(rel_offsets), rel_seq_len)
        mlp_inputs = jnp.asarray(np.stack([rel_seq_range, rel_off_range], -1),
                                 jnp.float32)
        table = self._pos_bias_mlp(mlp_inputs)  # ((2N-1)(2Q-1), H)

        rel = pos_inp[:, None, :] - pos_inp[None, :, :]
        rel_seq_idx = rel[..., 0] + max_seq - 1
        rel_off_idx = rel[..., 1] + num_offsets - 1
        flat_idx = rel_seq_idx * rel_offsets + rel_off_idx
        bias = table[jnp.asarray(flat_idx)]  # (L, L, H)
        bias = bias.transpose(2, 0, 1)

        is_start = seq_positions == -1
        start_mask = is_start[:, None] | is_start[None, :]
        return jnp.where(jnp.asarray(start_mask)[None], self.null_pos_bias, bias)

    def embed_coarse(self, coarse_token_ids):
        n = coarse_token_ids.shape[-1]
        offsets = jnp.asarray(_tile_offsets(self.num_coarse_quantizers, n,
                                            self.codebook_size))
        emb = jnp.take(self.coarse_embedding, coarse_token_ids + offsets, axis=0)
        qpos = jnp.asarray(_tile_offsets(self.num_coarse_quantizers, n, 1))
        return emb + jnp.take(self.coarse_quantize_embedding, qpos, axis=0)

    def embed_fine(self, fine_token_ids):
        n = fine_token_ids.shape[-1]
        offsets = jnp.asarray(_tile_offsets(self.num_fine_quantizers, n,
                                            self.codebook_size))
        emb = jnp.take(self.fine_embedding, fine_token_ids + offsets, axis=0)
        qpos = jnp.asarray(_tile_offsets(self.num_fine_quantizers, n, 1))
        return emb + jnp.take(self.fine_quantize_embedding, qpos, axis=0)

    def __call__(self, coarse_token_ids, fine_token_ids, *, text=None,
                 text_embeds=None, text_mask=None, cond_drop_prob=None,
                 self_attn_mask=None, key=None, kv_cache: Optional[KVCache] = None,
                 return_kv_cache: bool = False, return_only_fine_logits: bool = False):
        b = coarse_token_ids.shape[0]
        cond_drop_prob = default(cond_drop_prob, self.cond_drop_prob)
        text_embeds, text_mask = _process_text_condition(
            text, text_embeds, text_mask, self._proj_text, self.has_condition,
            cond_drop_prob, key, self.t5_name, b)

        coarse_token_ids = coarse_token_ids.reshape(b, -1)
        fine_token_ids = fine_token_ids.reshape(b, -1)
        n_coarse = coarse_token_ids.shape[-1]
        n_fine = fine_token_ids.shape[-1]

        # mask out coarse padding/EOS from attention
        # (reference: audiolm_pytorch.py:1173-1184)
        coarse_ok = (coarse_token_ids != self.pad_id) & (coarse_token_ids != self.eos_id)
        coarse_token_ids = jnp.where(coarse_ok, coarse_token_ids, 0)
        cmask = jnp.pad(coarse_ok, ((0, 0), (1, 0)), constant_values=True)
        cmask = jnp.pad(cmask, ((0, 0), (0, n_fine + 1)), constant_values=True)
        self_attn_mask = cmask if self_attn_mask is None else (self_attn_mask & cmask)

        coarse_tokens = self.embed_coarse(coarse_token_ids)
        fine_tokens = self.embed_fine(fine_token_ids)
        start_c = jnp.broadcast_to(self.coarse_start_token.astype(coarse_tokens.dtype),
                                   (b, 1, self.dim))
        start_f = jnp.broadcast_to(self.fine_start_token.astype(fine_tokens.dtype),
                                   (b, 1, self.dim))
        tokens = jnp.concatenate([start_c, coarse_tokens, start_f, fine_tokens], axis=1)

        if kv_cache is not None:
            max_len = kv_cache.k.shape[2]
            fine_budget = max_len - n_coarse - 2
            attn_bias = self.build_attn_bias(n_coarse, fine_budget)
            pos = _concrete_cache_pos(kv_cache)
            tokens = tokens[:, pos:]
        else:
            attn_bias = self.build_attn_bias(n_coarse, n_fine)

        out, new_cache = self.transformer(
            tokens, context=text_embeds, self_attn_mask=self_attn_mask,
            context_mask=text_mask, attn_bias=attn_bias, kv_cache=kv_cache,
            return_kv_cache=True)

        full = out
        pos = _concrete_cache_pos(kv_cache) if kv_cache is not None else 0
        if pos:
            pad = jnp.zeros((b, pos, out.shape[-1]), out.dtype)
            full = jnp.concatenate([pad, out], axis=1)

        pred_coarse = full[:, :n_coarse]
        pred_fine = full[:, n_coarse + 1:]

        coarse_logits = None
        if not return_only_fine_logits and self.coarse_logit_weights is not None:
            coarse_logits = _per_quantizer_logits(
                pred_coarse, self.coarse_logit_weights, self.num_coarse_quantizers)
        fine_logits = _per_quantizer_logits(pred_fine, self.fine_logit_weights,
                                            self.num_fine_quantizers)
        logits = (coarse_logits, fine_logits)
        if return_kv_cache:
            return logits, new_cache
        return logits

    def forward_with_cond_scale(self, coarse_token_ids, fine_token_ids, *,
                                cond_scale: float = 3.0,
                                kv_cache: Optional[KVCache] = None,
                                return_kv_cache: bool = False, text_embeds=None,
                                text_mask=None, **kwargs):
        if cond_scale == 1 or not self.has_condition:
            logits, cache = self(coarse_token_ids, fine_token_ids,
                                 text_embeds=text_embeds, text_mask=text_mask,
                                 cond_drop_prob=0.0, kv_cache=kv_cache,
                                 return_kv_cache=True, **kwargs)
            return (logits, cache) if return_kv_cache else logits

        if text_mask is None and text_embeds is not None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)
        co2 = jnp.concatenate([coarse_token_ids] * 2, axis=0)
        fi2 = jnp.concatenate([fine_token_ids] * 2, axis=0)
        te2 = jnp.concatenate([text_embeds] * 2, axis=0)
        tm2 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0)
        (cl2, fl2), cache = self(co2, fi2, text_embeds=te2, text_mask=tm2,
                                 cond_drop_prob=0.0, kv_cache=kv_cache,
                                 return_kv_cache=True, **kwargs)
        scaled_c = None
        if cl2 is not None:
            c, n = jnp.split(cl2, 2, axis=0)
            scaled_c = n + (c - n) * cond_scale
        c, n = jnp.split(fl2, 2, axis=0)
        scaled_f = n + (c - n) * cond_scale
        logits = (scaled_c, scaled_f)
        return (logits, cache) if return_kv_cache else logits
