"""Sampling, masking and token-stream helpers — static-shape, jit-safe.

Functional equivalents of the reference's tensor helpers
(reference: audiolm_pytorch/audiolm_pytorch.py:82-186), re-designed for XLA:
everything keeps static shapes (mask-and-pad instead of ragged outputs) and
takes explicit PRNG keys, so the whole sampling loop can live inside
``lax.while_loop``/``lax.scan``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "log", "l2norm", "gumbel_noise", "gumbel_sample", "top_k",
    "mask_out_after_eos_id", "all_rows_have_eos_id", "prob_mask_like",
    "append_eos_id", "batch_unique_consecutive", "generate_mask_with_prob",
    "grad_shrink", "get_embeds", "ceil_div", "round_down_nearest_multiple",
    "curtail_to_multiple",
]


def ceil_div(numer: int, denom: int) -> int:
    return (numer + denom - 1) // denom


def round_down_nearest_multiple(val: int, mult: int) -> int:
    return (val // mult) * mult


def curtail_to_multiple(t, mult: int, from_left: bool = False):
    """Trim the time axis (axis -1 for waveforms) to a multiple of `mult`
    (reference: utils.py:8-12)."""
    n = t.shape[-1]
    rounded = round_down_nearest_multiple(n, mult)
    seq_slice = slice(None, rounded) if not from_left else slice(-rounded, None)
    return t[..., seq_slice]


def log(t, eps: float = 1e-20):
    return jnp.log(t + eps)


def l2norm(t, axis: int = -1, eps: float = 1e-12):
    return t / jnp.maximum(jnp.linalg.norm(t, axis=axis, keepdims=True), eps)


def gumbel_noise(key, shape, dtype=jnp.float32):
    u = jax.random.uniform(key, shape, dtype, minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def gumbel_sample(key, logits, temperature: float = 1.0, axis: int = -1):
    """Temperature-scaled gumbel-max sampling (reference: audiolm_pytorch.py:108-109)."""
    return jnp.argmax(logits / max(temperature, 1e-10) +
                      gumbel_noise(key, logits.shape, logits.dtype), axis=axis)


def top_k(logits, thres: float = 0.5):
    """Keep the top (1-thres) fraction of logits, others -> -inf
    (reference: audiolm_pytorch.py:111-117). Static k, jit-safe."""
    num_logits = logits.shape[-1]
    k = max(int((1 - thres) * num_logits), 1)
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def mask_out_after_eos_id(t, eos_id: int, mask_value: int = -1, keep_eos: bool = True):
    """Replace every token strictly after (or at, if not keep_eos) the first EOS
    (reference: audiolm_pytorch.py:119-126)."""
    eos_mask = (t == eos_id).astype(jnp.int32)
    if keep_eos:
        eos_mask = jnp.pad(eos_mask, [(0, 0)] * (t.ndim - 1) + [(1, 0)])[..., :-1]
    after = jnp.cumsum(eos_mask, axis=-1) > 0
    return jnp.where(after, mask_value, t)


def all_rows_have_eos_id(t, eos_id: int):
    return jnp.all(jnp.any(t == eos_id, axis=-1))


def prob_mask_like(key, shape, prob: float):
    """CFG keep-mask (reference: audiolm_pytorch.py:144-151)."""
    if prob == 1:
        return jnp.ones(shape, bool)
    if prob == 0:
        return jnp.zeros(shape, bool)
    return jax.random.uniform(key, shape) < prob


def append_eos_id(ids, eos_id: int):
    b = ids.shape[0]
    return jnp.concatenate([ids, jnp.full((b, 1), eos_id, ids.dtype)], axis=-1)


def batch_unique_consecutive(t, pad_value: int = -1):
    """Deduplicate consecutive repeats per row, left-packed, padded to the
    original static length (reference: audiolm_pytorch.py:162-164 — which
    returns ragged+padded; we keep the full static width, trailing positions
    filled with `pad_value`).

    Positions already equal to pad_value are treated as padding and dropped.
    """
    b, n = t.shape
    first = jnp.ones((b, 1), bool)
    keep = jnp.concatenate([first, t[:, 1:] != t[:, :-1]], axis=1)
    keep = keep & (t != pad_value)
    # stable left-pack: destination index of each kept element
    dest = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    out = jnp.full((b, n), pad_value, t.dtype)
    rows = jnp.arange(b)[:, None].repeat(n, 1)
    dest_safe = jnp.where(keep, dest, n)  # dropped -> scatter into overflow slot
    out = jnp.pad(out, ((0, 0), (0, 1)), constant_values=pad_value)
    out = out.at[rows, dest_safe].set(jnp.where(keep, t, pad_value))
    return out[:, :n]


def generate_mask_with_prob(key, shape, mask_prob: float):
    """Forgetful-causal-mask: keep-mask with ~mask_prob of positions dropped,
    position 0 always dropped-candidate-protected (reference: audiolm_pytorch.py:82-90)."""
    seq = shape[-1]
    num_mask = min(int(seq * mask_prob), seq - 1)
    if num_mask <= 0:
        return jnp.ones(shape, bool)
    rand = jax.random.normal(key, shape)
    rand = rand.at[..., 0].set(-jnp.inf)  # never mask first position
    kth = jax.lax.top_k(rand, num_mask)[0][..., -1:]
    return rand < kth  # True = keep


def grad_shrink(t, alpha: float = 0.1):
    """Scale gradients by alpha without changing values (reference: audiolm_pytorch.py:93-94)."""
    return t * alpha + jax.lax.stop_gradient(t) * (1 - alpha)


def get_embeds(embed_table, codes, pad_id: int = -1, return_mask: bool = False,
               mask_pad_pos_to=0.0):
    """Embedding lookup where `pad_id` rows embed to `mask_pad_pos_to`
    (reference: audiolm_pytorch.py:168-186). `embed_table` is the raw (V, D) array
    or an Embedding module."""
    table = getattr(embed_table, "weight", embed_table)
    pad_mask = codes == pad_id
    safe = jnp.where(pad_mask, 0, codes)
    embeds = jnp.take(table, safe, axis=0)
    if mask_pad_pos_to is not None:
        embeds = jnp.where(pad_mask[..., None], mask_pad_pos_to, embeds)
    if return_mask:
        return embeds, ~pad_mask
    return embeds
