"""Relative-position bias expansion utilities.

The continuous rel-pos bias (reference: audiolm_pytorch.py:202-242) is a
(2j-1, H) per-distance table; attention needs bias[h, q, k] = tab[q-k+j-1, h].

Two expansions live here:

* `toeplitz_expand` — full (H, i, j) materialization, scatter-free in both
  directions (the naive gather's transpose is a 33M-element scatter-add at
  seq 2048 that XLA lowers near-serially on TPU). Used by the math attention
  path. Memory note: the skew materializes a (j, 2j, H) transient ≈ 2x the
  final bias.

* `delta_bias_blocks` — O(L·B) per-delta-BLOCK expansion for the pallas flash
  kernel (round 5): a (block, block) tile of the bias at q-block i, k-block j
  depends only on d = i - j, so only the nq+nk-1 distinct delta blocks are
  built, each from a contiguous (2B-1) window of the table. The flash kernel
  indexes them with `i - j + nk - 1` in its BlockSpec index map, so the full
  (H, N, M) bias (134 MB fp32 at 2k ctx) never exists in HBM, and the bias
  gradient comes back in the same O(L·B) form (AD through this function
  reduces it to the table — slices and skews only, no scatter).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["toeplitz_expand", "delta_bias_blocks"]


def _toeplitz_expand_impl(tab, i: int, j: int):
    """(2j-1, H) distance table -> (H, i, j) bias, bias[h,q,k] =
    tab[(q + j - i) - k + (j - 1), h], built WITHOUT a gather.

    The naive `tab[rel]` gather is cheap forward but its transpose is a
    33M-element scatter-add into 4095 rows at seq 2048 — XLA lowers that
    scatter essentially serially on TPU and it dominated the seq-2048 train
    step (measured 10-15% MFU). This builds the Toeplitz expansion with a
    pad+flatten+reshape skew (each row of the flattened broadcast shifts by
    one), so both directions are pure reshapes/reductions the TPU lowers to
    dense vector ops.
    """
    H = tab.shape[1]
    trev = jnp.flip(tab, axis=0)  # trev[x] = tab[2j-2-x]
    trev_pad = jnp.concatenate([trev, jnp.zeros((1, H), tab.dtype)], axis=0)
    y = jnp.broadcast_to(trev_pad[None], (j, 2 * j, H))
    # flatten + re-chop one element short per row: row q shifts right by q,
    # so y[q, m] = trev_pad[(m - q) mod 2j]
    y = y.reshape(j * 2 * j, H)[: j * (2 * j - 1)].reshape(j, 2 * j - 1, H)
    # B_full[q, k] = y[q, k + j - 1] = trev[k + j - 1 - q] = tab[q - k + j - 1]
    full = y[:, j - 1:, :]  # (j, j, H)
    return full[j - i:].transpose(2, 0, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def toeplitz_expand(tab, i: int, j: int):
    return _toeplitz_expand_impl(tab, i, j)


def _toeplitz_expand_fwd(tab, i: int, j: int):
    return _toeplitz_expand_impl(tab, i, j), None


def _toeplitz_expand_bwd(i: int, j: int, _res, g):
    # exact transpose of the forward ops: no scatter anywhere
    H = g.shape[0]
    gq = g.transpose(1, 2, 0)  # (i, j, H)
    full = jnp.pad(gq, ((j - i, 0), (0, 0), (0, 0)))          # rows [j-i:]
    dy = jnp.pad(full, ((0, 0), (j - 1, 0), (0, 0)))          # cols [j-1:]
    flat = dy.reshape(j * (2 * j - 1), H)
    flat = jnp.pad(flat, ((0, j), (0, 0)))                    # undo the chop
    dtrev_pad = flat.reshape(j, 2 * j, H).sum(axis=0)         # undo broadcast
    dtab = jnp.flip(dtrev_pad[: 2 * j - 1], axis=0)
    return (dtab,)


toeplitz_expand.defvjp(_toeplitz_expand_fwd, _toeplitz_expand_bwd)


def delta_bias_blocks(tab, n: int, nq: int, nk: int, block: int):
    """(2n-1, H) table -> (H, nq+nk-1, block, block) per-delta bias blocks.

    blocks[h, i - j + nk - 1, a, c] == bias[h, i*block + a, j*block + c]
    where bias[h, q, k] = tab[q - k + n - 1, h] (zero outside the table —
    such entries only ever cover padded/masked positions). Differentiable:
    gradient w.r.t. the per-delta blocks flows back to the table through
    static slices and the scatter-free toeplitz skew.
    """
    H = tab.shape[1]
    nd = nq + nk - 1
    B = block
    # pad so every window is in range: idx = q - k + (n-1), with padded
    # positions q < nq*B, k < nk*B
    F = nk * B
    G = (nq + nk) * B  # loose upper bound on back overrun
    tpad = jnp.pad(tab, ((F, G), (0, 0)))
    blocks = []
    for dd in range(nd):
        # window for q-block i, k-block j with i - j = dd - (nk-1):
        # idx range [(i-j)*B - (B-1) + n-1, (i-j)*B + (B-1) + n-1]
        s = (dd - nk) * B + n + F  # == (i-j)*B - (B-1) + (n-1) + F
        w = jax.lax.slice(tpad, (s, 0), (s + 2 * B - 1, H))
        # toeplitz_expand(w, B, B)[h, a, c] = w[a - c + B - 1, h]
        #   = tpad[s + a - c + B - 1] = tab[(i-j)*B + a - c + n - 1]  ✓
        blocks.append(toeplitz_expand(w, B, B))
    return jnp.stack(blocks, axis=1)  # (H, nd, B, B)
