"""Flash attention (online-softmax, blocked) with ADDITIVE BIAS support.

The reference's flash path cannot take a positional bias (reference:
attend.py:112 asserts `not exists(attn_bias)` under flash) and so disables
rel-pos entirely when flash is on (audiolm_pytorch.py:430). This kernel keeps
both: O(N) memory attention AND the continuous rel-pos bias.

Design (pallas_guide.md patterns):
  * grid = (B*H, num_q_blocks, num_kv_blocks) — the kv axis is innermost and
    TPU grids execute sequentially, so the online-softmax running state
    (m, l, acc) lives in VMEM scratch persisted across kv steps.
  * q/k/v tiles are (BQ, D) / (BK, D) in VMEM; matmuls hit the MXU with fp32
    accumulation; softmax statistics are fp32 regardless of input dtype.
  * causal blocks strictly above the diagonal are skipped with @pl.when.
  * supports MQA: k/v carry one shared head (broadcast over the H grid).

Falls back to the XLA math path (ops.attention.attend) for tiny shapes.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, bias_ref, kmask_ref, o_ref, lse_ref,
            m_scratch, l_scratch, acc_scratch, *, causal: bool, scale: float,
            block_q: int, block_k: int, num_k_blocks: int):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    def compute():
        q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)
        k = k_ref[0].astype(jnp.float32)          # (BK, D)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (BQ, BK)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        if kmask_ref is not None:
            s = jnp.where(kmask_ref[0, 0][None, :] != 0, s, _NEG_INF)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, _NEG_INF)

        m_prev = m_scratch[:]          # (BQ, 1)
        l_prev = l_scratch[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)         # (BQ, BK)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0].astype(jnp.float32)
        pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scratch[:] = acc_scratch[:] * alpha + pv
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    if causal:
        # skip blocks strictly above the diagonal
        @pl.when(ki * block_k <= qi * block_q + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l = l_scratch[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / safe_l).astype(o_ref.dtype)
        lse_ref[0] = m_scratch[:] + jnp.log(safe_l)  # (BQ, 1)


def _flash_bh(q, k, v, bias, kmask, *, causal: bool, scale: float,
              block_q: int, block_k: int, interpret: bool,
              bias_blocks: bool = False):
    """q: (BH, N, D); k, v: (BH, M, D); bias: (Hb, N, M) or None with
    Hb dividing BH (indexed modulo — shared across batch, no broadcast);
    with bias_blocks=True, bias is (H*(nq+nk-1), BQ, BK) per-delta blocks
    indexed (head, i - j + nk - 1) — the O(L·B) rel-pos layout (ops/relpos).
    kmask: (Bk, M) int8 or None with Bk dividing BH (indexed by b // h)."""
    bh, n, d = q.shape
    m = k.shape[1]
    nq = pl.cdiv(n, block_q)
    nk = pl.cdiv(m, block_k)

    kv_group = bh // k.shape[0]  # MQA: kv shared across heads, indexed b // group
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b // kv_group, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b // kv_group, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None and bias_blocks:
        nd = nq + nk - 1
        hh = bias.shape[0] // nd
        in_specs.append(pl.BlockSpec(
            (1, block_q, block_k),
            lambda b, i, j: ((b % hh) * nd + (i - j + nk - 1), 0, 0),
            memory_space=pltpu.VMEM))
        args.append(bias)
    elif bias is not None:
        hb = bias.shape[0]
        in_specs.append(pl.BlockSpec((1, block_q, block_k),
                                     lambda b, i, j: (b % hb, i, j),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    if kmask is not None:
        h_per_b = bh // kmask.shape[0]
        # (B, 1, M) layout: TPU requires the 2nd-to-last block dim to divide 8
        # or equal the array dim — the singleton middle dim satisfies that
        in_specs.append(pl.BlockSpec((1, 1, block_k),
                                     lambda b, i, j: (b // h_per_b, 0, j),
                                     memory_space=pltpu.VMEM))
        args.append(kmask[:, None, :])

    kernel = functools.partial(
        _kernel_dispatch, has_bias=bias is not None, has_kmask=kmask is not None,
        causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        num_k_blocks=nk)

    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out, lse[..., 0]


def _kernel_dispatch(*refs, has_bias, has_kmask, **kw):
    idx = 3
    bias_ref = refs[idx] if has_bias else None
    idx += 1 if has_bias else 0
    kmask_ref = refs[idx] if has_kmask else None
    idx += 1 if has_kmask else 0
    o_ref, lse_ref = refs[idx], refs[idx + 1]
    m_s, l_s, acc_s = refs[idx + 2: idx + 5]
    _kernel(refs[0], refs[1], refs[2], bias_ref, kmask_ref, o_ref, lse_ref,
            m_s, l_s, acc_s, **kw)


def _dq_kernel(q_ref, k_ref, v_ref, lse_ref, delta_ref, g_ref, bias_ref,
               kmask_ref, dq_ref, dq_scratch, *, causal: bool, scale: float,
               block_q: int, block_k: int, num_k_blocks: int):
    """Fused dq pass: grid (BH, nq, nk), kv axis innermost; dq accumulates in
    VMEM scratch across kv steps (classic flash backward, recomputing P from
    the forward's logsumexp)."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    def compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        g = g_ref[0].astype(jnp.float32)
        lse = lse_ref[0]              # (BQ, 1) fp32
        delta = delta_ref[0]          # (BQ, 1) fp32
        s = scale * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        if kmask_ref is not None:
            s = jnp.where(kmask_ref[0, 0][None, :] != 0, s, _NEG_INF)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, _NEG_INF)
        p = jnp.exp(s - lse)
        # fully-masked rows store lse ~ -inf -> zero their contribution
        p = jnp.where(lse > _NEG_INF / 2, p, 0.0)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq_scratch[:] += scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        @pl.when(ki * block_k <= qi * block_q + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, lse_ref, delta_ref, g_ref, bias_ref,
                kmask_ref, dk_ref, dv_ref, dk_scratch, dv_scratch, *,
                causal: bool, scale: float, block_q: int, block_k: int,
                inner_steps: int, nq: int):
    """Fused dk/dv pass: grid (B*Hk, nk, group*nq) with the (head, q-block)
    pair enumerated on the innermost sequential axis, so MQA head-summation
    folds into the same VMEM accumulation as the q sweep."""
    kj = pl.program_id(1)
    t = pl.program_id(2)
    qi = t % nq

    @pl.when(t == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    def compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        g = g_ref[0].astype(jnp.float32)
        lse = lse_ref[0]
        delta = delta_ref[0]
        s = scale * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        if kmask_ref is not None:
            s = jnp.where(kmask_ref[0, 0][None, :] != 0, s, _NEG_INF)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, _NEG_INF)
        p = jnp.exp(s - lse)
        p = jnp.where(lse > _NEG_INF / 2, p, 0.0)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_scratch[:] += scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (BK, D)
        dv_scratch[:] += jax.lax.dot_general(
            p, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (BK, D)

    if causal:
        @pl.when(kj * block_k <= qi * block_q + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(t == inner_steps - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _dbias_kernel(q_ref, k_ref, v_ref, lse_ref, delta_ref, g_ref, bias_ref,
                  kmask_ref, db_ref, db_scratch, *, causal: bool, scale: float,
                  block_q: int, block_k: int, num_b: int):
    """Fused dbias pass for a batch-shared (H, N, M) bias: grid
    (H, nq, nk, B) with BATCH innermost, so the batch reduction of
    ds = p * (dp - delta) accumulates in VMEM scratch and each (h, qi, kj)
    bias tile is written exactly once (NOTES round-2 worklist #2)."""
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    bi = pl.program_id(3)

    @pl.when(bi == 0)
    def _init():
        db_scratch[:] = jnp.zeros_like(db_scratch)

    def compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        g = g_ref[0].astype(jnp.float32)
        lse = lse_ref[0]
        delta = delta_ref[0]
        s = scale * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        s = s + bias_ref[0]
        if kmask_ref is not None:
            s = jnp.where(kmask_ref[0, 0][None, :] != 0, s, _NEG_INF)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, _NEG_INF)
        p = jnp.exp(s - lse)
        p = jnp.where(lse > _NEG_INF / 2, p, 0.0)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        db_scratch[:] += p * (dp - delta)

    if causal:
        @pl.when(kj * block_k <= qi * block_q + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(bi == num_b - 1)
    def _finalize():
        db_ref[0] = db_scratch[:].astype(db_ref.dtype)


def _dblocks_kernel(q_ref, k_ref, v_ref, lse_ref, delta_ref, g_ref, bias_ref,
                    kmask_ref, db_ref, db_scratch, *, causal: bool,
                    scale: float, block_q: int, block_k: int, nq: int,
                    nk: int, num_b: int, d0: int):
    """dbias in per-delta-BLOCK form (round 5): grid (H, n_deltas, nq, B) with
    (q-block, batch) innermost, so every tile gradient with the same block
    delta d = qi - kj accumulates into ONE (BQ, BK) scratch and is written
    once. Output is (H*n_deltas, BQ, BK) — O(L·B), never the (H, N, M) bias.
    d0 is the first delta index covered (causal grids skip the always-empty
    above-diagonal deltas)."""
    dci = pl.program_id(1)
    p = pl.program_id(2)          # q block index
    bi = pl.program_id(3)
    kj = p - (dci + d0) + (nk - 1)  # k block index for this delta

    @pl.when((p == 0) & (bi == 0))
    def _init():
        db_scratch[:] = jnp.zeros_like(db_scratch)

    valid = (kj >= 0) & (kj < nk)
    if causal:
        valid = valid & (kj * block_k <= p * block_q + block_q - 1)

    @pl.when(valid)
    def compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        g = g_ref[0].astype(jnp.float32)
        lse = lse_ref[0]
        delta = delta_ref[0]
        s = scale * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        s = s + bias_ref[0].astype(jnp.float32)
        if kmask_ref is not None:
            s = jnp.where(kmask_ref[0, 0][None, :] != 0, s, _NEG_INF)
        if causal:
            q_pos = p * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            k_pos = kj * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(k_pos <= q_pos, s, _NEG_INF)
        p_mat = jnp.exp(s - lse)
        p_mat = jnp.where(lse > _NEG_INF / 2, p_mat, 0.0)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        db_scratch[:] += p_mat * (dp - delta)

    @pl.when((p == nq - 1) & (bi == num_b - 1))
    def _finalize():
        db_ref[0] = db_scratch[:].astype(db_ref.dtype)


def _flash_bwd_fused(q, k, v, bias, key_mask, out, lse, g, *, causal, scale,
                     block_q, block_k, interpret, bias_blocks: bool = False):
    """Fully-fused pallas backward: dq then dk/dv kernels (both recomputing P
    blockwise from the saved logsumexp), plus a third dbias kernel when a
    batch-shared (H, N, M) bias needs a gradient. O(N) memory, all matmuls on
    the MXU."""
    b, h, n, d = q.shape
    hk = k.shape[1]
    m = k.shape[2]
    group = h // hk

    block_q = min(block_q, max(16, 1 << (n - 1).bit_length()))
    block_k = min(block_k, max(16, 1 << (m - 1).bit_length()))
    pad_n = (-n) % block_q
    pad_m = (-m) % block_k

    gf = g.astype(jnp.float32)
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1)  # (B, H, N)

    if pad_n:
        cfg = ((0, 0), (0, 0), (0, pad_n), (0, 0))
        q = jnp.pad(q, cfg)
        g = jnp.pad(g, cfg)
        # padded query rows: lse=+inf -> p = exp(s - inf) = 0 exactly
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pad_n)),
                      constant_values=-_NEG_INF)
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pad_n)))
    if pad_m:
        cfg = ((0, 0), (0, 0), (0, pad_m), (0, 0))
        k = jnp.pad(k, cfg)
        v = jnp.pad(v, cfg)
        key_mask = jnp.pad(key_mask if key_mask is not None
                           else jnp.ones((b, m), bool), ((0, 0), (0, pad_m)))
    np_, mp_ = n + pad_n, m + pad_m
    nq = np_ // block_q
    nk = mp_ // block_k

    qf = q.reshape(b * h, np_, d)
    gf = g.reshape(b * h, np_, d)
    kf = k.reshape(b * hk, mp_, d)
    vf = v.reshape(b * hk, mp_, d)
    lsef = lse.reshape(b * h, np_, 1).astype(jnp.float32)
    deltaf = delta.reshape(b * h, np_, 1).astype(jnp.float32)
    kmask_f = (key_mask.astype(jnp.int8)[:, None, :]
               if key_mask is not None else None)
    bias_f = None
    nd = nq + nk - 1
    if bias is not None and bias_blocks:
        # (H, nd, BQ, BK) per-delta blocks: already built for the padded grid
        bias_f = bias.reshape(h * nd, block_q, block_k)
    elif bias is not None:
        # batch-shared (H, N, M) bias, fp32 (matches the forward's layout)
        bias_f = jnp.pad(bias, ((0, 0), (0, pad_n), (0, pad_m))) \
            if (pad_n or pad_m) else bias
        bias_f = bias_f.astype(jnp.float32)

    def _blk_spec_dq():  # bias tile for (bb, i, j) grid in per-delta form
        return pl.BlockSpec(
            (1, block_q, block_k),
            lambda bb, i, j: ((bb % h) * nd + (i - j + nk - 1), 0, 0),
            memory_space=pltpu.VMEM)

    # ---- dq pass: grid (BH, nq, nk) ----
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bb, i, j: (bb, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bb, i, j: (bb // group, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bb, i, j: (bb // group, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 1), lambda bb, i, j: (bb, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 1), lambda bb, i, j: (bb, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, d), lambda bb, i, j: (bb, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf, lsef, deltaf, gf]
    if bias_f is not None:
        in_specs.append(_blk_spec_dq() if bias_blocks else
                        pl.BlockSpec((1, block_q, block_k),
                                     lambda bb, i, j: (bb % h, i, j),
                                     memory_space=pltpu.VMEM))
        args.append(bias_f)
    if kmask_f is not None:
        in_specs.append(pl.BlockSpec((1, 1, block_k),
                                     lambda bb, i, j: (bb // h, 0, j),
                                     memory_space=pltpu.VMEM))
        args.append(kmask_f)

    def dq_dispatch(*refs):
        idx = 6
        bias_ref = refs[idx] if bias_f is not None else None
        idx += 1 if bias_f is not None else 0
        kmask_ref = refs[idx] if kmask_f is not None else None
        idx += 1 if kmask_f is not None else 0
        _dq_kernel(refs[0], refs[1], refs[2], refs[3], refs[4], refs[5],
                   bias_ref, kmask_ref, refs[idx], refs[idx + 1], causal=causal,
                   scale=scale, block_q=block_q, block_k=block_k,
                   num_k_blocks=nk)

    dq = pl.pallas_call(
        dq_dispatch,
        grid=(b * h, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda bb, i, j: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, np_, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(*args)

    # ---- dk/dv pass: grid (B*Hk, nk, group*nq) ----
    inner = group * nq

    qix = lambda bb, j, t: (bb * group + t // nq, t % nq, 0)
    in_specs2 = [
        pl.BlockSpec((1, block_q, d), qix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bb, j, t: (bb, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda bb, j, t: (bb, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 1), qix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, 1), qix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, d), qix, memory_space=pltpu.VMEM),
    ]
    args2 = [qf, kf, vf, lsef, deltaf, gf]
    if bias_f is not None:
        in_specs2.append(pl.BlockSpec(
            (1, block_q, block_k),
            (lambda bb, j, t: (((bb * group + t // nq) % h) * nd
                              + ((t % nq) - j + nk - 1), 0, 0))
            if bias_blocks else
            (lambda bb, j, t: ((bb * group + t // nq) % h, t % nq, j)),
            memory_space=pltpu.VMEM))
        args2.append(bias_f)
    if kmask_f is not None:
        in_specs2.append(pl.BlockSpec(
            (1, 1, block_k),
            lambda bb, j, t: ((bb * group + t // nq) // h, 0, j),
            memory_space=pltpu.VMEM))
        args2.append(kmask_f)

    def dkv_dispatch(*refs):
        idx = 6
        bias_ref = refs[idx] if bias_f is not None else None
        idx += 1 if bias_f is not None else 0
        kmask_ref = refs[idx] if kmask_f is not None else None
        idx += 1 if kmask_f is not None else 0
        _dkv_kernel(refs[0], refs[1], refs[2], refs[3], refs[4], refs[5],
                    bias_ref, kmask_ref, refs[idx], refs[idx + 1], refs[idx + 2],
                    refs[idx + 3], causal=causal, scale=scale, block_q=block_q,
                    block_k=block_k, inner_steps=inner, nq=nq)

    dk, dv = pl.pallas_call(
        dkv_dispatch,
        grid=(b * hk, nk, inner),
        in_specs=in_specs2,
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda bb, j, t: (bb, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bb, j, t: (bb, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * hk, mp_, d), k.dtype),
            jax.ShapeDtypeStruct((b * hk, mp_, d), v.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        interpret=interpret,
    )(*args2)

    dq = dq.reshape(b, h, np_, d)[:, :, :n]
    dk = dk.reshape(b, hk, mp_, d)[:, :, :m]
    dv = dv.reshape(b, hk, mp_, d)[:, :, :m]

    dbias = None
    if bias_f is not None and bias_blocks:
        # ---- per-delta dbias pass: grid (H, n_deltas, nq, B) ----
        # causal grids only sweep the on/below-diagonal deltas (qi >= kj,
        # i.e. delta index >= nk-1); the skipped blocks get zero gradient
        d0 = nk - 1 if causal else 0
        ndv = nd - d0

        def kjc(dci, p):  # clamped k-block index (skipped steps still fetch)
            return jnp.clip(p - (dci + d0) + (nk - 1), 0, nk - 1)

        in_specs4 = [
            pl.BlockSpec((1, block_q, d), lambda hh, dci, p, bi: (bi * h + hh, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda hh, dci, p, bi: (bi * hk + hh // group, kjc(dci, p), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda hh, dci, p, bi: (bi * hk + hh // group, kjc(dci, p), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda hh, dci, p, bi: (bi * h + hh, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda hh, dci, p, bi: (bi * h + hh, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda hh, dci, p, bi: (bi * h + hh, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, block_k),
                         lambda hh, dci, p, bi: (hh * nd + dci + d0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args4 = [qf, kf, vf, lsef, deltaf, gf, bias_f]
        if kmask_f is not None:
            in_specs4.append(pl.BlockSpec(
                (1, 1, block_k),
                lambda hh, dci, p, bi: (bi, 0, kjc(dci, p)),
                memory_space=pltpu.VMEM))
            args4.append(kmask_f)

        def dblocks_dispatch(*refs):
            idx = 7
            kmask_ref = refs[idx] if kmask_f is not None else None
            idx += 1 if kmask_f is not None else 0
            _dblocks_kernel(refs[0], refs[1], refs[2], refs[3], refs[4],
                            refs[5], refs[6], kmask_ref, refs[idx],
                            refs[idx + 1], causal=causal, scale=scale,
                            block_q=block_q, block_k=block_k, nq=nq, nk=nk,
                            num_b=b, d0=d0)

        dvisited = pl.pallas_call(
            dblocks_dispatch,
            grid=(h, ndv, nq, b),
            in_specs=in_specs4,
            out_specs=pl.BlockSpec((1, block_q, block_k),
                                   lambda hh, dci, p, bi: (hh * ndv + dci, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h * ndv, block_q, block_k),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((block_q, block_k), jnp.float32)],
            interpret=interpret,
        )(*args4)
        dvisited = dvisited.reshape(h, ndv, block_q, block_k)
        if d0:
            dvisited = jnp.concatenate(
                [jnp.zeros((h, d0, block_q, block_k), jnp.float32), dvisited],
                axis=1)
        dbias = dvisited  # (H, nd, BQ, BK) — caller's per-delta layout
        return dq, dk, dv, dbias
    if bias_f is not None:
        # ---- dbias pass: grid (H, nq, nk, B), batch innermost ----
        in_specs3 = [
            pl.BlockSpec((1, block_q, d), lambda hh, i, j, bb: (bb * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda hh, i, j, bb: (bb * hk + hh // group, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda hh, i, j, bb: (bb * hk + hh // group, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda hh, i, j, bb: (bb * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda hh, i, j, bb: (bb * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda hh, i, j, bb: (bb * h + hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, block_k), lambda hh, i, j, bb: (hh, i, j),
                         memory_space=pltpu.VMEM),
        ]
        args3 = [qf, kf, vf, lsef, deltaf, gf, bias_f]
        if kmask_f is not None:
            in_specs3.append(pl.BlockSpec((1, 1, block_k),
                                          lambda hh, i, j, bb: (bb, 0, j),
                                          memory_space=pltpu.VMEM))
            args3.append(kmask_f)

        def dbias_dispatch(*refs):
            idx = 7
            kmask_ref = refs[idx] if kmask_f is not None else None
            idx += 1 if kmask_f is not None else 0
            _dbias_kernel(refs[0], refs[1], refs[2], refs[3], refs[4], refs[5],
                          refs[6], kmask_ref, refs[idx], refs[idx + 1],
                          causal=causal, scale=scale, block_q=block_q,
                          block_k=block_k, num_b=b)

        dbias = pl.pallas_call(
            dbias_dispatch,
            grid=(h, nq, nk, b),
            in_specs=in_specs3,
            out_specs=pl.BlockSpec((1, block_q, block_k),
                                   lambda hh, i, j, bb: (hh, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, np_, mp_), jnp.float32),
            scratch_shapes=[pltpu.VMEM((block_q, block_k), jnp.float32)],
            interpret=interpret,
        )(*args3)
        dbias = dbias[:, :n, :m]
    return dq, dk, dv, dbias


def _math_reference(q, k, v, bias, key_mask, causal, scale):
    """Same semantics as the kernel, in plain XLA — used as the backward
    (flash fwd + math bwd until the dedicated backward kernel lands)."""
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if k.shape[1] == 1 and q.shape[1] > 1:
        sim = jnp.einsum("bhnd,bkmd->bhnm", qf, kf)
    else:
        sim = jnp.einsum("bhnd,bhmd->bhnm", qf, kf)
    if bias is not None:
        sim = sim + (bias if bias.ndim == 4 else bias[None]).astype(jnp.float32)
    if key_mask is not None:
        sim = jnp.where(key_mask[:, None, None, :], sim, _NEG_INF)
    if causal:
        n, m = sim.shape[-2:]
        cm = jnp.tril(jnp.ones((n, m), bool), k=m - n)
        sim = jnp.where(cm, sim, _NEG_INF)
    attn = jax.nn.softmax(sim, axis=-1)
    if v.shape[1] == 1 and q.shape[1] > 1:
        out = jnp.einsum("bhnm,bkmd->bhnd", attn, vf)
    else:
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vf)
    return out.astype(q.dtype)


def _flash_bwd_chunked(q, k, v, bias, key_mask, out, lse, g, *, causal, scale,
                       block_k):
    """Flash-style backward in O(N·block_k) memory: lax.scan over key blocks,
    re-deriving P from the saved logsumexp — the (N, M) attention matrix is
    never materialized (the classic dq/dk/dv/dbias recurrences)."""
    b, h, n, d = q.shape
    hk = k.shape[1]
    m = k.shape[2]
    pad_m = (-m) % block_k
    if pad_m:
        cfg = ((0, 0), (0, 0), (0, pad_m), (0, 0))
        k = jnp.pad(k, cfg)
        v = jnp.pad(v, cfg)
        key_mask = jnp.pad(key_mask if key_mask is not None
                           else jnp.ones((b, m), bool), ((0, 0), (0, pad_m)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0),) * (bias.ndim - 1) + ((0, pad_m),))
    mp = m + pad_m
    nblk = mp // block_k

    qf = q.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1)  # (B, H, N)
    kb_all = k.reshape(b, hk, nblk, block_k, d).astype(jnp.float32)
    vb_all = v.reshape(b, hk, nblk, block_k, d).astype(jnp.float32)
    km_all = key_mask.reshape(b, nblk, block_k) if key_mask is not None else None
    if bias is not None:
        bias_all = (bias if bias.ndim == 4 else bias[None]).astype(jnp.float32)
        bias_blocks = bias_all.reshape(*bias_all.shape[:-1], nblk, block_k)
    q_pos = jnp.arange(n)

    def body(dq_acc, j):
        if hk == 1:
            kb = kb_all[:, 0, j]  # (B, Bk, D) — shared MQA head
            vb = vb_all[:, 0, j]
            s = scale * jnp.einsum("bhnd,bkd->bhnk", qf, kb)
        else:
            kb = kb_all[:, :, j]  # (B, H, Bk, D)
            vb = vb_all[:, :, j]
            s = scale * jnp.einsum("bhnd,bhkd->bhnk", qf, kb)
        if bias is not None:
            s = s + jax.lax.dynamic_index_in_dim(bias_blocks, j, axis=-2,
                                                 keepdims=False)
        if km_all is not None:
            s = jnp.where(km_all[:, j][:, None, None, :], s, _NEG_INF)
        if causal:
            k_pos = j * block_k + jnp.arange(block_k)
            s = jnp.where(k_pos[None, None, None, :] <=
                          q_pos[None, None, :, None], s, _NEG_INF)
        p = jnp.exp(s - lse[..., None])          # (B, H, N, Bk)
        # a fully-masked query row stores lse ≈ -inf; exp(s - lse) would then
        # be 1 for every (masked) column — its gradient contribution must be 0
        p = jnp.where(lse[..., None] > _NEG_INF / 2, p, 0.0)
        if hk == 1:
            dp = jnp.einsum("bhnd,bkd->bhnk", gf, vb)
        else:
            dp = jnp.einsum("bhnd,bhkd->bhnk", gf, vb)
        ds = p * (dp - delta[..., None])          # (B, H, N, Bk)
        if hk == 1:
            dq_step = scale * jnp.einsum("bhnk,bkd->bhnd", ds, kb)
            # MQA: head contributions sum into the single shared kv head
            dk_j = scale * jnp.einsum("bhnk,bhnd->bkd", ds, qf)[:, None]
            dv_j = jnp.einsum("bhnk,bhnd->bkd", p, gf)[:, None]
        else:
            dq_step = scale * jnp.einsum("bhnk,bhkd->bhnd", ds, kb)
            dk_j = scale * jnp.einsum("bhnk,bhnd->bhkd", ds, qf)
            dv_j = jnp.einsum("bhnk,bhnd->bhkd", p, gf)
        db_j = jnp.sum(ds, axis=0) if (bias is not None and bias.ndim == 3) \
            else (ds if bias is not None else None)
        return dq_acc + dq_step, (dk_j, dv_j, db_j)

    dq, (dk_blocks, dv_blocks, db_blocks) = jax.lax.scan(
        body, jnp.zeros_like(qf), jnp.arange(nblk))
    dk = jnp.moveaxis(dk_blocks, 0, 2).reshape(b, hk, mp, d)[:, :, :m]
    dv = jnp.moveaxis(dv_blocks, 0, 2).reshape(b, hk, mp, d)[:, :, :m]
    dbias = None
    if bias is not None:
        db = jnp.moveaxis(db_blocks, 0, -2)  # (..., N, nblk, Bk)
        db = db.reshape(*db.shape[:-2], mp)[..., :m]
        dbias = db
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias)


@functools.lru_cache(maxsize=None)
def _make_vjp_fn(causal, scale, block_q, block_k, interpret, has_bias,
                 has_kmask, bias_blocks=False):
    @jax.custom_vjp
    def f(q, k, v, bias, key_mask):
        return _flash_forward(q, k, v, bias=bias, key_mask=key_mask,
                              causal=causal, scale=scale, block_q=block_q,
                              block_k=block_k, interpret=interpret,
                              bias_blocks=bias_blocks)

    def fwd(q, k, v, bias, key_mask):
        out, lse = _flash_forward(q, k, v, bias=bias, key_mask=key_mask,
                                  causal=causal, scale=scale, block_q=block_q,
                                  block_k=block_k, interpret=interpret,
                                  return_lse=True, bias_blocks=bias_blocks)
        return out, (q, k, v, bias, key_mask, out, lse)

    def bwd(res, g):
        q, k, v, bias, key_mask, out, lse = res
        if bias is None or bias.ndim == 3 or bias_blocks:
            # fully-fused pallas dq + dkv (+ dbias for batch-shared bias)
            dq, dk, dv, dbias = _flash_bwd_fused(
                q, k, v, bias, key_mask, out, lse, g, causal=causal,
                scale=scale, block_q=block_q, block_k=block_k,
                interpret=interpret, bias_blocks=bias_blocks)
            if dbias is not None:
                dbias = dbias.astype(bias.dtype)
            return dq, dk, dv, dbias, None
        # per-batch (B, H, N, M) bias gradient: chunked XLA recurrence
        dq, dk, dv, dbias = _flash_bwd_chunked(
            q, k, v, bias, key_mask, out, lse, g, causal=causal, scale=scale,
            block_k=block_k)
        return dq, dk, dv, dbias, None

    f.defvjp(fwd, bwd)
    return f


def flash_attention(q, k, v, *, bias=None, bias_tab=None, key_mask=None,
                    causal: bool = False, scale: float | None = None,
                    block_q: int = 512, block_k: int = 512,
                    interpret: bool | None = None):
    """Differentiable entry: pallas forward + fused pallas backward
    (custom VJP; chunked XLA backward when a bias gradient is needed).

    `bias_tab` (round 5): the (2N-1, H) rel-pos distance table instead of a
    materialized bias. Expanded to O(L·B) per-delta blocks (ops/relpos) that
    the kernels index by `q_block - k_block`; the (H, N, M) bias (134 MB fp32
    at 2k ctx, plus 2x transients in its scatter-free expansion) never exists
    in HBM, in either direction. Requires square self-attention (N == M).

    Default block 512: measured fwd+bwd at seq 2048 (b8 h8 d128, v5e-class
    chip, fetch-timed) — block 128: 21.5 ms, 256: 10.5 ms, 512: 7.1 ms vs
    math 102.7 ms and chunked 17.9 ms. Short sequences clamp the block to
    the next power of two of the length, so small shapes are unaffected."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    if interpret is None:
        from . import on_tpu
        interpret = not on_tpu()
    if bias_tab is not None:
        assert bias is None, "pass bias or bias_tab, not both"
        n, m = q.shape[2], k.shape[2]
        assert n == m, "bias_tab needs square self-attention"
        bq = min(block_q, max(16, 1 << (n - 1).bit_length()))
        bk = min(block_k, max(16, 1 << (m - 1).bit_length()))
        assert bq == bk, "per-delta blocks need square tiles"
        nq = pl.cdiv(n + ((-n) % bq), bq)
        from ..relpos import delta_bias_blocks
        # built OUTSIDE the custom_vjp: AD carries the per-delta block
        # gradient back to the table through slices and skews automatically
        bias = delta_bias_blocks(bias_tab, n, nq, nq, bq)
        fn = _make_vjp_fn(causal, float(scale), block_q, block_k, interpret,
                          True, key_mask is not None, bias_blocks=True)
        return fn(q, k, v, bias, key_mask)
    fn = _make_vjp_fn(causal, float(scale), block_q, block_k, interpret,
                      bias is not None, key_mask is not None)
    return fn(q, k, v, bias, key_mask)


def _flash_forward(q, k, v, *, bias=None, key_mask=None, causal: bool = False,
                   scale: float | None = None, block_q: int = 512,
                   block_k: int = 512, interpret: bool | None = None,
                   return_lse: bool = False, bias_blocks: bool = False):
    """q: (B, H, N, D); k, v: (B, Hk, M, D), Hk in {1, H} (MQA broadcast).
    bias: (H, N, M) or (B, H, N, M) additive. key_mask: (B, M) bool, True=keep.
    Returns (B, H, N, D).

    Sequence lengths are padded to the block size internally; padded keys are
    masked, padded query rows are sliced away.
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    if interpret is None:
        from . import on_tpu
        interpret = not on_tpu()

    block_q = min(block_q, max(16, 1 << (n - 1).bit_length()))
    block_k = min(block_k, max(16, 1 << (m - 1).bit_length()))
    pad_n = (-n) % block_q
    pad_m = (-m) % block_k

    hk = k.shape[1]
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_n), (0, 0))) if pad_n else q
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_m), (0, 0))) if pad_m else k
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_m), (0, 0))) if pad_m else v
    np_, mp_ = n + pad_n, m + pad_m

    qf = qp.reshape(b * h, np_, d)
    # MQA: kv stays un-broadcast (B*Hk, M, D); the kernel indexes it b // group
    kf = kp.reshape(b * hk, mp_, d)
    vf = vp.reshape(b * hk, mp_, d)

    bias_f = None
    if bias is not None and bias_blocks:
        # (H, nd, BQ, BK) per-delta blocks, already padded-grid sized
        bias_f = bias.reshape(-1, bias.shape[2], bias.shape[3]) \
            .astype(jnp.float32)
    elif bias is not None:
        # keep bias (H, N, M) un-broadcast: the kernel indexes it modulo H,
        # so batch never multiplies HBM traffic
        if bias.ndim == 4:
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad_n), (0, pad_m)))
            bias_f = bias.reshape(b * h, np_, mp_).astype(jnp.float32)
        else:
            bias = jnp.pad(bias, ((0, 0), (0, pad_n), (0, pad_m)))
            bias_f = bias.astype(jnp.float32)

    km = key_mask
    if km is None and pad_m:
        km = jnp.ones((b, m), bool)
    kmask_f = None
    if km is not None:
        km = jnp.pad(km, ((0, 0), (0, pad_m)))
        kmask_f = km.astype(jnp.int8)  # (B, M), kernel indexes by b // h

    out, lse = _flash_bh(qf, kf, vf, bias_f, kmask_f, causal=causal, scale=scale,
                         block_q=block_q, block_k=block_k, interpret=interpret,
                         bias_blocks=bias_blocks)
    out = out.reshape(b, h, np_, d)[:, :, :n]
    if return_lse:
        return out, lse.reshape(b, h, np_)[:, :, :n]
    return out
