"""Flash-attention kernel parity vs the XLA math path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolm_pytorch_tpu.ops.attention import attend
from audiolm_pytorch_tpu.ops.pallas.flash_attention import flash_attention

KEY = jax.random.PRNGKey(0)


def make_qkv(b=2, h=4, n=64, m=64, d=32, mqa=False):
    k1, k2, k3 = jax.random.split(KEY, 3)
    q = jax.random.normal(k1, (b, h, n, d))
    hk = 1 if mqa else h
    k = jax.random.normal(k2, (b, hk, m, d))
    v = jax.random.normal(k3, (b, hk, m, d))
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_math(causal):
    q, k, v = make_qkv()
    ref = attend(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_with_bias():
    q, k, v = make_qkv(n=32, m=32)
    bias = 0.5 * jax.random.normal(KEY, (4, 32, 32))
    ref = attend(q, k, v, attn_bias=bias, causal=True)
    out = flash_attention(q, k, v, bias=bias, causal=True, block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_mqa_and_key_mask():
    q, k, v = make_qkv(mqa=True, n=48, m=48)
    mask = jnp.ones((2, 48), bool).at[1, 30:].set(False)
    ref = attend(q, k, v, mask=mask[:, None, None, :], causal=True)
    out = flash_attention(q, k, v, key_mask=mask, causal=True, block_q=16,
                          block_k=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_unaligned_lengths():
    q, k, v = make_qkv(n=50, m=50)
    ref = attend(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_grads_match_math():
    q, k, v = make_qkv(n=32, m=32, mqa=True)
    bias = 0.3 * jax.random.normal(KEY, (4, 32, 32))

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias=bias, causal=True,
                                       block_q=16, block_k=16) ** 2)

    def loss_math(q, k, v, bias):
        return jnp.sum(attend(q, k, v, attn_bias=bias, causal=True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_math, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-3)


def test_flash_transformer_matches_math_transformer():
    from audiolm_pytorch_tpu.models.transformer import Transformer
    from audiolm_pytorch_tpu.nn.module import evolve
    tr = Transformer(dim=32, depth=2, heads=4, dim_head=8,
                     num_residual_streams=1, flash_attn=False,
                     key=jax.random.PRNGKey(3))
    x = jax.random.normal(KEY, (2, 24, 32))
    ref = tr(x)
    tr_flash = jax.tree_util.tree_map(lambda a: a, tr)
    for layer in tr_flash.layers:
        object.__setattr__(layer[1], "flash", True)
    out = tr_flash(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-3,
                               atol=5e-3)


def test_flash_bf16():
    q, k, v = (t.astype(jnp.bfloat16) for t in make_qkv())
    ref = attend(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("mqa", [False, True])
@pytest.mark.parametrize("causal", [False, True])
def test_fused_pallas_backward_matches_math(mqa, causal):
    """The bias-less backward runs the fully-fused pallas dq/dkv kernels
    (not the chunked XLA recurrence) — parity vs math-path autodiff."""
    q, k, v = make_qkv(n=48, m=48, mqa=mqa)
    mask = jnp.ones((2, 48), bool).at[1, 35:].set(False)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, key_mask=mask, causal=causal,
                                       block_q=16, block_k=16) ** 2)

    def loss_math(q, k, v):
        return jnp.sum(attend(q, k, v, mask=mask[:, None, None, :],
                              causal=causal) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_math, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-3)


def test_fused_pallas_backward_unaligned_no_mask():
    """Padding path of the fused backward: no key_mask given, lengths not a
    multiple of the block size (padded lse rows must contribute zero)."""
    q, k, v = make_qkv(n=50, m=50)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True,
                                       block_q=16, block_k=16) ** 2)

    def loss_math(q, k, v):
        return jnp.sum(attend(q, k, v, causal=True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_math, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-3)


def test_fused_dbias_unaligned_masked_mqa():
    """Round-3 fused dbias kernel: batch-shared (H, N, M) bias gradient from
    the third pallas pass (grid (H, nq, nk, B), batch innermost) must match
    math autodiff with MQA + key_mask + non-block-aligned lengths."""
    q, k, v = make_qkv(n=50, m=50, mqa=True)
    bias = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (4, 50, 50))
    mask = jnp.ones((2, 50), bool).at[0, 41:].set(False)

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias=bias, key_mask=mask,
                                       causal=True, block_q=16, block_k=16) ** 2)

    def loss_math(q, k, v, bias):
        return jnp.sum(attend(q, k, v, attn_bias=bias,
                              mask=mask[:, None, None, :], causal=True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_math, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-3)


def test_per_batch_bias_grad_chunked_fallback():
    """(B, H, N, M) bias still takes the chunked XLA backward; grads match."""
    q, k, v = make_qkv(n=32, m=32)
    bias = 0.3 * jax.random.normal(jax.random.PRNGKey(8), (2, 4, 32, 32))

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias=bias, causal=True,
                                       block_q=16, block_k=16) ** 2)

    def loss_math(q, k, v, bias):
        return jnp.sum(attend(q, k, v, attn_bias=bias, causal=True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_math, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-3)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("mqa", [True, False])
def test_bias_tab_per_delta_blocks(causal, mqa):
    """Round-5 O(L*B) rel-pos path: passing the (2N-1, H) distance TABLE
    (bias_tab=) must match the math path fed the materialized toeplitz bias,
    in value AND in the gradient w.r.t. the table — without the (H, N, M)
    bias ever being built (per-delta blocks + the _dblocks_kernel grid)."""
    from audiolm_pytorch_tpu.ops.relpos import toeplitz_expand

    n = 48
    q, k, v = make_qkv(n=n, m=n, mqa=mqa)
    tab = 0.3 * jax.random.normal(jax.random.PRNGKey(9), (2 * n - 1, 4))
    mask = jnp.ones((2, n), bool).at[1, 40:].set(False)

    def loss_flash(q, k, v, tab):
        return jnp.sum(flash_attention(q, k, v, bias_tab=tab, key_mask=mask,
                                       causal=causal, block_q=16,
                                       block_k=16) ** 2)

    def loss_math(q, k, v, tab):
        bias = toeplitz_expand(tab, n, n)
        return jnp.sum(attend(q, k, v, attn_bias=bias,
                              mask=mask[:, None, None, :], causal=causal) ** 2)

    o1 = loss_flash(q, k, v, tab)
    o2 = loss_math(q, k, v, tab)
    np.testing.assert_allclose(float(o1), float(o2), rtol=2e-3)
    g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, tab)
    g2 = jax.grad(loss_math, argnums=(0, 1, 2, 3))(q, k, v, tab)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-3)


def test_bias_tab_unaligned_lengths():
    """Per-delta blocks with n not a multiple of the block size: padded
    positions must not contaminate values or the table gradient."""
    from audiolm_pytorch_tpu.ops.relpos import toeplitz_expand

    n = 50
    q, k, v = make_qkv(n=n, m=n)
    tab = 0.3 * jax.random.normal(jax.random.PRNGKey(10), (2 * n - 1, 4))

    def loss_flash(q, k, v, tab):
        return jnp.sum(flash_attention(q, k, v, bias_tab=tab, causal=True,
                                       block_q=16, block_k=16) ** 2)

    def loss_math(q, k, v, tab):
        bias = toeplitz_expand(tab, n, n)
        return jnp.sum(attend(q, k, v, attn_bias=bias, causal=True) ** 2)

    np.testing.assert_allclose(float(loss_flash(q, k, v, tab)),
                               float(loss_math(q, k, v, tab)), rtol=2e-3)
    g1 = jax.grad(loss_flash, argnums=3)(q, k, v, tab)
    g2 = jax.grad(loss_math, argnums=3)(q, k, v, tab)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-2,
                               atol=1e-3)
