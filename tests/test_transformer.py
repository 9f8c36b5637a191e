import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolm_pytorch_tpu.models.transformer import (
    Attention, KVCache, RelativePositionBias, Transformer,
)


def make_transformer(**kw):
    kwargs = dict(dim=32, depth=2, heads=4, dim_head=8, key=jax.random.PRNGKey(0))
    kwargs.update(kw)
    return Transformer(**kwargs)


def test_forward_shape():
    tr = make_transformer()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32))
    out = tr(x)
    assert out.shape == (2, 10, 32)


def test_causality():
    """Changing a future token must not change past outputs."""
    tr = make_transformer(num_residual_streams=1)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32))
    out1 = tr(x)
    x2 = x.at[:, 5:].set(jax.random.normal(jax.random.PRNGKey(3), (1, 3, 32)))
    out2 = tr(x2)
    np.testing.assert_allclose(np.asarray(out1[:, :5]), np.asarray(out2[:, :5]),
                               rtol=1e-4, atol=1e-5)


def test_kv_cache_matches_full_forward():
    """Incremental decoding with the fixed-size cache must equal the full pass."""
    tr = make_transformer()
    n, max_len = 6, 12
    x = jax.random.normal(jax.random.PRNGKey(4), (2, n, 32))

    full = tr(x)

    cache = KVCache.create(tr.depth, 2, max_len, tr.dim_head)
    outs = []
    # prefill 3 tokens, then decode one at a time
    out, cache = tr(x[:, :3], kv_cache=cache, return_kv_cache=True)
    outs.append(out)
    for i in range(3, n):
        out, cache = tr(x[:, i:i + 1], kv_cache=cache, return_kv_cache=True)
        outs.append(out)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), rtol=1e-3, atol=1e-4)


def test_cross_attention_and_context_mask():
    tr = make_transformer(cross_attend=True, dim_context=16)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 7, 16))
    mask = jnp.ones((2, 7), bool).at[1, 4:].set(False)
    out = tr(x, context=ctx, context_mask=mask)
    assert out.shape == (2, 5, 32)
    # fully-masked context still works thanks to the null KV
    out2 = tr(x, context=ctx, context_mask=jnp.zeros((2, 7), bool))
    assert bool(jnp.all(jnp.isfinite(out2)))


def test_cond_as_self_attn_prefix():
    tr = make_transformer(cond_as_self_attn_prefix=True, dim_context=32)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(8), (2, 3, 32))
    out = tr(x, context=ctx)
    assert out.shape == (2, 5, 32)


def test_rel_pos_bias_slicing():
    rpb = RelativePositionBias(dim=16, heads=4, key=jax.random.PRNGKey(0))
    full = rpb(8, 8)
    assert full.shape == (4, 8, 8)
    suffix = rpb(2, 8)  # last 2 query rows
    np.testing.assert_allclose(np.asarray(full[:, 6:]), np.asarray(suffix),
                               rtol=1e-5, atol=1e-6)


def test_grads_flow():
    tr = make_transformer()
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 6, 32))
    from audiolm_pytorch_tpu.nn.module import combine, partition_trainable
    params, rest = partition_trainable(tr)

    def loss(p):
        return jnp.sum(combine(p, rest)(x) ** 2)

    g = jax.grad(loss)(params)
    gn = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)
          if hasattr(x, "shape")]
    assert all(np.isfinite(v) for v in gn)
    assert sum(v > 0 for v in gn) > len(gn) * 0.8  # almost all params get grads


def test_toeplitz_expand_matches_gather():
    """The scatter-free Toeplitz expansion must be numerically identical to
    the straightforward gather formulation (reference rel-pos indexing,
    audiolm_pytorch.py:236-241) in BOTH directions."""
    from audiolm_pytorch_tpu.models.transformer import toeplitz_expand

    def gather_expand(tab, i, j):
        i_pos = jnp.arange(i) + (j - i)
        rel = i_pos[:, None] - jnp.arange(j)[None, :] + (j - 1)
        return tab[rel].transpose(2, 0, 1)

    for i, j, h in [(1, 1, 2), (5, 5, 4), (3, 8, 4), (16, 16, 8), (7, 13, 3)]:
        tab = jax.random.normal(jax.random.PRNGKey(i * 31 + j), (2 * j - 1, h))
        want = gather_expand(tab, i, j)
        got = jax.jit(toeplitz_expand, static_argnums=(1, 2))(tab, i, j)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
        # backward: anti-diagonal sums vs autodiff of the gather (scatter-add)
        ct = jax.random.normal(jax.random.PRNGKey(j), (h, i, j))
        g_want = jax.grad(lambda t: jnp.sum(gather_expand(t, i, j) * ct))(tab)
        g_got = jax.grad(lambda t: jnp.sum(toeplitz_expand(t, i, j) * ct))(tab)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=1e-5, atol=1e-5)
