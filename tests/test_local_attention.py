"""Local attention: XLA blocked implementation properties + pallas kernel parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolm_pytorch_tpu.ops.attention import (LocalMHA, LocalTransformer,
                                               attend, local_attention)
from audiolm_pytorch_tpu.ops.pallas.local_attention import local_attention_pallas

KEY = jax.random.PRNGKey(0)


def make_qkv(b=2, h=2, t=64, d=16):
    k1, k2, k3 = jax.random.split(KEY, 3)
    return (jax.random.normal(k1, (b, h, t, d)),
            jax.random.normal(k2, (b, h, t, d)),
            jax.random.normal(k3, (b, h, t, d)))


def test_local_matches_full_attention_when_window_covers():
    """window >= T: local attention == full causal attention."""
    q, k, v = make_qkv(t=32)
    loc = local_attention(q, k, v, window_size=32)
    full = attend(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(loc), np.asarray(full), rtol=1e-4,
                               atol=1e-5)


def test_local_attention_is_causal_and_windowed():
    q, k, v = make_qkv(t=64)
    out1 = local_attention(q, k, v, window_size=16)
    # past-only: changing the future never changes earlier outputs
    v2 = v.at[:, :, 40:].set(0.0)
    k2 = k.at[:, :, 40:].set(0.0)
    out2 = local_attention(q, k2, v2, window_size=16)
    np.testing.assert_allclose(np.asarray(out1[:, :, :40]),
                               np.asarray(out2[:, :, :40]), rtol=1e-4, atol=1e-5)
    # windowed: token 63 (window [48,64), lookback [32,48)) ignores keys < 32
    k3 = k.at[:, :, :16].set(7.0)
    v3 = v.at[:, :, :16].set(7.0)
    out3 = local_attention(q, k3, v3, window_size=16)
    np.testing.assert_allclose(np.asarray(out1[:, :, 48:]),
                               np.asarray(out3[:, :, 48:]), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("t,window", [(64, 16), (50, 16), (128, 32)])
def test_pallas_local_matches_xla(t, window):
    q, k, v = make_qkv(t=t)
    ref = local_attention(q, k, v, window_size=window)
    out = local_attention_pallas(q, k, v, window_size=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_pallas_local_with_mask_and_bias():
    q, k, v = make_qkv(t=64)
    mask = jnp.ones((2, 64), bool).at[0, 50:].set(False)
    bias = 0.3 * jax.random.normal(KEY, (2, 16, 32))
    ref = local_attention(q, k, v, window_size=16, mask=mask, attn_bias=bias)
    out = local_attention_pallas(q, k, v, window_size=16, mask=mask,
                                 attn_bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_pallas_local_grads():
    q, k, v = make_qkv(t=32)

    def loss_p(q, k, v):
        return jnp.sum(local_attention_pallas(q, k, v, window_size=16) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(local_attention(q, k, v, window_size=16) ** 2)

    g1 = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-3)


def test_local_mha_module():
    mha = LocalMHA(dim=32, heads=2, dim_head=16, window_size=16, key=KEY)
    x = jax.random.normal(KEY, (2, 40, 32))
    out = mha(x)
    assert out.shape == (2, 40, 32)


def test_local_transformer_causality():
    lt = LocalTransformer(dim=32, depth=2, heads=2, dim_head=16,
                          window_size=16, key=KEY)
    x = jax.random.normal(KEY, (1, 40, 32))
    o1 = lt(x)
    x2 = x.at[:, 30:].set(0.0)
    o2 = lt(x2)
    np.testing.assert_allclose(np.asarray(o1[:, :30]), np.asarray(o2[:, :30]),
                               rtol=1e-4, atol=1e-5)
