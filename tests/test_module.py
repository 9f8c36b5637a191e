import jax
import jax.numpy as jnp
import pytest

from audiolm_pytorch_tpu.nn.module import (
    Buffer, Module, combine, evolve, partition_trainable, tree_size,
)
from audiolm_pytorch_tpu.nn.layers import FeedForward, LayerNorm, Linear


class Toy(Module):
    def __init__(self, key):
        k1, k2 = jax.random.split(key)
        self.lin = Linear(4, 4, key=k1)
        self.emb_table = jax.random.normal(k2, (8, 4))
        self.counter = Buffer(jnp.zeros((), jnp.int32))
        self.ema = Buffer(jnp.ones((4,)))
        self.name = "toy"
        self.depth = 3

    def __call__(self, x):
        return self.lin(x) + self.ema.value.astype(x.dtype)


def test_pytree_roundtrip():
    m = Toy(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(m)
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert m2.name == "toy" and m2.depth == 3
    x = jnp.ones((2, 4))
    assert jnp.allclose(m(x), m2(x))


def test_jit_static_aux():
    m = Toy(jax.random.PRNGKey(0))
    calls = []

    @jax.jit
    def f(m, x):
        calls.append(1)
        return m(x)

    x = jnp.ones((2, 4))
    f(m, x)
    f(m, x)  # cache hit — no retrace
    assert len(calls) == 1


def test_partition_trainable_excludes_buffers_and_ints():
    m = Toy(jax.random.PRNGKey(0))
    params, rest = partition_trainable(m)
    leaves = [x for x in jax.tree_util.tree_leaves(params)]
    # buffers (counter int32, ema float) excluded; lin.weight, lin.bias, emb_table included
    assert len(leaves) == 3
    m2 = combine(params, rest)
    x = jnp.ones((2, 4))
    assert jnp.allclose(m(x), m2(x))


def test_grad_through_partition():
    m = Toy(jax.random.PRNGKey(0))
    params, rest = partition_trainable(m)
    x = jnp.ones((2, 4))

    def loss(p):
        return jnp.sum(combine(p, rest)(x) ** 2)

    g = jax.grad(loss)(params)
    assert g.lin.weight.shape == (4, 4)
    # buffer slots carry no gradient (None child inside the Buffer wrapper)
    assert g.counter.value is None and g.ema.value is None


def test_evolve():
    m = Toy(jax.random.PRNGKey(0))
    m2 = evolve(m, ema=Buffer(jnp.zeros((4,))))
    assert jnp.allclose(m2.ema.value, 0)
    assert jnp.allclose(m.ema.value, 1)
    with pytest.raises(AttributeError):
        evolve(m, nope=1)


def test_cast_floats():
    from audiolm_pytorch_tpu.nn.module import cast_floats
    m = Toy(jax.random.PRNGKey(0))
    m16 = cast_floats(m, jnp.bfloat16)
    assert m16.lin.weight.dtype == jnp.bfloat16
    assert m16.counter.value.dtype == jnp.int32  # non-floats untouched
    x = jnp.ones((2, 4), jnp.bfloat16)
    assert m16(x).dtype == jnp.bfloat16


def test_layers_shapes():
    key = jax.random.PRNGKey(1)
    ff = FeedForward(16, key=key)
    x = jax.random.normal(key, (2, 5, 16))
    assert ff(x).shape == (2, 5, 16)
    ln = LayerNorm(16)
    y = ln(x)
    assert jnp.allclose(jnp.mean(y, -1), 0, atol=1e-4)
    assert tree_size(ff) > 0
