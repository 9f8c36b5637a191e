"""Batch-sharded generation: the jitted samplers accept batch-sharded inputs
and GSPMD partitions the whole while-loop across the data axis."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiolm_pytorch_tpu.models.wrappers import SemanticTransformerWrapper
from tests.test_lm import make_semantic, KEY


def test_semantic_generate_batch_sharded():
    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.array(devices), ("data",))
    st = make_semantic()
    w = SemanticTransformerWrapper(transformer=st)

    ids = jax.random.randint(KEY, (8, 4), 0, 20)
    ids_sharded = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    with mesh:
        out = w.generate(max_length=8, prime_ids=ids_sharded, batch_size=8,
                         key=KEY)
    assert out.shape == (8, 8)
    # same results as the unsharded run
    out_ref = w.generate(max_length=8, prime_ids=ids, batch_size=8, key=KEY)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
