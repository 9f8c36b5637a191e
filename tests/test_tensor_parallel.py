"""Tensor-parallel sharding rules: a TP-sharded LM training step must compile
under GSPMD on a (data x model) mesh and match the replicated run's loss."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiolm_pytorch_tpu.models.lm import SemanticTransformer
from audiolm_pytorch_tpu.models.wrappers import SemanticTransformerWrapper
from audiolm_pytorch_tpu.nn.module import combine, partition_trainable
from audiolm_pytorch_tpu.parallel.mesh import make_mesh
from audiolm_pytorch_tpu.parallel.tp import apply_tp_sharding, tp_rules_for_lm

KEY = jax.random.PRNGKey(0)


def _make_wrapper():
    st = SemanticTransformer(num_semantic_tokens=32, dim=64, depth=2, heads=4,
                             dim_head=16, num_residual_streams=1, key=KEY)
    return SemanticTransformerWrapper(transformer=st)


def test_tp_rules_cover_the_big_matmuls():
    w = _make_wrapper()
    rules = tp_rules_for_lm(w, num_model=2)
    sharded = [k for k, s in rules.items() if s != P()]
    assert any("to_q.weight" in k for k in sharded)
    assert any("to_out.weight" in k for k in sharded)
    assert any("proj_in.weight" in k for k in sharded)
    assert any("proj_out.weight" in k for k in sharded)
    assert any("to_logits.weight" in k for k in sharded)
    assert any("semantic_embedding" in k for k in sharded)
    # norms stay replicated
    assert all(s == P() for k, s in rules.items() if "gamma" in k)


def test_tp_train_step_matches_replicated():
    mesh = make_mesh(num_data=2, num_model=4)
    wrapper = _make_wrapper()
    params, rest = partition_trainable(wrapper)
    tx = optax.adam(1e-3)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 24), 0, 32)
    key = jax.random.PRNGKey(2)

    def make_step():
        @jax.jit
        def step(params, opt_state, ids):
            def loss_fn(p):
                w = combine(p, rest)
                return w(semantic_token_ids=ids, return_loss=True, train=True,
                         key=key)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return step

    # replicated baseline
    loss_ref = None
    p0 = params
    opt0 = tx.init(p0)
    _, _, loss_ref = make_step()(p0, opt0, ids)

    # TP + DP sharded
    with mesh:
        params_tp = apply_tp_sharding(params, mesh)
        rest = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P()))
            if hasattr(x, "shape") else x, rest)
        opt_tp = tx.init(params_tp)
        ids_tp = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
        new_params, _, loss_tp = make_step()(params_tp, opt_tp, ids_tp)
        loss_tp.block_until_ready()

    np.testing.assert_allclose(float(loss_tp), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    # param shardings survived the update (GSPMD kept the layout)
    flat = jax.tree_util.tree_leaves(new_params)
    assert any(not s.is_fully_replicated
               for x in flat if hasattr(x, "sharding")
               for s in [x.sharding])


def test_tp_sharded_generation_matches_replicated():
    """Serving-side TP: the whole wrapper pytree is sharded over the model
    axis and the jitted while-loop sampler runs under GSPMD (collectives
    inside every decode step). Output token ids must equal the replicated
    sampler's (same PRNG key)."""
    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.array(devices).reshape(1, 8), ("data", "model"))

    w = _make_wrapper()
    ids_ref = w.generate(max_length=8, batch_size=2, key=KEY)

    w_tp = apply_tp_sharding(w, mesh)
    with mesh:
        ids_tp = w_tp.generate(max_length=8, batch_size=2, key=KEY)
    assert ids_tp.shape == ids_ref.shape
    np.testing.assert_array_equal(np.asarray(ids_tp), np.asarray(ids_ref))
