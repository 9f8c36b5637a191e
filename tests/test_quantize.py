import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from audiolm_pytorch_tpu.ops.quantize import (
    FSQ, LFQ, GroupedResidualVQ, ResidualFSQ, ResidualLFQ, ResidualVQ,
    VectorQuantizeEMA,
)


def make_clustered_data(key, b, n, dim, n_clusters=8, noise=0.02):
    # fixed cluster centers across calls; only assignment/noise vary with key
    centers = jax.random.normal(jax.random.PRNGKey(1234), (n_clusters, dim))
    kn, ka = jax.random.split(key)
    assign = jax.random.randint(ka, (b * n,), 0, n_clusters)
    x = centers[assign] + noise * jax.random.normal(kn, (b * n, dim))
    return x.reshape(b, n, dim)


def test_vq_ema_converges_on_toy_clusters():
    key = jax.random.PRNGKey(0)
    dim, cb = 4, 8
    vq = VectorQuantizeEMA(dim, cb, key=key, threshold_ema_dead_code=0.5)

    @jax.jit
    def step(vq, x, key):
        out, idx, loss, vq = vq(x, key=key, train=True)
        return vq, loss

    for i in range(30):
        key, k1, k2 = jax.random.split(key, 3)
        x = make_clustered_data(k1, 4, 32, dim)
        vq, loss = step(vq, x, k2)
    # after EMA training, quantization error on cluster data should be small
    x = make_clustered_data(jax.random.PRNGKey(99), 4, 32, dim)
    out, idx, loss, _ = vq(x, train=False)
    err = jnp.mean((out - x) ** 2)
    assert float(err) < 0.05, float(err)


def test_vq_encode_decode_roundtrip():
    key = jax.random.PRNGKey(1)
    vq = VectorQuantizeEMA(8, 16, key=key, kmeans_init=False)
    x = jax.random.normal(key, (2, 10, 8))
    idx = vq.encode(x)
    dec = vq.decode(idx)
    idx2 = vq.encode(dec)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


def test_rvq_shapes_and_dropout():
    key = jax.random.PRNGKey(2)
    rvq = ResidualVQ(dim=8, num_quantizers=4, codebook_size=16,
                     quantize_dropout=True, quantize_dropout_cutoff_index=1, key=key)
    x = jax.random.normal(key, (2, 12, 8))
    out, idx, losses, rvq2 = rvq(x, key=key, train=True)
    assert out.shape == x.shape
    assert idx.shape == (2, 12, 4)
    assert losses.shape == (4,)
    # dropped quantizers marked -1, and dropout keeps at least cutoff+1 quantizers
    dropped = np.asarray(idx[0, 0] == -1)
    assert not dropped[:2].any()

    # residual property: more quantizers -> lower recon error
    out1, idx1, _, _ = rvq(x, train=False)
    assert not np.any(np.asarray(idx1) == -1)
    partial_err, full_err = [], []
    dec_full = rvq.get_output_from_indices(idx1)
    dec_partial = rvq.get_output_from_indices(idx1.at[..., 2:].set(-1))
    assert float(jnp.mean((dec_full - out1) ** 2)) < 1e-10


def test_rvq_get_output_from_indices_matches_forward():
    key = jax.random.PRNGKey(3)
    rvq = ResidualVQ(dim=8, num_quantizers=3, codebook_size=16,
                     kmeans_init=False, key=key)
    x = jax.random.normal(key, (2, 6, 8))
    out, idx, _, _ = rvq(x, train=False)
    dec = rvq.get_output_from_indices(idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dec), rtol=1e-5, atol=1e-6)


def test_grouped_rvq():
    key = jax.random.PRNGKey(4)
    g = GroupedResidualVQ(dim=16, groups=2, num_quantizers=3, codebook_size=8,
                          kmeans_init=False, key=key)
    x = jax.random.normal(key, (2, 6, 16))
    out, idx, loss, _ = g(x, train=False)
    assert out.shape == x.shape
    assert idx.shape == (2, 2, 6, 3)  # (G, B, N, Q)
    dec = g.get_output_from_indices(idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dec), rtol=1e-5, atol=1e-6)


def test_lfq_roundtrip():
    key = jax.random.PRNGKey(5)
    lfq = LFQ(dim=16, codebook_size=256, key=key)
    x = jax.random.normal(key, (2, 6, 16))
    out, idx, loss, _ = lfq(x, train=False)
    assert idx.shape == (2, 6) and int(idx.max()) < 256
    dec = lfq.decode(idx)
    assert dec.shape == out.shape


def test_residual_lfq_and_indices():
    key = jax.random.PRNGKey(6)
    rlfq = ResidualLFQ(dim=8, num_quantizers=2, codebook_size=256, key=key)
    x = jax.random.normal(key, (2, 6, 8))
    out, idx, loss, _ = rlfq(x, train=False)
    dec = rlfq.get_output_from_indices(idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dec), rtol=1e-4, atol=1e-5)


def test_fsq_roundtrip():
    key = jax.random.PRNGKey(7)
    fsq = FSQ(dim=16, levels=(8, 5, 5, 5), key=key)
    assert fsq.codebook_size == 1000
    x = jax.random.normal(key, (2, 6, 16))
    out, idx, loss, _ = fsq(x, train=False)
    assert int(idx.max()) < 1000 and int(idx.min()) >= 0
    dec = fsq.decode(idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dec), rtol=1e-4, atol=1e-5)


def test_residual_fsq_roundtrip():
    key = jax.random.PRNGKey(8)
    rfsq = ResidualFSQ(dim=8, levels=(5, 5, 5), num_quantizers=3, key=key)
    x = 0.5 * jax.random.normal(key, (2, 6, 8))
    out, idx, _, _ = rfsq(x, train=False)
    dec = rfsq.get_output_from_indices(idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dec), rtol=1e-4, atol=1e-5)


def test_vq_ema_psum_keeps_replicas_identical():
    """Data-parallel EMA correctness: different data per device, identical
    codebooks afterwards (the reference relies on torch.distributed all_reduce;
    we psum — SURVEY.md §2.4). The per-replica codebooks are returned with
    out_specs P("data") so the assertion actually compares replicas."""
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual cpu devices, got {len(devices)}"
    mesh = Mesh(np.array(devices), ("data",))
    key = jax.random.PRNGKey(9)
    vq = VectorQuantizeEMA(4, 8, key=key)
    x = make_clustered_data(key, 16, 32, 4)  # batch 16 -> 2 per device

    def make_step(axis_name):
        def step(vq, x, key):
            out, idx, loss, vq = vq(x, key=key, train=True, axis_name=axis_name)
            # leading singleton axis -> out_specs P("data") stacks one full
            # codebook copy per device: (8, codes, dim)
            return vq, vq.codebook.value[None]
        return shard_map(step, mesh=mesh,
                         in_specs=(P(), P("data"), P()),
                         out_specs=(P(), P("data")), check_vma=False)

    vq2, per_replica = jax.jit(make_step("data"))(vq, x, key)
    per_replica = np.asarray(per_replica)
    assert per_replica.shape[0] == 8
    assert np.isfinite(per_replica).all()
    for d in range(1, 8):
        np.testing.assert_array_equal(per_replica[d], per_replica[0],
                                      err_msg=f"replica {d} diverged")

    # negative control: WITHOUT the psum (axis_name=None) replicas must
    # diverge, or this test has no power
    _, per_replica_nosync = jax.jit(make_step(None))(vq, x, key)
    per_replica_nosync = np.asarray(per_replica_nosync)
    assert not all(np.array_equal(per_replica_nosync[d], per_replica_nosync[0])
                   for d in range(1, 8)), "psum-less replicas were identical"

    # single-device run over the same full batch reaches similar quality
    out, idx, loss, vq3 = vq(x, key=key, train=True, axis_name=None)
    xq2, _, _, _ = vq2(x, train=False)
    xq3, _, _, _ = vq3(x, train=False)
    e2 = float(jnp.mean((xq2 - x) ** 2))
    e3 = float(jnp.mean((xq3 - x) ** 2))
    assert e2 < 0.1 and e3 < 0.1


def test_vq_distance_argmin_matches_torch_fp32():
    """Toward bit-exact token streams (BASELINE.md row 'token-stream
    equivalence'): the fp32 expanded squared-distance + argmin must pick the
    same codes as torch's reference computation, including lowest-index
    tie-breaking (both jnp.argmin and torch.argmin return the FIRST minimal
    index)."""
    torch = pytest.importorskip("torch")
    from audiolm_pytorch_tpu.ops.quantize import _sq_dist

    rng = np.random.default_rng(0)
    x = rng.normal(size=(257, 16)).astype(np.float32)
    cb = rng.normal(size=(64, 16)).astype(np.float32)
    # inject exact ties: duplicate codebook rows, and duplicate an input row
    cb[17] = cb[3]
    cb[50] = cb[3]
    x[5] = cb[3]

    d_j = np.asarray(_sq_dist(jnp.asarray(x), jnp.asarray(cb)))
    xt, ct = torch.from_numpy(x), torch.from_numpy(cb)
    d_t = (xt.pow(2).sum(-1, keepdim=True)
           - 2 * xt @ ct.T + ct.pow(2).sum(-1)).numpy()
    np.testing.assert_allclose(d_j, d_t, rtol=1e-5, atol=1e-4)

    idx_j = np.asarray(jnp.argmin(jnp.asarray(d_j), axis=-1))
    idx_t = torch.argmin(torch.from_numpy(d_j), dim=-1).numpy()
    np.testing.assert_array_equal(idx_j, idx_t)
    assert idx_j[5] == 3  # exact-duplicate row -> lowest index wins


def test_vq_encode_fp32_invariant_to_input_dtype():
    """encode() must produce identical code indices for bf16 and fp32 inputs
    that round-trip exactly (bf16-representable values): the distance/argmin
    always runs in fp32."""
    key = jax.random.PRNGKey(3)
    vq = VectorQuantizeEMA(8, 32, key=key)
    x = jax.random.normal(key, (4, 16, 8)).astype(jnp.bfloat16)
    idx16 = vq.encode(x)
    idx32 = vq.encode(x.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(idx16), np.asarray(idx32))


def test_dead_code_expiry_small_batch_dynamics():
    """When a step supplies fewer vectors than codebook entries, a high
    expiry threshold re-seeds most codes every step (collapse); a threshold
    below the achievable steady-state EMA usage keeps far more codes alive
    (root cause of the at-scale codec silence collapse, round 2)."""
    def run(threshold, steps=100):
        vq = VectorQuantizeEMA(8, 1024, threshold_ema_dead_code=threshold,
                               key=jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        centers = jax.random.normal(jax.random.PRNGKey(42), (64, 8))

        @jax.jit
        def step(vq, key):
            k1, k2, key = jax.random.split(key, 3)
            x = centers[jax.random.randint(k1, (400,), 0, 64)] \
                + 0.05 * jax.random.normal(k2, (400, 8))
            _, idx, _, vq = vq(x, key=key, train=True)
            return vq, idx, key

        for _ in range(steps):
            vq, idx, key = step(vq, key)
        return len(np.unique(np.asarray(idx)))

    uniq_lo = run(0.25)
    uniq_hi = run(2.0)
    assert uniq_lo > uniq_hi * 1.5, (uniq_lo, uniq_hi)


def test_rotation_trick_gradient_scale_bounded():
    """Regression (round 2): the rotation-trick backward is scale*R with
    scale = ||q||/||x|| — unbounded on near-zero residuals, which exploded
    encoder grads 3e4x over decoder grads and collapsed every at-scale codec
    run. The clamped-gradient form must keep encoder/decoder grads within a
    sane ratio while the forward still returns exactly the quantized value."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_soundstream import tiny_soundstream
    from audiolm_pytorch_tpu.nn.module import combine, partition_trainable

    ss = tiny_soundstream()  # rotation_trick=True default
    params, rest = partition_trainable(ss)
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (2, 2000))

    def loss_fn(p):
        m = combine(p, rest)
        _, bd, _ = m(x, key=jax.random.PRNGKey(2), train=True,
                     return_loss_breakdown=True)
        return bd[0]  # recon term only

    grads = jax.grad(loss_fn)(params)
    from jax import tree_util
    norms = {tree_util.keystr(p): float(jnp.linalg.norm(g))
             for p, g in tree_util.tree_flatten_with_path(grads)[0]}
    enc = norms[".encoder_final.weight"]
    dec = norms[".decoder_final.weight"]
    assert enc < 100 * dec, (enc, dec)

    # forward exactness: rotation output equals the quantized vector
    from audiolm_pytorch_tpu.ops.quantize import _rotate_to
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    xs = 0.01 * jax.random.normal(k1, (32, 8))   # tiny norms -> clamped rows
    qs = jax.random.normal(k2, (32, 8))
    np.testing.assert_allclose(np.asarray(_rotate_to(xs, qs)), np.asarray(qs),
                               rtol=1e-5, atol=1e-5)


def test_double_ema_update_equals_decay_squared():
    """PARITY decision note (D-phase VQ-EMA cadence): re-running the EMA
    update on the SAME batch statistics at decay d — what matching the
    reference's D-phase train-mode forward would do under our shared-batch
    D step — is exactly one update at decay d^2. So the reference-matching
    knob is `rq_ema_decay`, not a second update (see PARITY.md)."""
    import jax
    import jax.numpy as jnp

    def make(decay):
        return VectorQuantizeEMA(4, 8, decay=decay, kmeans_init=False,
                                 threshold_ema_dead_code=0.0,
                                 key=jax.random.PRNGKey(0))

    flat = jax.random.normal(jax.random.PRNGKey(1), (32, 4))
    onehot = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(2), (32,), 0, 8), 8)

    twice = make(0.95)._ema_update(None, flat, onehot, None) \
        ._ema_update(None, flat, onehot, None)
    once_sq = make(0.95 ** 2)._ema_update(None, flat, onehot, None)
    np.testing.assert_allclose(np.asarray(twice.cluster_size.value),
                               np.asarray(once_sq.cluster_size.value),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(twice.embed_avg.value),
                               np.asarray(once_sq.embed_avg.value),
                               rtol=1e-6, atol=1e-6)
