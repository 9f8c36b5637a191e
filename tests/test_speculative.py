"""Speculative multi-quantizer decode equivalence (VERDICT r2 next-step 7).

At temperature→0 sampling is deterministic argmax, so the speculative
draft-verify sampler must produce token-identical output to the sequential
sampler (reference nested loop: audiolm_pytorch.py:1677-1706) — including
forced-mismatch paths, because the verify pass resamples from the true
prefix-conditioned logits with the same per-position key."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolm_pytorch_tpu.models.lm import CoarseTransformer, FineTransformer
from audiolm_pytorch_tpu.models.wrappers import (CoarseTransformerWrapper,
                                                 FineTransformerWrapper)

KEY = jax.random.PRNGKey(0)
TEMP = 1e-8  # temperature -> 0: gumbel noise vanishes, sampling = argmax


@pytest.fixture(scope="module")
def coarse_wrapper():
    tr = CoarseTransformer(codebook_size=24, num_coarse_quantizers=3,
                           num_semantic_tokens=20, dim=32, depth=2, heads=4,
                           dim_head=8, num_residual_streams=1, cond_dim=32,
                           flash_attn=False, key=KEY)
    return CoarseTransformerWrapper(transformer=tr, unique_consecutive=False)


@pytest.fixture(scope="module")
def fine_wrapper():
    tr = FineTransformer(num_coarse_quantizers=3, num_fine_quantizers=5,
                         codebook_size=24, dim=32, depth=2, heads=4,
                         dim_head=8, num_residual_streams=1, cond_dim=32,
                         flash_attn=False, key=KEY)
    return FineTransformerWrapper(transformer=tr)


@pytest.mark.parametrize("batch", [1, 2])
def test_coarse_speculative_matches_sequential(coarse_wrapper, batch):
    sem = jax.random.randint(jax.random.PRNGKey(3), (batch, 6), 0, 20)
    kw = dict(semantic_token_ids=sem, max_time_steps=5, cond_scale=1.0,
              temperature=TEMP, key=jax.random.PRNGKey(5))
    seq = coarse_wrapper.generate(speculative=False, **kw)
    spec = coarse_wrapper.generate(speculative=True, **kw)
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(seq))


def test_coarse_speculative_with_aligned_prime(coarse_wrapper):
    sem = jax.random.randint(jax.random.PRNGKey(4), (1, 6), 0, 20)
    prime = jax.random.randint(jax.random.PRNGKey(6), (1, 2, 3), 0, 24)
    kw = dict(semantic_token_ids=sem, prime_coarse_token_ids=prime,
              max_time_steps=4, cond_scale=1.0, temperature=TEMP,
              key=jax.random.PRNGKey(7))
    seq = coarse_wrapper.generate(speculative=False, **kw)
    spec = coarse_wrapper.generate(speculative=True, **kw)
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(seq))


@pytest.mark.parametrize("batch", [1, 2])
def test_fine_speculative_matches_sequential(fine_wrapper, batch):
    coarse = jax.random.randint(jax.random.PRNGKey(8), (batch, 4, 3), 0, 24)
    kw = dict(coarse_token_ids=coarse, cond_scale=1.0, temperature=TEMP,
              key=jax.random.PRNGKey(9))
    seq = fine_wrapper.generate(speculative=False, **kw)
    spec = fine_wrapper.generate(speculative=True, **kw)
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(seq))


def test_coarse_speculative_nonzero_temperature_valid(coarse_wrapper):
    """At temperature 1 the streams differ (different key consumption), but
    the speculative output must still be structurally valid tokens."""
    sem = jax.random.randint(jax.random.PRNGKey(10), (2, 6), 0, 20)
    out = coarse_wrapper.generate(semantic_token_ids=sem, max_time_steps=5,
                                  cond_scale=1.0, temperature=1.0,
                                  speculative=True, key=jax.random.PRNGKey(11))
    arr = np.asarray(out)
    assert arr.shape == (2, 5, 3)
    assert ((arr >= -1) & (arr < 25)).all()


def test_spec_stats_reported(coarse_wrapper, fine_wrapper):
    """return_spec_stats exposes (accepted, steps): at temperature->0 the
    acceptance rate is well-defined and bounded by steps * Q; the sequential
    sampler reports stats=None passthrough shape (VERDICT r3 weak #4)."""
    sem = jax.random.randint(jax.random.PRNGKey(12), (1, 6), 0, 20)
    out, stats = coarse_wrapper.generate(
        semantic_token_ids=sem, max_time_steps=5, cond_scale=1.0,
        temperature=TEMP, speculative=True, return_spec_stats=True,
        key=jax.random.PRNGKey(13))
    assert out.shape == (1, 5, 3)
    acc, steps, q = int(stats["accepted"]), int(stats["steps"]), stats["num_q"]
    assert q == 3 and 1 <= steps <= 5
    assert steps <= acc <= steps * q  # token 0 of each step always accepted
    coarse = jax.random.randint(jax.random.PRNGKey(14), (1, 4, 3), 0, 24)
    fout, fstats = fine_wrapper.generate(
        coarse_token_ids=coarse, cond_scale=1.0, temperature=TEMP,
        speculative=True, return_spec_stats=True, key=jax.random.PRNGKey(15))
    facc, fsteps = int(fstats["accepted"]), int(fstats["steps"])
    assert fsteps == 4 and fsteps <= facc <= fsteps * fstats["num_q"]
    # non-speculative: stats is None
    out2, stats2 = coarse_wrapper.generate(
        semantic_token_ids=sem, max_time_steps=5, cond_scale=1.0,
        temperature=TEMP, speculative=False, return_spec_stats=True,
        key=jax.random.PRNGKey(13))
    assert stats2 is None and out2.shape == (1, 5, 3)
