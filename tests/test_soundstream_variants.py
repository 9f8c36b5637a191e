"""SoundStream variant coverage: LFQ/FSQ bottlenecks, grouped RVQ, gateloop
layers, FiLM denoising, and a short overfit run (training dynamics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolm_pytorch_tpu.models.soundstream import SoundStream
from tests.test_soundstream import tiny_soundstream

KEY = jax.random.PRNGKey(0)


def test_lfq_soundstream_roundtrip():
    ss = tiny_soundstream(use_lookup_free_quantizer=True, codebook_size=64)
    x = 0.1 * jax.random.normal(KEY, (1, 1024))
    codes = ss.tokenize(x)
    recon = ss.decode_from_codebook_indices(codes)
    direct = ss(x, return_recons_only=True)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)


def test_fsq_soundstream_roundtrip():
    ss = tiny_soundstream(use_finite_scalar_quantizer=True, codebook_size=None,
                          finite_scalar_quantizer_levels=[5, 5, 5])
    assert ss.codebook_size == 125
    x = 0.1 * jax.random.normal(KEY, (1, 1024))
    codes = ss.tokenize(x)
    recon = ss.decode_from_codebook_indices(codes)
    direct = ss(x, return_recons_only=True)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)
    # FSQ has no aux loss (reference: soundstream.py:839-845)
    total, breakdown, _ = ss(x, key=KEY, train=True, return_loss_breakdown=True)
    assert float(breakdown[-1]) == 0.0


def test_grouped_rvq_soundstream():
    ss = tiny_soundstream(rq_groups=2, codebook_dim=32)
    x = 0.1 * jax.random.normal(KEY, (2, 1024))
    codes = ss.tokenize(x)
    assert codes.shape == (2, 2, 128, 4)  # (G, B, N, Q)
    recon = ss.decode_from_codebook_indices(codes)
    direct = ss(x, return_recons_only=True)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)
    # flattened (B, N, G*Q) form
    flat = codes.transpose(1, 2, 0, 3).reshape(2, 128, 8)
    recon2 = ss.decode_from_codebook_indices(flat)
    np.testing.assert_allclose(np.asarray(recon2), np.asarray(direct),
                               rtol=1e-4, atol=1e-5)
    # return_encoded emits the flattened layout used by the coarse/fine wrappers
    _, idx, _ = ss(x, return_encoded=True)
    assert idx.shape == (2, 128, 8)


def test_gateloop_soundstream():
    ss = tiny_soundstream(use_gate_loop_layers=True)
    x = 0.1 * jax.random.normal(KEY, (1, 1024))
    recon = ss(x, return_recons_only=True)
    assert recon.shape == (1, 1024)
    assert bool(jnp.all(jnp.isfinite(recon)))


def test_film_denoising_forward():
    ss = tiny_soundstream()
    noisy = 0.2 * jax.random.normal(KEY, (1, 1024))
    clean = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (1, 1024))
    total, breakdown, _ = ss(noisy, key=KEY, train=True, target=clean,
                             is_denoising=True, return_loss_breakdown=True)
    assert jnp.isfinite(total)
    total2, _, _ = ss(noisy, key=KEY, train=True, target=clean,
                      is_denoising=False, return_loss_breakdown=True)
    assert jnp.isfinite(total2)


@pytest.mark.slow
def test_codec_overfits_sine():
    """Training dynamics: ~40 generator-only steps on one sine should cut the
    recon loss well below its starting value (EMA-VQ + rotation trick learn)."""
    import optax
    from audiolm_pytorch_tpu.nn.module import (combine, evolve,
                                               partition_buffers,
                                               partition_trainable_where)
    ss = tiny_soundstream(multi_spectral_window_powers_of_two=(6,))
    t = np.arange(1024) / 16000.0
    x = jnp.asarray(0.5 * np.sin(2 * np.pi * 440 * t), jnp.float32)[None]

    tx = optax.adam(2e-3)
    not_discr = lambda p: not p.startswith(("discriminators", "stft_discriminator"))

    @jax.jit
    def step(params, rest, opt_state, key):
        def loss_fn(p):
            model = combine(p, rest)
            total, bd, new_model = model(x, key=key, train=True,
                                         return_loss_breakdown=True)
            bufs, _ = partition_buffers(new_model.rq)
            return bd[0], bufs  # recon loss only: isolate AE learning
        (recon, bufs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, bufs, recon

    params, rest = partition_trainable_where(ss, not_discr)
    opt_state = tx.init(params)
    key = KEY
    first = None
    for i in range(40):
        key, k = jax.random.split(key)
        params, opt_state, bufs, recon = step(params, rest, opt_state, k)
        # merge VQ buffers back
        model = combine(params, rest)
        _, rq_nonbuf = partition_buffers(model.rq)
        model = evolve(model, rq=combine(bufs, rq_nonbuf))
        params, rest = partition_trainable_where(model, not_discr)
        if first is None:
            first = float(recon)
    last = float(recon)
    assert last < first * 0.5, (first, last)


def test_multi_stft_phase_aware_loss():
    """The round-4 phase-aware MR-STFT loss: zero at identity, strictly
    positive under a pure phase shift (which waveform-magnitude/mel losses
    cannot see), finite grads, and wired into the breakdown (position 2)."""
    ss = tiny_soundstream(multi_stft_recon_loss_weight=0.1,
                          multi_stft_resolutions=((128, 32, 128),
                                                  (256, 64, 256)))
    t = np.arange(2048) / 16000.0
    a = jnp.asarray(np.sin(2 * np.pi * 220 * t), jnp.float32)[None]
    shifted = jnp.asarray(np.sin(2 * np.pi * 220 * t + 1.0), jnp.float32)[None]
    l_same = float(ss._multi_stft_loss(a, a))
    l_shift = float(ss._multi_stft_loss(a, shifted))
    assert l_same < 1e-5
    assert l_shift > 0.1  # the complex term sees the phase error
    g = jax.grad(lambda r: ss._multi_stft_loss(a, r))(shifted)
    assert bool(jnp.all(jnp.isfinite(g)))
    x = 0.1 * jax.random.normal(KEY, (1, 1024))
    total, bd, _ = ss(x, key=KEY, train=True, return_loss_breakdown=True)
    assert len(bd) == 7 and jnp.isfinite(bd[2]) and float(bd[2]) > 0


def test_si_snr_loss_term():
    """Round-5 quality lever: negative per-clip SI-SNR as a training loss.
    Scale-invariant (halving the recon amplitude costs nothing), phase-
    sensitive (a phase-shifted tone is penalized), finite grads, wired into
    the breakdown (position 3). No reference counterpart — the reference
    trains MSE + mel only (soundstream.py:927-995)."""
    ss = tiny_soundstream(si_snr_loss_weight=0.05)
    x = 0.1 * jax.random.normal(KEY, (2, 1024))
    total, bd, _ = ss(x, key=KEY, train=True, return_loss_breakdown=True)
    assert len(bd) == 7 and jnp.isfinite(bd[3])
    # the term is -mean(si_snr): random recon => strongly positive loss
    assert float(bd[3]) > 5.0

    def loss_fn(inp):
        t, _ = ss(inp, key=KEY, train=True)
        return t
    g = jax.grad(loss_fn)(x)  # backward through decode+si_snr is finite
    assert bool(jnp.all(jnp.isfinite(g)))
