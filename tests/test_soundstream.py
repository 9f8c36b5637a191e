import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolm_pytorch_tpu.models.soundstream import (
    AudioLMSoundStream, ComplexSTFTDiscriminator, MultiScaleDiscriminator,
    SoundStream, avg_pool1d,
)


def tiny_soundstream(key=None, **overrides):
    kwargs = dict(
        channels=8,
        strides=(2, 4),
        channel_mults=(2, 4),
        codebook_dim=32,
        codebook_size=64,
        rq_num_quantizers=4,
        attn_window_size=16,
        attn_heads=2,
        attn_dim_head=16,
        multi_spectral_window_powers_of_two=(6, 7),
        multi_spectral_n_ffts=128,
        multi_spectral_n_mels=32,
        multi_scale_discr_kwargs=dict(channels=4, layers=2, groups=(1, 2),
                                      chan_max=32),
        complex_stft_discr_kwargs=dict(channels=4, n_fft=128, hop_length=32,
                                       win_length=128,
                                       strides=((1, 2), (2, 2)),
                                       chan_mults=(1, 2)),
        key=key if key is not None else jax.random.PRNGKey(0),
    )
    kwargs.update(overrides)
    return SoundStream(**kwargs)


def test_encode_decode_shapes():
    ss = tiny_soundstream()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1024))
    emb = ss.encode_frames(x)
    assert emb.shape == (2, 128, 32)  # 1024 / 8 frames
    wave = ss.decode(emb)
    assert wave.shape == (2, 1024)


def test_tokenize_decode_contract():
    """README contract (reference README.md:100-113): decode_from_codebook_indices
    of tokenize == forward(return_recons_only=True) at eval."""
    ss = tiny_soundstream()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1024))
    codes = ss.tokenize(x)
    assert codes.shape == (1, 1, 128, 4)  # (G, B, N, Q)
    recon_from_codes = ss.decode_from_codebook_indices(codes)
    recon_direct = ss(x, return_recons_only=True)
    np.testing.assert_allclose(np.asarray(recon_from_codes),
                               np.asarray(recon_direct), rtol=1e-4, atol=1e-5)
    # 3-dim (B, N, G*Q) form also accepted
    flat = codes.transpose(1, 2, 0, 3).reshape(1, 128, 4)
    recon_flat = ss.decode_from_codebook_indices(flat)
    np.testing.assert_allclose(np.asarray(recon_flat),
                               np.asarray(recon_direct), rtol=1e-4, atol=1e-5)


def test_return_encoded():
    ss = tiny_soundstream()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 1024))
    emb, indices, commit = ss(x, return_encoded=True)
    assert emb.shape == (2, 128, 32)
    assert indices.shape == (2, 128, 4)


def test_gen_loss_and_grads():
    ss = tiny_soundstream()
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (1, 1024))
    total, breakdown, new_ss = ss(x, key=jax.random.PRNGKey(5), train=True,
                                  return_loss_breakdown=True)
    assert jnp.isfinite(total)
    recon, mel, mstft, sisnr, adv, feat, commit = breakdown
    assert all(jnp.isfinite(v) for v in breakdown)
    # rq EMA state updated
    assert bool(new_ss.rq.rvqs[0].layers[0].initted.value)


def test_discr_loss():
    ss = tiny_soundstream()
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (1, 1024))
    d = ss(x, key=jax.random.PRNGKey(7), return_discr_loss=True)
    assert jnp.isfinite(d)
    sep = ss(x, key=jax.random.PRNGKey(7), return_discr_loss=True,
             return_discr_losses_separately=True)
    names = [k for k, _ in sep]
    assert "stft" in names and any(n.startswith("scale:") for n in names)


def test_discr_grad_penalty():
    ss = tiny_soundstream()
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(8), (1, 1024))
    d = ss(x, key=jax.random.PRNGKey(9), return_discr_loss=True,
           apply_grad_penalty=True)
    assert jnp.isfinite(d)


def test_multi_scale_discriminator():
    d = MultiScaleDiscriminator(key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1024))
    out, inter = d(x, return_intermediates=True)
    assert out.shape[0] == 2 and len(inter) == 4


def test_complex_stft_discriminator():
    d = ComplexSTFTDiscriminator(key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1024))
    out, inter = d(x, return_intermediates=True)
    assert out.shape[0] == 2 and len(inter) == 7


def test_avg_pool1d_matches_torch():
    import torch
    x = np.random.default_rng(0).standard_normal((2, 64)).astype(np.float32)
    y = avg_pool1d(jnp.asarray(x), 4, 2, 2)
    yt = torch.nn.AvgPool1d(4, stride=2, padding=2)(torch.from_numpy(x)[:, None]).numpy()[:, 0]
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-5, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    ss = tiny_soundstream()
    p = tmp_path / "ss.npz"
    ss.save(p)
    ss2 = SoundStream.init_and_load_from(p)
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 1024))
    np.testing.assert_allclose(np.asarray(ss(x, return_recons_only=True)),
                               np.asarray(ss2(x, return_recons_only=True)),
                               rtol=1e-5, atol=1e-6)


def test_process_input_resample_and_curtail():
    ss = tiny_soundstream()
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 1500))
    out = ss.process_input(x)
    assert out.shape[-1] == 1496  # curtailed to multiple of 8
    out2 = ss.process_input(x, input_sample_hz=24000)  # resample 24k->16k = 1000
    assert out2.shape[-1] == 1000


def test_presets():
    ss = AudioLMSoundStream(channels=4, channel_mults=(2, 4, 4, 4),
                            codebook_dim=16, codebook_size=32,
                            attn_window_size=8, attn_heads=2, attn_dim_head=8,
                            multi_spectral_window_powers_of_two=(6,),
                            key=jax.random.PRNGKey(0))
    assert ss.seq_len_multiple_of == 320
    assert ss.num_quantizers == 12


def test_rq_kwargs_override_dead_code_threshold():
    """SoundStream's hardcoded rq defaults must be overridable through
    rq_kwargs (needed when batch*frames < codebook_size — see the expiry
    note at the rq construction site)."""
    ss = tiny_soundstream(rq_kwargs=dict(threshold_ema_dead_code=0.25))
    layers = ss.rq.rvqs[0].layers if hasattr(ss.rq, "rvqs") else ss.rq.layers
    assert layers[0].threshold_ema_dead_code == 0.25
    # and the config self-persists the override
    assert dict(ss.configs)["rq_kwargs"]["threshold_ema_dead_code"] == 0.25


def test_load_prefer_ema_flag(tmp_path):
    """Trainer checkpoints hold raw + EMA weights; `prefer_ema=False` must
    pick the RAW subtree (mid-anneal the EMA shadow lags by several dB —
    NOTES round-3/4; the reference always prefers EMA, soundstream.py:745)."""
    import jax.tree_util as jtu

    from audiolm_pytorch_tpu.training.checkpoint import save_pytree
    from audiolm_pytorch_tpu.training.ema import EMAState

    ss = tiny_soundstream()
    bump = lambda a: a + 1.0 if jnp.issubdtype(a.dtype, jnp.floating) else a
    ema = jtu.tree_map(bump, ss)
    p = tmp_path / "trainer.ckpt.npz"
    save_pytree(p, {"model": ss,
                    "ema": EMAState(shadow=ema, step=jnp.asarray(5)),
                    "steps": jnp.asarray(5, jnp.int32)})
    got_ema = ss.load(p)  # default: EMA preferred (reference semantics)
    got_raw = ss.load(p, prefer_ema=False)
    for name, g, e, w in zip(range(10**9), jtu.tree_leaves(got_raw),
                             jtu.tree_leaves(got_ema), jtu.tree_leaves(ss)):
        if not jnp.issubdtype(w.dtype, jnp.floating):
            continue
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(e), np.asarray(w) + 1.0,
                                   rtol=1e-6)
