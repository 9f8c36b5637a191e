"""Frozen-encoder adapters: T5, HuBERT+kmeans, vq-wav2vec, EnCodec."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiolm_pytorch_tpu.models.encodec import EncodecWrapper
from audiolm_pytorch_tpu.models.hubert import HubertWithKmeans
from audiolm_pytorch_tpu.models.t5 import (T5Encoder, get_encoded_dim,
                                           tokenize_text)
from audiolm_pytorch_tpu.models.vq_wav2vec import FairseqVQWav2Vec

KEY = jax.random.PRNGKey(0)


def test_t5_fallback_tokenizer_warns_once():
    """Hash-tokenizer fallback must loudly warn that conditioning is
    non-semantic (VERDICT r2 next-step 10); only fires once."""
    import warnings
    from audiolm_pytorch_tpu.models import t5 as t5_mod
    if t5_mod._get_tokenizer("google/t5-v1_1-small") is not None:
        pytest.skip("real tokenizer cached; fallback not in use")
    t5_mod._warned_fallback = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tokenize_text(["hello"])
        tokenize_text(["again"])
    runtime = [x for x in w if issubclass(x.category, RuntimeWarning)
               and "hash tokenizer" in str(x.message)]
    assert len(runtime) == 1


def test_t5_tokenize_and_encode():
    ids, mask = tokenize_text(["hello world", "a"])
    assert ids.shape[0] == 2 and mask.dtype == bool
    assert mask[1].sum() < mask[0].sum()
    enc = T5Encoder("google/t5-v1_1-small", load_pretrained=False, key=KEY)
    out = enc(jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape == (2, ids.shape[1], 512)
    # padding rows zeroed -> downstream mask recovery via any(!=0)
    rec_mask = np.asarray(jnp.any(out != 0, axis=-1))
    np.testing.assert_array_equal(rec_mask, np.asarray(mask))
    assert get_encoded_dim("google/t5-v1_1-base") == 768


def test_hubert_kmeans_shapes():
    hub = HubertWithKmeans(dim=48, num_layers=2, heads=4, output_layer=2,
                           codebook_size=32, key=KEY)
    wav = jax.random.normal(KEY, (2, 3200))
    ids = hub(wav, flatten=False)
    assert ids.shape[0] == 2 and ids.ndim == 2
    assert int(ids.max()) < 32
    # resampling path
    ids24 = hub(jax.random.normal(KEY, (2, 4800)), input_sample_hz=24000)
    assert ids24.shape[0] == 2
    assert hub.downsample_factor == 320


def test_vq_wav2vec_shapes():
    vq = FairseqVQWav2Vec(codebook_size=16, num_groups=2, key=KEY)
    wav = jax.random.normal(KEY, (2, 2400))
    ids = vq(wav, flatten=False)
    assert ids.shape[0] == 2 and ids.shape[-1] == 2
    flat = vq(wav, flatten=True)
    assert flat.shape == (2, ids.shape[1] * 2)
    # released encoder = 8 convs, total stride 160 (the reference hardcodes 80
    # with a "todo: double check" — vq_wav2vec.py:54-56)
    assert vq.groups == 2 and vq.downsample_factor == 160
    assert int(flat.max()) < 16


def test_vq_wav2vec_skip_and_logcompression_paths():
    vq = FairseqVQWav2Vec(
        conv_spec=((8, 10, 5), (8, 4, 2), (8, 1, 1)), codebook_size=12,
        num_groups=2, skip_connections=True, log_compression=True,
        combine_groups=True, key=KEY)
    assert vq.downsample_factor == 10
    ids = vq(jax.random.normal(KEY, (2, 400)), flatten=False)
    assert ids.shape[-1] == 2 and int(ids.max()) < 12


def test_encodec_wrapper_roundtrip():
    enc = EncodecWrapper(channels=4, codebook_dim=16, codebook_size=32,
                         strides=(2, 4), bandwidth=30.0, key=KEY)
    assert enc.num_quantizers == 2
    wav = 0.1 * jax.random.normal(KEY, (2, 512))
    emb, codes, none = enc(wav, return_encoded=True)
    assert none is None
    assert codes.shape[:2] == (2, 512 // 8)
    assert codes.shape[-1] == enc.num_quantizers
    out = enc.decode_from_codebook_indices(codes)
    assert out.shape == (2, 512)
    # tokenize contract
    codes2 = enc.tokenize(wav)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))


def test_encodec_default_config_matches_reference():
    enc = EncodecWrapper.__new__(EncodecWrapper)  # avoid heavy init
    # reference contract values (encodec.py:46-92)
    full = EncodecWrapper(channels=2, codebook_dim=8, codebook_size=1024,
                          key=KEY)
    assert full.num_quantizers == 8  # bandwidth 6.0 -> 8 quantizers
    assert full.target_sample_hz == 24000
    assert full.rq_groups == 1
    assert full.seq_len_multiple_of == 320
