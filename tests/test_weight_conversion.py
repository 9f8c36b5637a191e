"""Weight-port converters exercised against synthetic torch state dicts with
the real checkpoint key layouts (fairseq HuBERT, Meta EnCodec, HF T5) —
validates every key mapping and transpose without network access."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)


def make_fairseq_hubert_sd(dim=48, layers=2, ff=96, conv_dim=512):
    """Synthetic fairseq hubert state dict (the keys load_fairseq_checkpoint maps)."""
    rng = np.random.default_rng(0)
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32) * 0.05)
    sd = {}
    spec = [(conv_dim, 10, 5)] + [(conv_dim, 3, 2)] * 4 + [(conv_dim, 2, 2)] * 2
    cin = 1
    for i, (cout, k, s) in enumerate(spec):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = t(cout, cin, k)
        if i == 0:
            sd[f"feature_extractor.conv_layers.{i}.2.weight"] = t(cout)
            sd[f"feature_extractor.conv_layers.{i}.2.bias"] = t(cout)
        cin = cout
    sd["post_extract_proj.weight"] = t(dim, conv_dim)
    sd["post_extract_proj.bias"] = t(dim)
    sd["layer_norm.weight"] = t(conv_dim)
    sd["layer_norm.bias"] = t(conv_dim)
    sd["encoder.pos_conv.0.weight_g"] = torch.ones(1, 1, 1)
    sd["encoder.pos_conv.0.weight_v"] = t(dim, dim // 16, 128)
    sd["encoder.pos_conv.0.bias"] = t(dim)
    sd["encoder.layer_norm.weight"] = t(dim)
    sd["encoder.layer_norm.bias"] = t(dim)
    for i in range(layers):
        p = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = t(dim, dim)
            sd[f"{p}.self_attn.{proj}.bias"] = t(dim)
        sd[f"{p}.self_attn_layer_norm.weight"] = t(dim)
        sd[f"{p}.self_attn_layer_norm.bias"] = t(dim)
        sd[f"{p}.fc1.weight"] = t(ff, dim)
        sd[f"{p}.fc1.bias"] = t(ff)
        sd[f"{p}.fc2.weight"] = t(dim, ff)
        sd[f"{p}.fc2.bias"] = t(dim)
        sd[f"{p}.final_layer_norm.weight"] = t(dim)
        sd[f"{p}.final_layer_norm.bias"] = t(dim)
    return sd


def test_hubert_fairseq_conversion(tmp_path):
    from audiolm_pytorch_tpu.models.hubert import HubertWithKmeans
    sd = make_fairseq_hubert_sd()
    path = tmp_path / "hubert.pt"
    torch.save({"model": sd}, path)

    hub = HubertWithKmeans(dim=48, num_layers=2, heads=4, output_layer=2, ff_dim=96,
                           codebook_size=16, key=KEY)
    before = hub.encoder.layers[0].fc1.weight.copy()
    hub.load_fairseq_checkpoint(path)
    assert hub.pretrained
    # weights actually changed and transposes are consistent
    assert not np.allclose(np.asarray(before),
                           np.asarray(hub.encoder.layers[0].fc1.weight))
    np.testing.assert_allclose(
        np.asarray(hub.encoder.layers[0].fc1.weight),
        sd["encoder.layers.0.fc1.weight"].numpy().T, rtol=1e-6)
    # converted model runs
    ids = hub(jax.random.normal(KEY, (1, 3200)))
    assert ids.shape[0] == 1 and np.isfinite(np.asarray(ids)).all()

    # kmeans centers from npy
    centers = np.random.default_rng(1).standard_normal((16, 48)).astype(np.float32)
    np.save(tmp_path / "km.npy", centers)
    hub.load_kmeans(tmp_path / "km.npy")
    np.testing.assert_allclose(np.asarray(hub.cluster_centers), centers)


def make_encodec_sd(channels=4, codebook_dim=16, codebook_size=32,
                    strides=(2, 4), num_q=2, lstm_dim=None):
    rng = np.random.default_rng(2)
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32) * 0.05)
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight_g"] = torch.ones(cout, 1, 1)
        sd[f"{name}.weight_v"] = t(cout, cin, k)
        sd[f"{name}.bias"] = t(cout)

    ch = channels
    conv("encoder.model.0.conv.conv", ch, 1, 7)
    li = 1
    for s in strides:
        conv(f"encoder.model.{li}.block.1.conv.conv", ch // 2, ch, 3)
        conv(f"encoder.model.{li}.block.3.conv.conv", ch, ch // 2, 1)
        conv(f"encoder.model.{li}.shortcut.conv.conv", ch, ch, 1)
        conv(f"encoder.model.{li + 2}.conv.conv", ch * 2, ch, 2 * s)
        ch *= 2
        li += 3
    for j in range(2):
        sd[f"encoder.model.{li}.lstm.weight_ih_l{j}"] = t(4 * ch, ch)
        sd[f"encoder.model.{li}.lstm.weight_hh_l{j}"] = t(4 * ch, ch)
        sd[f"encoder.model.{li}.lstm.bias_ih_l{j}"] = t(4 * ch)
        sd[f"encoder.model.{li}.lstm.bias_hh_l{j}"] = t(4 * ch)
    conv(f"encoder.model.{li + 2}.conv.conv", codebook_dim, ch, 7)

    for qi in range(num_q):
        sd[f"quantizer.vq.layers.{qi}._codebook.embed"] = t(codebook_size, codebook_dim)

    conv("decoder.model.0.conv.conv", ch, codebook_dim, 7)
    for j in range(2):
        sd[f"decoder.model.1.lstm.weight_ih_l{j}"] = t(4 * ch, ch)
        sd[f"decoder.model.1.lstm.weight_hh_l{j}"] = t(4 * ch, ch)
        sd[f"decoder.model.1.lstm.bias_ih_l{j}"] = t(4 * ch)
        sd[f"decoder.model.1.lstm.bias_hh_l{j}"] = t(4 * ch)
    li = 3
    for s in reversed(strides):
        sd[f"decoder.model.{li}.convtr.convtr.weight_g"] = torch.ones(ch, 1, 1)
        sd[f"decoder.model.{li}.convtr.convtr.weight_v"] = t(ch, ch // 2, 2 * s)
        sd[f"decoder.model.{li}.convtr.convtr.bias"] = t(ch // 2)
        conv(f"decoder.model.{li + 2}.block.1.conv.conv", ch // 4, ch // 2, 3)
        conv(f"decoder.model.{li + 2}.block.3.conv.conv", ch // 2, ch // 4, 1)
        conv(f"decoder.model.{li + 2}.shortcut.conv.conv", ch // 2, ch // 2, 1)
        ch //= 2
        li += 3
    conv(f"decoder.model.{li + 1}.conv.conv", 1, ch, 7)
    return sd


def test_encodec_conversion(tmp_path):
    from audiolm_pytorch_tpu.models.encodec import EncodecWrapper
    sd = make_encodec_sd()
    path = tmp_path / "encodec.th"
    torch.save({"best_state": sd}, path)

    enc = EncodecWrapper(channels=4, codebook_dim=16, codebook_size=32,
                         strides=(2, 4), bandwidth=30.0, key=KEY)
    assert enc.num_quantizers == 2
    enc.load_encodec_checkpoint(path)
    assert enc.pretrained
    # codebooks ported into our RVQ buffers
    np.testing.assert_allclose(
        np.asarray(enc.rq.layers[0].codebook.value),
        sd["quantizer.vq.layers.0._codebook.embed"].numpy(), rtol=1e-6)
    # converted model round-trips
    wav = 0.1 * jax.random.normal(KEY, (1, 256))
    _, codes, _ = enc(wav, return_encoded=True)
    out = enc.decode_from_codebook_indices(codes)
    assert out.shape == (1, 256) and np.isfinite(np.asarray(out)).all()


def test_t5_conversion_offline_guard():
    """Without a local HF cache the encoder must fall back cleanly."""
    from audiolm_pytorch_tpu.models.t5 import T5Encoder
    enc = T5Encoder("google/t5-v1_1-small", load_pretrained=True, key=KEY)
    assert enc.pretrained in (True, False)  # no crash either way


def test_t5_conversion_against_transformers():
    """Validate the T5 key mapping + architecture numerics against
    transformers' OWN T5EncoderModel (randomly initialized from T5Config — no
    network), per VERDICT r1 next-step 5. Reference frozen model:
    /root/reference/audiolm_pytorch/t5.py:31-110."""
    torch = pytest.importorskip("torch")
    from transformers import T5Config, T5EncoderModel
    from audiolm_pytorch_tpu.models.t5 import T5Encoder, T5_CONFIGS

    name = "google/t5-v1_1-small"
    c = T5_CONFIGS[name]
    cfg = T5Config(
        vocab_size=c["vocab"], d_model=c["dim"], d_kv=c["dim_head"],
        d_ff=c["ff"], num_layers=c["layers"], num_heads=c["heads"],
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
        use_cache=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = T5EncoderModel(cfg).eval()

    ours = T5Encoder(name, load_pretrained=False)
    ours.load_torch_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()})

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 1000, (2, 11)).astype(np.int32)
    mask = np.ones((2, 11), bool)
    mask[0, 8:] = False

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64))
                 ).last_hidden_state.numpy()
    got = np.asarray(ours(jnp.asarray(ids), jnp.asarray(mask)))
    # our contract zeroes padding rows (reference t5.py:103-108); compare the
    # valid positions numerically and the padded ones for the zeroing
    np.testing.assert_allclose(got[mask], ref[mask], rtol=2e-4, atol=2e-4)
    assert np.all(got[~mask] == 0.0)


def make_torch_vqw2v(spec=((8, 10, 5), (8, 4, 2), (8, 1, 1)), groups=2,
                     num_vars=12):
    """Torch replica of the fairseq Wav2VecModel pieces the reference uses
    (ConvFeatureExtractionModel + KmeansVectorQuantizer), with fairseq's
    exact module paths so the saved state dict has the real key layout."""
    import torch.nn as nn

    dim = spec[-1][0]

    class Replica(nn.Module):
        def __init__(self):
            super().__init__()
            convs = []
            cin = 1
            for cout, k, s in spec:
                convs.append(nn.Sequential(
                    nn.Conv1d(cin, cout, k, stride=s, bias=False),
                    nn.Dropout(0.0),
                    nn.GroupNorm(1, cout),
                    nn.ReLU()))
                cin = cout
            fe = nn.Module()
            fe.conv_layers = nn.ModuleList(convs)
            self.feature_extractor = fe
            vq = nn.Module()
            vq.projection = nn.Sequential(
                nn.Conv1d(dim, dim, 1, groups=groups, bias=False),
                nn.GroupNorm(groups, dim))
            vq.embedding = nn.Parameter(
                0.5 * torch.randn(num_vars, groups, dim // groups))
            self.vector_quantizer = vq
            self.groups = groups

        def forward(self, wav):
            x = wav.unsqueeze(1)
            for c in self.feature_extractor.conv_layers:
                x = c(x)
            ze = self.vector_quantizer.projection(x)  # (B, D, T)
            b, d, t = ze.shape
            g = self.groups
            ze_ = ze.view(b, g, d // g, t)
            emb = self.vector_quantizer.embedding  # (V, G, Dg)
            dist = ((ze_.unsqueeze(1) - emb[None, :, :, :, None]) ** 2
                    ).sum(3)  # (B, V, G, T)
            idx = dist.argmin(dim=1)  # (B, G, T)
            return x, idx.permute(0, 2, 1)  # features, ids (B, T, G)

    torch.manual_seed(3)
    return Replica().eval()


def test_vq_wav2vec_conversion_against_torch(tmp_path):
    """Full-checkpoint load of the fairseq vq-wav2vec layout + numeric parity
    of conv/groupnorm/grouped-projection/argmin against a torch replica
    (reference frozen model: /root/reference/audiolm_pytorch/vq_wav2vec.py:40-76)."""
    import argparse
    from audiolm_pytorch_tpu.models.vq_wav2vec import FairseqVQWav2Vec

    spec = ((8, 10, 5), (8, 4, 2), (8, 1, 1))
    ref = make_torch_vqw2v(spec=spec)
    args = argparse.Namespace(
        conv_feature_layers=str(list(spec)), vq_vars=12, vq_groups=2,
        log_compression=False, skip_connections_feat=False,
        residual_scale=0.5, activation="relu")
    path = tmp_path / "vq_wav2vec_kmeans.pt"
    torch.save({"args": args, "model": ref.state_dict()}, path)

    ours = FairseqVQWav2Vec(str(path), allow_pickle=True, key=KEY)
    assert ours.pretrained and ours.codebook_size == 12
    assert ours.downsample_factor == 10 and ours.groups == 2

    rng = np.random.default_rng(1)
    wav = rng.standard_normal((2, 500)).astype(np.float32)
    with torch.no_grad():
        feats_t, ids_t = ref(torch.from_numpy(wav))
    feats_j = ours._features(jnp.asarray(wav))
    np.testing.assert_allclose(
        np.asarray(feats_j), feats_t.numpy().transpose(0, 2, 1),
        rtol=2e-5, atol=2e-5)
    ids_j = ours(jnp.asarray(wav), flatten=False)
    np.testing.assert_array_equal(np.asarray(ids_j), ids_t.numpy())
    # flatten interleaves groups like the reference rearrange 'b t g -> b (t g)'
    flat = ours(jnp.asarray(wav))
    np.testing.assert_array_equal(
        np.asarray(flat), ids_t.numpy().reshape(2, -1))


def test_encodec_lstm_numerics_against_torch():
    """The SLSTM is the one EnCodec component whose conversion involves gate
    layout (torch packs [i|f|g|o] rows in weight_ih/hh): run our lax.scan LSTM
    against torch.nn.LSTM with the identical weights (reference frozen model:
    /root/reference/audiolm_pytorch/encodec.py:46; SLSTM = 2-layer LSTM with
    input skip)."""
    from audiolm_pytorch_tpu.models.encodec import _LSTM

    d = 12
    torch.manual_seed(0)
    ref = torch.nn.LSTM(d, d, num_layers=2, batch_first=True)

    ours = _LSTM(d, key=KEY)
    for j in range(2):
        ours.cells[j] = (
            jnp.asarray(getattr(ref, f"weight_ih_l{j}").detach().numpy()).T,
            jnp.asarray(getattr(ref, f"weight_hh_l{j}").detach().numpy()).T,
            jnp.asarray(getattr(ref, f"bias_ih_l{j}").detach().numpy()),
            jnp.asarray(getattr(ref, f"bias_hh_l{j}").detach().numpy()),
        )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 17, d)).astype(np.float32)
    with torch.no_grad():
        y_t, _ = ref(torch.from_numpy(x))
    y_t = x + y_t.numpy()  # EnCodec SLSTM skip connection
    y_j = np.asarray(ours(jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, rtol=2e-5, atol=2e-5)


def make_torch_hubert_replica(dim=48, layers=2, heads=4, ff=96,
                              pos_k=128, pos_groups=16):
    """Torch replica of the fairseq HuBERT encoder pieces (conv feature
    extractor, weight-normed positional conv with dim=2 norm like fairseq,
    post-norm transformer) with fairseq's exact state-dict key paths."""
    import torch.nn as nn

    spec = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
            (512, 3, 2), (512, 2, 2), (512, 2, 2))

    class Layer(nn.Module):
        def __init__(self):
            super().__init__()
            sa = nn.Module()
            sa.q_proj = nn.Linear(dim, dim)
            sa.k_proj = nn.Linear(dim, dim)
            sa.v_proj = nn.Linear(dim, dim)
            sa.out_proj = nn.Linear(dim, dim)
            self.self_attn = sa
            self.self_attn_layer_norm = nn.LayerNorm(dim)
            self.fc1 = nn.Linear(dim, ff)
            self.fc2 = nn.Linear(ff, dim)
            self.final_layer_norm = nn.LayerNorm(dim)

        def forward(self, x):
            b, n, d = x.shape
            dh = d // heads
            q = self.self_attn.q_proj(x).view(b, n, heads, dh).transpose(1, 2)
            k = self.self_attn.k_proj(x).view(b, n, heads, dh).transpose(1, 2)
            v = self.self_attn.v_proj(x).view(b, n, heads, dh).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) * dh ** -0.5, dim=-1)
            o = (a @ v).transpose(1, 2).reshape(b, n, d)
            x = self.self_attn_layer_norm(x + self.self_attn.out_proj(o))
            y = self.fc2(torch.nn.functional.gelu(self.fc1(x)))
            return self.final_layer_norm(x + y)

    class Replica(nn.Module):
        def __init__(self):
            super().__init__()
            convs = []
            cin = 1
            for i, (cout, kk, s) in enumerate(spec):
                mods = [nn.Conv1d(cin, cout, kk, stride=s, bias=False),
                        nn.Dropout(0.0)]
                if i == 0:
                    mods.append(nn.GroupNorm(cout, cout))
                mods.append(nn.GELU())
                convs.append(nn.Sequential(*mods))
                cin = cout
            fe = nn.Module()
            fe.conv_layers = nn.ModuleList(convs)
            self.feature_extractor = fe
            self.layer_norm = nn.LayerNorm(512)
            self.post_extract_proj = nn.Linear(512, dim)
            pc = nn.Conv1d(dim, dim, pos_k, padding=pos_k // 2,
                           groups=pos_groups)
            pc = nn.utils.weight_norm(pc, name="weight", dim=2)  # fairseq dim=2
            enc = nn.Module()
            enc.pos_conv = nn.Sequential(pc)
            enc.layer_norm = nn.LayerNorm(dim)
            enc.layers = nn.ModuleList([Layer() for _ in range(layers)])
            self.encoder = enc

        def forward(self, wav, output_layer):
            x = wav.unsqueeze(1)
            for c in self.feature_extractor.conv_layers:
                x = c(x)
            x = x.transpose(1, 2)
            x = self.layer_norm(x)
            x = self.post_extract_proj(x)
            pos = self.encoder.pos_conv(x.transpose(1, 2))
            if pos_k % 2 == 0:  # fairseq SamePad crops one for even kernels
                pos = pos[..., :-1]
            x = x + torch.nn.functional.gelu(pos.transpose(1, 2))
            x = self.encoder.layer_norm(x)
            for layer in self.encoder.layers[:output_layer]:
                x = layer(x)
            return x

    torch.manual_seed(5)
    return Replica().eval()


def test_hubert_numerics_against_torch(tmp_path):
    """Full-forward numeric parity of our JAX HuBERT encoder against a torch
    replica with fairseq's module paths — validates every transpose and the
    weight-norm reconstruction, not just key coverage (reference frozen model:
    /root/reference/audiolm_pytorch/hubert_kmeans.py:37-121)."""
    from audiolm_pytorch_tpu.models.hubert import HubertWithKmeans

    ref = make_torch_hubert_replica()
    path = tmp_path / "hubert_base_ls960.pt"
    torch.save({"model": ref.state_dict()}, path)

    hub = HubertWithKmeans(str(path), dim=48, num_layers=2, heads=4,
                           ff_dim=96, output_layer=2, codebook_size=16,
                           key=KEY)
    assert hub.pretrained

    rng = np.random.default_rng(7)
    wav = rng.standard_normal((2, 3200)).astype(np.float32)
    with torch.no_grad():
        feats_t = ref(torch.from_numpy(wav), output_layer=2).numpy()
    feats_j = np.asarray(hub.encoder.extract_features(jnp.asarray(wav), 2))
    np.testing.assert_allclose(feats_j, feats_t, rtol=2e-4, atol=2e-4)

    # cluster assignment against a plain numpy nearest-center computation
    centers = rng.standard_normal((16, 48)).astype(np.float32)
    np.save(tmp_path / "km.npy", centers)
    hub.load_kmeans(tmp_path / "km.npy")
    ids_j = np.asarray(hub(jnp.asarray(wav)))
    d = ((feats_t[..., None, :] - centers[None, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(ids_j, d.argmin(-1))
