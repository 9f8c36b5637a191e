"""EnCodec (Meta, 24 kHz) as a SoundStream-compatible JAX codec.

Replaces the reference's wrapper over the `encodec` pip package (reference:
audiolm_pytorch/encodec.py:25-177) with a native JAX implementation of the
EnCodec architecture (SEANet causal conv encoder/decoder with a 2-layer LSTM
bottleneck + residual VQ). `load_encodec_checkpoint` ports Meta's torch
weights (state-dict key mapping; torch-cpu deserialization only — no encodec
package at runtime). Without a checkpoint the module random-initializes with
identical shapes so the API stays exercisable offline.

SoundStream-compatible surface (reference: encodec.py:59-92):
`target_sample_hz`, `codebook_dim=128`, `rq_groups=1`, `num_quantizers`,
`seq_len_multiple_of`, `downsample_factor`, forward -> (emb, codes, None),
`decode_from_codebook_indices`.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.module import Buffer, Module
from ..nn.layers import exists
from ..ops.conv import CausalConv1d, CausalConvTranspose1d, causal_conv1d
from ..ops.resample import resample
from ..ops.sampling import curtail_to_multiple

__all__ = ["EncodecWrapper"]


class _LSTM(Module):
    """2-layer LSTM with residual skip (EnCodec SLSTM). Runs as lax.scan —
    sequential over frames (50 Hz), negligible next to the conv stacks."""

    def __init__(self, dim: int, layers: int = 2, *, key):
        self.cells = []
        for i in range(layers):
            k1, k2, key = jax.random.split(key, 3)
            lim = 1.0 / math.sqrt(dim)
            self.cells.append((
                jax.random.uniform(k1, (dim, 4 * dim), jnp.float32, -lim, lim),  # W_ih
                jax.random.uniform(k2, (dim, 4 * dim), jnp.float32, -lim, lim),  # W_hh
                jnp.zeros((4 * dim,)),  # b_ih
                jnp.zeros((4 * dim,)),  # b_hh
            ))
        self.dim = dim

    def __call__(self, x):  # (B, T, D)
        b, t, d = x.shape
        out = x
        for (wih, whh, bih, bhh) in self.cells:
            def step(carry, xt):
                h, c = carry
                gates = xt @ wih + h @ whh + bih + bhh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                c = f * c + i * jnp.tanh(g)
                h = o * jnp.tanh(c)
                return (h, c), h
            init = (jnp.zeros((b, d), out.dtype), jnp.zeros((b, d), out.dtype))
            _, ys = lax.scan(step, init, out.transpose(1, 0, 2))
            out = ys.transpose(1, 0, 2)
        return x + out  # skip connection


class _SEANetResBlock(Module):
    def __init__(self, dim: int, *, key):
        k1, k2, k3 = jax.random.split(key, 3)
        self.conv1 = CausalConv1d(dim, dim // 2, 3, key=k1)
        self.conv2 = CausalConv1d(dim // 2, dim, 1, key=k2)
        self.shortcut = CausalConv1d(dim, dim, 1, key=k3)

    def __call__(self, x):
        h = self.conv1(jax.nn.elu(x))
        h = self.conv2(jax.nn.elu(h))
        return self.shortcut(x) + h


class EncodecWrapper(Module):
    def __init__(self, *, target_sample_hz: int = 24000, strides=(2, 4, 5, 8),
                 channels: int = 32, codebook_dim: int = 128,
                 codebook_size: int = 1024, bandwidth: float = 6.0,
                 checkpoint_path: Optional[str] = None,
                 key: Optional[jax.Array] = None):
        from ..ops.quantize import ResidualVQ
        key = key if key is not None else jax.random.PRNGKey(0)
        keys = jax.random.split(key, 32)

        # bandwidth -> number of quantizers (reference: encodec.py:46-57:
        # 6 kbps @ 75 Hz, 10 bits/code -> 8 quantizers)
        frame_rate = target_sample_hz // int(np.prod(strides))
        bits_per_q = int(math.log2(codebook_size))
        self.num_quantizers = int(bandwidth * 1000 / (frame_rate * bits_per_q))

        self.target_sample_hz = target_sample_hz
        self.strides = tuple(strides)
        self.codebook_dim = codebook_dim
        self.codebook_size = codebook_size
        self.rq_groups = 1
        self.pretrained = False

        # SEANet encoder
        ch = channels
        ki = iter(range(32))
        self.enc_init = CausalConv1d(1, ch, 7, key=keys[next(ki)])
        self.enc_blocks = []
        for s in strides:
            self.enc_blocks.append((
                _SEANetResBlock(ch, key=keys[next(ki)]),
                CausalConv1d(ch, ch * 2, 2 * s, stride=s, key=keys[next(ki)]),
            ))
            ch *= 2
        self.enc_lstm = _LSTM(ch, key=keys[next(ki)])
        self.enc_final = CausalConv1d(ch, codebook_dim, 7, key=keys[next(ki)])

        # RVQ (EnCodec codebooks get copied in here, like the reference copies
        # them into vector-quantize-pytorch's ResidualVQ, encodec.py:70-84)
        self.rq = ResidualVQ(dim=codebook_dim, num_quantizers=self.num_quantizers,
                             codebook_size=codebook_size, kmeans_init=False,
                             quantize_dropout=False, key=keys[next(ki)])

        # SEANet decoder
        self.dec_init = CausalConv1d(codebook_dim, ch, 7, key=keys[next(ki)])
        self.dec_lstm = _LSTM(ch, key=keys[next(ki)])
        self.dec_blocks = []
        for s in reversed(strides):
            self.dec_blocks.append((
                CausalConvTranspose1d(ch, ch // 2, 2 * s, stride=s, key=keys[next(ki)]),
                _SEANetResBlock(ch // 2, key=keys[next(ki)]),
            ))
            ch //= 2
        self.dec_final = CausalConv1d(ch, 1, 7, key=keys[next(ki)])

        if exists(checkpoint_path):
            self.load_encodec_checkpoint(checkpoint_path)

    @property
    def seq_len_multiple_of(self):
        out = 1
        for s in self.strides:
            out *= s
        return out

    @property
    def downsample_factor(self):
        return self.seq_len_multiple_of

    def encode_frames(self, x):
        h = self.enc_init(x[..., None])
        for res, down in self.enc_blocks:
            h = down(jax.nn.elu(res(h)))
        h = self.enc_lstm(h)
        h = self.enc_final(jax.nn.elu(h))
        return h

    def decode_frames(self, h):
        h = self.dec_init(h)
        h = self.dec_lstm(h)
        for up, res in self.dec_blocks:
            h = res(up(jax.nn.elu(h)))
        return self.dec_final(jax.nn.elu(h))[..., 0]

    def __call__(self, x, *, return_encoded: bool = False, input_sample_hz=None,
                 **kwargs):
        """Mirrors the reference forward contract: returns (emb, codes, None)
        (reference: encodec.py:94-136)."""
        if x.ndim == 1:
            x = x[None]
        if exists(input_sample_hz):
            x = resample(x, input_sample_hz, self.target_sample_hz)
        x = curtail_to_multiple(x, self.seq_len_multiple_of)
        emb = self.encode_frames(x)
        q, codes, _, _ = self.rq(emb, train=False)
        if return_encoded:
            return q, codes, None
        return q, codes, None

    def tokenize(self, audio, input_sample_hz=None):
        _, codes, _ = self(audio, return_encoded=True, input_sample_hz=input_sample_hz)
        return codes

    def decode(self, emb, quantize: bool = False):
        if quantize:
            emb, *_ = self.rq(emb, train=False)
        return self.decode_frames(emb)

    def decode_from_codebook_indices(self, indices):
        """(B, N, Q) or (G=1, B, N, Q) -> waveform (B, T)
        (reference: encodec.py:138-177 — frame decode + overlap-add; our codec
        is single-segment causal so plain decode is exact)."""
        if indices.ndim == 4:
            indices = indices[0]
        emb = self.rq.get_output_from_indices(indices)
        return self.decode_frames(emb)

    def load_encodec_checkpoint(self, path):
        """Port Meta encodec_24khz torch weights by state-dict key name."""
        import torch
        ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
        sd = ckpt.get("best_state", ckpt.get("state_dict", ckpt))
        sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}

        def conv_w(name):
            # weight-normed conv: weight_g * weight_v / ||weight_v||
            g = sd.get(f"{name}.weight_g")
            v = sd.get(f"{name}.weight_v")
            if g is not None:
                w = g * v / (np.linalg.norm(v, axis=(1, 2), keepdims=True) + 1e-12)
            else:
                w = sd[f"{name}.weight"]
            return jnp.asarray(np.transpose(w, (2, 1, 0)))  # (k, in, out)

        def conv_b(name):
            b = sd.get(f"{name}.bias")
            return jnp.asarray(b) if b is not None else None

        # encoder: encodec SEANet layer indices
        # model.encoder.model = [conv, (res, conv)x4, lstm, elu, conv]
        def try_port():
            self.enc_init.weight = conv_w("encoder.model.0.conv.conv")
            self.enc_init.bias = conv_b("encoder.model.0.conv.conv")
            li = 1
            for (res, down) in self.enc_blocks:
                res.conv1.weight = conv_w(f"encoder.model.{li}.block.1.conv.conv")
                res.conv1.bias = conv_b(f"encoder.model.{li}.block.1.conv.conv")
                res.conv2.weight = conv_w(f"encoder.model.{li}.block.3.conv.conv")
                res.conv2.bias = conv_b(f"encoder.model.{li}.block.3.conv.conv")
                res.shortcut.weight = conv_w(f"encoder.model.{li}.shortcut.conv.conv")
                res.shortcut.bias = conv_b(f"encoder.model.{li}.shortcut.conv.conv")
                down.weight = conv_w(f"encoder.model.{li + 2}.conv.conv")
                down.bias = conv_b(f"encoder.model.{li + 2}.conv.conv")
                li += 3
            # lstm
            for j, cell in enumerate(self.enc_lstm.cells):
                wih = jnp.asarray(sd[f"encoder.model.{li}.lstm.weight_ih_l{j}"]).T
                whh = jnp.asarray(sd[f"encoder.model.{li}.lstm.weight_hh_l{j}"]).T
                bih = jnp.asarray(sd[f"encoder.model.{li}.lstm.bias_ih_l{j}"])
                bhh = jnp.asarray(sd[f"encoder.model.{li}.lstm.bias_hh_l{j}"])
                self.enc_lstm.cells[j] = (wih, whh, bih, bhh)
            self.enc_final.weight = conv_w(f"encoder.model.{li + 2}.conv.conv")
            self.enc_final.bias = conv_b(f"encoder.model.{li + 2}.conv.conv")
            # quantizer codebooks -> our RVQ buffers
            for qi, layer in enumerate(self.rq.layers):
                embed = jnp.asarray(sd[f"quantizer.vq.layers.{qi}._codebook.embed"])
                layer.codebook = Buffer(embed)
                layer.embed_avg = Buffer(embed.copy())
                layer.initted = Buffer(jnp.asarray(True))
            # decoder
            self.dec_init.weight = conv_w("decoder.model.0.conv.conv")
            self.dec_init.bias = conv_b("decoder.model.0.conv.conv")
            for j, cell in enumerate(self.dec_lstm.cells):
                wih = jnp.asarray(sd[f"decoder.model.1.lstm.weight_ih_l{j}"]).T
                whh = jnp.asarray(sd[f"decoder.model.1.lstm.weight_hh_l{j}"]).T
                bih = jnp.asarray(sd[f"decoder.model.1.lstm.bias_ih_l{j}"])
                bhh = jnp.asarray(sd[f"decoder.model.1.lstm.bias_hh_l{j}"])
                self.dec_lstm.cells[j] = (wih, whh, bih, bhh)
            li = 3
            for (up, res) in self.dec_blocks:
                w = sd.get(f"decoder.model.{li}.convtr.convtr.weight_v")
                g = sd.get(f"decoder.model.{li}.convtr.convtr.weight_g")
                if w is not None:
                    wn = g * w / (np.linalg.norm(w, axis=(1, 2), keepdims=True) + 1e-12)
                else:
                    wn = sd[f"decoder.model.{li}.convtr.convtr.weight"]
                # torch convT weight (in, out, k) -> ours (k, in, out)
                up.weight = jnp.asarray(np.transpose(wn, (2, 0, 1)))
                b = sd.get(f"decoder.model.{li}.convtr.convtr.bias")
                up.bias = jnp.asarray(b) if b is not None else up.bias
                res.conv1.weight = conv_w(f"decoder.model.{li + 2}.block.1.conv.conv")
                res.conv1.bias = conv_b(f"decoder.model.{li + 2}.block.1.conv.conv")
                res.conv2.weight = conv_w(f"decoder.model.{li + 2}.block.3.conv.conv")
                res.conv2.bias = conv_b(f"decoder.model.{li + 2}.block.3.conv.conv")
                res.shortcut.weight = conv_w(f"decoder.model.{li + 2}.shortcut.conv.conv")
                res.shortcut.bias = conv_b(f"decoder.model.{li + 2}.shortcut.conv.conv")
                li += 3
            self.dec_final.weight = conv_w(f"decoder.model.{li + 1}.conv.conv")
            self.dec_final.bias = conv_b(f"decoder.model.{li + 1}.conv.conv")

        try_port()
        self.pretrained = True
