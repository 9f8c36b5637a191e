"""vq-wav2vec semantic tokenizer, JAX-native.

Alternative to HuBERT+kmeans (reference: audiolm_pytorch/vq_wav2vec.py:19-81,
which wraps a fairseq checkpoint). Architecture: strided conv feature encoder
followed by a grouped (kmeans-style) vector quantizer whose per-group code ids
form the semantic token stream. `load_fairseq_checkpoint` converts fairseq's
torch state_dict by key name (torch-cpu deserialization only); without a
checkpoint the module random-initializes with the same API so the pipeline
remains runnable.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.module import Module
from ..nn.layers import exists
from ..ops.resample import resample
from ..ops.sampling import curtail_to_multiple

__all__ = ["FairseqVQWav2Vec"]

# vq-wav2vec conv encoder: (dim, kernel, stride) — total stride 80
_ENC_SPEC = ((512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2))


class _ConvBlock(Module):
    def __init__(self, cin, cout, k, stride, *, key):
        lim = 1.0 / math.sqrt(cin * k)
        self.weight = jax.random.uniform(key, (k, cin, cout), jnp.float32, -lim, lim)
        self.bias = jnp.zeros((cout,))
        self.stride = stride

    def __call__(self, x):
        y = lax.conv_general_dilated(
            x, self.weight.astype(x.dtype), (self.stride,), "VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        y = y + self.bias.astype(y.dtype)
        # per-channel instance norm over time + ReLU (fairseq norm="instance")
        m = jnp.mean(y, axis=1, keepdims=True)
        v = jnp.var(y, axis=1, keepdims=True)
        return jax.nn.relu((y - m) * jax.lax.rsqrt(v + 1e-5))


class FairseqVQWav2Vec(Module):
    """(API parity: reference vq_wav2vec.py:19-81 — `codebook_size`, `groups`,
    `downsample_factor`, `target_sample_hz`, forward -> grouped code ids)."""

    def __init__(self, checkpoint_path: Optional[str] = None, *,
                 target_sample_hz: int = 24000, codebook_size: int = 320,
                 num_groups: int = 2, dim: int = 512,
                 seq_len_multiple_of: Optional[int] = None,
                 key: Optional[jax.Array] = None):
        key = key if key is not None else jax.random.PRNGKey(0)
        keys = jax.random.split(key, len(_ENC_SPEC) + 1)
        self.encoder = []
        cin = 1
        for i, (cout, k, s) in enumerate(_ENC_SPEC):
            self.encoder.append(_ConvBlock(cin, cout, k, s, key=keys[i]))
            cin = cout
        assert dim % num_groups == 0
        self.codebook = 0.5 * jax.random.normal(
            keys[-1], (num_groups, codebook_size, dim // num_groups))
        self.target_sample_hz = target_sample_hz
        self.seq_len_multiple_of = seq_len_multiple_of
        self.num_groups = num_groups
        self.pretrained = False
        if exists(checkpoint_path):
            self.load_fairseq_checkpoint(checkpoint_path)

    @property
    def groups(self):
        return self.num_groups

    @property
    def downsample_factor(self):
        return 80  # product of encoder strides (reference vq_wav2vec.py:54-56)

    @property
    def codebook_size(self):
        return self.codebook.shape[1]

    def load_fairseq_checkpoint(self, path):
        import torch
        ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
        sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
        for i, blk in enumerate(self.encoder):
            wkey = f"feature_extractor.conv_layers.{i}.0.weight"
            if wkey in sd:
                blk.weight = jnp.asarray(np.transpose(sd[wkey], (2, 1, 0)))
                bkey = f"feature_extractor.conv_layers.{i}.0.bias"
                if bkey in sd:
                    blk.bias = jnp.asarray(sd[bkey])
        for cb_key in ("vector_quantizer.embedding", "vector_quantizer.vars"):
            if cb_key in sd:
                cb = np.asarray(sd[cb_key])
                g, c = self.num_groups, self.codebook.shape[1]
                self.codebook = jnp.asarray(cb.reshape(g, c, -1), jnp.float32)
                break
        self.pretrained = True

    def __call__(self, wav_input, flatten: bool = True, input_sample_hz=None):
        """(B, T) -> ids (B, frames, groups) or flattened (B, frames*groups)."""
        if exists(input_sample_hz):
            wav_input = resample(wav_input, input_sample_hz, self.target_sample_hz)
        if exists(self.seq_len_multiple_of):
            wav_input = curtail_to_multiple(wav_input, self.seq_len_multiple_of)
        x = wav_input[..., None]
        for blk in self.encoder:
            x = blk(x)
        b, n, d = x.shape
        xg = x.reshape(b, n, self.num_groups, d // self.num_groups).astype(jnp.float32)
        cb = self.codebook.astype(jnp.float32)  # (G, C, Dg)
        dist = (jnp.sum(xg * xg, -1, keepdims=True)
                - 2 * jnp.einsum("bngd,gcd->bngc", xg, cb)
                + jnp.sum(cb * cb, -1)[None, None])
        ids = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (B, N, G)
        if flatten:
            return ids.reshape(b, -1)
        return ids
