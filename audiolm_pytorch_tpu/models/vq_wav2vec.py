"""vq-wav2vec semantic tokenizer, JAX-native.

Alternative to HuBERT+kmeans (reference: audiolm_pytorch/vq_wav2vec.py:19-81,
which wraps a fairseq checkpoint). This is a full reimplementation of the
fairseq `Wav2VecModel` pieces the reference actually uses:

- ``ConvFeatureExtractionModel``: stack of Conv1d(bias=False) -> Dropout ->
  GroupNorm(1 group, fp32) -> ReLU blocks, optional same-channel skip
  connections scaled by sqrt(residual_scale), optional log(|x|+1) compression.
  The released vq-wav2vec kmeans model uses the 8-layer spec below
  (kernels 10,8,4,4,4,1,1,1 / strides 5,4,2,2,2,1,1,1 — total stride 160).
- ``KmeansVectorQuantizer``: grouped 1x1 projection -> GroupNorm(groups),
  then per-group L2 argmin against an (num_vars, groups, var_dim) codebook
  (optionally shared across groups via ``combine_groups``).

``load_fairseq_checkpoint`` converts fairseq's torch checkpoint by key name
(torch-cpu deserialization only) and re-configures the architecture from the
checkpoint's saved args, so the real released `vq-wav2vec_kmeans.pt` loads
without hand-tuning. Without a checkpoint the module random-initializes with
the same API so the pipeline remains runnable.

Note: the reference hardcodes ``downsample_factor = 80`` with a
"todo: double check architecture" comment (vq_wav2vec.py:54-56); the actual
released encoder downsamples by 160. We compute it from the conv strides.
"""
from __future__ import annotations

import ast
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..nn.module import Module
from ..nn.layers import exists
from ..ops.resample import resample
from ..ops.sampling import curtail_to_multiple

__all__ = ["FairseqVQWav2Vec"]

# released vq-wav2vec (kmeans) conv encoder — total stride 160
_VQW2V_ENC_SPEC = ((512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2),
                   (512, 4, 2), (512, 1, 1), (512, 1, 1), (512, 1, 1))


def _group_norm(x, num_groups: int, weight, bias, eps: float = 1e-5):
    """fairseq Fp32GroupNorm over (B, T, C) channels-last input.

    GroupNorm normalizes each sample over (group-channels x time) jointly,
    always in fp32 (fairseq wraps nn.GroupNorm in an fp32 cast)."""
    b, t, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, t, num_groups, c // num_groups)
    m = jnp.mean(xg, axis=(1, 3), keepdims=True)
    v = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - m) * lax.rsqrt(v + eps)
    y = xg.reshape(b, t, c)
    if weight is not None:
        y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class _ConvBlock(Module):
    """Conv1d(bias=False) -> GroupNorm(1, C, fp32) -> ReLU (fairseq
    wav2vec.py ConvFeatureExtractionModel.block; dropout=0 at inference)."""

    def __init__(self, cin, cout, k, stride, *, affine=True, key):
        lim = 1.0 / math.sqrt(cin * k)
        self.weight = jax.random.uniform(key, (k, cin, cout), jnp.float32, -lim, lim)
        self.norm_weight = jnp.ones((cout,)) if affine else None
        self.norm_bias = jnp.zeros((cout,)) if affine else None
        self.stride = stride

    def __call__(self, x):
        y = lax.conv_general_dilated(
            x, self.weight.astype(x.dtype), (self.stride,), "VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        y = _group_norm(y, 1, self.norm_weight, self.norm_bias)
        return jax.nn.relu(y)


class _KmeansVQ(Module):
    """fairseq KmeansVectorQuantizer (modules/kmeans_vector_quantizer.py):
    grouped 1x1 conv projection (no bias) -> GroupNorm(groups) -> per-group
    nearest-codeword ids."""

    def __init__(self, dim, num_vars, groups, combine_groups, *, key):
        var_dim = dim // groups
        k1, k2 = jax.random.split(key)
        num_banks = 1 if combine_groups else groups
        self.embedding = 0.01 * jax.random.normal(k1, (num_vars, num_banks, var_dim))
        # grouped conv1x1: torch weight (dim, dim/groups, 1) -> per-group (Dg, Dg)
        lim = 1.0 / math.sqrt(var_dim)
        self.proj_weight = jax.random.uniform(k2, (groups, var_dim, var_dim),
                                              jnp.float32, -lim, lim)
        self.norm_weight = jnp.ones((dim,))
        self.norm_bias = jnp.zeros((dim,))
        self.groups = groups
        self.combine_groups = combine_groups

    @property
    def num_vars(self):
        return self.embedding.shape[0]

    def __call__(self, x):
        """x: (B, T, D) -> ids (B, T, G)."""
        b, t, d = x.shape
        g = self.groups
        xg = x.reshape(b, t, g, d // g).astype(jnp.float32)
        ze = jnp.einsum("btgd,gde->btge", xg, self.proj_weight.astype(jnp.float32))
        ze = _group_norm(ze.reshape(b, t, d), g, self.norm_weight,
                         self.norm_bias).reshape(b, t, g, d // g)
        cb = self.embedding.astype(jnp.float32)  # (V, banks, Dg)
        if self.combine_groups:
            cb = jnp.broadcast_to(cb, (cb.shape[0], g, cb.shape[2]))
        dist = (jnp.sum(ze * ze, -1)[..., None]                  # (B,T,G,1)
                - 2 * jnp.einsum("btgd,vgd->btgv", ze, cb)       # (B,T,G,V)
                + jnp.sum(cb * cb, -1).T[None, None])            # (1,1,G,V)
        return jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (B, T, G)


class FairseqVQWav2Vec(Module):
    """(API parity: reference vq_wav2vec.py:19-81 — `codebook_size`, `groups`,
    `downsample_factor`, `target_sample_hz`, forward -> grouped code ids)."""

    def __init__(self, checkpoint_path: Optional[str] = None, *,
                 target_sample_hz: int = 24000,
                 conv_spec: Sequence[Tuple[int, int, int]] = _VQW2V_ENC_SPEC,
                 codebook_size: int = 320, num_groups: int = 2,
                 combine_groups: bool = False, skip_connections: bool = False,
                 residual_scale: float = 0.5, log_compression: bool = False,
                 seq_len_multiple_of: Optional[int] = None,
                 allow_pickle: bool = False,
                 key: Optional[jax.Array] = None):
        key = key if key is not None else jax.random.PRNGKey(0)
        self._build(conv_spec, codebook_size, num_groups, combine_groups, key)
        self.skip_connections = skip_connections
        self.residual_scale = math.sqrt(residual_scale)
        self.log_compression = log_compression
        self.target_sample_hz = target_sample_hz
        self.seq_len_multiple_of = seq_len_multiple_of
        self.pretrained = False
        if exists(checkpoint_path):
            self.load_fairseq_checkpoint(checkpoint_path,
                                         allow_pickle=allow_pickle)

    def _build(self, conv_spec, codebook_size, num_groups, combine_groups, key):
        conv_spec = tuple(tuple(s) for s in conv_spec)
        keys = jax.random.split(key, len(conv_spec) + 1)
        self.encoder = []
        cin = 1
        for i, (cout, k, s) in enumerate(conv_spec):
            self.encoder.append(_ConvBlock(cin, cout, k, s, key=keys[i]))
            cin = cout
        assert cin % num_groups == 0
        self.vq = _KmeansVQ(cin, codebook_size, num_groups, combine_groups,
                            key=keys[-1])
        self.conv_spec = conv_spec
        self.num_groups = num_groups

    @property
    def groups(self):
        return self.num_groups

    @property
    def downsample_factor(self):
        # product of encoder strides (reference vq_wav2vec.py:54-56 hardcodes
        # 80 with a "todo: double check" — the released encoder is 160)
        out = 1
        for _, _, s in self.conv_spec:
            out *= s
        return out

    @property
    def codebook_size(self):
        return self.vq.num_vars

    def load_fairseq_checkpoint(self, path, *, allow_pickle: bool = False):
        """Load a fairseq vq-wav2vec checkpoint.

        TRUST NOTE (ADVICE r3): real fairseq checkpoints always carry a
        pickled argparse.Namespace in `args`, so weights_only=True fails on
        every one of them and an automatic fallback would silently run
        arbitrary pickled code for malicious files too. The unsafe path is
        therefore gated behind an EXPLICIT opt-in: pass allow_pickle=True
        only for checkpoints from sources you trust. Without it, loading
        still works for safe (weights-only) archives and otherwise raises
        with a clear message instead of auto-degrading."""
        import torch
        try:
            ckpt = torch.load(str(path), map_location="cpu", weights_only=True)
        except Exception as e:
            if not allow_pickle:
                raise RuntimeError(
                    f"{path} requires unpickling arbitrary objects (fairseq "
                    "stores args as a pickled Namespace). If you trust this "
                    "file, call load_fairseq_checkpoint(path, "
                    "allow_pickle=True).") from e
            ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
        args = ckpt.get("args")
        sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
        sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
                  np.asarray(v)) for k, v in sd.items()}

        # re-configure architecture from the checkpoint's saved args
        if args is not None:
            get = lambda n, d: getattr(args, n, d)
            spec = get("conv_feature_layers", None)
            spec = ast.literal_eval(spec) if isinstance(spec, str) \
                else (spec or _VQW2V_ENC_SPEC)
            emb = sd.get("vector_quantizer.embedding")
            num_vars = emb.shape[0] if emb is not None else int(get("vq_vars", 320))
            groups = int(get("vq_groups", 2))
            combine = (emb is not None and emb.shape[1] == 1 and groups > 1) \
                or bool(get("combine_groups", False))
            self._build(spec, num_vars, groups, combine, jax.random.PRNGKey(0))
            self.skip_connections = bool(get("skip_connections_feat", False))
            self.residual_scale = math.sqrt(float(get("residual_scale", 0.5)))
            self.log_compression = bool(get("log_compression", False))

        for i, blk in enumerate(self.encoder):
            pre = f"feature_extractor.conv_layers.{i}"
            if f"{pre}.0.weight" in sd:  # torch conv (Cout, Cin, K) -> (K, Cin, Cout)
                blk.weight = jnp.asarray(np.transpose(sd[f"{pre}.0.weight"], (2, 1, 0)))
            # norm_block index differs with dropout in the Sequential; probe both
            for ni in (2, 1):
                wk = f"{pre}.{ni}.weight"
                if wk in sd and sd[wk].ndim == 1:
                    blk.norm_weight = jnp.asarray(sd[wk])
                    blk.norm_bias = jnp.asarray(sd[f"{pre}.{ni}.bias"])
                    break
        if "vector_quantizer.embedding" in sd:
            self.vq.embedding = jnp.asarray(sd["vector_quantizer.embedding"],
                                            jnp.float32)
        pw = sd.get("vector_quantizer.projection.0.weight")
        if pw is not None:  # grouped conv1x1 (D, D/G, 1)
            g = self.vq.groups
            d, dg = pw.shape[0], pw.shape[1]
            # per-group torch weight (Dg_out, Dg_in) applied as y = W @ x
            w = pw.reshape(g, d // g, dg, 1)[..., 0]          # (G, Dg_out, Dg_in)
            self.vq.proj_weight = jnp.asarray(np.swapaxes(w, 1, 2))  # (G, in, out)
        nw = sd.get("vector_quantizer.projection.1.weight")
        if nw is not None:
            self.vq.norm_weight = jnp.asarray(nw)
            self.vq.norm_bias = jnp.asarray(sd["vector_quantizer.projection.1.bias"])
        self.pretrained = True

    def _features(self, wav):
        x = wav[..., None]  # (B, T, 1)
        for blk in self.encoder:
            residual = x
            x = blk(x)
            if self.skip_connections and x.shape[-1] == residual.shape[-1]:
                r_t, t = residual.shape[1], x.shape[1]
                residual = residual[:, :: r_t // t][:, :t]
                x = (x + residual) * self.residual_scale
        if self.log_compression:
            x = jnp.log1p(jnp.abs(x))
        return x

    def __call__(self, wav_input, flatten: bool = True, input_sample_hz=None):
        """(B, T) -> ids (B, frames, groups) or flattened (B, frames*groups).

        Matches reference vq_wav2vec.py:62-81 (resample -> curtail ->
        feature_extractor -> vector_quantizer.forward_idx -> flatten)."""
        if exists(input_sample_hz):
            wav_input = resample(wav_input, input_sample_hz, self.target_sample_hz)
        if exists(self.seq_len_multiple_of):
            wav_input = curtail_to_multiple(wav_input, self.seq_len_multiple_of)
        ids = self.vq(self._features(wav_input))  # (B, N, G)
        if flatten:
            return ids.reshape(ids.shape[0], -1)
        return ids
