"""SoundStream neural codec — encoder / RVQ / decoder with GAN discriminators.

TPU-native re-design of the reference codec (reference: audiolm_pytorch/
soundstream.py:451-1023). Key differences from the torch original:

  * channels-last (B, T, C) activations throughout — XLA tiles convs onto the
    MXU without layout churn.
  * fully functional: RVQ EMA codebooks are Buffers; training forwards return
    the updated model. The whole G step / D step jits as one graph.
  * complex STFT discriminator implemented as real/imag pairs of real convs
    (4 real matmuls per complex conv) — TPU has no native complex conv.
  * squeeze-excite uses a causal cumulative mean over *time* (the reference's
    cumsum is over channels — soundstream.py:161 — which we take as a bug;
    the intended op per the code comment is the autoregressive time mean).

Public surface mirrors the reference: `SoundStream(...)`, `.tokenize`,
`.decode_from_codebook_indices`, `.encode/.decode`, forward-mode flags,
`AudioLMSoundStream`, `MusicLMSoundStream`, `.save` / `.init_and_load_from`
(self-describing checkpoints, reference: soundstream.py:503-506, 711-733).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..nn.layers import LayerNorm, Linear, exists, default
from ..nn.module import Buffer, Module, evolve
from ..ops.attention import LocalTransformer
from ..ops.conv import CausalConv1d, CausalConvTranspose1d
from ..ops.quantize import GroupedResidualFSQ, GroupedResidualLFQ, GroupedResidualVQ
from ..ops.resample import resample
from ..ops.sampling import curtail_to_multiple
from ..ops.stft import melspectrogram, stft as stft_op

__all__ = ["SoundStream", "AudioLMSoundStream", "MusicLMSoundStream",
           "MultiScaleDiscriminator", "ComplexSTFTDiscriminator",
           "hinge_discr_loss", "hinge_gen_loss"]


# ---------------------------------------------------------------------------
# losses (reference: soundstream.py:58-83)
# ---------------------------------------------------------------------------

def hinge_discr_loss(fake, real):
    fake = fake.astype(jnp.float32)
    real = real.astype(jnp.float32)
    return jnp.mean(jax.nn.relu(1 + fake) + jax.nn.relu(1 - real))


def hinge_gen_loss(fake):
    return -jnp.mean(fake.astype(jnp.float32))


def _safe_log(t, eps: float = 1e-20):
    return jnp.log(jnp.maximum(t, eps))


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

class FiLM(Module):
    """Per-channel scale/shift from a conditioning vector (reference:
    soundstream.py:442-449)."""

    def __init__(self, dim: int, dim_cond: int, *, key: jax.Array):
        self.to_cond = Linear(dim_cond, dim * 2, key=key)

    def __call__(self, x, cond):
        gamma, beta = jnp.split(self.to_cond(cond.astype(x.dtype)), 2, axis=-1)
        return x * gamma + beta


class SqueezeExcite(Module):
    """Autoregressive squeeze-excitation: gate from the causal running mean
    over time (reference intent at soundstream.py:142-169)."""

    def __init__(self, dim: int, *, reduction_factor: int = 4, dim_minimum: int = 8,
                 key: jax.Array):
        dim_inner = max(dim_minimum, dim // reduction_factor)
        k1, k2 = jax.random.split(key)
        self.fc1 = Linear(dim, dim_inner, key=k1)
        self.fc2 = Linear(dim_inner, dim, key=k2)

    def __call__(self, x):  # x: (B, T, C)
        t = x.shape[1]
        cum_mean = jnp.cumsum(x.astype(jnp.float32), axis=1) / \
            jnp.arange(1, t + 1, dtype=jnp.float32)[None, :, None]
        gate = jax.nn.sigmoid(self.fc2(jax.nn.silu(self.fc1(cum_mean.astype(x.dtype)))))
        return x * gate


class ResidualUnit(Module):
    """conv(k, dilated) -> ELU -> conv(1) -> ELU [-> SE], residual
    (reference: soundstream.py:362-372)."""

    def __init__(self, chan_in: int, chan_out: int, dilation: int, *,
                 kernel_size: int = 7, squeeze_excite: bool = False,
                 pad_mode: str = "reflect", key: jax.Array):
        k1, k2, k3 = jax.random.split(key, 3)
        self.conv1 = CausalConv1d(chan_in, chan_out, kernel_size,
                                  dilation=dilation, pad_mode=pad_mode, key=k1)
        self.conv2 = CausalConv1d(chan_out, chan_out, 1, pad_mode=pad_mode, key=k2)
        self.se = SqueezeExcite(chan_out, key=k3) if squeeze_excite else None

    def __call__(self, x):
        h = jax.nn.elu(self.conv1(x))
        h = jax.nn.elu(self.conv2(h))
        if self.se is not None:
            h = self.se(h)
        return h + x


class GateLoop(Module):
    """Simple data-controlled linear recurrence (the `gateloop-transformer`
    SimpleGateLoopLayer capability, reference: soundstream.py:29, 524-525):
    h_t = a_t * h_{t-1} + (1 - a_t) * v_t via jax.lax.associative_scan,
    gated output q_t * h_t, used as a residual branch."""

    def __init__(self, dim: int, *, key: jax.Array):
        k1, k2 = jax.random.split(key)
        self.to_qva = Linear(dim, dim * 3, use_bias=False, key=k1)
        self.to_out = Linear(dim, dim, use_bias=False, key=k2)

    def __call__(self, x):  # (B, T, C)
        q, v, a = jnp.split(self.to_qva(x), 3, axis=-1)
        a = jax.nn.sigmoid(a.astype(jnp.float32))
        v = v.astype(jnp.float32)

        def combine(l, r):
            al, bl = l
            ar, br = r
            return al * ar, br + ar * bl

        _, h = lax.associative_scan(combine, (a, (1 - a) * v), axis=1)
        return self.to_out((jax.nn.silu(q.astype(jnp.float32)) * h).astype(x.dtype))


class EncoderBlock(Module):
    def __init__(self, chan_in: int, chan_out: int, stride: int,
                 cycle_dilations=(1, 3, 9), squeeze_excite: bool = False,
                 pad_mode: str = "reflect", *, key: jax.Array):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        d = list(cycle_dilations)
        self.res1 = ResidualUnit(chan_in, chan_in, d[0 % len(d)], squeeze_excite=squeeze_excite, pad_mode=pad_mode, key=k1)
        self.res2 = ResidualUnit(chan_in, chan_in, d[1 % len(d)], squeeze_excite=squeeze_excite, pad_mode=pad_mode, key=k2)
        self.res3 = ResidualUnit(chan_in, chan_in, d[2 % len(d)], squeeze_excite=squeeze_excite, pad_mode=pad_mode, key=k3)
        self.down = CausalConv1d(chan_in, chan_out, 2 * stride, stride=stride, pad_mode=pad_mode, key=k4)

    def __call__(self, x):
        return self.down(self.res3(self.res2(self.res1(x))))


class DecoderBlock(Module):
    def __init__(self, chan_in: int, chan_out: int, stride: int,
                 cycle_dilations=(1, 3, 9), squeeze_excite: bool = False,
                 pad_mode: str = "reflect", *, key: jax.Array):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        d = list(cycle_dilations)
        self.up = CausalConvTranspose1d(chan_in, chan_out, 2 * stride, stride=stride, key=k1)
        self.res1 = ResidualUnit(chan_out, chan_out, d[0 % len(d)], squeeze_excite=squeeze_excite, pad_mode=pad_mode, key=k2)
        self.res2 = ResidualUnit(chan_out, chan_out, d[1 % len(d)], squeeze_excite=squeeze_excite, pad_mode=pad_mode, key=k3)
        self.res3 = ResidualUnit(chan_out, chan_out, d[2 % len(d)], squeeze_excite=squeeze_excite, pad_mode=pad_mode, key=k4)

    def __call__(self, x):
        return self.res3(self.res2(self.res1(self.up(x))))


# ---------------------------------------------------------------------------
# discriminators
# ---------------------------------------------------------------------------

def _conv1d(x, w, b, *, stride=1, padding=0, groups=1):
    """Symmetric-padded (non-causal) conv1d in (B, T, C); w: (K, Cin/groups, Cout)."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), [(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        ).astype(x.dtype)
    return y + b.astype(y.dtype) if b is not None else y


class _Conv1dLayer(Module):
    def __init__(self, cin, cout, k, *, stride=1, padding=0, groups=1, key):
        lim = 1.0 / math.sqrt(cin // groups * k)
        self.weight = jax.random.uniform(key, (k, cin // groups, cout), jnp.float32, -lim, lim)
        self.bias = jnp.zeros((cout,), jnp.float32)
        self.stride = stride
        self.padding = padding
        self.groups = groups

    def __call__(self, x):
        return _conv1d(x, self.weight, self.bias, stride=self.stride,
                       padding=self.padding, groups=self.groups)


class MultiScaleDiscriminator(Module):
    """Waveform conv discriminator returning intermediates for the
    feature-matching loss (reference: soundstream.py:92-140)."""

    def __init__(self, *, channels: int = 16, layers: int = 4,
                 groups=(4, 16, 64, 256), chan_max: int = 1024,
                 input_channels: int = 1, key: jax.Array):
        keys = jax.random.split(key, layers + 3)
        self.init_conv = _Conv1dLayer(input_channels, channels, 15, padding=7, key=keys[0])
        self.conv_layers = []
        curr = channels
        for i, group in zip(range(layers), groups):
            chan_out = min(curr * 4, chan_max)
            self.conv_layers.append(_Conv1dLayer(curr, chan_out, 41, stride=4,
                                                 padding=20, groups=group, key=keys[i + 1]))
            curr = chan_out
        self.final_conv1 = _Conv1dLayer(curr, curr, 5, padding=2, key=keys[-2])
        self.final_conv2 = _Conv1dLayer(curr, 1, 3, padding=1, key=keys[-1])

    def __call__(self, x, return_intermediates: bool = False):
        """x: (B, T) waveform."""
        h = self.init_conv(x[..., None])
        intermediates = []
        for layer in self.conv_layers:
            h = jax.nn.leaky_relu(layer(h), 0.1)
            intermediates.append(h)
        out = self.final_conv2(jax.nn.leaky_relu(self.final_conv1(h), 0.1))
        if not return_intermediates:
            return out
        return out, intermediates


class ComplexConv2d(Module):
    """Complex conv as 4 real convs on (re, im) pairs, NHWC
    (reference: soundstream.py:185-206 uses torch complex64 — TPU-unfriendly)."""

    def __init__(self, cin, cout, kernel_size, *, stride=1, padding=0, key):
        kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
        k1, k2 = jax.random.split(key)
        lim = 1.0 / math.sqrt(cin * kh * kw)
        self.wr = jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32, -lim, lim)
        self.wi = jax.random.uniform(k2, (kh, kw, cin, cout), jnp.float32, -lim, lim)
        self.br = jnp.zeros((cout,), jnp.float32)
        self.bi = jnp.zeros((cout,), jnp.float32)
        self.stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
        self.padding = (padding, padding) if isinstance(padding, int) else tuple(padding)

    def __call__(self, xr, xi):
        ph, pw = self.padding
        pads = [(ph, ph), (pw, pw)]
        conv = functools.partial(
            lax.conv_general_dilated, window_strides=self.stride, padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if xr.dtype == jnp.float32 else None)
        wr = self.wr.astype(xr.dtype)
        wi = self.wi.astype(xr.dtype)
        yr = (conv(xr, wr) - conv(xi, wi) + self.br).astype(xr.dtype)
        yi = (conv(xr, wi) + conv(xi, wr) + self.bi).astype(xr.dtype)
        return yr, yi


class ModReLU(Module):
    """relu(|z| + b) * z/|z| (reference: soundstream.py:173-183)."""

    def __init__(self):
        self.b = jnp.zeros((), jnp.float32)

    def __call__(self, xr, xi):
        # eps 1e-6: keeps the second derivative (grad penalty is grad-of-grad
        # through this sqrt) bounded near |z| = 0
        mag = jnp.sqrt(xr * xr + xi * xi + 1e-6)
        scale = jax.nn.relu(mag + self.b) / mag
        return xr * scale, xi * scale


class ComplexSTFTResidualUnit(Module):
    def __init__(self, chan_in, chan_out, strides, *, key):
        k1, k2, k3 = jax.random.split(key, 3)
        ks = tuple(s + 2 for s in strides)
        pads = tuple(k // 2 for k in ks)
        self.conv1 = ComplexConv2d(chan_in, chan_in, 3, padding=1, key=k1)
        self.act = ModReLU()
        self.conv2 = ComplexConv2d(chan_in, chan_in, 3, padding=1, key=k2)
        self.down = ComplexConv2d(chan_in, chan_out, ks, stride=strides, padding=pads, key=k3)

    def __call__(self, xr, xi):
        hr, hi = self.conv1(xr, xi)
        hr, hi = self.act(hr, hi)
        hr, hi = self.conv2(hr, hi)
        xr, xi = xr + hr, xi + hi
        return self.down(xr, xi)


class ComplexSTFTDiscriminator(Module):
    """Complex STFT discriminator (reference: soundstream.py:222-310)."""

    def __init__(self, *, channels: int = 32,
                 strides=((1, 2), (2, 2), (1, 2), (2, 2), (1, 2), (2, 2)),
                 chan_mults=(1, 2, 4, 4, 8, 8), input_channels: int = 1,
                 n_fft: int = 1024, hop_length: int = 256, win_length: int = 1024,
                 stft_normalized: bool = False, logits_abs: bool = True,
                 key: jax.Array):
        keys = jax.random.split(key, len(strides) + 2)
        self.init_conv = ComplexConv2d(input_channels, channels, 7, padding=3, key=keys[0])
        layer_channels = (channels, *(m * channels for m in chan_mults))
        self.layers = [
            ComplexSTFTResidualUnit(ci, co, s, key=k)
            for (ci, co, s, k) in zip(layer_channels[:-1], layer_channels[1:],
                                      strides, keys[1:-1])
        ]
        self.final_conv = ComplexConv2d(layer_channels[-1], 1, (16, 1), key=keys[-1])
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.stft_normalized = stft_normalized
        self.logits_abs = logits_abs

    def __call__(self, x, return_intermediates: bool = False):
        """x: (B, T) waveform."""
        spec = stft_op(x, self.n_fft, self.hop_length, self.win_length,
                       normalized=self.stft_normalized)  # (B, F, T') complex
        xr = jnp.real(spec)[..., None]  # NHWC with H=freq, W=frames
        xi = jnp.imag(spec)[..., None]
        hr, hi = self.init_conv(xr, xi)
        intermediates = [jnp.concatenate([hr, hi], axis=-1)]
        for layer in self.layers:
            hr, hi = layer(hr, hi)
            intermediates.append(jnp.concatenate([hr, hi], axis=-1))
        lr, li = self.final_conv(hr, hi)
        if self.logits_abs:
            logits = jnp.sqrt(lr * lr + li * li + 1e-6)
        else:
            logits = jnp.stack([lr, li], axis=-1)
        if not return_intermediates:
            return logits
        return logits, intermediates


def avg_pool1d(x, kernel: int, stride: int, padding: int):
    """torch.nn.AvgPool1d(count_include_pad=True) on (B, T)."""
    xp = jnp.pad(x, ((0, 0), (padding, padding)))[..., None]
    summed = lax.reduce_window(xp, 0.0, lax.add, (1, kernel, 1), (1, stride, 1), "VALID")
    return summed[..., 0] / kernel


# ---------------------------------------------------------------------------
# SoundStream
# ---------------------------------------------------------------------------

class SoundStream(Module):
    def __init__(
        self,
        *,
        channels: int = 32,
        strides=(2, 4, 5, 8),
        channel_mults=(2, 4, 8, 16),
        codebook_dim: int = 512,
        codebook_size: Optional[int] = None,
        finite_scalar_quantizer_levels=None,
        rq_num_quantizers: int = 8,
        rq_commitment_weight: float = 1.0,
        rq_ema_decay: float = 0.95,
        rq_quantize_dropout_multiple_of: int = 1,
        rq_groups: int = 1,
        rq_stochastic_sample_codes: bool = False,
        rq_rotation_trick: bool = True,
        rq_kwargs: dict | None = None,
        use_lookup_free_quantizer: bool = False,
        use_finite_scalar_quantizer: bool = False,
        input_channels: int = 1,
        discr_multi_scales=(1, 0.5, 0.25),
        stft_normalized: bool = False,
        enc_cycle_dilations=(1, 3, 9),
        dec_cycle_dilations=(1, 3, 9),
        multi_spectral_window_powers_of_two=tuple(range(6, 12)),
        multi_spectral_n_ffts: int = 512,
        multi_spectral_n_mels: int = 64,
        recon_loss_weight: float = 1.0,
        multi_spectral_recon_loss_weight: float = 1e-5,
        multi_stft_recon_loss_weight: float = 0.0,
        multi_stft_resolutions=((128, 32, 128), (512, 128, 512),
                                (1024, 256, 1024), (2048, 512, 2048)),
        multi_stft_term_weights=(1.0, 1.0, 1.0),
        si_snr_loss_weight: float = 0.0,
        adversarial_loss_weight: float = 1.0,
        feature_loss_weight: float = 100.0,
        quantize_dropout_cutoff_index: int = 1,
        target_sample_hz: int = 16000,
        use_local_attn: bool = True,
        attn_window_size: int = 128,
        attn_dim_head: int = 64,
        attn_heads: int = 8,
        attn_depth: int = 1,
        attn_xpos_scale_base=None,
        attn_dynamic_pos_bias: bool = False,
        use_gate_loop_layers: bool = False,
        squeeze_excite: bool = False,
        complex_stft_discr_logits_abs: bool = True,
        pad_mode: str = "reflect",
        complex_stft_discr_kwargs: dict | None = None,
        multi_scale_discr_kwargs: dict | None = None,
        compute_dtype: str = "float32",
        key: jax.Array,
    ):
        # self-describing config (reference: soundstream.py:503-506)
        cfg = {k: v for k, v in locals().items()
               if k not in ("self", "key", "__class__")}
        cfg["rq_kwargs"] = dict(rq_kwargs or {})
        cfg["complex_stft_discr_kwargs"] = dict(complex_stft_discr_kwargs or {})
        cfg["multi_scale_discr_kwargs"] = dict(multi_scale_discr_kwargs or {})
        for tk in ("strides", "channel_mults", "discr_multi_scales",
                   "enc_cycle_dilations", "dec_cycle_dilations",
                   "multi_spectral_window_powers_of_two"):
            cfg[tk] = tuple(cfg[tk])
        cfg["multi_stft_resolutions"] = tuple(
            tuple(r) for r in cfg["multi_stft_resolutions"])
        cfg["multi_stft_term_weights"] = tuple(cfg["multi_stft_term_weights"])
        if cfg["finite_scalar_quantizer_levels"] is not None:
            cfg["finite_scalar_quantizer_levels"] = tuple(cfg["finite_scalar_quantizer_levels"])
        self.configs = tuple(sorted(cfg.items()))

        keys = jax.random.split(key, 16)
        rq_kwargs = rq_kwargs or {}

        self.target_sample_hz = target_sample_hz
        self.single_channel = input_channels == 1
        self.strides = tuple(strides)
        self.channels = channels
        self.codebook_dim = codebook_dim
        self.rq_groups = rq_groups
        self.num_quantizers = rq_num_quantizers
        self.use_lookup_free_quantizer = use_lookup_free_quantizer
        self.use_finite_scalar_quantizer = use_finite_scalar_quantizer

        layer_channels = (channels, *(m * channels for m in channel_mults))
        pairs = tuple(zip(layer_channels[:-1], layer_channels[1:]))

        # encoder
        ekeys = jax.random.split(keys[0], len(pairs) + 2)
        enc_blocks = []
        for i, ((ci, co), s) in enumerate(zip(pairs, strides)):
            enc_blocks.append(EncoderBlock(ci, co, s, enc_cycle_dilations,
                                           squeeze_excite, pad_mode, key=ekeys[i]))
            if use_gate_loop_layers:
                enc_blocks.append(GateLoop(co, key=jax.random.fold_in(ekeys[i], 1)))
        self.encoder_init = CausalConv1d(input_channels, channels, 7, pad_mode=pad_mode, key=ekeys[-2])
        self.encoder_blocks = enc_blocks
        self.encoder_final = CausalConv1d(layer_channels[-1], codebook_dim, 3, pad_mode=pad_mode, key=ekeys[-1])

        attn_kwargs = dict(dim=codebook_dim, dim_head=attn_dim_head, heads=attn_heads,
                           depth=attn_depth, window_size=attn_window_size,
                           xpos_scale_base=attn_xpos_scale_base,
                           dynamic_pos_bias=attn_dynamic_pos_bias)
        self.encoder_attn = LocalTransformer(**attn_kwargs, key=keys[1]) if use_local_attn else None
        self.encoder_film = FiLM(codebook_dim, 2, key=keys[2])

        # quantizer
        if use_lookup_free_quantizer:
            assert exists(codebook_size) and not exists(finite_scalar_quantizer_levels)
            self.rq = GroupedResidualLFQ(
                dim=codebook_dim, groups=rq_groups, num_quantizers=rq_num_quantizers,
                codebook_size=codebook_size, quantize_dropout=True,
                quantize_dropout_cutoff_index=quantize_dropout_cutoff_index,
                key=keys[3], **rq_kwargs)
            self.codebook_size = codebook_size
        elif use_finite_scalar_quantizer:
            assert not exists(codebook_size) and exists(finite_scalar_quantizer_levels)
            self.rq = GroupedResidualFSQ(
                dim=codebook_dim, groups=rq_groups,
                levels=tuple(finite_scalar_quantizer_levels),
                num_quantizers=rq_num_quantizers, quantize_dropout=True,
                quantize_dropout_cutoff_index=quantize_dropout_cutoff_index,
                key=keys[3], **rq_kwargs)
            self.codebook_size = self.rq.codebook_size
        else:
            assert exists(codebook_size) and not exists(finite_scalar_quantizer_levels)
            # defaults match the reference's hardcoded rq kwargs
            # (soundstream.py:592-607); rq_kwargs overrides them — e.g.
            # threshold_ema_dead_code should drop well below 1.0 when
            # batch·frames < codebook_size, or the EMA cluster sizes sit
            # below the threshold in steady state and the expiry re-seeds
            # most of the codebook every step (codebook collapse)
            rq_kw = dict(kmeans_init=True, threshold_ema_dead_code=2.0,
                         quantize_dropout=True)
            rq_kw.update(rq_kwargs or {})
            self.rq = GroupedResidualVQ(
                dim=codebook_dim, groups=rq_groups, num_quantizers=rq_num_quantizers,
                codebook_size=codebook_size, decay=rq_ema_decay,
                commitment_weight=rq_commitment_weight,
                quantize_dropout_multiple_of=rq_quantize_dropout_multiple_of,
                quantize_dropout_cutoff_index=quantize_dropout_cutoff_index,
                stochastic_sample_codes=rq_stochastic_sample_codes,
                rotation_trick=rq_rotation_trick, key=keys[3], **rq_kw)
            self.codebook_size = codebook_size

        self.decoder_film = FiLM(codebook_dim, 2, key=keys[4])
        self.decoder_attn = LocalTransformer(**attn_kwargs, key=keys[5]) if use_local_attn else None

        # decoder
        dkeys = jax.random.split(keys[6], len(pairs) + 2)
        dec_blocks = []
        for i, ((ci, co), s) in enumerate(zip(reversed(pairs), reversed(strides))):
            dec_blocks.append(DecoderBlock(co, ci, s, dec_cycle_dilations,
                                           squeeze_excite, pad_mode, key=dkeys[i]))
            if use_gate_loop_layers:
                dec_blocks.append(GateLoop(ci, key=jax.random.fold_in(dkeys[i], 1)))
        self.decoder_init = CausalConv1d(codebook_dim, layer_channels[-1], 7, pad_mode=pad_mode, key=dkeys[-2])
        self.decoder_blocks = dec_blocks
        self.decoder_final = CausalConv1d(channels, input_channels, 7, pad_mode=pad_mode, key=dkeys[-1])

        # discriminators (grouped under .discrs for G/D param partitioning)
        self.discr_multi_scales = tuple(discr_multi_scales)
        self.discriminators = [
            MultiScaleDiscriminator(key=jax.random.fold_in(keys[7], i),
                                    **(multi_scale_discr_kwargs or {}))
            for i in range(len(discr_multi_scales))]
        rel = [int(s1 / s2) for s1, s2 in zip(self.discr_multi_scales[:-1],
                                              self.discr_multi_scales[1:])]
        self.downsample_factors = tuple(rel)  # avg-pool factor before discr i+1
        self.stft_discriminator = ComplexSTFTDiscriminator(
            stft_normalized=stft_normalized,
            logits_abs=complex_stft_discr_logits_abs,
            key=keys[8], **(complex_stft_discr_kwargs or {}))

        # multi-spectral recon settings (reference: soundstream.py:646-672)
        self.mel_settings = []
        for power in multi_spectral_window_powers_of_two:
            win = 2 ** power
            n_fft = max(multi_spectral_n_ffts, win)
            self.mel_settings.append((n_fft, win, win // 4, multi_spectral_n_mels,
                                      (win / 2) ** 0.5))
        self.stft_normalized = stft_normalized

        self.compute_dtype = compute_dtype
        self.recon_loss_weight = recon_loss_weight
        self.multi_spectral_recon_loss_weight = multi_spectral_recon_loss_weight
        self.multi_stft_recon_loss_weight = multi_stft_recon_loss_weight
        self.si_snr_loss_weight = si_snr_loss_weight
        self.stft_loss_settings = tuple(tuple(r) for r in multi_stft_resolutions)
        self.stft_term_weights = tuple(multi_stft_term_weights)
        self.adversarial_loss_weight = adversarial_loss_weight
        self.feature_loss_weight = feature_loss_weight

    def non_discr_parameters(self):
        """Generator-side trainable params (API parity: reference
        soundstream.py:760-769). Returns the trainable partition with
        discriminator slots set to None."""
        from ..nn.module import partition_trainable_where
        params, _ = partition_trainable_where(
            self, lambda p: not p.startswith(("discriminators",
                                              "stft_discriminator")))
        return params

    # -- properties ---------------------------------------------------------
    @property
    def seq_len_multiple_of(self):
        return functools.reduce(lambda a, b: a * b, self.strides)

    @property
    def downsample_factor(self):
        return self.seq_len_multiple_of

    # -- core paths ----------------------------------------------------------
    def process_input(self, x, input_sample_hz=None, curtail_from_left=False):
        """Accept (T,), (B, T) or (B, 1, T); resample + curtail to frame multiple."""
        if x.ndim == 1:
            x = x[None]
        if x.ndim == 3:
            x = x[:, 0]
        if exists(input_sample_hz):
            x = resample(x, input_sample_hz, self.target_sample_hz)
        x = curtail_to_multiple(x, self.seq_len_multiple_of, from_left=curtail_from_left)
        return x

    def encode_frames(self, x):
        """waveform (B, T) -> pre-quantization embeddings (B, T/DS, D).
        Activations run in `compute_dtype` (bf16 halves HBM traffic on the
        conv stacks; RVQ distances stay fp32 regardless)."""
        x = x.astype(jnp.dtype(self.compute_dtype))
        h = self.encoder_init(x[..., None])
        for block in self.encoder_blocks:
            h = block(h) if not isinstance(block, GateLoop) else h + block(h)
        h = self.encoder_final(h)
        if self.encoder_attn is not None:
            h = self.encoder_attn(h)
        return h

    def decode(self, x, quantize: bool = False):
        """quantized embeddings (B, N, D) -> waveform (B, N*DS)."""
        if quantize:
            x, *_ = self.rq(x, train=False)
        x = x.astype(jnp.dtype(self.compute_dtype))
        if self.decoder_attn is not None:
            x = self.decoder_attn(x)
        h = self.decoder_init(x)
        for block in self.decoder_blocks:
            h = block(h) if not isinstance(block, GateLoop) else h + block(h)
        h = self.decoder_final(h)
        return h[..., 0]

    def tokenize(self, audio, input_sample_hz=None):
        """waveform -> codes (G, B, N, Q), eval mode (reference: soundstream.py:797-800)."""
        return self(audio, return_codes_only=True, input_sample_hz=input_sample_hz)

    def decode_from_codebook_indices(self, quantized_indices):
        """codes (G, B, N, Q) or (B, N, G*Q) -> waveform
        (reference: soundstream.py:691-699)."""
        if quantized_indices.ndim == 3:
            b, n, gq = quantized_indices.shape
            g = self.rq_groups
            quantized_indices = quantized_indices.reshape(b, n, g, gq // g)
            quantized_indices = quantized_indices.transpose(2, 0, 1, 3)
        x = self.rq.get_output_from_indices(quantized_indices)
        return self.decode(x)

    # -- losses ---------------------------------------------------------------
    def _multi_mel_loss(self, orig, recon):
        total = 0.0
        for n_fft, win, hop, n_mels, alpha in self.mel_settings:
            om = melspectrogram(orig, self.target_sample_hz, n_fft, hop, win,
                                n_mels=n_mels, normalized=self.stft_normalized)
            rm = melspectrogram(recon, self.target_sample_hz, n_fft, hop, win,
                                n_mels=n_mels, normalized=self.stft_normalized)
            l1 = jnp.mean(jnp.sum(jnp.abs(om - rm), axis=-2))
            l2 = alpha * jnp.mean(jnp.linalg.norm(_safe_log(om) - _safe_log(rm), axis=-2))
            total = total + l1 + l2
        return total

    def _multi_stft_loss(self, orig, recon):
        """Multi-resolution STFT loss with a PHASE-AWARE complex term.

        Round-3 diagnosis (NOTES): the codec's binding error on speech-like
        clips is pitch-phase tracking — the magnitude envelope is right but
        the reconstructed harmonic phase drifts, which craters waveform
        SI-SNR. Waveform MSE alone has pathological phase gradients (for a
        phase error beyond pi/2 the MSE gradient pushes AWAY from lock), so
        per resolution we combine:
          - spectral convergence + log-magnitude L1 (the standard MR-STFT
            pair, Parallel-WaveGAN style),
          - an L1 on the COMPLEX spectrum difference, normalized by the
            reference magnitude: locally linearizes phase error per
            time-frequency cell, giving a well-conditioned pull toward
            phase lock at every resolution.
        The reference's only spectral loss is mel-magnitude (reference
        soundstream.py:645-672) which is phase-blind; this term is the
        TPU build's addition (matmul-DFT STFT rides the MXU, ops/stft.py).
        """
        w_sc, w_logmag, w_phase = self.stft_term_weights
        total = 0.0
        for n_fft, hop, win in self.stft_loss_settings:
            so = stft_op(orig, n_fft, hop, win)
            sr = stft_op(recon, n_fft, hop, win)
            mo, mr = jnp.abs(so), jnp.abs(sr)
            term = 0.0
            if w_sc:
                term += w_sc * jnp.linalg.norm(mo - mr) / \
                    (jnp.linalg.norm(mo) + 1e-8)
            if w_logmag:
                term += w_logmag * jnp.mean(
                    jnp.abs(jnp.log(mo + 1e-5) - jnp.log(mr + 1e-5)))
            if w_phase:
                # the COMPLEX difference: the only term that sees phase.
                # Round-4 training finding: the phase-blind terms above,
                # weighted equally, create a "right magnitude, uncorrelated
                # phase" attractor (SI-SNR stuck at -33 dB while mel-distance
                # improves); the main run uses (0, 0, 1)
                term += w_phase * jnp.mean(jnp.abs(so - sr)) / \
                    (jnp.mean(mo) + 1e-8)
            total = total + term
        return total / len(self.stft_loss_settings)

    def _discr_logits_and_feats(self, wave):
        """Run all discriminators; returns ([logits...], [intermediates...]) with
        the STFT discriminator first (matching reference ordering of features)."""
        logits, feats = [], []
        l, inter = self.stft_discriminator(wave, return_intermediates=True)
        logits.append(l)
        feats.append(inter)
        scaled = wave
        for i, discr in enumerate(self.discriminators):
            if i > 0:
                f = self.downsample_factors[i - 1]
                scaled = avg_pool1d(scaled, 2 * f, f, f)
            l, inter = discr(scaled, return_intermediates=True)
            logits.append(l)
            feats.append(inter)
        return logits, feats

    # -- the forward-mode multiplexer (API parity with reference forward flags,
    #    reference: soundstream.py:802-870) --------------------------------------
    def __call__(self, x, *, key=None, train: bool = False, target=None,
                 is_denoising=None, return_encoded=False, return_codes_only=False,
                 return_discr_loss=False, return_discr_losses_separately=False,
                 return_loss_breakdown=False, return_recons_only=False,
                 input_sample_hz=None, apply_grad_penalty=False,
                 curtail_from_left=False, axis_name=None):
        assert not (exists(is_denoising) and not exists(target))
        x = self.process_input(x, input_sample_hz, curtail_from_left)
        if exists(target):
            target = self.process_input(target, input_sample_hz, curtail_from_left)
        orig_x = x

        h = self.encode_frames(x)

        if exists(is_denoising):
            denoise_cond = jnp.asarray([1.0, 0.0]) if is_denoising else jnp.asarray([0.0, 1.0])
            h = self.encoder_film(h, denoise_cond)

        rq_key = None
        if key is not None:
            key, rq_key = jax.random.split(key)
        hq, indices, commit_loss, new_rq = self.rq(h, key=rq_key, train=train,
                                                   axis_name=axis_name)
        new_self = evolve(self, rq=new_rq) if train else self

        if return_codes_only:
            return indices

        if return_encoded:
            # (G, B, N, Q) -> (B, N, G*Q)
            g, b, n, q = indices.shape
            flat_idx = indices.transpose(1, 2, 0, 3).reshape(b, n, g * q)
            return hq, flat_idx, commit_loss

        if exists(is_denoising):
            hq = self.decoder_film(hq, denoise_cond)

        recon_x = self.decode(hq)

        if return_recons_only:
            return recon_x

        if return_discr_loss:
            return self._discr_loss(orig_x, jax.lax.stop_gradient(recon_x),
                                    apply_grad_penalty, return_discr_losses_separately)

        # loss terms aggregate in fp32 regardless of compute dtype (the heavy
        # conv/matmul work above already ran in the input dtype, e.g. bf16)
        target = default(target, orig_x).astype(jnp.float32)
        recon32 = recon_x.astype(jnp.float32)
        recon_loss = jnp.mean((target - recon32) ** 2)
        multi_spectral_recon_loss = self._multi_mel_loss(target, recon32) \
            if self.multi_spectral_recon_loss_weight > 0 else jnp.asarray(0.0)
        multi_stft_recon_loss = self._multi_stft_loss(target, recon32) \
            if self.multi_stft_recon_loss_weight > 0 else jnp.asarray(0.0)
        if self.si_snr_loss_weight > 0:
            # negative per-clip SI-SNR (round 5): the held-out metric is the
            # per-clip mean of a scale-invariant, phase-sensitive ratio — MSE
            # is dominated by high-energy clips and tolerates the pitch-phase
            # drift that SI-SNR punishes (NOTES round-3 diagnosis), so train
            # on the metric directly. No reference counterpart (the reference
            # trains MSE + mel only, soundstream.py:927-995).
            from ..utils.metrics import si_snr as _si_snr
            b = target.shape[0]
            si_snr_loss = -jnp.mean(_si_snr(recon32.reshape(b, -1),
                                            target.reshape(b, -1)))
        else:
            si_snr_loss = jnp.asarray(0.0)

        if self.adversarial_loss_weight == 0 and self.feature_loss_weight == 0:
            # pure-reconstruction phase: skip the discriminator forwards
            # entirely (they would otherwise still be traced/compiled because
            # the loss breakdown returns their values as metrics)
            adversarial_loss = jnp.asarray(0.0)
            feature_loss = jnp.asarray(0.0)
        else:
            logits, fake_feats = self._discr_logits_and_feats(recon_x)
            _, real_feats = self._discr_logits_and_feats(jax.lax.stop_gradient(orig_x))
            adversarial_loss = jnp.mean(jnp.stack(
                [hinge_gen_loss(l.astype(jnp.float32)) for l in logits]))
            feat_losses = []
            for rf, ff in zip(real_feats, fake_feats):
                feat_losses.extend([jnp.mean(jnp.abs(r.astype(jnp.float32)
                                                     - f.astype(jnp.float32)))
                                    for r, f in zip(rf, ff)])
            feature_loss = jnp.mean(jnp.stack(feat_losses))

        all_commit = jnp.sum(commit_loss)
        total = (recon_loss * self.recon_loss_weight
                 + multi_spectral_recon_loss * self.multi_spectral_recon_loss_weight
                 + multi_stft_recon_loss * self.multi_stft_recon_loss_weight
                 + si_snr_loss * self.si_snr_loss_weight
                 + adversarial_loss * self.adversarial_loss_weight
                 + feature_loss * self.feature_loss_weight
                 + all_commit)
        if return_loss_breakdown:
            return total, (recon_loss, multi_spectral_recon_loss,
                           multi_stft_recon_loss, si_snr_loss,
                           adversarial_loss, feature_loss, all_commit), new_self
        return total, new_self

    def _discr_loss(self, real, fake, apply_grad_penalty, separately):
        """Hinge discriminator losses, optionally with zero-centered gradient
        penalties (reference: soundstream.py:870-925). Grad penalty = ||∂loss/∂input||²,
        computed with jax.grad (grad-of-grad through the jitted graph)."""
        losses = []

        def stft_loss_fn(r, f):
            return hinge_discr_loss(self.stft_discriminator(f), self.stft_discriminator(r))

        stft_loss = stft_loss_fn(real, fake)
        losses.append(("stft", stft_loss))
        if apply_grad_penalty:
            gr = jax.grad(lambda r: stft_loss_fn(r, fake))(real)
            gf = jax.grad(lambda f: stft_loss_fn(real, f))(fake)
            # ||g||^2 as a direct sum of squares: identical to (norm-0)^2 with a
            # numerically clean second derivative (no sqrt at the origin)
            gp = 10.0 * (jnp.mean(jnp.sum(gr.reshape(gr.shape[0], -1) ** 2, axis=1))
                         + jnp.mean(jnp.sum(gf.reshape(gf.shape[0], -1) ** 2, axis=1)))
            losses.append(("stft_grad_penalty", gp))

        scaled_real, scaled_fake = real, fake
        for i, (scale, discr) in enumerate(zip(self.discr_multi_scales, self.discriminators)):
            if i > 0:
                f = self.downsample_factors[i - 1]
                scaled_real = avg_pool1d(scaled_real, 2 * f, f, f)
                scaled_fake = avg_pool1d(scaled_fake, 2 * f, f, f)

            def loss_fn(r, fk, d=discr):
                return hinge_discr_loss(d(fk), d(r))

            one = loss_fn(scaled_real, scaled_fake)
            losses.append((f"scale:{scale}", one))
            if apply_grad_penalty:
                gr = jax.grad(lambda r: loss_fn(r, scaled_fake))(scaled_real)
                gf = jax.grad(lambda fk: loss_fn(scaled_real, fk))(scaled_fake)
                gp = 10.0 * (jnp.mean(jnp.sum(gr.reshape(gr.shape[0], -1) ** 2, axis=1))
                             + jnp.mean(jnp.sum(gf.reshape(gf.shape[0], -1) ** 2, axis=1)))
                losses.append((f"scale_grad_penalty:{scale}", gp))

        if separately:
            return losses
        scale_losses = [v for k, v in losses if k.startswith("scale:")]
        total = jnp.mean(jnp.stack(scale_losses))
        total = total + dict(losses)["stft"]
        for k, v in losses:
            if k.endswith("grad_penalty"):
                total = total + v
        return total

    # -- persistence ----------------------------------------------------------
    def save(self, path):
        from ..training.checkpoint import save_checkpoint
        from ..version import __version__
        save_checkpoint(path, self, config=dict(self.configs), version=__version__,
                        kind="SoundStream")

    def load(self, path, prefer_ema=True):
        """Return a new module with weights from `path` — accepts bare-model,
        trainer, and EMA-bearing trainer checkpoints, preferring EMA weights
        like the reference (soundstream.py:745-752). `prefer_ema=False` loads
        the RAW weights from a trainer checkpoint: through a staged-lr anneal
        the EMA shadow lags the raw weights by several dB of SI-SNR (round-3/4
        measured), so mid-anneal snapshots should be consumed raw."""
        from ..training.checkpoint import load_pytree_into
        prefixes = (("['ema'].shadow", "['model']", "") if prefer_ema
                    else ("['model']", "['ema'].shadow", ""))
        for prefix in prefixes:
            try:
                return load_pytree_into(path, self, prefix=prefix)
            except ValueError:
                continue
        raise ValueError(f"no loadable SoundStream weights found in {path}")

    def load_from_trainer_saved_obj(self, path):
        """(API parity: reference soundstream.py:754-758)."""
        from ..training.checkpoint import load_pytree_into
        return load_pytree_into(path, self, prefix="['model']")

    @classmethod
    def init_and_load_from(cls, path):
        from ..training.checkpoint import load_checkpoint
        pkg = load_checkpoint(path)
        config = pkg["config"]
        if not config:
            raise ValueError(
                f"{path} has no constructor config (it is a trainer/EMA "
                "checkpoint, not a SoundStream.save artifact) — build the "
                "model with its original kwargs and call .load(path) instead")
        model = cls(**config, key=jax.random.PRNGKey(0))
        return pkg["restore"](model)


def AudioLMSoundStream(strides=(2, 4, 5, 8), target_sample_hz=16000,
                       rq_num_quantizers=12, **kwargs):
    """Preset (reference: soundstream.py:999-1010)."""
    return SoundStream(strides=strides, target_sample_hz=target_sample_hz,
                       rq_num_quantizers=rq_num_quantizers, **kwargs)


def MusicLMSoundStream(strides=(3, 4, 5, 8), target_sample_hz=24000,
                       rq_num_quantizers=12, **kwargs):
    """Preset (reference: soundstream.py:1012-1023)."""
    return SoundStream(strides=strides, target_sample_hz=target_sample_hz,
                       rq_num_quantizers=rq_num_quantizers, **kwargs)
