"""Import machinery for golden-parity tests against the torch reference at
/root/reference (read-only). The reference depends on several libraries absent
from this image (vector_quantize_pytorch, local_attention,
gateloop_transformer, hyper_connections, torchaudio, beartype, fairseq,
joblib, ema_pytorch); this module installs minimal stubs for them BEFORE
loading the reference submodules, so the reference's own torch classes
(CausalConv1d, discriminators, Attend, LayerNorm, FeedForward,
RelativePositionBias, Attention, Transformer) can be instantiated and used as
numerical oracles.

Stubs are inert placeholders EXCEPT hyper_connections, whose disabled
(num_residual_streams=1) semantics — plain residual add with auxiliary
outputs passed through — must be faithful for Transformer parity to be
meaningful.

The reference package's __init__ is bypassed (a bare namespace module with
__path__ pointing at the reference dir) so only the submodules under test are
executed.
"""
from __future__ import annotations

import sys
import types

REF_DIR = "/root/reference"


def _new_module(name):
    m = types.ModuleType(name)
    # a real __spec__ keeps importlib.util.find_spec (used by transformers'
    # dependency probing) happy
    import importlib.machinery
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    return m


def install_stubs():
    import torch
    import torch.nn as nn

    if "vector_quantize_pytorch" not in sys.modules:
        m = _new_module("vector_quantize_pytorch")

        class _VQStub(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        for n in ("GroupedResidualVQ", "GroupedResidualLFQ", "GroupedResidualFSQ",
                  "ResidualVQ", "ResidualLFQ", "ResidualFSQ", "VectorQuantize"):
            setattr(m, n, _VQStub)

    if "local_attention" not in sys.modules:
        m = _new_module("local_attention")

        class _LocalMHA(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        m.LocalMHA = _LocalMHA
        mt = _new_module("local_attention.transformer")

        def _FF(*a, **k):
            return nn.Identity()

        class _DynPosBias(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        mt.FeedForward = _FF
        mt.DynamicPositionBias = _DynPosBias
        m.transformer = mt

    if "gateloop_transformer" not in sys.modules:
        m = _new_module("gateloop_transformer")

        class _GateLoop(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        m.SimpleGateLoopLayer = _GateLoop

    if "hyper_connections" not in sys.modules:
        m = _new_module("hyper_connections")

        class _Residual(nn.Module):
            """disable=True semantics of the hyper-connections lib: plain
            residual add; tuple outputs pass their tail through."""

            def __init__(self, branch):
                super().__init__()
                self.branch = branch

            def forward(self, x, *a, **k):
                out = self.branch(x, *a, **k)
                if isinstance(out, tuple):
                    return (out[0] + x, *out[1:])
                return out + x

        class _HyperConnection(nn.Module):
            """Faithful n-stream hyper-connection oracle (arXiv:2409.19606,
            the paper the reference pins): static residual-equivalent init
            (branch reads stream layer_index%S, identity mixing, branch
            output written to ALL streams) plus zero-initialized dynamic
            alpha/beta = tanh(rmsnorm(x) @ W) * scale. Streams are carried
            as (S, B, N, D); expand copies, reduce sums (the final
            scale-invariant LayerNorm restores residual equivalence)."""

            def __init__(self, branch, dim, num_streams, layer_index):
                super().__init__()
                import torch as _t
                self.branch = branch
                s = num_streams
                onehot = _t.zeros(s)
                onehot[layer_index % s] = 1.0
                self.alpha_in = nn.Parameter(onehot.clone())
                self.alpha_mix = nn.Parameter(_t.eye(s))
                self.beta = nn.Parameter(_t.ones(s))
                self.dyn_alpha_w = nn.Parameter(_t.zeros(dim, s + 1))
                self.dyn_alpha_scale = nn.Parameter(_t.tensor(1e-2))
                self.dyn_beta_w = nn.Parameter(_t.zeros(dim))
                self.dyn_beta_scale = nn.Parameter(_t.tensor(1e-2))

            def forward(self, streams, *a, **k):
                import torch as _t
                xbar = streams * _t.rsqrt(
                    streams.pow(2).mean(-1, keepdim=True) + 1e-6)
                dyn_a = _t.tanh(xbar @ self.dyn_alpha_w) * self.dyn_alpha_scale
                dyn_b = _t.tanh(xbar @ self.dyn_beta_w) * self.dyn_beta_scale
                a_in = self.alpha_in[:, None, None] + dyn_a[..., 0]
                branch_in = _t.einsum("sbn,sbnd->bnd", a_in, streams)
                mix = self.alpha_mix[:, None, None, :] + dyn_a[..., 1:]
                mixed = _t.einsum("sbnt,sbnd->tbnd", mix, streams)
                beta = self.beta[:, None, None] + dyn_b
                out = self.branch(branch_in, *a, **k)
                rest = None
                if isinstance(out, tuple):
                    out, *rest = out
                streams = mixed + beta[..., None] * out[None]
                if rest:
                    return (streams, *rest)
                return streams

        class _Expand(nn.Module):
            def __init__(self, n):
                super().__init__()
                self.n = n

            def forward(self, x):
                return x[None].expand(self.n, *x.shape).contiguous()

        class _Reduce(nn.Module):
            def forward(self, streams):
                return streams.sum(0)

        def get_init_and_expand_reduce_stream_functions(n, disable=False):
            if disable:
                def init_hyper_conn(*, dim, branch):
                    return _Residual(branch)

                ident = nn.Identity()
                return init_hyper_conn, ident, ident

            counter = iter(range(10 ** 6))

            def init_hyper_conn(*, dim, branch):
                return _HyperConnection(branch, dim, n, next(counter))

            return init_hyper_conn, _Expand(n), _Reduce()

        m.get_init_and_expand_reduce_stream_functions = \
            get_init_and_expand_reduce_stream_functions
        m.Residual = _Residual
        m.HyperConnection = _HyperConnection

    if "torchaudio" not in sys.modules:
        m = _new_module("torchaudio")

        def _unavailable(*a, **k):
            raise RuntimeError("torchaudio stub: not usable in parity tests")

        m.load = _unavailable
        m.save = _unavailable
        mf = _new_module("torchaudio.functional")
        mf.resample = _unavailable
        mt = _new_module("torchaudio.transforms")

        class _Transform(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            forward = staticmethod(_unavailable)

        mt.MelSpectrogram = _Transform
        mt.Spectrogram = _Transform
        m.functional = mf
        m.transforms = mt

    if "beartype" not in sys.modules:
        m = _new_module("beartype")

        def beartype(f=None, **k):
            if f is None:
                return lambda g: g
            return f

        m.beartype = beartype
        import typing
        mt = _new_module("beartype.typing")
        for n in dir(typing):
            if not n.startswith("_"):
                setattr(mt, n, getattr(typing, n))
        m.typing = mt

    if "beartype.door" not in sys.modules:
        md = _new_module("beartype.door")
        md.is_bearable = lambda obj, hint: True

    # joblib IS installed (sklearn depends on it) — do NOT stub it
    for absent in ("fairseq", "ema_pytorch"):
        if absent not in sys.modules:
            _new_module(absent)

    if "encodec" not in sys.modules:
        m = _new_module("encodec")

        class _EncodecModel:
            @staticmethod
            def encodec_model_24khz(*a, **k):
                raise RuntimeError("encodec stub")

        m.EncodecModel = _EncodecModel
        mu = _new_module("encodec.utils")
        mu._linear_overlap_add = None

    # bypass the reference package __init__ (it imports the whole world);
    # submodules resolve through __path__
    if "audiolm_pytorch" not in sys.modules:
        pkg = types.ModuleType("audiolm_pytorch")
        pkg.__path__ = [f"{REF_DIR}/audiolm_pytorch"]
        sys.modules["audiolm_pytorch"] = pkg


def load_reference(submodule: str):
    """import audiolm_pytorch.<submodule> with stubs installed."""
    install_stubs()
    import importlib
    return importlib.import_module(f"audiolm_pytorch.{submodule}")
