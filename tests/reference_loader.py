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

        def get_init_and_expand_reduce_stream_functions(n, disable=False):
            assert disable, (
                "parity stub supports only num_residual_streams=1 "
                "(the real hyper-connections lib is not in this image)")

            def init_hyper_conn(*, dim, branch):
                return _Residual(branch)

            ident = nn.Identity()
            return init_hyper_conn, ident, ident

        m.get_init_and_expand_reduce_stream_functions = \
            get_init_and_expand_reduce_stream_functions
        m.Residual = _Residual

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
