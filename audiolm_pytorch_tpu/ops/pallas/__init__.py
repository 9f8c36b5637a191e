"""Pallas TPU kernels for the hot ops (flash attention with additive bias,
blocked local attention). Each kernel has an XLA fallback behind the same
signature; `interpret=True` is used automatically off-TPU so tests exercise
the kernels on the CPU mesh."""
import jax


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


from .flash_attention import flash_attention  # noqa: E402

__all__ = ["flash_attention", "on_tpu"]
