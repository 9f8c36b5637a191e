"""Misc utilities (reference: audiolm_pytorch/utils.py:1-17)."""
from ..ops.sampling import curtail_to_multiple  # re-export, API parity


class AudioConditionerBase:
    """Marker base class for MuLaN-style audio conditioners
    (reference: utils.py:16-17; consumed at audiolm_pytorch.py:1379)."""


__all__ = ["curtail_to_multiple", "AudioConditionerBase"]
