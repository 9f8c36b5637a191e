"""audiolm_pytorch_tpu — TPU-native AudioLM framework (JAX/XLA/Pallas/pjit).

Public API mirrors the reference package exports
(reference: audiolm_pytorch/__init__.py:1-20).
"""
from .version import __version__

from .models.audiolm import AudioLM
from .models.soundstream import (SoundStream, AudioLMSoundStream,
                                 MusicLMSoundStream)
from .models.encodec import EncodecWrapper
from .models.lm import (SemanticTransformer, CoarseTransformer, FineTransformer)
from .models.wrappers import (SemanticTransformerWrapper,
                              CoarseTransformerWrapper, FineTransformerWrapper)
from .models.vq_wav2vec import FairseqVQWav2Vec
from .models.hubert import HubertWithKmeans

from .training.trainer import (SoundStreamTrainer, SemanticTransformerTrainer,
                               CoarseTransformerTrainer, FineTransformerTrainer)

from .ops.sampling import get_embeds

__all__ = [
    "AudioLM",
    "SoundStream", "AudioLMSoundStream", "MusicLMSoundStream",
    "EncodecWrapper",
    "SemanticTransformer", "CoarseTransformer", "FineTransformer",
    "SemanticTransformerWrapper", "CoarseTransformerWrapper",
    "FineTransformerWrapper",
    "FairseqVQWav2Vec", "HubertWithKmeans",
    "SoundStreamTrainer", "SemanticTransformerTrainer",
    "CoarseTransformerTrainer", "FineTransformerTrainer",
    "get_embeds",
    "__version__",
]
