"""End-to-end AudioLM: semantic → coarse → fine → waveform
(reference: audiolm_pytorch/audiolm_pytorch.py:2141-2254).

Each stage's `.generate` is a single compiled lax loop (see wrappers.py); this
class only chains them and routes the (once-computed) text embedding to the
stages that condition on it (reference: audiolm_pytorch.py:2163-2166, 2227-2247).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from ..nn.layers import default, exists
from ..nn.module import Module
from .lm import CoarseTransformer, FineTransformer, SemanticTransformer
from .wrappers import (CoarseTransformerWrapper, FineTransformerWrapper,
                       SemanticTransformerWrapper)

__all__ = ["AudioLM"]


class AudioLM(Module):
    def __init__(self, *, wav2vec, codec,
                 semantic_transformer: SemanticTransformer,
                 coarse_transformer: CoarseTransformer,
                 fine_transformer: FineTransformer,
                 audio_conditioner=None, unique_consecutive: bool = True):
        # cross-model compatibility asserts (reference: audiolm_pytorch.py:2158-2161)
        assert semantic_transformer.num_semantic_tokens == coarse_transformer.num_semantic_tokens
        assert coarse_transformer.codebook_size == fine_transformer.codebook_size
        assert coarse_transformer.num_coarse_quantizers == fine_transformer.num_coarse_quantizers
        assert (fine_transformer.num_coarse_quantizers +
                fine_transformer.num_fine_quantizers) == codec.num_quantizers

        self.audio_conditioner = audio_conditioner
        self.semantic_has_condition = semantic_transformer.has_condition
        self.coarse_has_condition = coarse_transformer.has_condition
        self.fine_has_condition = fine_transformer.has_condition
        self.needs_text = any([self.semantic_has_condition,
                               self.coarse_has_condition, self.fine_has_condition])

        self.semantic = SemanticTransformerWrapper(
            wav2vec=wav2vec, transformer=semantic_transformer,
            audio_conditioner=audio_conditioner,
            unique_consecutive=unique_consecutive)
        self.coarse = CoarseTransformerWrapper(
            wav2vec=wav2vec, codec=codec, transformer=coarse_transformer,
            audio_conditioner=audio_conditioner,
            unique_consecutive=unique_consecutive)
        self.fine = FineTransformerWrapper(
            codec=codec, transformer=fine_transformer,
            audio_conditioner=audio_conditioner)

    @property
    def sample_rate(self):
        return self.coarse.codec.target_sample_hz

    def __call__(self, *, batch_size: int = 1, text=None, text_embeds=None,
                 prime_wave=None, prime_wave_input_sample_hz=None,
                 prime_wave_path=None, max_length: int = 2048,
                 max_coarse_time_steps: int = 512,
                 return_coarse_generated_wave: bool = False,
                 mask_out_generated_fine_tokens: bool = False,
                 speculative: bool = False,
                 has_padding: "bool | None" = None, key=None):
        # speculative: draft-then-verify multi-quantizer decode in the coarse
        # and fine stages (models/wrappers.py); token-equivalent at
        # temperature->0, measured faster at the reference configs (bench.py
        # gen_3stage_rtf_speculative). Our extension - no reference analogue
        # (their nested loop: audiolm_pytorch.py:1677-1706).
        assert not (self.needs_text and (not exists(text) and not exists(text_embeds))), \
            "text must be provided when any transformer is text-conditioned"
        key = default(key, jax.random.PRNGKey(0))
        k1, k2, k3 = jax.random.split(key, 3)

        if self.needs_text and exists(text):
            text_embeds = self.semantic.embed_text(text)

        assert not (exists(prime_wave) and exists(prime_wave_path))
        if exists(prime_wave):
            assert exists(prime_wave_input_sample_hz), \
                "prime_wave_input_sample_hz required with prime_wave"
            prime_wave = jnp.asarray(prime_wave)
        elif exists(prime_wave_path):
            from ..utils.audio_io import load_audio
            path = Path(prime_wave_path)
            assert path.exists(), f"file does not exist at {path}"
            wav, prime_wave_input_sample_hz = load_audio(path)
            prime_wave = jnp.asarray(wav.mean(axis=0))[None]  # mono (1, T)

        semantic_token_ids = self.semantic.generate(
            text_embeds=text_embeds if self.semantic_has_condition else None,
            batch_size=batch_size, prime_wave=prime_wave,
            prime_wave_input_sample_hz=prime_wave_input_sample_hz,
            max_length=max_length, key=k1)

        coarse_out = self.coarse.generate(
            text_embeds=text_embeds if self.coarse_has_condition else None,
            semantic_token_ids=semantic_token_ids, prime_wave=prime_wave,
            prime_wave_input_sample_hz=prime_wave_input_sample_hz,
            max_time_steps=max_coarse_time_steps,
            reconstruct_wave=return_coarse_generated_wave,
            speculative=speculative, has_padding=has_padding, key=k2)

        if return_coarse_generated_wave:
            return coarse_out

        generated_wave = self.fine.generate(
            text_embeds=text_embeds if self.fine_has_condition else None,
            coarse_token_ids=coarse_out, prime_wave=prime_wave,
            prime_wave_input_sample_hz=prime_wave_input_sample_hz,
            reconstruct_wave=True,
            mask_out_generated_fine_tokens=mask_out_generated_fine_tokens,
            speculative=speculative, has_padding=has_padding, key=k3)
        return generated_wave
