"""FLUX text-conditioning helpers (ref:univa/utils/denoiser_prompt_embedding_flux.py).

encode_prompt(text) -> (t5_embeds (B, 512, 4096), clip_pooled (B, 768)).
The reference's defaults: T5 max_sequence_length 512 (256 for the empty
training prompt), CLIP 77 tokens; both tokenizers ship inside the FLUX
checkpoint dir (tokenizer/ = CLIP, tokenizer_2/ = T5)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models import clip as clip_mod
from gpt_image_edit_tpu.models import t5 as t5_mod


class FluxTextEncoders:
    def __init__(self, flux_ckpt_dir: str):
        from transformers import AutoTokenizer

        from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource

        self.clip_cfg = clip_mod.ClipTextConfig()
        self.t5_cfg = t5_mod.T5Config()
        self.clip_tokenizer = AutoTokenizer.from_pretrained(f"{flux_ckpt_dir}/tokenizer")
        self.t5_tokenizer = AutoTokenizer.from_pretrained(f"{flux_ckpt_dir}/tokenizer_2")
        self.clip_params = clip_mod.convert_clip(
            TensorSource.from_dir(f"{flux_ckpt_dir}/text_encoder"), self.clip_cfg
        )
        self.t5_params = t5_mod.convert_t5(
            TensorSource.from_dir(f"{flux_ckpt_dir}/text_encoder_2"), self.t5_cfg
        )

    def encode_clip_pooled(self, prompts: List[str]) -> jnp.ndarray:
        """(B, 768) pooled embeds
        (ref:denoiser_prompt_embedding_flux.py:_encode_prompt_with_clip)."""
        toks = self.clip_tokenizer(
            prompts, padding="max_length", max_length=77, truncation=True,
            return_tensors="np",
        )
        _, pooled = clip_mod.apply(
            self.clip_params, self.clip_cfg, jnp.asarray(toks["input_ids"])
        )
        return pooled

    def encode_t5(self, prompts: List[str], max_length: int = 512) -> jnp.ndarray:
        """(B, L, 4096) sequence embeds
        (ref:denoiser_prompt_embedding_flux.py:_encode_prompt_with_t5)."""
        toks = self.t5_tokenizer(
            prompts, padding="max_length", max_length=max_length, truncation=True,
            return_tensors="np",
        )
        return t5_mod.apply(
            self.t5_params, self.t5_cfg, jnp.asarray(toks["input_ids"])
        )

    def encode_prompt(
        self, prompts: List[str], max_sequence_length: int = 512
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(t5_embeds, pooled) — the reference's encode_prompt
        (ref:denoiser_prompt_embedding_flux.py:107-144)."""
        return (
            self.encode_t5(prompts, max_sequence_length),
            self.encode_clip_pooled(prompts),
        )
