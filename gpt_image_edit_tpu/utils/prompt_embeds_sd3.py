"""SD3 triple-encoder prompt embeddings
(ref:univa/utils/denoiser_prompt_embedding.py).

Assembly per the reference's encode_prompt (:79-128):
- CLIP-L and CLIP-G (both CLIPTextModelWithProjection): sequence embeds are
  the PENULTIMATE layer hidden states, pooled = text_projection(eos hidden).
- clip_prompt_embeds = concat([L, G], -1)  (768 + 1280 = 2048), zero-padded
  on the feature dim up to the T5 width (4096).
- prompt_embeds = concat([padded clip seq, T5 seq], -2)  (77 + max_len rows).
- pooled_prompt_embeds = concat([L pooled, G pooled], -1)  (2048,).

Lazy like FluxTextEncoders: encoders load on first use.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from gpt_image_edit_tpu.models import clip as clip_mod
from gpt_image_edit_tpu.models import t5 as t5_mod


class Sd3TextEncoders:
    def __init__(self, sd3_ckpt_dir: str):
        self._dir = sd3_ckpt_dir
        self.clip_l_cfg = clip_mod.ClipTextConfig.sd3_clip_l()
        self.clip_g_cfg = clip_mod.ClipTextConfig.sd3_clip_g()
        self.t5_cfg = t5_mod.T5Config()
        self._clip_l = None
        self._clip_g = None
        self._t5 = None

    def _load_clip(self, sub_tok: str, sub_enc: str, cfg):
        from transformers import AutoTokenizer

        from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource

        tok = AutoTokenizer.from_pretrained(f"{self._dir}/{sub_tok}")
        params = clip_mod.convert_clip(
            TensorSource.from_dir(f"{self._dir}/{sub_enc}"), cfg
        )
        return tok, params

    @property
    def clip_l(self):
        if self._clip_l is None:
            self._clip_l = self._load_clip("tokenizer", "text_encoder", self.clip_l_cfg)
        return self._clip_l

    @property
    def clip_g(self):
        if self._clip_g is None:
            self._clip_g = self._load_clip("tokenizer_2", "text_encoder_2", self.clip_g_cfg)
        return self._clip_g

    @property
    def t5(self):
        if self._t5 is None:
            from transformers import AutoTokenizer

            from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource

            tok = AutoTokenizer.from_pretrained(f"{self._dir}/tokenizer_3")
            params = t5_mod.convert_t5(
                TensorSource.from_dir(f"{self._dir}/text_encoder_3"), self.t5_cfg
            )
            self._t5 = (tok, params)
        return self._t5

    def _encode_clip(self, which, cfg, prompts: List[str]):
        tok, params = which
        ids = tok(
            prompts, padding="max_length", max_length=77, truncation=True,
            return_tensors="np",
        )["input_ids"]
        seq, pooled = clip_mod.apply(
            params, cfg, jnp.asarray(ids), output_penultimate=True
        )
        return seq, pooled

    def encode_prompt(
        self,
        prompts: List[str],
        max_sequence_length: int = 256,
        only_positive_t5: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """-> (clip_prompt_embeds padded to T5 width, prompt_embeds
        [clip ++ t5 along seq], pooled (B, 2048)) — the reference's
        encode_prompt return triple (ref:denoiser_prompt_embedding.py:79-128).
        only_positive_t5 feeds '' to the CLIPs (ablation flag)."""
        clip_prompts = [""] * len(prompts) if only_positive_t5 else prompts
        seq_l, pooled_l = self._encode_clip(self.clip_l, self.clip_l_cfg, clip_prompts)
        seq_g, pooled_g = self._encode_clip(self.clip_g, self.clip_g_cfg, clip_prompts)
        clip_seq = jnp.concatenate([seq_l, seq_g], axis=-1)
        pooled = jnp.concatenate([pooled_l, pooled_g], axis=-1)

        tok5, params5 = self.t5
        ids5 = tok5(
            prompts, padding="max_length", max_length=max_sequence_length,
            truncation=True, return_tensors="np",
        )["input_ids"]
        t5_seq = t5_mod.apply(params5, self.t5_cfg, jnp.asarray(ids5))

        pad = t5_seq.shape[-1] - clip_seq.shape[-1]
        clip_padded = jnp.pad(clip_seq, ((0, 0), (0, 0), (0, pad)))
        prompt_embeds = jnp.concatenate(
            [clip_padded, t5_seq.astype(clip_padded.dtype)], axis=-2
        )
        return clip_padded, prompt_embeds, pooled
