"""FLUX text-conditioning helpers (ref:univa/utils/denoiser_prompt_embedding_flux.py).

encode_prompt(text) -> (t5_embeds (B, 512, 4096), clip_pooled (B, 768)).
The reference's defaults: T5 max_sequence_length 512 (256 for the empty
training prompt), CLIP 77 tokens; both tokenizers ship inside the FLUX
checkpoint dir (tokenizer/ = CLIP, tokenizer_2/ = T5)."""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from gpt_image_edit_tpu.models import clip as clip_mod
from gpt_image_edit_tpu.models import t5 as t5_mod


class FluxTextEncoders:
    """Lazy container: CLIP and T5 weights are loaded on first use, so a
    caller that only needs the 768-dim CLIP pooled row (e.g. the trainer's
    empty-prompt conditioning, ref:train_denoiser.py:795-805) never
    materializes the ~19GB T5-XXL encoder."""

    def __init__(self, flux_ckpt_dir: str, offload_store=None,
                 synthetic: bool = False, quantize_t5=None):
        """`offload_store`: optional utils.offload.ComponentStore — when
        given, loaded encoder params are parked in pinned_host memory and
        staged into HBM per encode call (the T5-XXL encoder is ~9.4GB bf16;
        leaving it HBM-resident would defeat --offload's
        peak-HBM-=-one-component guarantee).

        `synthetic`: shape-only bf16 weights + the fake hash tokenizer —
        full-size serving-path perf rehearsal without checkpoints (no public
        weights ship in this environment; see utils/synthetic.py).

        `quantize_t5`: None | "int8" | "int4" — weight-only quantized T5
        trunk. The T5-XXL is the second-biggest per-request staging chunk
        under --offload (9.4GB bf16 vs int8 4.7 / int4 2.4); it is a frozen
        encoder (same error-budget argument as the int8 VLM trunk) and the
        encode itself is ~60ms, so staged bytes are what matter. CLIP-L
        (~0.25GB) always stays bf16."""
        self._dir = flux_ckpt_dir
        self.clip_cfg = clip_mod.ClipTextConfig()
        self.t5_cfg = t5_mod.T5Config()
        self._clip = None  # (tokenizer, params)
        self._t5 = None
        self._store = offload_store
        self._synthetic = synthetic
        if quantize_t5 not in (None, "int8", "int4"):
            raise ValueError(
                f"quantize_t5 must be None | 'int8' | 'int4', "
                f"got {quantize_t5!r}"
            )
        self._quantize_t5 = quantize_t5

    def _synthetic_pair(self, init_fn, cfg, qkey=None):
        import jax

        from gpt_image_edit_tpu.data.tokenizer import FakeTokenizer
        from gpt_image_edit_tpu.utils.synthetic import (
            quantized_shape_params, shape_params,
        )

        abstract = jax.eval_shape(lambda k: init_fn(k, cfg), jax.random.key(0))
        place = self._store.placement if self._store else None
        if qkey is not None:
            params = quantized_shape_params(
                abstract, qkey=qkey, float_dtype=jnp.bfloat16, place=place
            )
        else:
            params = shape_params(
                abstract, float_dtype=jnp.bfloat16, place=place
            )
        return FakeTokenizer(), params

    @property
    def clip(self):
        if self._clip is None:
            if self._synthetic:
                tok, params = self._synthetic_pair(clip_mod.init, self.clip_cfg)
            else:
                from transformers import AutoTokenizer

                from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource

                tok = AutoTokenizer.from_pretrained(f"{self._dir}/tokenizer")
                params = clip_mod.convert_clip(
                    TensorSource.from_dir(f"{self._dir}/text_encoder"), self.clip_cfg,
                    placement=(self._store.placement if self._store else None),
                )
            if self._store is not None:
                params = self._store.add("clip", params)
            self._clip = (tok, params)
        return self._clip

    @property
    def t5(self):
        if self._t5 is None:
            qmode = self._quantize_t5
            if self._synthetic:
                tok, params = self._synthetic_pair(
                    t5_mod.init, self.t5_cfg,
                    qkey={"int8": "q", "int4": "q4"}.get(qmode),
                )
            else:
                from transformers import AutoTokenizer

                from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource

                place = self._store.placement if self._store else None
                tok = AutoTokenizer.from_pretrained(f"{self._dir}/tokenizer_2")
                params = t5_mod.convert_t5(
                    TensorSource.from_dir(f"{self._dir}/text_encoder_2"),
                    self.t5_cfg, placement=place,
                )
                if qmode is not None:
                    from gpt_image_edit_tpu.utils.quantize import (
                        quantize_params,
                    )

                    params = quantize_params(
                        params,
                        mode="int4" if qmode == "int4" else "weight_only",
                        min_size=1 << 20, place=place,
                    )
            if self._store is not None:
                params = self._store.add("t5", params)
            self._t5 = (tok, params)
        return self._t5

    def evict(self):
        """Drop any staged HBM copies (offload mode; host masters stay)."""
        if self._store is not None:
            self._store.evict("clip")
            self._store.evict("t5")

    # Backwards-compatible attribute access
    @property
    def clip_tokenizer(self):
        return self.clip[0]

    @property
    def clip_params(self):
        p = self.clip[1]
        return self._store.stage("clip") if self._store is not None else p

    @property
    def t5_tokenizer(self):
        return self.t5[0]

    @property
    def t5_params(self):
        p = self.t5[1]
        return self._store.stage("t5") if self._store is not None else p

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
