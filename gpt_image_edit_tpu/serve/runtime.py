"""Serving runtime: merged checkpoint -> chat -> edit image / text answer.

Covers ref:univa/serve/cli.py's flow: ChatML conversation, LVLM
denoise_embeds, task-head generate-vs-understand routing (:199-207),
FluxKontext sampling with history images as conditioning (:210-254), and an
LM generate branch (:256-267)."""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from gpt_image_edit_tpu.data import constants as C
from gpt_image_edit_tpu.data.image_processing import (
    preprocess_vae_image,
    preprocess_vit_patches,
    smart_resize,
)
from gpt_image_edit_tpu.data.prompter import Qwen2VLPrompter
from gpt_image_edit_tpu.data.tokenizer import load_tokenizer
from gpt_image_edit_tpu.models.flux import FluxConfig, init_flux
from gpt_image_edit_tpu.models.qwen2p5vl import (
    Qwen2p5VLConfig,
    apply_qwen,
    init_qwen,
)
from gpt_image_edit_tpu.models.qwen2p5vl import language, vision
from gpt_image_edit_tpu.models.qwen2p5vl.rope_index import get_rope_index
from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae
from gpt_image_edit_tpu.pipeline.kontext import (
    KontextPipeline,
    pick_kontext_resolution,
    postprocess_to_uint8,
)

log = logging.getLogger("gie_tpu.serve")


def update_size(img: Optional[Image.Image], default: int = 1024) -> Tuple[int, int]:
    """Adaptive output size from the input aspect (ref:cli.py:82-97), snapped
    to the Kontext bucket table."""
    if img is None:
        return default, default
    w, h = pick_kontext_resolution(img.width, img.height)
    return h, w


class UnivaRuntime:
    def __init__(
        self,
        model_path: Optional[str] = None,
        flux_path: Optional[str] = None,
        *,
        tiny: bool = False,
        seed: int = 0,
        quantize: Optional[str] = None,  # "int8" weight-only (the NF4 analogue)
    ):
        self.prompter = Qwen2VLPrompter()
        self.history_images: List[Image.Image] = []
        # ViT view pixel budget (448^2 like ref:cli.py:33-34; tiny grids scale down)

        if tiny or not model_path:
            log.info("loading TINY random-weight models (demo mode)")
            self.qcfg = Qwen2p5VLConfig.tiny()
            self.fcfg = dataclasses.replace(
                FluxConfig.tiny(), joint_attention_dim=self.qcfg.projector_out
            )
            self.vcfg = VaeConfig.tiny()
            self.qwen_params = init_qwen(jax.random.key(0), self.qcfg)
            flux_params = init_flux(jax.random.key(1), self.fcfg)
            vae_params = init_vae(jax.random.key(2), self.vcfg)
            self.tokenizer = load_tokenizer("fake")
            self.vit_pixels = 3136
        else:
            from gpt_image_edit_tpu.utils.ckpt_convert import (
                TensorSource,
                convert_vae,
                load_merged_checkpoint,
            )

            self.qcfg, self.fcfg, self.vcfg = Qwen2p5VLConfig(), FluxConfig(), VaeConfig()
            self.qwen_params, flux_params = load_merged_checkpoint(
                model_path, self.qcfg, self.fcfg
            )
            vae_dir = flux_path or model_path
            vae_params = convert_vae(TensorSource.from_dir(f"{vae_dir}/vae"), self.vcfg)
            self.tokenizer = load_tokenizer(model_path)
            self.vit_pixels = 200704

        if quantize in ("int8", "w8a8"):
            from gpt_image_edit_tpu.utils.quantize import quantize_params

            mode = "w8a8" if quantize == "w8a8" else "weight_only"
            log.info("quantizing FLUX weights to int8 (%s)", mode)
            flux_params = quantize_params(flux_params, mode=mode)
        elif quantize:
            raise ValueError(f"unknown quantize mode {quantize!r} (int8 | w8a8)")

        # generate-vs-understand routing head (ref:cli.py:42-49), if shipped
        self.task_head = None
        if model_path:
            import os

            th_path = os.path.join(model_path, "task_head_final.pt")
            if os.path.exists(th_path):
                from gpt_image_edit_tpu.serve.task_head import load_task_head

                self.task_head = load_task_head(th_path)
                log.info("loaded task head from %s", th_path)

        self.pipe = KontextPipeline(flux_params, self.fcfg, vae_params, self.vcfg)
        self.rng = jax.random.key(seed)

    # ------------------------------------------------------------------
    def _encode_prompt(self, conversation, images: List[Image.Image]):
        """ChatML + <image> expansion -> LVLM denoise_embeds."""
        prompt = self.prompter(conversation, add_generation_prompt=True)
        prompt += C.SPECIAL_TOKENS["image_begin_token"]  # generation trigger

        patches, grids = [], []
        for img in images:
            flat, grid = preprocess_vit_patches(
                img,
                patch_size=self.qcfg.vision.patch_size,
                merge_size=self.qcfg.vision.spatial_merge_size,
                temporal_patch_size=self.qcfg.vision.temporal_patch_size,
                min_pixels=self.vit_pixels,
                max_pixels=self.vit_pixels,
            )
            patches.append(flat)
            grids.append(grid)
            n = int(np.prod(grid)) // self.qcfg.vision.merge_unit
            expansion = (
                C.SPECIAL_TOKENS["image_begin_token"]
                + C.SPECIAL_TOKENS["image_token"] * n
                + C.SPECIAL_TOKENS["image_end_token"]
            )
            prompt = prompt.replace("<image>", expansion, 1)

        input_ids = np.asarray([self.tokenizer.encode(prompt)], dtype=np.int64)
        attn = np.ones_like(input_ids)
        grid_thw = np.asarray(grids, dtype=np.int64) if grids else None
        pos, _ = get_rope_index(
            input_ids, grid_thw, attn,
            spatial_merge_size=self.qcfg.vision.spatial_merge_size,
            image_token_id=self.qcfg.image_token_id,
            video_token_id=self.qcfg.video_token_id,
            vision_start_token_id=self.qcfg.vision_start_token_id,
        )
        kwargs = dict(
            input_ids=jnp.asarray(input_ids),
            position_ids=jnp.asarray(pos),
            attention_mask=jnp.asarray(attn),
        )
        if patches:
            kwargs["pixel_patches"] = jnp.asarray(np.concatenate(patches, 0))
            kwargs["vision_aux"] = vision.vision_precompute(grid_thw, self.qcfg.vision)
        embeds = apply_qwen(self.qwen_params, self.qcfg, output_type="denoise_embeds", **kwargs)
        return embeds, kwargs

    # ------------------------------------------------------------------
    def edit(
        self,
        instruction: str,
        image=None,  # PIL.Image, list of PIL.Images (multi-ref), or None (t2i)
        *,
        steps: int = 28,
        guidance: float = 3.5,
        height: Optional[int] = None,
        width: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> Image.Image:
        images = (
            list(image) if isinstance(image, (list, tuple))
            else ([image] if image is not None else [])
        )
        value = "<image>" * len(images) + instruction
        conversation = [{"from": "user", "value": value}]
        embeds, _ = self._encode_prompt(conversation, images)

        first = images[0] if images else None
        if height is None or width is None:
            height, width = update_size(first)
        if self.vcfg.downscale != 8:  # tiny demo: keep it small
            height = width = 8 * self.vcfg.downscale

        cond = None
        if images:
            conds = []
            for im in images:
                bw, bh = pick_kontext_resolution(im.width, im.height)
                if self.vcfg.downscale != 8:
                    bw = bh = height
                conds.append(jnp.asarray(preprocess_vae_image(im, bh, bw))[None])
            cond = conds if len(conds) > 1 else conds[0]

        rng = jax.random.key(seed) if seed is not None else self.rng
        self.rng, sample_rng = jax.random.split(rng)
        out = self.pipe(
            prompt_embeds=embeds.astype(jnp.bfloat16),
            pooled_prompt_embeds=jnp.zeros(
                (1, self.fcfg.pooled_projection_dim), jnp.bfloat16
            ),
            image=cond,
            height=height,
            width=width,
            num_inference_steps=steps,
            guidance_scale=guidance,
            rng=sample_rng,
        )
        arr = postprocess_to_uint8(out)[0]
        return Image.fromarray(arr)

    # ------------------------------------------------------------------
    def route(self, message: str, image: Optional[Image.Image] = None) -> bool:
        """Task-head routing: True = IMAGE branch (ref:cli.py:199-207).
        Falls back to 'image present => edit' without a head."""
        if self.task_head is None:
            return image is not None
        from gpt_image_edit_tpu.serve.task_head import route as _route

        value = ("<image>" if image is not None else "") + message
        conversation = [{"from": "user", "value": value}]
        # reuse the prompt encoder but take LM hidden states
        prompt = self.prompter(conversation, add_generation_prompt=True)
        images = [image] if image is not None else []
        patches, grids = [], []
        for img in images:
            flat, grid = preprocess_vit_patches(
                img,
                patch_size=self.qcfg.vision.patch_size,
                merge_size=self.qcfg.vision.spatial_merge_size,
                min_pixels=self.vit_pixels,
                max_pixels=self.vit_pixels,
            )
            patches.append(flat)
            grids.append(grid)
            n = int(np.prod(grid)) // self.qcfg.vision.merge_unit
            prompt = prompt.replace(
                "<image>",
                C.SPECIAL_TOKENS["image_begin_token"]
                + C.SPECIAL_TOKENS["image_token"] * n
                + C.SPECIAL_TOKENS["image_end_token"],
                1,
            )
        input_ids = np.asarray([self.tokenizer.encode(prompt)], dtype=np.int64)
        attn = np.ones_like(input_ids)
        grid_thw = np.asarray(grids, dtype=np.int64) if grids else None
        pos, _ = get_rope_index(
            input_ids, grid_thw, attn,
            spatial_merge_size=self.qcfg.vision.spatial_merge_size,
            image_token_id=self.qcfg.image_token_id,
            video_token_id=self.qcfg.video_token_id,
            vision_start_token_id=self.qcfg.vision_start_token_id,
        )
        kwargs = dict(
            input_ids=jnp.asarray(input_ids),
            position_ids=jnp.asarray(pos),
            attention_mask=jnp.asarray(attn),
        )
        if patches:
            kwargs["pixel_patches"] = jnp.asarray(np.concatenate(patches, 0))
            kwargs["vision_aux"] = vision.vision_precompute(grid_thw, self.qcfg.vision)
        hidden = apply_qwen(self.qwen_params, self.qcfg, output_type="hidden", **kwargs)
        return bool(_route(self.task_head, hidden, input_ids)[0])

    def chat(self, message: str, image: Optional[Image.Image] = None, **kw):
        """One chat turn with automatic routing: returns (PIL image, None) or
        (None, text answer) — the reference REPL's behavior."""
        if self.route(message, image):
            return self.edit(message, image, **kw), None
        return None, self.answer(message, image)

    # ------------------------------------------------------------------
    def load_text_encoders(self, flux_ckpt_dir: str):
        """Load T5-XXL + CLIP-L from a FLUX checkpoint dir for the
        only_use_t5 ablation / CLIP pooled embeds (ref:train_denoiser.py:408-426)."""
        from gpt_image_edit_tpu.utils.prompt_embeds import FluxTextEncoders

        self.text_encoders = FluxTextEncoders(flux_ckpt_dir)
        return self.text_encoders

    def edit_t5_only(
        self,
        instruction: str,
        image: Optional[Image.Image] = None,
        *,
        steps: int = 28,
        guidance: float = 3.5,
        max_sequence_length: int = 512,
        seed: Optional[int] = None,
    ) -> Image.Image:
        """T5-only conditioning, bypassing the VLM (the reference's
        step1_gen_samples_T5_only ablation, ref:univa/eval/imgedit/)."""
        assert getattr(self, "text_encoders", None) is not None, (
            "call load_text_encoders(flux_ckpt_dir) first"
        )
        embeds, pooled = self.text_encoders.encode_prompt(
            [instruction], max_sequence_length
        )
        height, width = update_size(image)
        cond = None
        if image is not None:
            bw, bh = pick_kontext_resolution(image.width, image.height)
            cond = jnp.asarray(preprocess_vae_image(image, bh, bw))[None]
        rng = jax.random.key(seed) if seed is not None else self.rng
        self.rng, sample_rng = jax.random.split(rng)
        out = self.pipe(
            prompt_embeds=embeds.astype(jnp.bfloat16),
            pooled_prompt_embeds=pooled.astype(jnp.bfloat16),
            image=cond,
            height=height, width=width,
            num_inference_steps=steps, guidance_scale=guidance,
            rng=sample_rng,
        )
        return Image.fromarray(postprocess_to_uint8(out)[0])

    # ------------------------------------------------------------------
    def answer(
        self,
        question: str,
        image: Optional[Image.Image] = None,
        *,
        max_new_tokens: int = 64,
    ) -> str:
        """Understanding branch: KV-cache greedy decode (ref:cli.py:256-267)."""
        images = [image] if image is not None else []
        value = ("<image>" if image is not None else "") + question
        conversation = [{"from": "user", "value": value}]
        prompt = self.prompter(conversation, add_generation_prompt=True)

        patches, grids = [], []
        for img in images:
            flat, grid = preprocess_vit_patches(
                img,
                patch_size=self.qcfg.vision.patch_size,
                merge_size=self.qcfg.vision.spatial_merge_size,
                min_pixels=self.vit_pixels,
                max_pixels=self.vit_pixels,
            )
            patches.append(flat)
            grids.append(grid)
            n = int(np.prod(grid)) // self.qcfg.vision.merge_unit
            expansion = (
                C.SPECIAL_TOKENS["image_begin_token"]
                + C.SPECIAL_TOKENS["image_token"] * n
                + C.SPECIAL_TOKENS["image_end_token"]
            )
            prompt = prompt.replace("<image>", expansion, 1)

        from gpt_image_edit_tpu.models.qwen2p5vl.model import generate_greedy

        input_ids = np.asarray([self.tokenizer.encode(prompt)], dtype=np.int64)
        attn = np.ones_like(input_ids)
        grid_thw = np.asarray(grids, dtype=np.int64) if grids else None
        pos, deltas = get_rope_index(
            input_ids, grid_thw, attn,
            spatial_merge_size=self.qcfg.vision.spatial_merge_size,
            image_token_id=self.qcfg.image_token_id,
            video_token_id=self.qcfg.video_token_id,
            vision_start_token_id=self.qcfg.vision_start_token_id,
        )
        kwargs = {}
        if patches:
            kwargs = dict(
                pixel_patches=jnp.asarray(np.concatenate(patches, 0)),
                vision_aux=vision.vision_precompute(grid_thw, self.qcfg.vision),
            )
        out_tokens = generate_greedy(
            self.qwen_params, self.qcfg,
            input_ids=jnp.asarray(input_ids),
            position_ids=jnp.asarray(pos),
            rope_delta=int(deltas[0, 0]),
            attention_mask=jnp.asarray(attn),
            max_new_tokens=max_new_tokens,
            eos_token_id=getattr(self.tokenizer, "eos_token_id", C.IM_END_ID),
            **kwargs,
        )
        if hasattr(self.tokenizer, "decode"):
            return self.tokenizer.decode(out_tokens, skip_special_tokens=True)
        return " ".join(map(str, out_tokens))
