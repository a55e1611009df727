"""Edit-training dataset (host-side, numpy).

Parity target: ref:univa/dataset/qwen2vl_dataset.py —
- data.txt lines `image_root,json_path,need_weight` (:359-388)
- conversations -> ChatML; trailing <gen_image> becomes the
  <|vision_start|> generation trigger (:515-529)
- CFG prompt drop to "Generate an image." (:482-504)
- one `<image>` expands to <|vision_start|> + N x <|image_pad|> +
  <|vision_end|> (:814-872); N from the ViT view grid
- dual image views: ViT patches AND VAE pixels (:733-772)
- region weight masks per ref/target diff (get_mask)
- errors resample a random item (:687-691); token-budget guard (:645-654)
- `random_data` synthetic smoke mode (:393-459)
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, Dict, List, Optional

import numpy as np
from PIL import Image

from gpt_image_edit_tpu.data import constants as C
from gpt_image_edit_tpu.data.image_processing import (
    fit_ref_to_target,
    preprocess_vae_image,
    preprocess_vit_patches,
)
from gpt_image_edit_tpu.data.masks import region_weight_tokens
from gpt_image_edit_tpu.data.prompter import Qwen2VLPrompter


class EditDataset:
    def __init__(
        self,
        *,
        tokenizer,
        data_txt: str = "",
        height: int = 512,
        width: int = 512,
        min_pixels: int = 200704,
        max_pixels: int = 200704,
        drop_prompt_rate: float = 0.0,
        mask_weight_type: Optional[str] = "log",
        max_seq_len: int = 2048,
        random_data: bool = False,
        notry: bool = False,
        seed: int = 0,
        patch_size: int = 14,
        merge_size: int = 2,
        temporal_patch_size: int = 2,
        latent_downscale: int = 8,
        use_native: bool = True,  # C++ image-prep library when buildable
    ):
        self.patch_size = patch_size
        self.merge_size = merge_size
        self.temporal_patch_size = temporal_patch_size
        self.latent_downscale = latent_downscale
        if use_native:
            from gpt_image_edit_tpu.data import native as _native

            self._vit_fn = _native.preprocess_vit_patches_native
        else:
            self._vit_fn = preprocess_vit_patches
        self.tokenizer = tokenizer
        self.prompter = Qwen2VLPrompter()
        self.height, self.width = height, width
        self.min_pixels, self.max_pixels = min_pixels, max_pixels
        self.drop_prompt_rate = drop_prompt_rate
        self.mask_weight_type = mask_weight_type
        self.max_seq_len = max_seq_len
        self.random_data = random_data
        self.notry = notry
        self.rng = random.Random(seed)
        self.data: List[Dict[str, Any]] = []
        if not random_data and data_txt:
            self._load_data(data_txt)

    def _load_data(self, data_txt: str):
        with open(data_txt) as f:
            lines = [l.strip() for l in f if l.strip()]
        for line in lines:
            image_root, json_file, need_weight = line.split(",")
            with open(json_file) as f:
                items = json.load(f)
            for item in items:
                imgs = item.get("image", [])
                if isinstance(imgs, str):
                    imgs = [imgs]
                item["image"] = [os.path.join(image_root, p) for p in imgs]
                item["need_weight"] = need_weight.strip().lower() == "true"
                self.data.append(item)

    def __len__(self):
        return max(len(self.data), 1) if not self.random_data else 10000

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if self.random_data:
            return self._random_item(idx)
        try:
            return self._real_item(self.data[idx % len(self.data)])
        except Exception:
            if self.notry:
                raise
            # resample on bad sample (ref :687-691)
            return self[self.rng.randrange(len(self.data))]

    # ------------------------------------------------------------------
    def _random_item(self, idx: int) -> Dict[str, Any]:
        rng = np.random.default_rng(idx)
        ref = Image.fromarray(
            rng.integers(0, 256, (self.height, self.width, 3), dtype=np.uint8), "RGB"
        )
        target = Image.fromarray(
            rng.integers(0, 256, (self.height, self.width, 3), dtype=np.uint8), "RGB"
        )
        convo = [
            {"from": "user", "value": "make the sky dramatic <image>"},
            {"from": "assistant", "value": C.GENERATE_TOKEN},
        ]
        return self._build(convo, [ref], target, need_weight=True)

    def _real_item(self, item: Dict[str, Any]) -> Dict[str, Any]:
        convo = []
        for turn in item["conversations"]:
            role = {"human": "user", "gpt": "assistant", "system": "system"}.get(
                turn["from"], turn["from"]
            )
            convo.append({"from": role, "value": turn["value"]})
        images = [Image.open(p) for p in item["image"]]
        # last image is the edit TARGET; earlier ones are conditioning refs
        assert images, "edit sample needs at least a target image"
        target = images[-1]
        refs = images[:-1]
        return self._build(convo, refs, target, need_weight=item.get("need_weight", True))

    # ------------------------------------------------------------------
    def _build(
        self,
        convo: List[Dict[str, str]],
        refs: List[Image.Image],
        target: Image.Image,
        need_weight: bool,
    ) -> Dict[str, Any]:
        th, tw = self.height, self.width
        drop_prompt = self.rng.random() < self.drop_prompt_rate

        # generation trigger: assistant turn ending in <gen_image> ->
        # <|vision_start|> right after the assistant header (ref :515-529)
        gen = any(C.GENERATE_TOKEN in c["value"] for c in convo)
        convo = [c for c in convo if C.GENERATE_TOKEN not in c["value"]]
        if drop_prompt:
            n_imgs = sum(c["value"].count("<image>") for c in convo)
            convo = [
                {"from": "user", "value": "<image>" * n_imgs + "Generate an image."}
            ]
        prompt = self.prompter(convo, add_generation_prompt=True)
        if gen:
            prompt += C.SPECIAL_TOKENS["image_begin_token"]

        # dual views of each conditioning image
        pixel_patches, grids, ref_pixels = [], [], []
        for ref in refs:
            ref_fit = fit_ref_to_target(ref, th, tw)
            flat, grid = self._vit_fn(
                ref,
                patch_size=self.patch_size,
                merge_size=self.merge_size,
                temporal_patch_size=self.temporal_patch_size,
                min_pixels=self.min_pixels,
                max_pixels=self.max_pixels,
            )
            pixel_patches.append(flat)
            grids.append(grid)
            ref_pixels.append(preprocess_vae_image(ref_fit, th, tw))

        # expand <image> -> begin + N pads + end in the prompt string
        for grid in grids:
            n_tokens = (grid[0] * grid[1] * grid[2]) // 4
            expansion = (
                C.SPECIAL_TOKENS["image_begin_token"]
                + C.SPECIAL_TOKENS["image_token"] * n_tokens
                + C.SPECIAL_TOKENS["image_end_token"]
            )
            prompt = prompt.replace("<image>", expansion, 1)
        assert "<image>" not in prompt, "more <image> placeholders than images"

        input_ids = np.asarray(self.tokenizer.encode(prompt), dtype=np.int64)
        if len(input_ids) > self.max_seq_len:
            raise ValueError(f"sample too long: {len(input_ids)}")

        target_pixels = preprocess_vae_image(target, th, tw)
        tok_down = 2 * self.latent_downscale  # packed token = 2x2 latents
        if ref_pixels and self.mask_weight_type and need_weight:
            weights = region_weight_tokens(
                ref_pixels[0], target_pixels,
                weight_type=self.mask_weight_type,
                latent_down=self.latent_downscale,
            )
        else:
            weights = np.ones(((th // tok_down) * (tw // tok_down),), np.float32)

        return {
            "input_ids": input_ids,
            "pixel_patches": np.concatenate(pixel_patches, 0) if pixel_patches else None,
            "grid_thw": np.asarray(grids, dtype=np.int64) if grids else None,
            "ref_pixels": ref_pixels[0] if ref_pixels else None,
            "target_pixels": target_pixels,
            "weight_tokens": weights,
            "prompt": prompt,
        }
