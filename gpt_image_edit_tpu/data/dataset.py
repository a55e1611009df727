"""Edit-training dataset (host-side, numpy).

Parity target: ref:univa/dataset/qwen2vl_dataset.py —
- data.txt lines `image_root,json_path,need_weight` (:359-388)
- conversations -> ChatML; trailing <gen_image> becomes the
  <|vision_start|> generation trigger (:515-529)
- CFG prompt drop to "Generate an image." (:482-504)
- one `<image>` expands to <|vision_start|> + N x <|image_pad|> +
  <|vision_end|> (:814-872); N from the ViT view grid
- dual image views: ViT patches AND VAE pixels (:733-772)
- labels: assistant spans are CE labels, everything else -100 (:585-599)
- OCR prompt injection before the user turn's eos (:531-548)
- Step1X quote-protecting tokenization (:32-255, :556-575)
- ALL reference images kept for Kontext conditioning (the reference concats
  every ref latent, ref:train_denoiser.py:1006-1055)
- region weight masks per ref/target diff (get_mask)
- errors resample a random item (:687-691); token-budget guard (:645-654)
- `random_data` synthetic smoke mode (:393-459)

TPU-first: multi-resolution training uses per-sample bucket selection +
per-bucket batching (static shapes) instead of the reference's hetero
list-of-tensors pad/mask path (ref:train_denoiser.py:904-916).
"""

from __future__ import annotations

import json
import math
import os
import random
from typing import Any, Dict, List, Optional, Sequence, Tuple

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
from gpt_image_edit_tpu.data.step1x_tokenizer import Step1XTokenizer

IGNORE_INDEX = -100


def pick_bucket(
    buckets: Sequence[Tuple[int, int]], height: int, width: int
) -> Tuple[int, int]:
    """Bucket whose aspect ratio is closest (in log space) to the image's."""
    aspect = math.log(max(width, 1) / max(height, 1))
    return min(buckets, key=lambda b: abs(math.log(b[1] / b[0]) - aspect))


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
        ocr_enhancer: bool = False,
        use_step1x: bool = False,
        resolution_buckets: Optional[Sequence[Tuple[int, int]]] = None,
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
        # quote-protecting tokenize path (ref:qwen2vl_dataset.py:556-575);
        # Step1XTokenizer auto-disables itself after repeated failures
        self.step1x = (
            Step1XTokenizer(tokenizer, image_token=C.SPECIAL_TOKENS["image_token"])
            if use_step1x
            else None
        )
        self.ocr_enhancer = ocr_enhancer
        self.prompter = Qwen2VLPrompter()
        self.height, self.width = height, width
        self.resolution_buckets = (
            [tuple(b) for b in resolution_buckets] if resolution_buckets else None
        )
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

    def _encode(self, text: str) -> List[int]:
        if self.step1x is not None:
            return self.step1x.encode(text)
        return self.tokenizer.encode(text)

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
    def _target_size(self, target: Image.Image) -> Tuple[int, int]:
        if self.resolution_buckets:
            return pick_bucket(self.resolution_buckets, target.height, target.width)
        return self.height, self.width

    def _build(
        self,
        convo: List[Dict[str, str]],
        refs: List[Image.Image],
        target: Image.Image,
        need_weight: bool,
    ) -> Dict[str, Any]:
        th, tw = self._target_size(target)
        # CFG prompt drop only applies to generation samples
        # (ref:qwen2vl_dataset.py:482 only_generated_task branch)
        drop_prompt = (
            any(C.GENERATE_TOKEN in c["value"] for c in convo)
            and self.rng.random() < self.drop_prompt_rate
        )

        # the last user turn is the instruction (used for T5 conditioning,
        # ref:qwen2vl_dataset.py:477 "The last turn instruction ... t5_embed")
        instruction = ""
        for c in convo:
            if c["from"] == "user":
                instruction = c["value"].replace("<image>", "").replace("\n", "")

        if drop_prompt:
            # CFG drop: the reference keeps NO image tokens in the dropped
            # prompt (ref :482-504 commented-out variant unused)
            convo = [
                {"from": "user", "value": "Generate an image."},
                {"from": "assistant", "value": C.GENERATE_TOKEN},
            ]

        # dual views of each conditioning image. Under drop_prompt the
        # reference both skips ViT pixels AND zeroes the VAE conditioning
        # (ref:qwen2vl_dataset.py:770-782) — a true unconditional sample.
        pixel_patches, grids, ref_pixels = [], [], []
        mask_ref = None  # weight masks always use the REAL first ref
        for ref in refs:
            ref_fit = fit_ref_to_target(ref, th, tw)
            vae_view = preprocess_vae_image(ref_fit, th, tw)
            if mask_ref is None:
                mask_ref = vae_view
            ref_pixels.append(np.zeros_like(vae_view) if drop_prompt else vae_view)
            if drop_prompt:
                continue
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

        # span-wise assembly: assistant spans are labels (ref :585-599)
        spans = self.prompter.get_train_prompt(convo)
        input_ids: List[int] = []
        labels: List[int] = []
        processed: List[str] = []
        grid_iter = iter(grids)
        cur_img = 0
        for text, is_label in spans:
            if C.GENERATE_TOKEN in text:
                # gen trigger replaces "<gen_image><eos>" (ref :515-529)
                assert is_label, "generation token must be in an assistant turn"
                text = text.replace(
                    f"{C.GENERATE_TOKEN}<|im_end|>\n",
                    C.SPECIAL_TOKENS["image_begin_token"],
                )
            n_img_here = text.count("<image>")
            if n_img_here and self.ocr_enhancer and not drop_prompt:
                # OCR phrases appended before this turn's eos (ref :531-548)
                from gpt_image_edit_tpu.utils.ocr import ocr_phrases_for_image

                sentences = []
                for i in range(n_img_here):
                    phrase = ocr_phrases_for_image(refs[cur_img + i], cur_img + i)
                    if phrase:
                        sentences.append(phrase)
                ocr_text = "\n".join(sentences)
                if len(ocr_text.split()) > 256:  # ref truncates at 256 words
                    ocr_text = " ".join(ocr_text.split()[:256])
                if ocr_text:
                    text = text.replace("<|im_end|>", f"{ocr_text} <|im_end|>", 1)
            for _ in range(n_img_here):
                grid = next(grid_iter)
                n_tokens = (grid[0] * grid[1] * grid[2]) // (self.merge_size ** 2)
                text = text.replace(
                    "<image>",
                    C.SPECIAL_TOKENS["image_begin_token"]
                    + C.SPECIAL_TOKENS["image_token"] * n_tokens
                    + C.SPECIAL_TOKENS["image_end_token"],
                    1,
                )
                cur_img += 1
            ids = self._encode(text)
            processed.append(text)
            input_ids.extend(ids)
            labels.extend(ids if is_label else [IGNORE_INDEX] * len(ids))

        input_ids = np.asarray(input_ids, dtype=np.int64)
        labels = np.asarray(labels, dtype=np.int64)
        if len(input_ids) > self.max_seq_len:
            raise ValueError(f"sample too long: {len(input_ids)}")

        target_pixels = preprocess_vae_image(target, th, tw)
        tok_down = 2 * self.latent_downscale  # packed token = 2x2 latents
        if mask_ref is not None and self.mask_weight_type and need_weight:
            weights = region_weight_tokens(
                mask_ref, target_pixels,
                weight_type=self.mask_weight_type,
                latent_down=self.latent_downscale,
            )
        else:
            weights = np.ones(((th // tok_down) * (tw // tok_down),), np.float32)

        return {
            "input_ids": input_ids,
            "labels": labels,
            "pixel_patches": np.concatenate(pixel_patches, 0) if pixel_patches else None,
            "grid_thw": np.asarray(grids, dtype=np.int64) if grids else None,
            # ALL refs, stacked (K, th, tw, 3) — training multi-ref parity
            # with inference's encode_references (ref:train_denoiser.py:1006-1055)
            "ref_pixels": np.stack(ref_pixels) if ref_pixels else None,
            "target_pixels": target_pixels,
            "weight_tokens": weights,
            "instruction": instruction,
            "prompt": "".join(processed),
        }
