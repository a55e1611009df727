"""Legacy LLaVA-format dataset (ref:univa/dataset/llava_dataset.py).

Dead path for all shipped reference configs (SURVEY appendix) but ported for
registry completeness: LLaVA-format json (conversations + image list), fixed
729-token image protocol (27x27 SigLIP grid), assistant-span labels, CFG
prompt drop, trailing <gen_image> -> <|vision_start|> generation trigger.

Differences from the Qwen2VL dataset: ONE fixed token count per image (no
native-resolution grids), and the vision input is the SigLIP pixel view
(384^2 normalized) rather than ViT patches.
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, Dict, List

import numpy as np
from PIL import Image

from gpt_image_edit_tpu.data import constants as C
from gpt_image_edit_tpu.data.image_processing import preprocess_vae_image
from gpt_image_edit_tpu.data.prompter import Qwen2VLPrompter
from gpt_image_edit_tpu.models.llava import IMAGE_TOKEN_COUNT

IGNORE_INDEX = -100


class LlavaDataset:
    def __init__(
        self,
        *,
        tokenizer,
        data_txt: str,
        image_size: int = 384,          # SigLIP-so400m view (ref min/max_pixels 384^2)
        image_token_length: int = IMAGE_TOKEN_COUNT,
        only_generated_task: bool = False,
        drop_prompt_rate: float = 0.0,
        target_size: int = 512,          # VAE view of the generated target
        notry: bool = False,
        seed: int = 0,
    ):
        if drop_prompt_rate > 0:
            assert only_generated_task, (
                "prompt drop only applies to generation-only training (ref :48-51)"
            )
        self.tokenizer = tokenizer
        self.prompter = Qwen2VLPrompter()
        self.image_size = image_size
        self.image_token_length = image_token_length
        self.only_generated_task = only_generated_task
        self.drop_prompt_rate = drop_prompt_rate
        self.target_size = target_size
        self.notry = notry
        self.rng = random.Random(seed)
        self.data: List[Dict[str, Any]] = []
        with open(data_txt) as f:
            lines = [l.strip() for l in f if l.strip()]
        for line in lines:
            image_root, json_file = line.split(",")[:2]
            with open(json_file) as f:
                items = json.load(f)
            for item in items:
                imgs = item.get("image", [])
                if isinstance(imgs, str):
                    imgs = [imgs]
                item["image"] = [os.path.join(image_root, p) for p in imgs]
                self.data.append(item)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        try:
            return self._build(self.data[idx])
        except Exception:
            if self.notry:
                raise
            return self[self.rng.randrange(len(self.data))]  # resample (ref :687-691)

    def _build(self, item: Dict[str, Any]) -> Dict[str, Any]:
        convo = []
        for turn in item["conversations"]:
            role = {"human": "user", "gpt": "assistant"}.get(turn["from"], turn["from"])
            convo.append({"from": role, "value": turn["value"]})

        drop = (
            self.only_generated_task
            and self.rng.random() < self.drop_prompt_rate
        )
        if drop:
            convo = [
                {"from": "user", "value": "Generate an image."},
                {"from": "assistant", "value": C.GENERATE_TOKEN},
            ]

        expansion = (
            C.SPECIAL_TOKENS["image_begin_token"]
            + C.SPECIAL_TOKENS["image_token"] * self.image_token_length
            + C.SPECIAL_TOKENS["image_end_token"]
        )
        input_ids: List[int] = []
        labels: List[int] = []
        has_gen = False
        for text, is_label in self.prompter.get_train_prompt(convo):
            if C.GENERATE_TOKEN in text:
                assert is_label, "generation token must be in an assistant turn"
                text = text.replace(
                    f"{C.GENERATE_TOKEN}<|im_end|>\n",
                    C.SPECIAL_TOKENS["image_begin_token"],
                )
                has_gen = True
            text = text.replace("<image>", expansion)
            ids = self.tokenizer.encode(text)
            input_ids.extend(ids)
            labels.extend(ids if is_label else [IGNORE_INDEX] * len(ids))
        if self.only_generated_task and not has_gen:
            raise ValueError("generation-only training needs a <gen_image> turn")

        # vision views: conditioning images at the fixed SigLIP size; the
        # LAST image is the generation target when has_gen (ref :188-195)
        paths = item["image"]
        cond_paths = (paths[:-1] if has_gen else paths) if not drop else []
        pixel_values = [
            preprocess_vae_image(Image.open(p), self.image_size, self.image_size)
            for p in cond_paths
        ]
        target_pixels = None
        if has_gen and paths:
            target_pixels = preprocess_vae_image(
                Image.open(paths[-1]), self.target_size, self.target_size
            )

        return {
            "input_ids": np.asarray(input_ids, np.int64),
            "labels": np.asarray(labels, np.int64),
            "pixel_values": np.stack(pixel_values) if pixel_values else None,
            "image_token_length": self.image_token_length,
            "target_pixels": target_pixels,
        }
