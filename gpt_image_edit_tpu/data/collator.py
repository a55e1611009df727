"""Batch assembly to fixed shapes (ref:univa/dataset/data_collator.py).

TPU-first difference: instead of list-of-tensors hetero batches
(ref:data_collator.py:122-142), samples are padded into static buckets —
token length rounds up to a multiple of 64, image resolutions are fixed per
config — so each bucket compiles exactly once."""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from gpt_image_edit_tpu.data import constants as C
from gpt_image_edit_tpu.models.qwen2p5vl.rope_index import get_rope_index
from gpt_image_edit_tpu.models.qwen2p5vl.vision import vision_precompute


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Collator:
    def __init__(
        self,
        vision_cfg,
        *,
        padding_side: str = "left",
        pad_token_id: int = 151643,
        seq_multiple: int = 64,
        image_token_id: int = C.IMAGE_TOKEN_ID,
        video_token_id: int = C.VIDEO_TOKEN_ID,
        vision_start_id: int = C.VISION_START_ID,
    ):
        self.vision_cfg = vision_cfg
        self.padding_side = padding_side
        self.pad_token_id = pad_token_id
        self.seq_multiple = seq_multiple
        self.image_token_id = image_token_id
        self.video_token_id = video_token_id
        self.vision_start_id = vision_start_id

    def __call__(self, samples: List[Dict[str, Any]]) -> Dict[str, Any]:
        b = len(samples)
        max_len = _round_up(max(len(s["input_ids"]) for s in samples), self.seq_multiple)
        input_ids = np.full((b, max_len), self.pad_token_id, dtype=np.int64)
        labels = np.full((b, max_len), -100, dtype=np.int64)
        attn = np.zeros((b, max_len), dtype=np.int64)
        for i, s in enumerate(samples):
            ids = s["input_ids"]
            lab = s.get("labels")
            if self.padding_side == "left":
                input_ids[i, max_len - len(ids):] = ids
                attn[i, max_len - len(ids):] = 1
                if lab is not None:
                    labels[i, max_len - len(ids):] = lab
            else:
                input_ids[i, : len(ids)] = ids
                attn[i, : len(ids)] = 1
                if lab is not None:
                    labels[i, : len(ids)] = lab

        grids = [s["grid_thw"] for s in samples if s.get("grid_thw") is not None]
        grid_thw = np.concatenate(grids, axis=0) if grids else None
        patches = [s["pixel_patches"] for s in samples if s.get("pixel_patches") is not None]

        pos_ids, _ = get_rope_index(
            input_ids,
            grid_thw,
            attn,
            spatial_merge_size=self.vision_cfg.spatial_merge_size,
            image_token_id=self.image_token_id,
            video_token_id=self.video_token_id,
            vision_start_token_id=self.vision_start_id,
        )

        batch: Dict[str, Any] = {
            "input_ids": input_ids,
            "labels": labels,
            "attention_mask": attn,
            "position_ids": pos_ids,
            "target_pixels": np.stack([s["target_pixels"] for s in samples]),
            "weight_mask": np.stack([s["weight_tokens"] for s in samples]),
            "instructions": [s.get("instruction", s.get("prompt", "")) for s in samples],
        }
        if patches:
            batch["pixel_patches"] = np.concatenate(patches, axis=0)
            batch["vision_aux"] = vision_precompute(grid_thw, self.vision_cfg)
        refs = [s["ref_pixels"] for s in samples if s.get("ref_pixels") is not None]
        if refs:
            assert len(refs) == b, "mixed ref/no-ref batches not supported; bucket them"
            # Variable ref counts per sample: pad to the batch max (rounded up
            # to a power of two to bound compile variants) with a validity
            # mask — the TPU analogue of ref pad_list_of_tensors
            # (ref:data_collator.py:6-47,86-94). A (H,W,3) single-ref sample
            # is treated as K=1.
            refs = [r[None] if r.ndim == 3 else r for r in refs]
            kmax = max(r.shape[0] for r in refs)
            kpad = 1 << (kmax - 1).bit_length()  # next power of two
            h, w, c = refs[0].shape[1:]
            ref_pixels = np.zeros((b, kpad, h, w, c), refs[0].dtype)
            ref_valid = np.zeros((b, kpad), np.bool_)
            for i, r in enumerate(refs):
                ref_pixels[i, : r.shape[0]] = r
                ref_valid[i, : r.shape[0]] = True
            if kpad == 1:
                batch["ref_pixels"] = ref_pixels[:, 0]  # legacy (B,H,W,3) path
            else:
                batch["ref_pixels"] = ref_pixels
                batch["ref_valid"] = ref_valid
        return batch
