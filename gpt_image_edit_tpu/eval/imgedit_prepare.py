"""ImgEdit-harness step 0: materialize original images + the data json from
the raw HF release (ref:univa/eval/imgedit/step0_original_img.py).

The reference's step0 extracts each record's images into the PNG tree and
writes the {key: {prompt, id, edit_type}} json that step1 generation and the
step2 judge consume. Two images per record: the processed `input_image` is
saved as `{key}_SRCIMG.png`, and `input_image_raw` is saved as `{key}.png`
after the 32-aligned 512^2-area resize (ref :14-29 calculate_dimensions).
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, Tuple


def calculate_dimensions(
    target_area: int, ratio: float, multiple: int = 32
) -> Tuple[int, int, int]:
    """Width/height at `ratio` whose area lands just under/over target_area,
    both snapped to multiples of 32 (ref:step0_original_img.py:14-29)."""
    width = math.sqrt(target_area * ratio)
    height = width / ratio

    width = round(width / multiple) * multiple
    height = round(height / multiple) * multiple

    new_area = width * height
    if new_area < target_area:
        width += multiple
        new_area = width * height
    elif new_area > target_area:
        width -= multiple
        new_area = width * height
    return int(width), int(height), int(new_area)


def prepare(
    out_dir: str,
    data_json: str,
    *,
    dataset=None,
    target_area: int = 512 * 512,
) -> Dict[str, Dict]:
    """Extract the dataset into `out_dir` and write `data_json`.

    `dataset` is an iterable of records with task_type/key/instruction/
    instruction_language/input_image/input_image_raw fields; defaults to the
    HF release the reference pulls (ref :31-32). Returns the data mapping
    {key: {prompt, id, edit_type}} (ref :66-71)."""
    if dataset is None:
        from datasets import load_dataset

        dataset = load_dataset("stepfun-ai/GEdit-Bench", split="train")

    mapping: Dict[str, Dict] = {}
    for item in dataset:
        task_type = item["task_type"]
        key = item["key"]
        lang = item["instruction_language"]
        raw = item["input_image_raw"]
        tw, th, _ = calculate_dimensions(target_area, raw.width / raw.height)
        resized = raw.resize((tw, th))

        rel = f"fullset/{task_type}/{lang}/{key}.png"
        src_path = os.path.join(
            out_dir, "fullset", task_type, lang, f"{key}_SRCIMG.png"
        )
        img_path = os.path.join(out_dir, rel)
        os.makedirs(os.path.dirname(img_path), exist_ok=True)
        item["input_image"].save(src_path)
        resized.save(img_path)

        mapping[key] = {
            "prompt": item["instruction"],
            "id": rel,
            "edit_type": task_type,
        }

    with open(data_json, "w") as f:
        json.dump(mapping, f, indent=4)
    return mapping


if __name__ == "__main__":
    import argparse

    from gpt_image_edit_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--data_json", required=True)
    args = ap.parse_args()
    mapping = prepare(args.out_dir, args.data_json)
    print(f"{len(mapping)} records extracted under {args.out_dir}")
