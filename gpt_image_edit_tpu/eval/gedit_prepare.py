"""GEdit-Bench step 0: materialize the HF dataset as the PNG tree the
generator and judge expect (ref:univa/eval/gedit/step0_prepare_gedit.py).

Writes  <out>/fullset/<task_type>/<lang>/<key>_SRCIMG.png  (512²-area resized)
and returns the sample list step1_generate consumes. Requires `datasets`."""

from __future__ import annotations

import math
import os
from typing import Dict, List


def resize_to_area(image, target_area: int = 512 * 512, multiple: int = 8):
    w, h = image.size
    scale = math.sqrt(target_area / (w * h))
    nw = max(multiple, int(w * scale) // multiple * multiple)
    nh = max(multiple, int(h * scale) // multiple * multiple)
    return image.resize((nw, nh))


def prepare(out_dir: str, *, languages=("en",)) -> List[Dict]:
    from datasets import load_dataset

    ds = load_dataset("stepfun-ai/GEdit-Bench", split="train")
    samples = []
    for item in ds:
        lang = item["instruction_language"]
        if lang not in languages:
            continue
        task = item["task_type"]
        key = item["key"]
        src_dir = os.path.join(out_dir, "fullset", task, lang)
        os.makedirs(src_dir, exist_ok=True)
        src_path = os.path.join(src_dir, f"{key}_SRCIMG.png")
        if not os.path.exists(src_path):
            resize_to_area(item["input_image"].convert("RGB")).save(src_path)
        samples.append(
            {
                "key": key,
                "task_type": task,
                "instruction": item["instruction"],
                "instruction_language": lang,
                "intersection_exist": item.get("Intersection_exist", True),
                "source_image_path": src_path,
            }
        )
    return samples


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--languages", nargs="+", default=["en"])
    ap.add_argument("--samples_json", default=None)
    args = ap.parse_args()
    samples = prepare(args.out_dir, languages=tuple(args.languages))
    print(f"{len(samples)} samples prepared under {args.out_dir}")
    if args.samples_json:
        with open(args.samples_json, "w") as f:
            json.dump(samples, f)
