"""Dataset inspection tool (ref:univa/serve/check_data.py, CLI instead of
Gradio): decode samples back to text + image stats to eyeball the token
expansion, weight masks, and dual image views.

  python -m gpt_image_edit_tpu.serve.check_data --data_txt data.txt -n 3
  python -m gpt_image_edit_tpu.serve.check_data --random_data -n 2
"""

from __future__ import annotations

import argparse

import numpy as np

from gpt_image_edit_tpu.data import constants as C
from gpt_image_edit_tpu.data.dataset import EditDataset
from gpt_image_edit_tpu.data.tokenizer import FakeTokenizer, load_tokenizer


def describe(sample, idx: int):
    ids = sample["input_ids"]
    print(f"--- sample {idx} ---")
    print(f"prompt: {sample['prompt'][:200]!r}")
    print(f"tokens: {len(ids)}; image pads: {(ids == C.IMAGE_TOKEN_ID).sum()}; "
          f"gen trigger: {ids[-1] == C.VISION_START_ID}")
    if sample.get("grid_thw") is not None:
        print(f"vit grids: {sample['grid_thw'].tolist()}")
    if sample.get("ref_pixels") is not None:
        r = sample["ref_pixels"]
        print(f"ref view: {r.shape} range [{r.min():.2f}, {r.max():.2f}]")
    t = sample["target_pixels"]
    print(f"target view: {t.shape} range [{t.min():.2f}, {t.max():.2f}]")
    w = sample["weight_tokens"]
    print(f"weight tokens: {w.shape}, mean {w.mean():.3f}, max {w.max():.3f}, "
          f"upweighted frac {(w > 1).mean():.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_txt", default="")
    ap.add_argument("--tokenizer", default="fake")
    ap.add_argument("--random_data", action="store_true")
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("-n", type=int, default=3)
    args = ap.parse_args()

    ds = EditDataset(
        tokenizer=load_tokenizer(args.tokenizer),
        data_txt=args.data_txt,
        random_data=args.random_data,
        height=args.height,
        width=args.width,
        notry=True,
    )
    print(f"dataset: {len(ds)} samples")
    for i in range(min(args.n, len(ds))):
        describe(ds[i], i)


if __name__ == "__main__":
    main()
