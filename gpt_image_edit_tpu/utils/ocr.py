"""OCR prompt enhancer (ref:univa/utils/get_ocr.py).

Runs PaddleOCR (optional host-side dependency) over each conditioning image
and injects 9-grid position phrases into the instruction, e.g.
'In the first image: texts "STOP" at top-left, ...'. Degrades to a no-op
with a warning when paddleocr isn't installed."""

from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

log = logging.getLogger("gie_tpu.ocr")

_GRID = [
    ["top-left", "top", "top-right"],
    ["left", "center", "right"],
    ["bottom-left", "bottom", "bottom-right"],
]

_ORDINALS = ["first", "second", "third", "fourth", "fifth", "sixth"]

_paddle = None


def _get_paddle():
    global _paddle
    if _paddle is None:
        try:
            from paddleocr import PaddleOCR

            _paddle = PaddleOCR(use_angle_cls=False, lang="en", show_log=False)
        except Exception as e:  # pragma: no cover
            log.warning("paddleocr unavailable (%s); OCR enhancement disabled", e)
            _paddle = False
    return _paddle


def _cell(cx: float, cy: float, w: int, h: int) -> str:
    col = min(int(cx / w * 3), 2)
    row = min(int(cy / h * 3), 2)
    return _GRID[row][col]


def ocr_phrases_for_image(image, image_index: int = 0) -> Optional[str]:
    """PIL image -> position phrase, or None if no text / OCR unavailable."""
    ocr = _get_paddle()
    if not ocr:
        return None
    arr = np.asarray(image.convert("RGB"))
    result = ocr.ocr(arr, cls=False)
    if not result or not result[0]:
        return None
    h, w = arr.shape[:2]
    parts = []
    for box, (text, conf) in result[0]:
        if conf < 0.5 or not text.strip():
            continue
        xs = [p[0] for p in box]
        ys = [p[1] for p in box]
        parts.append(f'texts "{text}" at {_cell(sum(xs)/4, sum(ys)/4, w, h)}')
    if not parts:
        return None
    ordinal = _ORDINALS[min(image_index, len(_ORDINALS) - 1)]
    return f"In the {ordinal} image: " + ", ".join(parts) + "."


def enhance_prompt(prompt: str, images: List) -> str:
    """Append OCR phrases for all images (ref:get_ocr.py:get_ocr_result)."""
    extras = []
    for i, img in enumerate(images):
        phrase = ocr_phrases_for_image(img, i)
        if phrase:
            extras.append(phrase)
    if not extras:
        return prompt
    return prompt + " " + " ".join(extras)
