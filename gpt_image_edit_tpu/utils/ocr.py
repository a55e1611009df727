"""OCR prompt enhancer (ref:univa/utils/get_ocr.py).

Runs PaddleOCR (optional host-side dependency) over each conditioning image
and injects 9-grid position phrases into the instruction. Degrades to a
no-op with a warning when paddleocr isn't installed.

The phrase protocol matches the reference exactly (parity-tested against
the reference's own pure functions in tests/test_data.py):
- score filter > 0.9 (ref:get_ocr.py:84)
- 9-grid position from the box center: rows top/middle/bottom x cols
  left/center/right joined as "row-col" (ref:get_ocr.py:33-67)
- condensed sentence grouping texts by position:
  'In the first image: ( The texts "A", "B" are located at the top-left of
  the first image. ... )' (ref:get_ocr.py:93-121)
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("gie_tpu.ocr")

_ORDINALS = {
    1: "first", 2: "second", 3: "third", 4: "fourth", 5: "fifth",
    6: "sixth", 7: "seventh", 8: "eighth", 9: "ninth", 10: "tenth",
    11: "eleventh", 12: "twelfth", 13: "thirteenth", 14: "fourteenth",
    15: "fifteenth", 16: "sixteenth", 17: "seventeenth", 18: "eighteenth",
    19: "nineteenth", 20: "twentieth",
}

_paddle = None


def _get_paddle():
    global _paddle
    if _paddle is None:
        try:
            from paddleocr import PaddleOCR

            _paddle = PaddleOCR(use_angle_cls=True, lang="en", show_log=False)
        except Exception as e:  # pragma: no cover
            log.warning("paddleocr unavailable (%s); OCR enhancement disabled", e)
            _paddle = False
    return _paddle


def calculate_position(box: Sequence[Sequence[float]], width: int, height: int) -> str:
    """Box -> 9-grid cell name from its center (ref:get_ocr.py:33-67)."""
    x_coords = [coord[0] for coord in box]
    y_coords = [coord[1] for coord in box]
    center_x = (min(x_coords) + max(x_coords)) / 2
    center_y = (min(y_coords) + max(y_coords)) / 2

    if center_y < height / 3:
        row = "top"
    elif center_y < 2 * height / 3:
        row = "middle"
    else:
        row = "bottom"

    if center_x < width / 3:
        col = "left"
    elif center_x < 2 * width / 3:
        col = "center"
    else:
        col = "right"
    return f"{row}-{col}"


def filter_and_position(
    rows: Sequence[Tuple[Sequence, str, float]], width: int, height: int
) -> List[Tuple[str, str]]:
    """(box, text, score) rows -> [(position, text)] with score > 0.9
    (ref:get_ocr.py:69-88 process_dataframe, order-preserving)."""
    out = []
    for box, text, score in rows:
        if score > 0.9:
            out.append((calculate_position(box, width, height), text))
    return out


def format_condensed(positioned: Sequence[Tuple[str, str]], image_number: int) -> str:
    """[(position, text)] -> the condensed sentence, grouping texts at the
    same position, first-seen position order (ref:get_ocr.py:93-121)."""
    if len(positioned) == 0:
        return ""
    ordinal = _ORDINALS.get(image_number)
    assert ordinal is not None, "ordinal is not None"

    position_to_texts: dict = {}
    for position, text in positioned:
        position_to_texts.setdefault(position, []).append(text)

    sentences = [f"In the {ordinal} image: ("]
    for position, texts in position_to_texts.items():
        quoted = [f'"{text}"' for text in texts]
        text_string = ", ".join(quoted)
        sentences.append(
            f"The texts {text_string} are located at the {position} of the "
            f"{ordinal} image."
        )
    return " ".join(sentences) + " )"


def ocr_phrases_for_image(image, image_index: int = 0) -> Optional[str]:
    """PIL image -> position phrase, or None if no text / OCR unavailable.

    image_index is 0-based (the ref's get_ocr_result increments before
    formatting, ref:get_ocr.py:123-124)."""
    ocr = _get_paddle()
    if not ocr:
        return None
    arr = np.asarray(image.convert("RGB"))
    result = ocr.ocr(arr)
    if not result or not result[0]:
        return None
    h, w = arr.shape[:2]
    rows = [(item[0], item[1][0], item[1][1]) for item in result[0]]
    phrase = format_condensed(filter_and_position(rows, w, h), image_index + 1)
    return phrase or None


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
