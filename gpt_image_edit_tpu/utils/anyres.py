"""Aspect-bucket resolution logic (ref:univa/utils/anyres_util.py).

These buckets double as our static-shape compilation buckets: every
(ratio x area) choice maps to one XLA program."""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

from PIL import Image

RESOLUTIONS_17 = [
    (672, 1568), (688, 1504), (720, 1456), (752, 1392), (800, 1328),
    (832, 1248), (880, 1184), (944, 1104), (1024, 1024), (1104, 944),
    (1184, 880), (1248, 832), (1328, 800), (1392, 752), (1456, 720),
    (1504, 688), (1568, 672),
]

RATIO = {
    "any_17ratio": [
        (w // math.gcd(w, h), h // math.gcd(w, h)) for w, h in RESOLUTIONS_17
    ],
    "any_11ratio": [(16, 9), (9, 16), (7, 5), (5, 7), (5, 4), (4, 5), (4, 3),
                    (3, 4), (3, 2), (2, 3), (1, 1)],
    "any_9ratio": [(16, 9), (9, 16), (5, 4), (4, 5), (4, 3), (3, 4), (3, 2),
                   (2, 3), (1, 1)],
    "any_7ratio": [(16, 9), (9, 16), (4, 3), (3, 4), (3, 2), (2, 3), (1, 1)],
    "any_5ratio": [(16, 9), (9, 16), (4, 3), (3, 4), (1, 1)],
    "any_1ratio": [(1, 1)],
}


def pick_ratio(orig_h: int, orig_w: int, anyres: str = "any_17ratio") -> Tuple[int, int]:
    """Closest (rw, rh) aspect pair (ref:anyres_util.py:22-29)."""
    orig_ratio = orig_w / orig_h
    return min(RATIO[anyres], key=lambda p: abs((p[0] / p[1]) - orig_ratio))


def compute_size(
    rw: int,
    rh: int,
    stride: int,
    *,
    min_pixels: Optional[int] = None,
    max_pixels: Optional[int] = None,
    anchor_pixels: Optional[int] = None,
) -> Tuple[int, int]:
    """Stride-aligned (h, w) hitting the target area (ref:anyres_util.py:32-58)."""
    base_w, base_h = rw * stride, rh * stride
    area = base_w * base_h
    if anchor_pixels is not None:
        target_area = anchor_pixels
    elif min_pixels is not None and max_pixels is not None:
        target_area = min(max(area, min_pixels), max_pixels)
    else:
        target_area = area
    scale = math.sqrt(target_area / area)
    new_w = max(stride, int(base_w * scale)) // stride * stride
    new_h = max(stride, int(base_h * scale)) // stride * stride
    return new_h, new_w


def dynamic_resize(
    orig_h: int, orig_w: int, anyres: str = "any_1ratio", anchor_pixels: int = 1024 * 1024
) -> Tuple[int, int]:
    """(h, w) for generation given an input size (ref:anyres_util.py:61-78)."""
    rw, rh = pick_ratio(orig_h, orig_w, anyres)
    return compute_size(rw, rh, stride=32, anchor_pixels=anchor_pixels)


def concat_images_adaptive(images: List[Image.Image], bg=(255, 255, 255)) -> Image.Image:
    """Grid collage of N images (ref:anyres_util.py:81-109; used by the Gradio
    app for multi-image prompts)."""
    n = len(images)
    cols = math.ceil(math.sqrt(n))
    rows = math.ceil(n / cols)
    cell_w = max(im.width for im in images)
    cell_h = max(im.height for im in images)
    canvas = Image.new("RGB", (cols * cell_w, rows * cell_h), bg)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        x = c * cell_w + (cell_w - im.width) // 2
        y = r * cell_h + (cell_h - im.height) // 2
        canvas.paste(im, (x, y))
    return canvas
