"""Region-weighted-loss masks (ref:univa/utils/get_mask.py).

Pipeline: |ref - target| diff -> binary mask -> morphological close -> drop
tiny components -> downsample to the latent grid -> weight =
log2(total/changed) + 1 (or exp), all-ones when need_weight is false
(ref:get_mask.py:141-259). Output here is at *packed-token* granularity
(S_tgt,) — mean-pooled over each 2x2 latent patch — since our loss runs on
packed tokens."""

from __future__ import annotations

import numpy as np


def _binary_close(mask: np.ndarray, k: int = 5) -> np.ndarray:
    try:
        import cv2

        kernel = np.ones((k, k), np.uint8)
        return cv2.morphologyEx(mask.astype(np.uint8), cv2.MORPH_CLOSE, kernel) > 0
    except Exception:
        return mask


def _drop_small_components(mask: np.ndarray, min_area_frac: float = 0.001) -> np.ndarray:
    try:
        import cv2

        n, labels, stats, _ = cv2.connectedComponentsWithStats(mask.astype(np.uint8))
        min_area = min_area_frac * mask.size
        keep = np.zeros_like(mask)
        for i in range(1, n):
            if stats[i, cv2.CC_STAT_AREA] >= min_area:
                keep |= labels == i
        return keep
    except Exception:
        return mask


def region_weight_tokens(
    ref: np.ndarray,
    target: np.ndarray,
    *,
    weight_type: str = "log",
    diff_threshold: float = 0.05,
    latent_down: int = 8,
) -> np.ndarray:
    """ref/target: (H, W, 3) in [-1, 1], same shape. Returns (S_tgt,) fp32
    weights over packed latent tokens (H/16 * W/16), min 1.0."""
    h, w, _ = target.shape
    if ref.shape != target.shape or weight_type is None:
        return np.ones(((h // (2 * latent_down)) * (w // (2 * latent_down)),), np.float32)

    diff = np.abs(ref.astype(np.float32) - target.astype(np.float32)).mean(-1)
    mask = diff > (diff_threshold * 2.0)  # inputs span [-1,1] = 2.0 range
    mask = _binary_close(mask)
    mask = _drop_small_components(mask)

    changed = float(mask.sum())
    total = float(mask.size)
    if changed <= 0 or changed >= total:
        weight = 1.0
    elif weight_type == "log":
        weight = np.log2(total / changed) + 1.0
    elif weight_type == "exp":
        weight = min(np.exp(total / max(changed, 1.0) / 100.0), 8.0)
    else:
        weight = 1.0

    # downsample to latent grid via max-pool (ref uses 8x max pooling)
    lh, lw = h // latent_down, w // latent_down
    m = mask[: lh * latent_down, : lw * latent_down]
    m = m.reshape(lh, latent_down, lw, latent_down).max(axis=(1, 3))
    # pool 2x2 to packed tokens
    th, tw = lh // 2, lw // 2
    t = m[: th * 2, : tw * 2].reshape(th, 2, tw, 2).max(axis=(1, 3))
    weights = np.where(t, weight, 1.0).astype(np.float32)
    return weights.reshape(-1)
