"""FLUX latent token packing and rope-id generation.

The FLUX MMDiT consumes latents as a token sequence where each token is a
2x2 patch of the 16-channel VAE latent grid (64 features/token).

Layout note: this framework keeps latents in **NHWC** (TPU-friendly conv
layout). The packed channel ordering matches the reference's NCHW
`view(B,C,H/2,2,W/2,2).permute(0,2,4,1,3,5)` flattening
(ref:univa/utils/flux_pipeline.py:576-583): packed feature index
= c*4 + dy*2 + dx.
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_latents(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) NHWC latents -> (B, (H/2)*(W/2), C*4) tokens.

    Feature ordering per token: channel-major over the 2x2 patch, i.e.
    out[..., c*4 + dy*2 + dx] = x[:, 2h+dy, 2w+dx, c], matching
    ref:univa/utils/flux_pipeline.py:576-583.
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"latent H/W must be even, got {h}x{w}"
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # -> (B, h/2, w/2, C, 2, 2)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(tokens: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(B, S, C*4) tokens -> (B, H, W, C) NHWC latents.

    `height`/`width` are the latent grid dims (H, W), inverse of
    `pack_latents` (ref:univa/utils/flux_pipeline.py:585-598).
    """
    b, s, cf = tokens.shape
    c = cf // 4
    hh, ww = height // 2, width // 2
    assert s == hh * ww, f"token count {s} != {hh}*{ww}"
    x = tokens.reshape(b, hh, ww, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, h/2, 2, w/2, 2, C)
    return x.reshape(b, height, width, c)


def latent_image_ids(height: int, width: int, modality: int = 0) -> jnp.ndarray:
    """3-channel rope ids for a packed latent grid: (modality, y, x).

    `height`/`width` are the *packed* grid dims (latent//2). The reference
    sets channel 0 to 1 for the conditioning (Kontext reference) image and 0
    for the target (ref:univa/utils/flux_pipeline.py:561-572,694-698).
    Returns (height*width, 3) float32.
    """
    ids = jnp.zeros((height, width, 3), dtype=jnp.float32)
    ids = ids.at[..., 0].set(float(modality))
    ids = ids.at[..., 1].add(jnp.arange(height, dtype=jnp.float32)[:, None])
    ids = ids.at[..., 2].add(jnp.arange(width, dtype=jnp.float32)[None, :])
    return ids.reshape(height * width, 3)
