"""Rotary position embeddings: FLUX 3-axis rope and Qwen M-RoPE.

Two rotation conventions coexist in this stack and must not be mixed:

- **paired** (FLUX / diffusers `repeat_interleave_real=True`): features are
  rotated in adjacent pairs (0,1), (2,3), ...; cos/sin are interleaved
  [c0,c0,c1,c1,...]. (ref:univa/utils/flux_pipeline.py img_ids consumer —
  diffusers FluxPosEmbed.)
- **halves** (Qwen2/2.5 LM + ViT, HF convention): rotate_half splits the
  head dim in two halves; cos/sin are [c0..c{d/2-1}, c0..c{d/2-1}].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


# --------------------------------------------------------------------------
# FLUX 3-axis rope (paired convention)
# --------------------------------------------------------------------------

def flux_rope_freqs(
    ids: jnp.ndarray,
    axes_dim: Sequence[int] = (16, 56, 56),
    theta: float = 10000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for FLUX joint attention.

    ids: (S, 3) float — (modality, y, x) per token (text ids are all-zero,
    ref:univa/models/modeling_univa_denoise_tower.py:73).
    Returns (cos, sin), each (S, sum(axes_dim)) float32, interleaved layout
    [c0,c0,c1,c1,...] per axis then concatenated across axes.
    """
    cos_parts = []
    sin_parts = []
    for i, dim in enumerate(axes_dim):
        pos = ids[:, i].astype(jnp.float32)  # (S,)
        half = dim // 2
        freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / dim))
        angles = pos[:, None] * freqs[None, :]  # (S, half)
        # interleave: [a0, a0, a1, a1, ...]
        angles = jnp.repeat(angles, 2, axis=-1)  # (S, dim)
        cos_parts.append(jnp.cos(angles))
        sin_parts.append(jnp.sin(angles))
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rope_paired(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate adjacent feature pairs. x: (..., S, D); cos/sin: (S, D), or any
    shape that broadcasts against x — e.g. (S, 1, D) tables rotate a BSHD
    tensor in place, skipping the BHSD layout round-trip (FLUX serving path).

    Computes in the cos/sin dtype: f32 tables give the reference-faithful
    fp32 rotation (diffusers apply_rotary_emb); passing bf16 tables keeps
    the whole rotation in bf16 (fast-serving option, see FluxConfig.rope_dtype)."""
    dtype = x.dtype
    xf = x.astype(cos.dtype)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    rotated = jnp.stack([-x_odd, x_even], axis=-1).reshape(xf.shape)
    out = xf * cos + rotated * sin
    return out.astype(dtype)


# --------------------------------------------------------------------------
# Qwen M-RoPE (halves convention)
# --------------------------------------------------------------------------

def mrope_freqs(
    position_ids: jnp.ndarray,
    head_dim: int,
    mrope_section: Sequence[int] = (16, 24, 24),
    theta: float = 1000000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin for Qwen2.5-VL multimodal rope.

    position_ids: (3, B, S) int — (t, h, w) position per token
    (ref:univa/models/qwen2p5vl/modeling_univa_qwen2p5vl.py:139-318).
    Returns (cos, sin), each (B, S, head_dim) float32, halves layout: the
    head-dim is tiled as [sec0 from t, sec1 from h, sec2 from w] repeated
    twice (HF `apply_multimodal_rotary_pos_emb` semantics).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    angles = position_ids.astype(jnp.float32)[..., None] * inv_freq  # (3, B, S, half)
    cos3 = jnp.cos(angles)
    sin3 = jnp.sin(angles)

    def _mix(tab: jnp.ndarray) -> jnp.ndarray:
        parts = []
        start = 0
        for i, sec in enumerate(mrope_section):
            parts.append(tab[i, ..., start : start + sec])
            start += sec
        mixed_half = jnp.concatenate(parts, axis=-1)  # (B, S, half)
        return jnp.concatenate([mixed_half, mixed_half], axis=-1)  # (B, S, head_dim)

    return _mix(cos3), _mix(sin3)


def apply_rope_halves(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """HF-convention rotation. x: (B, H, S, D); cos/sin: (B, S, D) or (S, D).
    4-D cos/sin are used as-is — pass (B, S, 1, D) to rotate a BSHD tensor
    in place without the BHSD layout round-trip (identical values).

    Rotation runs in the table dtype — HF Qwen itself casts cos/sin to the
    activation dtype (bf16 for bf16 models), so bf16 tables match HF."""
    dtype = x.dtype
    xf = x.astype(cos.dtype)
    if cos.ndim == 2:
        c = cos[None, None, :, :]
        s = sin[None, None, :, :]
    elif cos.ndim == 4:
        c, s = cos, sin
    else:
        c = cos[:, None, :, :]
        s = sin[:, None, :, :]
    half = xf.shape[-1] // 2
    rotated = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    out = xf * c + rotated * s
    return out.astype(dtype)
