"""Attention front-end.

One entry point, `dot_product_attention`, in BSHD layout with GQA,
causal/segment/padding masking, and fp32 softmax. Dispatches to:

- `impl="xla"`: einsum + fp32 softmax — XLA fuses this well and it runs on
  every backend (the CPU test mesh included).
- `impl="pallas"`: the Pallas flash-attention kernel
  (gpt_image_edit_tpu.ops.pallas.flash_attention) on TPU.
- `impl="auto"` (default): pallas on TPU when the shapes qualify, else xla.

Replaces the reference's flash-attn-2 dependency
(ref:train_denoiser.py:1633, ref:univa/serve/cli.py:40).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _build_mask(
    q_len: int,
    kv_len: int,
    *,
    causal: bool,
    q_segment_ids: Optional[jnp.ndarray],
    kv_segment_ids: Optional[jnp.ndarray],
    pad_mask: Optional[jnp.ndarray],
) -> Optional[jnp.ndarray]:
    """Combine masks into a (B or 1, 1, Sq, Skv) boolean keep-mask."""
    mask = None
    if causal:
        causal_mask = jnp.tril(jnp.ones((q_len, kv_len), dtype=jnp.bool_), k=kv_len - q_len)
        mask = causal_mask[None, None, :, :]
    if q_segment_ids is not None and kv_segment_ids is not None:
        seg = q_segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        mask = seg if mask is None else jnp.logical_and(mask, seg)
    if pad_mask is not None:
        pm = pad_mask[:, None, None, :].astype(jnp.bool_)
        mask = pm if mask is None else jnp.logical_and(mask, pm)
    return mask


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    pad_mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention in BSHD layout.

    Args:
      q: (B, Sq, Hq, D); k, v: (B, Skv, Hkv, D) with Hq % Hkv == 0 (GQA).
      causal: lower-triangular mask (aligned to the end for Sq < Skv decode).
      q_segment_ids / kv_segment_ids: (B, Sq)/(B, Skv) int; attention only
        within equal segment ids (windowed ViT attention, packed batches).
      pad_mask: (B, Skv) bool/int — 1 = attend, 0 = masked key.
      bias: optional additive (B or 1, H or 1, Sq, Skv) fp32 bias.
      scale: defaults to D ** -0.5.
      impl: "auto" | "xla" | "pallas" | "ring" | "pallas_qk8" | "pallas_int8".
    Returns: (B, Sq, Hq, D) in q.dtype.
    """
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    if scale is None:
        scale = d ** -0.5

    if impl == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        use_pallas = (
            on_tpu
            and bias is None
            and d in (64, 80, 96, 128, 256)
            and sq >= 128
            and skv >= 128
        )
        impl = "pallas" if use_pallas else "xla"

    if impl == "ring":
        # context parallelism: sequence dim sharded over the mesh 'sequence'
        # axis, K/V rotate via ppermute (ops/ring_attention.py). jnp hops
        # run under a partial-manual shard_map (batch/head dims and all
        # params stay under GSPMD); Pallas flash hops switch to a
        # full-manual shard_map — Mosaic custom calls cannot lower inside a
        # partial-manual region (measured on-chip, scripts/check_ring_tpu).
        # Requires an ambient mesh with a 'sequence' axis (use
        # jax.sharding.set_mesh or pass shardings through jit).
        from gpt_image_edit_tpu.ops.ring_attention import (
            context_parallel_attention,
        )

        assert q_segment_ids is None and kv_segment_ids is None and bias is None, (
            "ring attention supports causal/pad_mask only"
        )
        # Pallas flash hops on TPU by default (padded to 128-aligned blocks;
        # custom VJP -> CP training uses them too). GIE_RING_HOP overrides
        # (jnp|flash|auto) for hardware A/B runs.
        import os

        return context_parallel_attention(
            q, k, v, pad_mask=pad_mask, causal=causal, scale=scale,
            hop_impl=os.environ.get("GIE_RING_HOP", "auto"),
        )

    if impl == "pallas":
        from gpt_image_edit_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(
            q,
            k,
            v,
            causal=causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            pad_mask=pad_mask,
            scale=scale,
        )

    if impl == "pallas_qk8":
        # inference-only: int8 QK^T (2x MXU), bf16 PV — far lower error than
        # full int8 since q/k are RMS-normalized in every model here
        from gpt_image_edit_tpu.ops.pallas.flash_attention import (
            flash_attention_qk8,
        )

        assert (
            not causal
            and q_segment_ids is None
            and kv_segment_ids is None
            and bias is None
        ), "pallas_qk8 supports pad_mask only (no causal/segments/bias)"
        return flash_attention_qk8(
            q,
            k,
            v,
            pad_mask=pad_mask,
            scale=scale,
            interpret=jax.devices()[0].platform != "tpu",
        )

    if impl == "pallas_int8":
        # inference-only int8-MXU fast path (serving --quantize w8a8 mode)
        from gpt_image_edit_tpu.ops.pallas.flash_attention import (
            flash_attention_int8,
        )

        return flash_attention_int8(
            q,
            k,
            v,
            causal=causal,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            pad_mask=pad_mask,
            scale=scale,
            interpret=jax.devices()[0].platform != "tpu",
        )

    # --- XLA path ---
    if hq != hkv:
        assert hq % hkv == 0, f"GQA requires Hq % Hkv == 0, got {hq}, {hkv}"
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    mask = _build_mask(
        sq,
        skv,
        causal=causal,
        q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids,
        pad_mask=pad_mask,
    )
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
