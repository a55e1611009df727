"""Qwen2.5-VL vision tower (ViT with windowed attention + 2x2 patch merger).

Parity target: HF Qwen2_5_VisionTransformerPretrainedModel as consumed by the
reference (ref:univa/models/qwen2p5vl/modeling_univa_qwen2p5vl.py:34,321-322).

TPU-first split of responsibilities:
- **host (numpy, `vision_precompute`)**: everything that depends only on
  `grid_thw` — window reordering indices, window/full segment ids, rope
  position ids. These are static per resolution bucket, so the device graph
  sees only dense gathers and segment-masked attention (no dynamic shapes,
  no cu_seqlens).
- **device (`apply`)**: patch projection, 32 blocks via lax.scan with a
  per-layer full-vs-window segment-id switch, merger MLP.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models.common import (
    Params,
    linear,
    linear_init,
    linear_multi,
    rms_weight_init,
)
from gpt_image_edit_tpu.models.qwen2p5vl.config import VisionConfig
from gpt_image_edit_tpu.ops.attention import dot_product_attention
from gpt_image_edit_tpu.ops.norms import rms_norm
from gpt_image_edit_tpu.ops.rope import apply_rope_halves


# --------------------------------------------------------------------------
# host-side precompute (numpy; depends only on grid_thw)
# --------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VisionAux:
    """Static per-bucket auxiliary arrays for one concatenated patch sequence.

    Registered as a pytree so it can ride inside jitted batch dicts."""

    window_order: np.ndarray   # (S,) gather order into window layout
    inverse_order: np.ndarray  # (S_merged,) restores merger output order
    seg_full: np.ndarray       # (S,) segment id per token (per image) in window layout
    seg_window: np.ndarray     # (S,) window segment id in window layout
    rope_cos: np.ndarray       # (S, head_dim) in window layout
    rope_sin: np.ndarray       # (S, head_dim)


def vision_precompute(grid_thw: np.ndarray, cfg: VisionConfig) -> VisionAux:
    """Compute window reorder + segments + rope for concatenated images.

    grid_thw: (num_images, 3) int — (t, h, w) patch grid per image. Matches
    HF `get_window_index` / `rot_pos_emb` semantics (tokens arrive grouped in
    merge-units of spatial_merge_size**2 consecutive patches).
    """
    merge = cfg.spatial_merge_size
    unit = cfg.merge_unit
    win = cfg.window_size // merge // cfg.patch_size  # merged-cell window side

    window_order_units = []  # merge-unit indices in window order
    seg_window_units = []
    seg_full_units = []
    hw_pos = []  # (h, w) per *patch* in the original (pre-window) order
    unit_base = 0
    window_id = 0
    for img_idx, (t, h, w) in enumerate(np.asarray(grid_thw)):
        gh, gw = h // merge, w // merge
        idx = np.arange(t * gh * gw).reshape(t, gh, gw)
        pad_h = (-gh) % win
        pad_w = (-gw) % win
        padded = np.full((t, gh + pad_h, gw + pad_w), -1, dtype=np.int64)
        padded[:, :gh, :gw] = idx
        nwh, nww = (gh + pad_h) // win, (gw + pad_w) // win
        padded = padded.reshape(t, nwh, win, nww, win).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t * nwh * nww, win * win)
        for row in padded:
            cells = row[row != -1]
            if cells.size == 0:
                continue
            window_order_units.append(cells + unit_base)
            seg_window_units.append(np.full(cells.size, window_id))
            seg_full_units.append(np.full(cells.size, img_idx))
            window_id += 1
        unit_base += t * gh * gw

        # rope ids per patch, original order: row-major over merge blocks
        hp = np.arange(h)[:, None].repeat(w, 1)
        hp = hp.reshape(gh, merge, gw, merge).transpose(0, 2, 1, 3).reshape(-1)
        wp = np.arange(w)[None, :].repeat(h, 0)
        wp = wp.reshape(gh, merge, gw, merge).transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hp, wp], axis=-1)  # (h*w, 2)
        hw_pos.append(np.tile(pos, (t, 1)))

    order_units = np.concatenate(window_order_units)           # (S/unit,)
    seg_window_u = np.concatenate(seg_window_units)
    seg_full_u = np.concatenate(seg_full_units)
    hw_pos = np.concatenate(hw_pos, axis=0)                    # (S, 2)

    # expand merge-unit order to patch order
    order = (order_units[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    seg_window = np.repeat(seg_window_u, unit)
    seg_full = np.repeat(seg_full_u, unit)

    # rope tables (halves convention), gathered into window layout
    half = cfg.head_dim // 2
    quarter = half // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) * 2.0 / half))
    hw = hw_pos[order]  # (S, 2) in window layout
    freqs = np.concatenate(
        [hw[:, 0:1] * inv_freq[None, :], hw[:, 1:2] * inv_freq[None, :]], axis=-1
    )  # (S, half)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (S, head_dim)
    rope_cos = np.cos(emb).astype(np.float32)
    rope_sin = np.sin(emb).astype(np.float32)

    inverse_order = np.argsort(order_units, kind="stable")
    return VisionAux(
        window_order=order.astype(np.int32),
        inverse_order=inverse_order.astype(np.int32),
        seg_full=seg_full.astype(np.int32),
        seg_window=seg_window.astype(np.int32),
        rope_cos=rope_cos,
        rope_sin=rope_sin,
    )


# --------------------------------------------------------------------------
# params
# --------------------------------------------------------------------------

def _block_init(rng, cfg: VisionConfig) -> Params:
    d, m = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(rng, 6)
    return {
        "norm1": rms_weight_init(d),
        "attn": {
            "qkv": linear_init(ks[0], d, 3 * d),
            "proj": linear_init(ks[1], d, d),
        },
        "norm2": rms_weight_init(d),
        "mlp": {
            "gate": linear_init(ks[2], d, m),
            "up": linear_init(ks[3], d, m),
            "down": linear_init(ks[4], m, d),
        },
    }


def init(rng: jax.Array, cfg: VisionConfig) -> Params:
    ks = jax.random.split(rng, 5)
    blocks = [_block_init(k, cfg) for k in jax.random.split(ks[0], cfg.depth)]
    merged_dim = cfg.hidden_size * cfg.merge_unit
    return {
        "patch_embed": {"kernel": linear_init(ks[1], cfg.patch_dim, cfg.hidden_size, bias=False)["kernel"]},
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "merger": {
            "ln_q": rms_weight_init(cfg.hidden_size),
            "fc1": linear_init(ks[2], merged_dim, merged_dim),
            "fc2": linear_init(ks[3], merged_dim, cfg.out_hidden_size),
        },
    }


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _block(p: Params, x, cos, sin, seg, cfg: VisionConfig):
    """x: (S, D) single concatenated sequence (batch of 1)."""
    s, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    xn = rms_norm(x, p["norm1"]["scale"], cfg.rms_eps)
    qkv = linear(p["attn"]["qkv"], xn).reshape(s, 3, h, hd)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    # rope (halves), shapes: (1, H, S, D)
    q = apply_rope_halves(q.transpose(1, 0, 2)[None], cos, sin)
    k = apply_rope_halves(k.transpose(1, 0, 2)[None], cos, sin)
    q = q[0].transpose(1, 0, 2)[None]  # (1, S, H, D)
    k = k[0].transpose(1, 0, 2)[None]
    attn = dot_product_attention(
        q,
        k,
        v[None],
        q_segment_ids=seg[None],
        kv_segment_ids=seg[None],
    )[0].reshape(s, d)
    x = x + linear(p["attn"]["proj"], attn)
    xn = rms_norm(x, p["norm2"]["scale"], cfg.rms_eps)
    # shared activation quant across gate/up under W8A8 (bitwise == per-head)
    gate, up = linear_multi((p["mlp"]["gate"], p["mlp"]["up"]), xn)
    mlp = linear(p["mlp"]["down"], jax.nn.silu(gate) * up)
    return x + mlp


def apply(
    params: Params,
    cfg: VisionConfig,
    pixel_patches: jnp.ndarray,  # (S, patch_dim) flattened patches, original order
    aux: VisionAux,
) -> jnp.ndarray:
    """Returns merged image embeddings (S / merge_unit, out_hidden_size),
    in the original (pre-window) merge-unit order."""
    # shared dispatch: the patch_embed kernel is ~1.5M elements, so
    # quantize_params covers it — a raw jnp.dot would see the int8 payload
    # dict (this crashed the quantized-VLM e2e bench path)
    x = linear(params["patch_embed"], pixel_patches)

    order = jnp.asarray(aux.window_order)
    x = x[order]
    cos = jnp.asarray(aux.rope_cos)
    sin = jnp.asarray(aux.rope_sin)
    seg_full = jnp.asarray(aux.seg_full)
    seg_window = jnp.asarray(aux.seg_window)

    full_set = set(int(i) for i in cfg.fullatt_block_indexes)
    is_full = jnp.asarray(
        [1 if i in full_set else 0 for i in range(cfg.depth)], dtype=jnp.int32
    )

    def body(carry, xs):
        p, full_flag = xs
        seg = jnp.where(full_flag > 0, seg_full, seg_window)
        return _block(p, carry, cos, sin, seg, cfg), None

    x, _ = jax.lax.scan(body, x, (params["blocks"], is_full))

    # merger: group merge_unit consecutive tokens
    m = params["merger"]
    x = rms_norm(x, m["ln_q"]["scale"], cfg.rms_eps)
    x = x.reshape(-1, cfg.merge_unit * cfg.hidden_size)
    x = linear(m["fc2"], jax.nn.gelu(linear(m["fc1"], x), approximate=False))
    return x[jnp.asarray(aux.inverse_order)]
