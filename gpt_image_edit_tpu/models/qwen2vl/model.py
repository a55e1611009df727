"""Qwen2-VL UniVA variant (ref:univa/models/qwen2vl/modeling_univa_qwen2vl.py).

Architecture deltas vs Qwen2.5-VL that this module implements:
- vision blocks use LayerNorm (not RMSNorm) and a QuickGELU MLP (fc1/fc2,
  not SwiGLU); attention is FULL per image in every block (no windowing)
- the patch merger's ln_q is a LayerNorm
- M-RoPE has no tokens_per_second temporal scaling (images are unaffected;
  ref :78-187)
The LM trunk is the same Qwen2 architecture — models/qwen2p5vl/language.py is
reused directly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models import register_model
from gpt_image_edit_tpu.models.common import (
    Params,
    layer_norm_init,
    linear,
    linear_init,
)
from gpt_image_edit_tpu.models.qwen2p5vl import language
from gpt_image_edit_tpu.models.qwen2p5vl.config import TextConfig
from gpt_image_edit_tpu.models.qwen2p5vl.model import (
    denoise_projector,
    scatter_image_embeds,
)
from gpt_image_edit_tpu.ops.attention import dot_product_attention
from gpt_image_edit_tpu.ops.norms import layer_norm
from gpt_image_edit_tpu.ops.rope import apply_rope_halves


@dataclasses.dataclass(frozen=True)
class Vision2Config:
    depth: int = 32
    embed_dim: int = 1280
    mlp_hidden: int = 5120     # mlp_ratio 4, QuickGELU
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    hidden_size: int = 3584    # LM width (merger output)
    ln_eps: float = 1e-6

    @property
    def head_dim(self):
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self):
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def merge_unit(self):
        return self.spatial_merge_size ** 2


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    vision: Vision2Config = Vision2Config()
    text: TextConfig = TextConfig()
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    projector_in: int = 3584
    projector_out: int = 4096

    @classmethod
    def tiny(cls) -> "Qwen2VLConfig":
        return cls(
            vision=Vision2Config(
                depth=2, embed_dim=32, mlp_hidden=64, num_heads=2,
                patch_size=4, hidden_size=48,
            ),
            text=TextConfig(
                vocab_size=1000, hidden_size=48, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=96, mrope_section=(2, 2, 2),
            ),
            projector_in=48,
            projector_out=32,
        )


# ----------------------------------------------------------------------
# vision tower
# ----------------------------------------------------------------------

def _block_init(rng, cfg: Vision2Config) -> Params:
    d, m = cfg.embed_dim, cfg.mlp_hidden
    ks = jax.random.split(rng, 4)
    return {
        "norm1": layer_norm_init(d),
        "attn": {"qkv": linear_init(ks[0], d, 3 * d), "proj": linear_init(ks[1], d, d)},
        "norm2": layer_norm_init(d),
        "mlp": {"fc1": linear_init(ks[2], d, m), "fc2": linear_init(ks[3], m, d)},
    }


def vision_init(rng, cfg: Vision2Config) -> Params:
    ks = jax.random.split(rng, 4)
    blocks = [_block_init(k, cfg) for k in jax.random.split(ks[0], cfg.depth)]
    merged = cfg.embed_dim * cfg.merge_unit
    return {
        "patch_embed": {
            "kernel": linear_init(ks[1], cfg.patch_dim, cfg.embed_dim, bias=False)["kernel"]
        },
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "merger": {
            "ln_q": layer_norm_init(cfg.embed_dim),
            "fc1": linear_init(ks[2], merged, merged),
            "fc2": linear_init(ks[3], merged, cfg.hidden_size),
        },
    }


def vision_rope(grid_thw: np.ndarray, cfg: Vision2Config):
    """(cos, sin, seg) in the ORIGINAL patch order (no window reorder)."""
    merge = cfg.spatial_merge_size
    hw_pos, seg = [], []
    for idx, (t, h, w) in enumerate(np.asarray(grid_thw)):
        gh, gw = h // merge, w // merge
        hp = np.arange(h)[:, None].repeat(w, 1)
        hp = hp.reshape(gh, merge, gw, merge).transpose(0, 2, 1, 3).reshape(-1)
        wp = np.arange(w)[None, :].repeat(h, 0)
        wp = wp.reshape(gh, merge, gw, merge).transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hp, wp], -1)
        hw_pos.append(np.tile(pos, (int(t), 1)))
        seg.append(np.full(int(t) * h * w, idx))
    hw = np.concatenate(hw_pos, 0)
    seg = np.concatenate(seg, 0)
    half = cfg.head_dim // 2
    quarter = half // 2
    inv = 1.0 / (10000.0 ** (np.arange(quarter) * 2.0 / half))
    freqs = np.concatenate([hw[:, :1] * inv[None], hw[:, 1:2] * inv[None]], -1)
    emb = np.concatenate([freqs, freqs], -1)
    return (
        np.cos(emb).astype(np.float32),
        np.sin(emb).astype(np.float32),
        seg.astype(np.int32),
    )


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def vision_apply(params: Params, cfg: Vision2Config, pixel_patches, rope_cos, rope_sin, seg):
    # linear() dispatch: the patch_embed kernel may be an int8 payload dict
    # under --quantize_vlm (same regression as qwen2p5vl vision.apply)
    x = linear(params["patch_embed"], pixel_patches)
    s, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    cos = jnp.asarray(rope_cos)
    sin = jnp.asarray(rope_sin)
    seg = jnp.asarray(seg)

    def block(x, p):
        xn = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], cfg.ln_eps)
        qkv = linear(p["attn"]["qkv"], xn).reshape(s, 3, h, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = apply_rope_halves(q.transpose(1, 0, 2)[None], cos, sin)[0].transpose(1, 0, 2)
        k = apply_rope_halves(k.transpose(1, 0, 2)[None], cos, sin)[0].transpose(1, 0, 2)
        attn = dot_product_attention(
            q[None], k[None], v[None],
            q_segment_ids=seg[None], kv_segment_ids=seg[None],
        )[0].reshape(s, d)
        x = x + linear(p["attn"]["proj"], attn)
        xn = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], cfg.ln_eps)
        return x + linear(p["mlp"]["fc2"], _quick_gelu(linear(p["mlp"]["fc1"], xn))), None

    x, _ = jax.lax.scan(lambda c, p: block(c, p), x, params["blocks"])
    m = params["merger"]
    x = layer_norm(x, m["ln_q"]["scale"], m["ln_q"]["bias"], cfg.ln_eps)
    x = x.reshape(-1, cfg.merge_unit * cfg.embed_dim)
    return linear(m["fc2"], jax.nn.gelu(linear(m["fc1"], x), approximate=False))


# ----------------------------------------------------------------------
# composition
# ----------------------------------------------------------------------

def init(rng, cfg: Qwen2VLConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    mid = cfg.projector_out * 3
    return {
        "visual": vision_init(k1, cfg.vision),
        "lm": language.init(k2, cfg.text),
        "projector": {
            "fc1": linear_init(k3, cfg.projector_in, mid),
            "fc2": linear_init(k4, mid, cfg.projector_out),
        },
    }


def apply(
    params: Params,
    cfg: Qwen2VLConfig,
    *,
    input_ids,
    position_ids,
    attention_mask=None,
    pixel_patches=None,
    vision_rope_args=None,  # (cos, sin, seg) from vision_rope
    image_embeds=None,
    output_type: str = "lvlm",
):
    embeds = language.embed(params["lm"], input_ids)
    if pixel_patches is not None:
        cos, sin, seg = vision_rope_args
        image_embeds = vision_apply(
            params["visual"], cfg.vision, pixel_patches.astype(embeds.dtype),
            cos, sin, seg,
        )
    if image_embeds is not None:
        embeds = scatter_image_embeds(
            embeds, image_embeds, input_ids == cfg.image_token_id
        )
    hidden = language.trunk(
        params["lm"], cfg.text, embeds, position_ids, pad_mask=attention_mask
    )
    if output_type == "lvlm":
        return language.logits(params["lm"], cfg.text, hidden)
    if output_type == "hidden":
        return hidden
    if output_type == "denoise_embeds":
        return denoise_projector(params["projector"], hidden)
    raise ValueError(output_type)


def convert_qwen2vl(src, cfg: Qwen2VLConfig) -> Params:
    """HF Qwen2VLForConditionalGeneration / merged ckpt -> params."""
    from gpt_image_edit_tpu.utils.ckpt_convert import (
        _detect_prefix, _lin, _stack, convert_qwen_lm,
    )

    vp = _detect_prefix(src, ["visual.", "model.visual."])
    lp = _detect_prefix(src, ["model.language_model.", "model.layers."])
    lp = "model.language_model." if lp == "model.language_model." else "model."

    def _ln(key):
        return {
            "scale": jnp.asarray(src.get(f"{key}.weight")),
            "bias": jnp.asarray(src.get(f"{key}.bias")),
        }

    pe = src.get(f"{vp}patch_embed.proj.weight")
    d = pe.shape[0]
    blocks = []
    for i in range(cfg.vision.depth):
        b = f"{vp}blocks.{i}."
        blocks.append(
            {
                "norm1": _ln(f"{b}norm1"),
                "attn": {"qkv": _lin(src, f"{b}attn.qkv"), "proj": _lin(src, f"{b}attn.proj")},
                "norm2": _ln(f"{b}norm2"),
                "mlp": {"fc1": _lin(src, f"{b}mlp.fc1"), "fc2": _lin(src, f"{b}mlp.fc2")},
            }
        )
    visual = {
        "patch_embed": {"kernel": jnp.asarray(pe.reshape(d, -1).T)},
        "blocks": _stack(blocks),
        "merger": {
            "ln_q": _ln(f"{vp}merger.ln_q"),
            "fc1": _lin(src, f"{vp}merger.mlp.0"),
            "fc2": _lin(src, f"{vp}merger.mlp.2"),
        },
    }
    params = {"visual": visual, "lm": convert_qwen_lm(src, cfg.text.num_layers, lp)}
    if "denoise_tower.denoise_projector.0.weight" in src:
        params["projector"] = {
            "fc1": _lin(src, "denoise_tower.denoise_projector.0"),
            "fc2": _lin(src, "denoise_tower.denoise_projector.2"),
        }
    return params


@register_model("qwen2vl")
class UnivaQwen2VL:
    config_cls = Qwen2VLConfig
    init = staticmethod(init)
    apply = staticmethod(apply)
