"""SD3 MMDiT denoiser (the reference's denoiser_type='sd3' path,
ref:univa/models/modeling_univa_denoise_tower.py:22-23,112-125,
ref:univa/utils/sd3_pipeline.py).

Behavioral notes vs FLUX (same MMDiT family, different trims):
- NO rope: patchified latents get a fixed 2D sincos positional table,
  center-cropped from a pos_embed_max_size grid (diffusers PatchEmbed).
- joint attention concatenates [image ++ context] (image FIRST — the
  opposite of FLUX's [txt ++ img] order).
- the LAST block is context_pre_only: context gets an AdaLayerNormContinuous
  and produces no context output.
- conditioning = timestep embedding + pooled text (2048-d), no guidance.
- prefix_prompt_embeds (T5) concatenate BEFORE the VLM embeds
  (ref tower :113-117), the opposite of flux ordering.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models.common import (
    Params,
    linear,
    linear_init,
    rms_weight_init,
)
from gpt_image_edit_tpu.models.flux.model import (
    _adaln,
    _mlp_embed,
    _mlp_embed_init,
    timestep_embedding,
)
from gpt_image_edit_tpu.ops.attention import dot_product_attention
from gpt_image_edit_tpu.ops.norms import layer_norm, modulate, rms_norm


@dataclasses.dataclass(frozen=True)
class SD3Config:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    qk_norm: Optional[str] = None  # "rms" for SD3.5
    time_embed_dim: int = 256

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def tiny(cls) -> "SD3Config":
        return cls(
            in_channels=4, out_channels=4, num_layers=3, attention_head_dim=8,
            num_attention_heads=4, joint_attention_dim=64,
            caption_projection_dim=32, pooled_projection_dim=32,
            pos_embed_max_size=16,
        )


def sincos_pos_embed_2d(dim: int, h: int, w: int) -> np.ndarray:
    """Fixed 2D sincos table, diffusers get_2d_sincos_pos_embed convention
    (dim/2 per axis, [sin|cos] per half, grid_w varies fastest)."""
    def _1d(d, pos):
        omega = 1.0 / (10000.0 ** (np.arange(d // 2, dtype=np.float64) / (d / 2.0)))
        out = np.einsum("p,f->pf", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(h, dtype=np.float64)
    grid_w = np.arange(w, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)  # w varies fastest
    emb_h = _1d(dim // 2, np.asarray(grid[1]))
    emb_w = _1d(dim // 2, np.asarray(grid[0]))
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)  # (h*w, dim)


def _block_init(rng, cfg: SD3Config, last: bool) -> Params:
    d = cfg.inner_dim
    hd = cfg.attention_head_dim
    ks = jax.random.split(rng, 16)
    p: Params = {
        "norm1": {"linear": linear_init(ks[0], d, 6 * d)},
        "attn": {
            "to_q": linear_init(ks[2], d, d),
            "to_k": linear_init(ks[3], d, d),
            "to_v": linear_init(ks[4], d, d),
            "add_q_proj": linear_init(ks[5], d, d),
            "add_k_proj": linear_init(ks[6], d, d),
            "add_v_proj": linear_init(ks[7], d, d),
            "to_out": linear_init(ks[8], d, d),
        },
        "ff": {
            "in": linear_init(ks[10], d, 4 * d),
            "out": linear_init(ks[11], 4 * d, d),
        },
    }
    if cfg.qk_norm == "rms":
        p["attn"]["norm_q"] = rms_weight_init(hd)
        p["attn"]["norm_k"] = rms_weight_init(hd)
        p["attn"]["norm_added_q"] = rms_weight_init(hd)
        p["attn"]["norm_added_k"] = rms_weight_init(hd)
    if last:
        p["norm1_context"] = {"linear": linear_init(ks[1], d, 2 * d)}  # continuous
    else:
        p["norm1_context"] = {"linear": linear_init(ks[1], d, 6 * d)}
        p["attn"]["to_add_out"] = linear_init(ks[9], d, d)
        p["ff_context"] = {
            "in": linear_init(ks[12], d, 4 * d),
            "out": linear_init(ks[13], 4 * d, d),
        }
    return p


def init(rng: jax.Array, cfg: SD3Config, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 8)
    d = cfg.inner_dim
    patch_dim = cfg.in_channels * cfg.patch_size ** 2
    blocks = [
        _block_init(k, cfg, last=(i == cfg.num_layers - 1))
        for i, k in enumerate(jax.random.split(ks[0], cfg.num_layers))
    ]
    params: Params = {
        "pos_embed_proj": linear_init(ks[1], patch_dim, d),
        "pos_embed": jnp.asarray(
            sincos_pos_embed_2d(d, cfg.pos_embed_max_size, cfg.pos_embed_max_size)
        ),
        "context_embedder": linear_init(ks[2], cfg.joint_attention_dim, cfg.caption_projection_dim),
        "time_in": _mlp_embed_init(ks[3], cfg.time_embed_dim, d),
        "pooled_in": _mlp_embed_init(ks[4], cfg.pooled_projection_dim, d),
        # per-layer structure differs on the last block -> keep a python list
        "blocks": blocks,
        "norm_out": {"linear": linear_init(ks[5], d, 2 * d)},
        "proj_out": linear_init(ks[6], d, cfg.patch_size ** 2 * cfg.out_channels),
    }
    if dtype != jnp.float32:
        from gpt_image_edit_tpu.models.common import cast_floating

        params = cast_floating(params, dtype)
    return params


def _joint_attn(p, img, ctx, cfg: SD3Config, last: bool):
    b, si, d = img.shape
    sc = ctx.shape[1]
    h, hd = cfg.num_attention_heads, cfg.attention_head_dim

    def heads(x):
        return x.reshape(b, -1, h, hd)

    q_i, k_i, v_i = (heads(linear(p[n], img)) for n in ("to_q", "to_k", "to_v"))
    q_c, k_c, v_c = (
        heads(linear(p[n], ctx)) for n in ("add_q_proj", "add_k_proj", "add_v_proj")
    )
    if "norm_q" in p:
        q_i = rms_norm(q_i, p["norm_q"]["scale"], 1e-6)
        k_i = rms_norm(k_i, p["norm_k"]["scale"], 1e-6)
        q_c = rms_norm(q_c, p["norm_added_q"]["scale"], 1e-6)
        k_c = rms_norm(k_c, p["norm_added_k"]["scale"], 1e-6)
    # SD3: image tokens FIRST
    q = jnp.concatenate([q_i, q_c], axis=1)
    k = jnp.concatenate([k_i, k_c], axis=1)
    v = jnp.concatenate([v_i, v_c], axis=1)
    out = dot_product_attention(q, k, v).reshape(b, si + sc, d)
    img_out = linear(p["to_out"], out[:, :si])
    ctx_out = None if last else linear(p["to_add_out"], out[:, si:])
    return img_out, ctx_out


def _block(p, img, ctx, temb, cfg: SD3Config, last: bool):
    sh, sc_, g, sh_m, sc_m, g_m = _adaln(p["norm1"], temb, 6)
    img_mod = modulate(layer_norm(img, eps=1e-6), sh, sc_)
    if last:
        c_scale, c_shift = _adaln(p["norm1_context"], temb, 2)
        ctx_mod = modulate(layer_norm(ctx, eps=1e-6), c_shift, c_scale)
    else:
        c_sh, c_sc, c_g, c_sh_m, c_sc_m, c_g_m = _adaln(p["norm1_context"], temb, 6)
        ctx_mod = modulate(layer_norm(ctx, eps=1e-6), c_sh, c_sc)

    attn_img, attn_ctx = _joint_attn(p["attn"], img_mod, ctx_mod, cfg, last)
    img = img + g[:, None, :] * attn_img
    img_m = modulate(layer_norm(img, eps=1e-6), sh_m, sc_m)
    img = img + g_m[:, None, :] * linear(
        p["ff"]["out"], jax.nn.gelu(linear(p["ff"]["in"], img_m), approximate=True)
    )
    if last:
        return img, ctx
    ctx = ctx + c_g[:, None, :] * attn_ctx
    ctx_m = modulate(layer_norm(ctx, eps=1e-6), c_sh_m, c_sc_m)
    ctx = ctx + c_g_m[:, None, :] * linear(
        p["ff_context"]["out"],
        jax.nn.gelu(linear(p["ff_context"]["in"], ctx_m), approximate=True),
    )
    return img, ctx


def apply(
    params: Params,
    cfg: SD3Config,
    *,
    hidden_states: jnp.ndarray,          # (B, H, W, C) NHWC latents (UNpacked)
    encoder_hidden_states: jnp.ndarray,  # (B, S_txt, joint_attention_dim)
    pooled_projections: jnp.ndarray,     # (B, 2048)
    timestep: jnp.ndarray,               # (B,) in [0, 1]
) -> jnp.ndarray:
    b, hh, ww, c = hidden_states.shape
    ps = cfg.patch_size
    gh, gw = hh // ps, ww // ps
    compute_dtype = hidden_states.dtype

    # patchify: (B, gh, gw, ps*ps*C), channel-last patch flatten (C-major per
    # pixel matches conv-kernel reshape in the converter)
    x = hidden_states.reshape(b, gh, ps, gw, ps, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, ps * ps * c)
    x = linear(params["pos_embed_proj"], x)

    # center-cropped positional table (diffusers PatchEmbed.cropped_pos_embed)
    m = cfg.pos_embed_max_size
    top = (m - gh) // 2
    left = (m - gw) // 2
    pos = params["pos_embed"].reshape(m, m, -1)[top : top + gh, left : left + gw]
    x = x + pos.reshape(1, gh * gw, -1).astype(compute_dtype)

    t_emb = timestep_embedding(timestep.astype(jnp.float32) * 1000.0, cfg.time_embed_dim)
    temb = _mlp_embed(params["time_in"], t_emb.astype(compute_dtype))
    temb = temb + _mlp_embed(params["pooled_in"], pooled_projections.astype(compute_dtype))

    ctx = linear(params["context_embedder"], encoder_hidden_states.astype(compute_dtype))

    for i, p in enumerate(params["blocks"]):
        x, ctx = _block(p, x, ctx, temb, cfg, last=(i == cfg.num_layers - 1))

    scale, shift = _adaln(params["norm_out"], temb, 2)
    x = modulate(layer_norm(x, eps=1e-6), shift, scale)
    x = linear(params["proj_out"], x)

    # unpatchify back to NHWC
    x = x.reshape(b, gh, gw, ps, ps, cfg.out_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.out_channels)
    return x


def convert_sd3(src, cfg: SD3Config, prefix: str = "") -> Params:
    """diffusers SD3Transformer2DModel state dict -> params."""
    from gpt_image_edit_tpu.utils.ckpt_convert import _lin, _norm_scale

    p = prefix
    conv_w = src.get(f"{p}pos_embed.proj.weight")  # (D, C, ps, ps)
    d = conv_w.shape[0]
    # torch conv patchify == linear over (ps, ps, C) patch flattened HWC-last;
    # our patchify flattens (ps, ps, C) too -> transpose conv to (ps*ps*C, D)
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)
    params: Params = {
        "pos_embed_proj": {
            "kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(src.get(f"{p}pos_embed.proj.bias")),
        },
        "pos_embed": jnp.asarray(src.get(f"{p}pos_embed.pos_embed"))[0],
        "context_embedder": _lin(src, f"{p}context_embedder"),
        "time_in": {
            "in": _lin(src, f"{p}time_text_embed.timestep_embedder.linear_1"),
            "out": _lin(src, f"{p}time_text_embed.timestep_embedder.linear_2"),
        },
        "pooled_in": {
            "in": _lin(src, f"{p}time_text_embed.text_embedder.linear_1"),
            "out": _lin(src, f"{p}time_text_embed.text_embedder.linear_2"),
        },
        "norm_out": {"linear": _lin(src, f"{p}norm_out.linear")},
        "proj_out": _lin(src, f"{p}proj_out"),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        b = f"{p}transformer_blocks.{i}."
        last = i == cfg.num_layers - 1
        blk = {
            "norm1": {"linear": _lin(src, f"{b}norm1.linear")},
            "norm1_context": {"linear": _lin(src, f"{b}norm1_context.linear")},
            "attn": {
                "to_q": _lin(src, f"{b}attn.to_q"),
                "to_k": _lin(src, f"{b}attn.to_k"),
                "to_v": _lin(src, f"{b}attn.to_v"),
                "add_q_proj": _lin(src, f"{b}attn.add_q_proj"),
                "add_k_proj": _lin(src, f"{b}attn.add_k_proj"),
                "add_v_proj": _lin(src, f"{b}attn.add_v_proj"),
                "to_out": _lin(src, f"{b}attn.to_out.0"),
            },
            "ff": {"in": _lin(src, f"{b}ff.net.0.proj"), "out": _lin(src, f"{b}ff.net.2")},
        }
        if f"{b}attn.norm_q.weight" in src:
            blk["attn"]["norm_q"] = _norm_scale(src, f"{b}attn.norm_q")
            blk["attn"]["norm_k"] = _norm_scale(src, f"{b}attn.norm_k")
            blk["attn"]["norm_added_q"] = _norm_scale(src, f"{b}attn.norm_added_q")
            blk["attn"]["norm_added_k"] = _norm_scale(src, f"{b}attn.norm_added_k")
        if not last:
            blk["attn"]["to_add_out"] = _lin(src, f"{b}attn.to_add_out")
            blk["ff_context"] = {
                "in": _lin(src, f"{b}ff_context.net.0.proj"),
                "out": _lin(src, f"{b}ff_context.net.2"),
            }
        params["blocks"].append(blk)
    return params
