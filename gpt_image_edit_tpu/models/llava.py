"""LLaVA-style legacy UniVA wrapper (ref:univa/models/modeling_univa.py).

A plain Qwen2 LM with a 2-layer MLP vision projector over precomputed image
features and a FIXED image-token count (729 = 27x27, the LLaVA/SigLIP grid;
ref:univa/dataset/llava_dataset.py:16). Dead code for all shipped reference
configs (SURVEY appendix) but kept registry-complete; reuses the Qwen2 trunk
from models/qwen2p5vl/language.py."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gpt_image_edit_tpu.models import register_model
from gpt_image_edit_tpu.models.common import Params, linear, linear_init
from gpt_image_edit_tpu.models.qwen2p5vl import language
from gpt_image_edit_tpu.models.qwen2p5vl.config import TextConfig
from gpt_image_edit_tpu.models.qwen2p5vl.model import (
    denoise_projector,
    scatter_image_embeds,
)

IMAGE_TOKEN_COUNT = 729  # fixed LLaVA grid (ref:llava_dataset.py)


@dataclasses.dataclass(frozen=True)
class LlavaUnivaConfig:
    text: TextConfig = TextConfig()
    vision_feature_dim: int = 1152    # SigLIP-so400m features
    image_token_id: int = 151655
    projector_in: int = 3584
    projector_out: int = 4096

    @classmethod
    def tiny(cls) -> "LlavaUnivaConfig":
        return cls(
            text=TextConfig(
                vocab_size=1000, hidden_size=48, num_layers=2, num_heads=4,
                num_kv_heads=2, intermediate_size=96, mrope_section=(2, 2, 2),
            ),
            vision_feature_dim=16,
            projector_in=48,
            projector_out=32,
        )


def init(rng: jax.Array, cfg: LlavaUnivaConfig) -> Params:
    ks = jax.random.split(rng, 5)
    d = cfg.text.hidden_size
    mid = cfg.projector_out * 3
    return {
        "lm": language.init(ks[0], cfg.text),
        "mm_projector": {  # vision features -> LM width (LLaVA mlp2x_gelu)
            "fc1": linear_init(ks[1], cfg.vision_feature_dim, d),
            "fc2": linear_init(ks[2], d, d),
        },
        "projector": {
            "fc1": linear_init(ks[3], cfg.projector_in, mid),
            "fc2": linear_init(ks[4], mid, cfg.projector_out),
        },
    }


def apply(
    params: Params,
    cfg: LlavaUnivaConfig,
    *,
    input_ids: jnp.ndarray,
    position_ids: jnp.ndarray,          # (3, B, S) — text-only mrope is 1D x3
    attention_mask: Optional[jnp.ndarray] = None,
    image_features: Optional[jnp.ndarray] = None,  # (N*729, feature_dim)
    output_type: str = "lvlm",
) -> jnp.ndarray:
    embeds = language.embed(params["lm"], input_ids)
    if image_features is not None:
        p = params["mm_projector"]
        feats = linear(
            p["fc2"],
            jax.nn.gelu(linear(p["fc1"], image_features.astype(embeds.dtype)),
                        approximate=False),
        )
        embeds = scatter_image_embeds(
            embeds, feats, input_ids == cfg.image_token_id
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


@register_model("llava")
class UnivaLlava:
    config_cls = LlavaUnivaConfig
    init = staticmethod(init)
    apply = staticmethod(apply)
