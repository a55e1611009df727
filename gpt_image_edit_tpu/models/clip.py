"""CLIP text encoders (CLIP-L for FLUX, CLIP-L/G-with-projection for SD3),
functional JAX.

Parity targets:
- CLIPTextModel from the FLUX checkpoint (ref:train_denoiser.py:408-426,
  ref:univa/utils/denoiser_prompt_embedding_flux.py:61-104 — `pooled_output`
  = final-LN hidden state at the EOS position)
- CLIPTextModelWithProjection pairs from an SD3 checkpoint
  (ref:univa/utils/denoiser_prompt_embedding.py:38-76: sequence embeds =
  PENULTIMATE layer hidden states, pooled = text_projection(eos hidden))."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gpt_image_edit_tpu.models.common import (
    Params,
    layer_norm_init,
    linear,
    linear_init,
)
from gpt_image_edit_tpu.ops.attention import dot_product_attention
from gpt_image_edit_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    eos_token_id: int = 49407
    ln_eps: float = 1e-5
    hidden_act: str = "quick_gelu"          # "gelu" for OpenCLIP bigG (SD3)
    projection_dim: Optional[int] = None    # text_projection (SD3 encoders)

    @classmethod
    def tiny(cls) -> "ClipTextConfig":
        return cls(vocab_size=512, hidden_size=32, num_layers=2, num_heads=2,
                   intermediate_size=64, max_position_embeddings=16, eos_token_id=511)

    @classmethod
    def sd3_clip_l(cls) -> "ClipTextConfig":
        return cls(projection_dim=768)

    @classmethod
    def sd3_clip_g(cls) -> "ClipTextConfig":
        # OpenCLIP bigG-14 text tower (SD3 text_encoder_2)
        return cls(hidden_size=1280, num_layers=32, num_heads=20,
                   intermediate_size=5120, hidden_act="gelu",
                   projection_dim=1280)


def _layer_init(rng, cfg: ClipTextConfig) -> Params:
    d = cfg.hidden_size
    ks = jax.random.split(rng, 6)
    return {
        "ln1": layer_norm_init(d),
        "attn": {
            "q": linear_init(ks[0], d, d),
            "k": linear_init(ks[1], d, d),
            "v": linear_init(ks[2], d, d),
            "o": linear_init(ks[3], d, d),
        },
        "ln2": layer_norm_init(d),
        "mlp": {
            "fc1": linear_init(ks[4], d, cfg.intermediate_size),
            "fc2": linear_init(ks[5], cfg.intermediate_size, d),
        },
    }


def init(rng: jax.Array, cfg: ClipTextConfig) -> Params:
    ks = jax.random.split(rng, 4)
    layers = [_layer_init(k, cfg) for k in jax.random.split(ks[0], cfg.num_layers)]
    return {
        "token_embed": jax.random.normal(ks[1], (cfg.vocab_size, cfg.hidden_size)) * 0.02,
        "pos_embed": jax.random.normal(ks[2], (cfg.max_position_embeddings, cfg.hidden_size)) * 0.02,
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_ln": layer_norm_init(cfg.hidden_size),
    }


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def apply(
    params: Params,
    cfg: ClipTextConfig,
    input_ids: jnp.ndarray,
    *,
    output_penultimate: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, S) -> (hidden (B, S, D), pooled (B, D | projection_dim)).

    pooled = final-LN hidden at the first EOS position (CLIPTextModel
    pooler), projected through text_projection when the checkpoint has one
    (CLIPTextModelWithProjection, the SD3 encoders). With
    output_penultimate=True the sequence output is the PENULTIMATE layer's
    hidden states (hidden_states[-2], the SD3 conditioning convention)."""
    b, s = input_ids.shape
    x = params["token_embed"][input_ids] + params["pos_embed"][:s]

    h, hd = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    act = _quick_gelu if cfg.hidden_act == "quick_gelu" else jax.nn.gelu

    def layer(x, p):
        xn = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], cfg.ln_eps)
        q = linear(p["attn"]["q"], xn).reshape(b, s, h, hd)
        k = linear(p["attn"]["k"], xn).reshape(b, s, h, hd)
        v = linear(p["attn"]["v"], xn).reshape(b, s, h, hd)
        attn = dot_product_attention(q, k, v, causal=True, impl="xla")
        x = x + linear(p["attn"]["o"], attn.reshape(b, s, -1))
        xn = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], cfg.ln_eps)
        x = x + linear(p["mlp"]["fc2"], act(linear(p["mlp"]["fc1"], xn)))
        return x, x

    x, per_layer = jax.lax.scan(lambda c, p: layer(c, p), x, params["layers"])
    final = layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"], cfg.ln_eps)

    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = final[jnp.arange(b), eos_pos]
    if "text_projection" in params:
        pooled = linear(params["text_projection"], pooled)
    # penultimate = input to the LAST layer = per_layer[-2]
    seq = per_layer[-2] if output_penultimate else final
    return seq, pooled


def convert_clip(src, cfg: ClipTextConfig, prefix: str = "text_model.",
                 placement=None) -> Params:
    from gpt_image_edit_tpu.utils.ckpt_convert import (
        _arr, _lin, _stack, with_placement,
    )
    if placement is not None:
        return with_placement(convert_clip)(src, cfg, prefix, placement=placement)

    def _ln(key):
        return {
            "scale": _arr(src.get(f"{key}.weight")),
            "bias": _arr(src.get(f"{key}.bias")),
        }

    p = prefix
    layers = []
    for i in range(cfg.num_layers):
        b = f"{p}encoder.layers.{i}."
        layers.append(
            {
                "ln1": _ln(f"{b}layer_norm1"),
                "attn": {
                    "q": _lin(src, f"{b}self_attn.q_proj"),
                    "k": _lin(src, f"{b}self_attn.k_proj"),
                    "v": _lin(src, f"{b}self_attn.v_proj"),
                    "o": _lin(src, f"{b}self_attn.out_proj"),
                },
                "ln2": _ln(f"{b}layer_norm2"),
                "mlp": {
                    "fc1": _lin(src, f"{b}mlp.fc1"),
                    "fc2": _lin(src, f"{b}mlp.fc2"),
                },
            }
        )
    out = {
        "token_embed": _arr(src.get(f"{p}embeddings.token_embedding.weight")),
        "pos_embed": _arr(src.get(f"{p}embeddings.position_embedding.weight")),
        "layers": _stack(layers),
        "final_ln": _ln(f"{p}final_layer_norm"),
    }
    if "text_projection.weight" in src:
        # CLIPTextModelWithProjection (no bias)
        out["text_projection"] = {
            "kernel": _arr(src.get("text_projection.weight").T)
        }
    return out
