"""Qwen2.5 LM trunk (GQA + M-RoPE + SwiGLU), functional JAX.

Parity target: the Qwen2_5_VLModel trunk the reference drives at
ref:univa/models/qwen2p5vl/modeling_univa_qwen2p5vl.py:481-494. Causal
attention runs through ops.attention (Pallas flash kernel on TPU) with a
padding mask; blocks are a stacked pytree under lax.scan.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gpt_image_edit_tpu.models.common import (
    Params,
    linear,
    linear_init,
    rms_weight_init,
)
from gpt_image_edit_tpu.models.qwen2p5vl.config import TextConfig
from gpt_image_edit_tpu.ops.attention import dot_product_attention
from gpt_image_edit_tpu.ops.norms import rms_norm
from gpt_image_edit_tpu.ops.rope import apply_rope_halves, mrope_freqs


def _layer_init(rng, cfg: TextConfig) -> Params:
    d = cfg.hidden_size
    hd = cfg.head_dim
    ks = jax.random.split(rng, 8)
    return {
        "input_ln": rms_weight_init(d),
        "attn": {
            "q": linear_init(ks[0], d, cfg.num_heads * hd, bias=True),
            "k": linear_init(ks[1], d, cfg.num_kv_heads * hd, bias=True),
            "v": linear_init(ks[2], d, cfg.num_kv_heads * hd, bias=True),
            "o": linear_init(ks[3], cfg.num_heads * hd, d, bias=False),
        },
        "post_ln": rms_weight_init(d),
        "mlp": {
            "gate": linear_init(ks[4], d, cfg.intermediate_size, bias=False),
            "up": linear_init(ks[5], d, cfg.intermediate_size, bias=False),
            "down": linear_init(ks[6], cfg.intermediate_size, d, bias=False),
        },
    }


def init(rng: jax.Array, cfg: TextConfig) -> Params:
    ks = jax.random.split(rng, 4)
    layers = [_layer_init(k, cfg) for k in jax.random.split(ks[0], cfg.num_layers)]
    params: Params = {
        "embed_tokens": jax.random.normal(ks[1], (cfg.vocab_size, cfg.hidden_size)) * 0.02,
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_ln": rms_weight_init(cfg.hidden_size),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = linear_init(ks[2], cfg.hidden_size, cfg.vocab_size, bias=False)
    return params


def _layer(p: Params, x, cos, sin, pad_mask, cfg: TextConfig):
    b, s, d = x.shape
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    xn = rms_norm(x, p["input_ln"]["scale"], cfg.rms_eps)
    q = linear(p["attn"]["q"], xn).reshape(b, s, h, hd)
    k = linear(p["attn"]["k"], xn).reshape(b, s, hk, hd)
    v = linear(p["attn"]["v"], xn).reshape(b, s, hk, hd)
    q = apply_rope_halves(q.transpose(0, 2, 1, 3), cos, sin).transpose(0, 2, 1, 3)
    k = apply_rope_halves(k.transpose(0, 2, 1, 3), cos, sin).transpose(0, 2, 1, 3)
    attn = dot_product_attention(q, k, v, causal=True, pad_mask=pad_mask)
    x = x + linear(p["attn"]["o"], attn.reshape(b, s, h * hd))
    xn = rms_norm(x, p["post_ln"]["scale"], cfg.rms_eps)
    mlp = linear(
        p["mlp"]["down"],
        jax.nn.silu(linear(p["mlp"]["gate"], xn)) * linear(p["mlp"]["up"], xn),
    )
    return x + mlp


def embed(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed_tokens"][input_ids]


def trunk(
    params: Params,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,         # (B, S, D)
    position_ids: jnp.ndarray,          # (3, B, S) M-RoPE ids
    pad_mask: Optional[jnp.ndarray] = None,  # (B, S)
) -> jnp.ndarray:
    """Final-norm hidden states (B, S, D)."""
    cos, sin = mrope_freqs(
        position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta
    )

    def body(carry, p):
        return _layer(p, carry, cos, sin, pad_mask, cfg), None

    x, _ = jax.lax.scan(body, inputs_embeds, params["layers"])
    return rms_norm(x, params["final_ln"]["scale"], cfg.rms_eps)


def logits(params: Params, cfg: TextConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    if cfg.tie_word_embeddings:
        return jnp.dot(hidden, params["embed_tokens"].T.astype(hidden.dtype))
    return linear(params["lm_head"], hidden)
