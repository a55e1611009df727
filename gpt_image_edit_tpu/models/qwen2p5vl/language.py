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
    linear_multi,
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
    # linear_multi: ONE shared activation quantization across q/k/v under
    # W8A8 serving (quantize_vlm="w8a8"); bitwise == per-head linear
    q, k, v = linear_multi((p["attn"]["q"], p["attn"]["k"], p["attn"]["v"]), xn)
    q = q.reshape(b, s, h, hd)
    k = k.reshape(b, s, hk, hd)
    v = v.reshape(b, s, hk, hd)
    # BSHD rope: (B, S, 1, D) tables broadcast over the head axis — same
    # rotation, no BHSD layout round-trip (ops/rope.py)
    q = apply_rope_halves(q, cos[:, :, None, :], sin[:, :, None, :])
    k = apply_rope_halves(k, cos[:, :, None, :], sin[:, :, None, :])
    attn = dot_product_attention(q, k, v, causal=True, pad_mask=pad_mask)
    x = x + linear(p["attn"]["o"], attn.reshape(b, s, h * hd))
    xn = rms_norm(x, p["post_ln"]["scale"], cfg.rms_eps)
    gate, up = linear_multi((p["mlp"]["gate"], p["mlp"]["up"]), xn)
    mlp = linear(p["mlp"]["down"], jax.nn.silu(gate) * up)
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
    # HF Qwen rotates in the activation dtype (cos/sin cast to x.dtype);
    # also saves re-slicing f32 tables inside the layer scan
    cos = cos.astype(inputs_embeds.dtype)
    sin = sin.astype(inputs_embeds.dtype)

    def body(carry, p):
        return _layer(p, carry, cos, sin, pad_mask, cfg), None

    x, _ = jax.lax.scan(body, inputs_embeds, params["layers"])
    return rms_norm(x, params["final_ln"]["scale"], cfg.rms_eps)


def logits(params: Params, cfg: TextConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    if cfg.tie_word_embeddings:
        return jnp.dot(hidden, params["embed_tokens"].T.astype(hidden.dtype))
    return linear(params["lm_head"], hidden)


# --------------------------------------------------------------------------
# KV-cache decoding (the `model.generate` analogue, ref:cli.py:256-267)
# --------------------------------------------------------------------------

def _layer_with_cache(p: Params, x, cos, sin, cache_k, cache_v, pad_mask, cfg: TextConfig):
    """x: (B, S, D) new tokens; cache_k/v: (B, S_cache, Hkv, hd) with this
    layer's past already written at positions [0, offset); pad_mask covers
    the full cache length. Returns (out, new_k, new_v) for the new tokens."""
    b, s, d = x.shape
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    xn = rms_norm(x, p["input_ln"]["scale"], cfg.rms_eps)
    q, k, v = linear_multi((p["attn"]["q"], p["attn"]["k"], p["attn"]["v"]), xn)
    q = q.reshape(b, s, h, hd)
    k = k.reshape(b, s, hk, hd)
    v = v.reshape(b, s, hk, hd)
    # BSHD rope: (B, S, 1, D) tables broadcast over the head axis — same
    # rotation, no BHSD layout round-trip (ops/rope.py)
    q = apply_rope_halves(q, cos[:, :, None, :], sin[:, :, None, :])
    k = apply_rope_halves(k, cos[:, :, None, :], sin[:, :, None, :])
    return q, k, v


def prefill(
    params: Params,
    cfg: TextConfig,
    inputs_embeds: jnp.ndarray,
    position_ids: jnp.ndarray,       # (3, B, S)
    pad_mask: Optional[jnp.ndarray],
    max_len: int,
):
    """Full forward building a (layers, B, max_len, Hkv, hd) KV cache.
    Returns (last_hidden (B, S, D), cache {k, v})."""
    b, s, _ = inputs_embeds.shape
    hk, hd = cfg.num_kv_heads, cfg.head_dim
    cos, sin = mrope_freqs(position_ids, cfg.head_dim, cfg.mrope_section, cfg.rope_theta)
    cos = cos.astype(inputs_embeds.dtype)
    sin = sin.astype(inputs_embeds.dtype)

    n_layers = cfg.num_layers
    cache_k = jnp.zeros((n_layers, b, max_len, hk, hd), inputs_embeds.dtype)
    cache_v = jnp.zeros((n_layers, b, max_len, hk, hd), inputs_embeds.dtype)

    x = inputs_embeds
    def body(carry, xs):
        x = carry
        p, li = xs
        bq, k, v = _layer_with_cache(p, x, cos, sin, None, None, pad_mask, cfg)
        attn = dot_product_attention(bq, k, v, causal=True, pad_mask=pad_mask)
        h = cfg.num_heads
        x2 = x + linear(p["attn"]["o"], attn.reshape(b, s, h * hd))
        xn = rms_norm(x2, p["post_ln"]["scale"], cfg.rms_eps)
        gate, up = linear_multi((p["mlp"]["gate"], p["mlp"]["up"]), xn)
        mlp = linear(p["mlp"]["down"], jax.nn.silu(gate) * up)
        return x2 + mlp, (k, v)

    x, kvs = jax.lax.scan(
        body, x, (params["layers"], jnp.arange(n_layers))
    )
    ks, vs = kvs  # (layers, B, S, hk, hd)
    cache_k = cache_k.at[:, :, :s].set(ks)
    cache_v = cache_v.at[:, :, :s].set(vs)
    x = rms_norm(x, params["final_ln"]["scale"], cfg.rms_eps)
    return x, (cache_k, cache_v)


def decode_step(
    params: Params,
    cfg: TextConfig,
    token_embed: jnp.ndarray,     # (B, 1, D)
    position_id: jnp.ndarray,     # (3, B, 1)
    cache,                        # (cache_k, cache_v) (L, B, max_len, hk, hd)
    offset: jnp.ndarray,          # scalar int32: tokens already in cache
    pad_mask: jnp.ndarray,        # (B, max_len) — 1 for valid cache slots
):
    """One greedy decode step; returns (logits (B, V), new_cache)."""
    cache_k, cache_v = cache
    b = token_embed.shape[0]
    h, hk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = mrope_freqs(position_id, cfg.head_dim, cfg.mrope_section, cfg.rope_theta)
    cos = cos.astype(token_embed.dtype)
    sin = sin.astype(token_embed.dtype)

    def body(carry, xs):
        x = carry
        p, ck, cv = xs
        q, k, v = _layer_with_cache(p, x, cos, sin, None, None, None, cfg)
        ck = jax.lax.dynamic_update_slice(ck, k, (0, offset, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v, (0, offset, 0, 0))
        attn = dot_product_attention(q, ck, cv, pad_mask=pad_mask)
        x2 = x + linear(p["attn"]["o"], attn.reshape(b, 1, h * hd))
        xn = rms_norm(x2, p["post_ln"]["scale"], cfg.rms_eps)
        gate, up = linear_multi((p["mlp"]["gate"], p["mlp"]["up"]), xn)
        mlp = linear(p["mlp"]["down"], jax.nn.silu(gate) * up)
        return x2 + mlp, (ck, cv)

    x, (cache_k, cache_v) = jax.lax.scan(
        body, token_embed, (params["layers"], cache_k, cache_v)
    )
    x = rms_norm(x, params["final_ln"]["scale"], cfg.rms_eps)
    return logits(params, cfg, x)[:, 0], (cache_k, cache_v)
