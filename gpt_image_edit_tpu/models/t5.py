"""T5 (v1.1 / XXL) text encoder, functional JAX.

Parity target: the T5EncoderModel the reference loads from the FLUX checkpoint
(ref:train_denoiser.py:408-426, ref:univa/utils/denoiser_prompt_embedding_flux.py:15-58).
T5 specifics honored: relative-position bias (computed in layer 0, shared by
all layers), no attention scaling (scale=1), RMSNorm without mean-centering,
gated-GELU MLP, embedding-scale-free encoder."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models.common import Params, linear, linear_init, rms_weight_init
from gpt_image_edit_tpu.ops.attention import dot_product_attention
from gpt_image_edit_tpu.ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    rms_eps: float = 1e-6

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(vocab_size=512, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4)


def _layer_init(rng, cfg: T5Config) -> Params:
    inner = cfg.num_heads * cfg.d_kv
    ks = jax.random.split(rng, 8)
    return {
        "ln1": rms_weight_init(cfg.d_model),
        "attn": {
            "q": linear_init(ks[0], cfg.d_model, inner, bias=False),
            "k": linear_init(ks[1], cfg.d_model, inner, bias=False),
            "v": linear_init(ks[2], cfg.d_model, inner, bias=False),
            "o": linear_init(ks[3], inner, cfg.d_model, bias=False),
        },
        "ln2": rms_weight_init(cfg.d_model),
        "mlp": {
            "wi0": linear_init(ks[4], cfg.d_model, cfg.d_ff, bias=False),
            "wi1": linear_init(ks[5], cfg.d_model, cfg.d_ff, bias=False),
            "wo": linear_init(ks[6], cfg.d_ff, cfg.d_model, bias=False),
        },
    }


def init(rng: jax.Array, cfg: T5Config) -> Params:
    ks = jax.random.split(rng, 4)
    layers = [_layer_init(k, cfg) for k in jax.random.split(ks[0], cfg.num_layers)]
    return {
        "embed": jax.random.normal(ks[1], (cfg.vocab_size, cfg.d_model)) * 1.0,
        "rel_bias": jax.random.normal(ks[2], (cfg.relative_attention_num_buckets, cfg.num_heads)) * 0.02,
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "final_ln": rms_weight_init(cfg.d_model),
    }


def _relative_buckets(rel_pos: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing (host-side, static)."""
    ret = np.zeros_like(rel_pos)
    n = num_buckets // 2
    ret += (rel_pos > 0).astype(np.int64) * n
    ap = np.abs(rel_pos)
    max_exact = n // 2
    is_small = ap < max_exact
    large = max_exact + (
        np.log(np.maximum(ap, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, n - 1)
    ret += np.where(is_small, ap, large)
    return ret


def relative_bias_table(cfg: T5Config, seq_len: int) -> np.ndarray:
    """(S, S) int bucket ids; bias = rel_bias[buckets] gathered per head."""
    pos = np.arange(seq_len)
    rel = pos[None, :] - pos[:, None]  # memory - query
    return _relative_buckets(
        rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )


def apply(
    params: Params,
    cfg: T5Config,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, S) ids -> (B, S, d_model) final hidden states."""
    b, s = input_ids.shape
    x = params["embed"][input_ids]

    buckets = jnp.asarray(relative_bias_table(cfg, s))
    bias = params["rel_bias"][buckets]          # (S, S, H)
    bias = bias.transpose(2, 0, 1)[None]        # (1, H, S, S)

    def layer(x, p):
        xn = rms_norm(x, p["ln1"]["scale"], cfg.rms_eps)
        q = linear(p["attn"]["q"], xn).reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = linear(p["attn"]["k"], xn).reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = linear(p["attn"]["v"], xn).reshape(b, s, cfg.num_heads, cfg.d_kv)
        attn = dot_product_attention(
            q, k, v, bias=bias, pad_mask=attention_mask, scale=1.0, impl="xla"
        )
        x = x + linear(p["attn"]["o"], attn.reshape(b, s, -1))
        xn = rms_norm(x, p["ln2"]["scale"], cfg.rms_eps)
        mlp = linear(
            p["mlp"]["wo"],
            jax.nn.gelu(linear(p["mlp"]["wi0"], xn), approximate=True)
            * linear(p["mlp"]["wi1"], xn),
        )
        return x + mlp, None

    x, _ = jax.lax.scan(lambda c, p: layer(c, p), x, params["layers"])
    return rms_norm(x, params["final_ln"]["scale"], cfg.rms_eps)


def convert_t5(src, cfg: T5Config, prefix: str = "", placement=None) -> Params:
    """HF T5EncoderModel state dict -> params. `placement`: see
    ckpt_convert.with_placement (host-side build + park, for --offload)."""
    from gpt_image_edit_tpu.utils.ckpt_convert import (
        _arr, _lin, _norm_scale, _stack, with_placement,
    )
    if placement is not None:
        return with_placement(convert_t5)(src, cfg, prefix, placement=placement)

    p = prefix
    layers = []
    for i in range(cfg.num_layers):
        b = f"{p}encoder.block.{i}."
        layers.append(
            {
                "ln1": _norm_scale(src, f"{b}layer.0.layer_norm"),
                "attn": {
                    "q": _lin(src, f"{b}layer.0.SelfAttention.q"),
                    "k": _lin(src, f"{b}layer.0.SelfAttention.k"),
                    "v": _lin(src, f"{b}layer.0.SelfAttention.v"),
                    "o": _lin(src, f"{b}layer.0.SelfAttention.o"),
                },
                "ln2": _norm_scale(src, f"{b}layer.1.layer_norm"),
                "mlp": {
                    "wi0": _lin(src, f"{b}layer.1.DenseReluDense.wi_0"),
                    "wi1": _lin(src, f"{b}layer.1.DenseReluDense.wi_1"),
                    "wo": _lin(src, f"{b}layer.1.DenseReluDense.wo"),
                },
            }
        )
    return {
        "embed": _arr(src.get(f"{p}shared.weight")),
        "rel_bias": _arr(
            src.get(
                f"{p}encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
            )
        ),
        "layers": _stack(layers),
        "final_ln": _norm_scale(src, f"{p}encoder.final_layer_norm"),
    }
