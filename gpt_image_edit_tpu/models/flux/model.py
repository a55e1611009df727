"""FLUX.1 MMDiT denoiser, TPU-first functional implementation.

Behavioral parity target: the diffusers FluxTransformer2DModel the reference
instantiates (ref:univa/models/modeling_univa_denoise_tower.py:20-21) and
drives through UnivaDenoiseTower.forward
(ref:univa/models/modeling_univa_denoise_tower.py:49-110): timestep arrives
in [0,1] and is scaled x1000 internally, txt rope ids are all-zero, the image
token stream is [target ++ reference] packed latents.

TPU-first design decisions (vs the torch reference):
- the 19 dual and 38 single blocks are *stacked pytrees* driven by
  `lax.scan` — one compiled block body each, smaller XLA graphs, and a
  natural leading axis for per-layer selective training
  (ref:train_denoiser.py:71-119 `flux_train_layer_idx`).
- attention runs through ops.attention (Pallas flash kernel on TPU).
- rope cos/sin are computed once per call from the (modality, y, x) ids and
  closed over by the scan bodies.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from gpt_image_edit_tpu.models.common import (
    Params,
    adaln_stacked,
    linear,
    linear_concat,
    linear_gelu,
    linear_init,
    linear_multi,
    ln_modulate_quant,
    rms_weight_init,
)
from gpt_image_edit_tpu.models.flux.config import FluxConfig
from gpt_image_edit_tpu.ops.attention import dot_product_attention
from gpt_image_edit_tpu.ops.norms import layer_norm, modulate, rms_norm
from gpt_image_edit_tpu.ops.rope import apply_rope_paired, flux_rope_freqs


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _mlp_embed_init(rng, in_dim, hidden) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "in": linear_init(r1, in_dim, hidden),
        "out": linear_init(r2, hidden, hidden),
    }


def _dual_block_init(rng, cfg: FluxConfig) -> Params:
    d = cfg.inner_dim
    hd = cfg.attention_head_dim
    keys = jax.random.split(rng, 16)
    return {
        "norm1": {"linear": linear_init(keys[0], d, 6 * d)},
        "norm1_context": {"linear": linear_init(keys[1], d, 6 * d)},
        "attn": {
            "to_q": linear_init(keys[2], d, d),
            "to_k": linear_init(keys[3], d, d),
            "to_v": linear_init(keys[4], d, d),
            "add_q_proj": linear_init(keys[5], d, d),
            "add_k_proj": linear_init(keys[6], d, d),
            "add_v_proj": linear_init(keys[7], d, d),
            "norm_q": rms_weight_init(hd),
            "norm_k": rms_weight_init(hd),
            "norm_added_q": rms_weight_init(hd),
            "norm_added_k": rms_weight_init(hd),
            "to_out": linear_init(keys[8], d, d),
            "to_add_out": linear_init(keys[9], d, d),
        },
        "ff": {
            "in": linear_init(keys[10], d, cfg.mlp_dim),
            "out": linear_init(keys[11], cfg.mlp_dim, d),
        },
        "ff_context": {
            "in": linear_init(keys[12], d, cfg.mlp_dim),
            "out": linear_init(keys[13], cfg.mlp_dim, d),
        },
    }


def _single_block_init(rng, cfg: FluxConfig) -> Params:
    d = cfg.inner_dim
    hd = cfg.attention_head_dim
    keys = jax.random.split(rng, 8)
    return {
        "norm": {"linear": linear_init(keys[0], d, 3 * d)},
        "proj_mlp": linear_init(keys[1], d, cfg.mlp_dim),
        "attn": {
            "to_q": linear_init(keys[2], d, d),
            "to_k": linear_init(keys[3], d, d),
            "to_v": linear_init(keys[4], d, d),
            "norm_q": rms_weight_init(hd),
            "norm_k": rms_weight_init(hd),
        },
        "proj_out": linear_init(keys[5], d + cfg.mlp_dim, d),
    }


def _stack_init(rng, n: int, block_init, cfg) -> Params:
    """Init n blocks and stack each leaf along a leading layer axis."""
    blocks = [block_init(r, cfg) for r in jax.random.split(rng, n)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def init(rng: jax.Array, cfg: FluxConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(rng, 10)
    d = cfg.inner_dim
    params: Params = {
        "x_embedder": linear_init(keys[0], cfg.in_channels, d),
        "context_embedder": linear_init(keys[1], cfg.joint_attention_dim, d),
        "time_in": _mlp_embed_init(keys[2], cfg.time_embed_dim, d),
        "pooled_in": _mlp_embed_init(keys[3], cfg.pooled_projection_dim, d),
        "dual_blocks": _stack_init(keys[5], cfg.num_layers, _dual_block_init, cfg),
        "single_blocks": _stack_init(keys[6], cfg.num_single_layers, _single_block_init, cfg),
        "norm_out": {"linear": linear_init(keys[7], d, 2 * d)},
        "proj_out": linear_init(keys[8], d, cfg.out_channels),
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = _mlp_embed_init(keys[4], cfg.time_embed_dim, d)
    if dtype != jnp.float32:
        from gpt_image_edit_tpu.models.common import cast_floating

        params = cast_floating(params, dtype)
    return params


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers convention (flip_sin_to_cos=True,
    downscale_freq_shift=0): output = [cos | sin]. t: (B,) fp32, pre-scaled."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _mlp_embed(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(p["out"], jax.nn.silu(linear(p["in"], x)))


def _adaln(p: Params, temb: jnp.ndarray, chunks: int):
    out = linear(p["linear"], jax.nn.silu(temb))
    return jnp.split(out, chunks, axis=-1)


def _qk_norm_heads(x: jnp.ndarray, scale: Params) -> jnp.ndarray:
    return rms_norm(x, scale["scale"], eps=1e-6)


def _joint_attention(
    p: Params,
    img: jnp.ndarray,
    txt: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: FluxConfig,
    pad_mask: Optional[jnp.ndarray],
):
    """MMDiT joint attention over [txt ++ img] tokens; returns (img_out, txt_out)."""
    b, s_img, d = img.shape
    s_txt = txt.shape[1]
    h, hd = cfg.num_attention_heads, cfg.attention_head_dim

    def heads(x):
        return x.reshape(b, -1, h, hd)

    # one shared activation quantization per stream in W8A8 mode
    lq_i, lk_i, lv_i = linear_multi([p["to_q"], p["to_k"], p["to_v"]], img)
    lq_t, lk_t, lv_t = linear_multi(
        [p["add_q_proj"], p["add_k_proj"], p["add_v_proj"]], txt
    )
    q_i = _qk_norm_heads(heads(lq_i), p["norm_q"])
    k_i = _qk_norm_heads(heads(lk_i), p["norm_k"])
    v_i = heads(lv_i)
    q_t = _qk_norm_heads(heads(lq_t), p["norm_added_q"])
    k_t = _qk_norm_heads(heads(lk_t), p["norm_added_k"])
    v_t = heads(lv_t)

    # Text tokens first, matching diffusers' joint-attention concat order.
    q = jnp.concatenate([q_t, q_i], axis=1)
    k = jnp.concatenate([k_t, k_i], axis=1)
    v = jnp.concatenate([v_t, v_i], axis=1)

    # rope directly in BSHD: (S, 1, hd) tables broadcast over the head axis
    # — bitwise-identical to rotating in BHSD, without the two 53MB layout
    # round-trips per tensor per block the transposes cost at serving width
    q = apply_rope_paired(q, cos[:, None, :], sin[:, None, :])
    k = apply_rope_paired(k, cos[:, None, :], sin[:, None, :])

    out = dot_product_attention(q, k, v, pad_mask=pad_mask, impl=cfg.attention_impl)
    out = out.reshape(b, s_txt + s_img, d)
    txt_out, img_out = out[:, :s_txt], out[:, s_txt:]
    return linear(p["to_out"], img_out), linear(p["to_add_out"], txt_out)


def _dual_block(
    p: Params,
    mod: jnp.ndarray,       # (6, B, d) adaLN chunks, hoisted out of the scan
    mod_ctx: jnp.ndarray,   # (6, B, d)
    img: jnp.ndarray,
    txt: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: FluxConfig,
    pad_mask: Optional[jnp.ndarray],
):
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = mod
    c_sh_msa, c_sc_msa, c_g_msa, c_sh_mlp, c_sc_mlp, c_g_mlp = mod_ctx

    # W8A8 + GIE_FUSE_MOD_QUANT: these return QuantRows from the fused
    # Pallas ln+modulate+quant kernel (one HBM pass; the bf16 modulated
    # tensor never materializes) — else the plain bf16 chain
    img_mod = ln_modulate_quant(img, sh_msa, sc_msa, p["attn"]["to_q"],
                                mode=cfg.fuse_mod_quant)
    txt_mod = ln_modulate_quant(txt, c_sh_msa, c_sc_msa,
                                p["attn"]["add_q_proj"],
                                mode=cfg.fuse_mod_quant)

    attn_img, attn_txt = _joint_attention(
        p["attn"], img_mod, txt_mod, cos, sin, cfg, pad_mask
    )

    img = img + g_msa[:, None, :] * attn_img
    img_mlp = ln_modulate_quant(img, sh_mlp, sc_mlp, p["ff"]["in"],
                                mode=cfg.fuse_mod_quant)
    # linear_gelu: single-pass gelu quantization in W8A8 mode (scale from
    # the pre-gelu row max); == linear(gelu(.)) otherwise
    img = img + g_mlp[:, None, :] * linear_gelu(
        p["ff"]["out"], linear(p["ff"]["in"], img_mlp)
    )

    txt = txt + c_g_msa[:, None, :] * attn_txt
    txt_mlp = ln_modulate_quant(txt, c_sh_mlp, c_sc_mlp,
                                p["ff_context"]["in"],
                                mode=cfg.fuse_mod_quant)
    txt = txt + c_g_mlp[:, None, :] * linear_gelu(
        p["ff_context"]["out"], linear(p["ff_context"]["in"], txt_mlp)
    )
    return img, txt


def _single_block(
    p: Params,
    mod: jnp.ndarray,       # (3, B, d) adaLN chunks, hoisted out of the scan
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: FluxConfig,
    pad_mask: Optional[jnp.ndarray],
):
    b, s, d = x.shape
    h, hd = cfg.num_attention_heads, cfg.attention_head_dim
    shift, scale, gate = mod
    x_mod = ln_modulate_quant(x, shift, scale, p["attn"]["to_q"],
                              mode=cfg.fuse_mod_quant)

    # one shared activation quantization of x_mod across all four heads
    lq, lk, lv, mlp_h = linear_multi(
        [p["attn"]["to_q"], p["attn"]["to_k"], p["attn"]["to_v"], p["proj_mlp"]],
        x_mod,
    )

    def heads(y):
        return y.reshape(b, s, h, hd)

    q = _qk_norm_heads(heads(lq), p["attn"]["norm_q"])
    k = _qk_norm_heads(heads(lk), p["attn"]["norm_k"])
    v = heads(lv)
    # BSHD rope (see _joint_attention): same rotation, no layout round-trip
    q = apply_rope_paired(q, cos[:, None, :], sin[:, None, :])
    k = apply_rope_paired(k, cos[:, None, :], sin[:, None, :])
    attn = dot_product_attention(
        q, k, v, pad_mask=pad_mask, impl=cfg.attention_impl
    ).reshape(b, s, d)

    # split concat matmul in W8A8 mode: per-part activation scales, and the
    # ("gelu", pre) part quantizes gelu in a single pass (scale from the
    # pre-gelu row max) instead of gelu-write + absmax-read + quant-read
    out = linear_concat(p["proj_out"], [attn, ("gelu", mlp_h)])
    return x + gate[:, None, :] * out


def apply(
    params: Params,
    cfg: FluxConfig,
    *,
    hidden_states: jnp.ndarray,       # (B, S_img, in_channels) packed latents
    encoder_hidden_states: jnp.ndarray,  # (B, S_txt, joint_attention_dim)
    pooled_projections: jnp.ndarray,  # (B, pooled_projection_dim)
    timestep: jnp.ndarray,            # (B,) in [0, 1]
    img_ids: jnp.ndarray,             # (S_img, 3)
    txt_ids: Optional[jnp.ndarray] = None,  # (S_txt, 3); zeros if None
    guidance: Optional[jnp.ndarray] = None,  # (B,) guidance scale
    pad_mask: Optional[jnp.ndarray] = None,  # (B, S_txt + S_img) keep-mask
    layer_gate: Optional[jnp.ndarray] = None,  # see train_step: stop-grad gating
    rope: Optional[tuple] = None,  # precomputed (cos, sin) — hoisted out of samplers
) -> jnp.ndarray:
    """Velocity prediction, (B, S_img, out_channels).

    `layer_gate`, when given, is a pair of per-layer {0,1} fp32 vectors
    (dual: (num_layers,), single: (num_single_layers,)) used to stop
    gradients into frozen layers (ref flux_train_layer_idx semantics,
    ref:train_denoiser.py:71-119) without splitting the scan.
    """
    b, s_img, _ = hidden_states.shape
    s_txt = encoder_hidden_states.shape[1]
    compute_dtype = hidden_states.dtype

    img = linear(params["x_embedder"], hidden_states)
    txt = linear(params["context_embedder"], encoder_hidden_states.astype(compute_dtype))

    # conditioning vector
    t_emb = timestep_embedding(timestep.astype(jnp.float32) * 1000.0, cfg.time_embed_dim)
    temb = _mlp_embed(params["time_in"], t_emb.astype(compute_dtype))
    if cfg.guidance_embeds:
        assert guidance is not None, "guidance-distilled model needs a guidance scale"
        g_emb = timestep_embedding(
            guidance.astype(jnp.float32) * 1000.0, cfg.time_embed_dim
        )
        temb = temb + _mlp_embed(params["guidance_in"], g_emb.astype(compute_dtype))
    temb = temb + _mlp_embed(
        params["pooled_in"], pooled_projections.astype(compute_dtype)
    )

    if rope is not None:
        cos, sin = rope
    else:
        if txt_ids is None:
            txt_ids = jnp.zeros((s_txt, 3), dtype=jnp.float32)
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        cos, sin = flux_rope_freqs(ids, cfg.axes_dims_rope, cfg.rope_theta)
    if cfg.rope_dtype == "bfloat16":
        cos, sin = cos.astype(jnp.bfloat16), sin.astype(jnp.bfloat16)

    dual_fn = _dual_block
    single_fn = _single_block
    if cfg.remat:
        policy = {
            "nothing": jax.checkpoint_policies.nothing_saveable,
            "dots": jax.checkpoint_policies.dots_saveable,
        }[cfg.remat_policy]
        dual_fn = jax.checkpoint(
            _dual_block, policy=policy, static_argnums=(7,),
        )
        single_fn = jax.checkpoint(
            _single_block, policy=policy, static_argnums=(5,),
        )

    # adaLN modulation vectors for ALL layers, hoisted out of the block
    # scans: one batched matmul over the stacked norm kernels instead of a
    # per-iteration 1-row matvec (whose weight slice + six tiny result
    # vectors dominated the profiled `copy` bucket — ~40% of the W8A8 step)
    silu_t = jax.nn.silu(temb)
    dual_mod = adaln_stacked(params["dual_blocks"]["norm1"]["linear"], silu_t, 6)
    dual_mod_ctx = adaln_stacked(
        params["dual_blocks"]["norm1_context"]["linear"], silu_t, 6
    )
    single_mod = adaln_stacked(params["single_blocks"]["norm"]["linear"], silu_t, 3)
    dual_xs = {
        k: v for k, v in params["dual_blocks"].items()
        if k not in ("norm1", "norm1_context")
    }
    single_xs = {k: v for k, v in params["single_blocks"].items() if k != "norm"}

    def dual_body(carry, xs):
        img_c, txt_c = carry
        p, m, mc, gate = xs
        img_n, txt_n = dual_fn(p, m, mc, img_c, txt_c, cos, sin, cfg, pad_mask)
        if gate is not None:
            img_n = img_c + gate * (img_n - img_c)
            txt_n = txt_c + gate * (txt_n - txt_c)
        return (img_n, txt_n), None

    dual_gate = None if layer_gate is None else layer_gate[0]
    if cfg.scan_blocks:
        (img, txt), _ = jax.lax.scan(
            functools.partial(dual_body),
            (img, txt),
            (dual_xs, dual_mod, dual_mod_ctx, dual_gate),
            unroll=cfg.scan_unroll,
        )
    else:
        # unrolled: per-layer STATIC slices of the stacked params (no
        # scan dynamic-slice copies; same pytree layout as the scan path)
        for i in range(cfg.num_layers):
            p_i = jax.tree_util.tree_map(lambda x: x[i], dual_xs)
            g_i = None if dual_gate is None else dual_gate[i]
            (img, txt), _ = dual_body(
                (img, txt), (p_i, dual_mod[i], dual_mod_ctx[i], g_i)
            )

    x = jnp.concatenate([txt, img], axis=1)

    def single_body(carry, xs):
        p, m, gate = xs
        x_n = single_fn(p, m, carry, cos, sin, cfg, pad_mask)
        if gate is not None:
            x_n = carry + gate * (x_n - carry)
        return x_n, None

    single_gate = None if layer_gate is None else layer_gate[1]
    if cfg.scan_blocks:
        x, _ = jax.lax.scan(
            single_body,
            x,
            (single_xs, single_mod, single_gate),
            unroll=cfg.scan_unroll,
        )
    else:
        for i in range(cfg.num_single_layers):
            p_i = jax.tree_util.tree_map(lambda y: y[i], single_xs)
            g_i = None if single_gate is None else single_gate[i]
            x, _ = single_body(x, (p_i, single_mod[i], g_i))

    x = x[:, s_txt:]

    scale, shift = _adaln(params["norm_out"], temb, 2)
    x = modulate(layer_norm(x, eps=1e-6), shift, scale)
    return linear(params["proj_out"], x)
