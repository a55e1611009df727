"""FLUX AutoencoderKL (encoder + decoder) in NHWC for TPU.

Parity target: diffusers AutoencoderKL as configured in the FLUX checkpoints
(16 latent channels, block_out_channels (128,256,512,512), no quant convs).
Encode returns the distribution mean ("argmax" sampling, the only mode the
reference uses: ref:univa/utils/flux_pipeline.py:600-613, train_denoiser.py
VAE encodes). All convs run NHWC — XLA's native TPU conv layout.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from gpt_image_edit_tpu.models.common import (
    Params,
    conv2d,
    conv2d_init,
    group_norm,
    group_norm_init,
    linear,
    linear_init,
)
from gpt_image_edit_tpu.models.vae.config import VaeConfig


# --------------------------------------------------------------------------
# blocks
# --------------------------------------------------------------------------

def _resnet_init(rng, in_ch: int, out_ch: int) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    p: Params = {
        "norm1": group_norm_init(in_ch),
        "conv1": conv2d_init(k1, in_ch, out_ch, 3),
        "norm2": group_norm_init(out_ch),
        "conv2": conv2d_init(k2, out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["shortcut"] = conv2d_init(k3, in_ch, out_ch, 1)
    return p


def _resnet(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    h = conv2d(p["conv1"], jax.nn.silu(group_norm(p["norm1"], x, num_groups=groups)))
    h = conv2d(p["conv2"], jax.nn.silu(group_norm(p["norm2"], h, num_groups=groups)))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x)
    return x + h


def _attn_init(rng, ch: int) -> Params:
    ks = jax.random.split(rng, 4)
    return {
        "norm": group_norm_init(ch),
        "to_q": linear_init(ks[0], ch, ch),
        "to_k": linear_init(ks[1], ch, ch),
        "to_v": linear_init(ks[2], ch, ch),
        "to_out": linear_init(ks[3], ch, ch),
    }


def _attn(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Single-head self-attention over the spatial grid (VAE mid-block)."""
    b, hh, ww, c = x.shape
    h = group_norm(p["norm"], x, num_groups=groups).reshape(b, hh * ww, c)
    q = linear(p["to_q"], h)
    k = linear(p["to_k"], h)
    v = linear(p["to_v"], h)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (c ** -0.5), axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v)
    out = linear(p["to_out"], out).reshape(b, hh, ww, c)
    return x + out


def _downsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 conv with diffusers' asymmetric (0,1) padding."""
    return conv2d(p, x, stride=2, padding=[(0, 1), (0, 1)])


def _upsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
    return conv2d(p, x)


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init(rng: jax.Array, cfg: VaeConfig) -> Params:
    n_stages = len(cfg.block_out_channels)
    rngs = iter(jax.random.split(rng, 256))

    # ----- encoder -----
    enc: Params = {"conv_in": conv2d_init(next(rngs), cfg.in_channels, cfg.block_out_channels[0], 3)}
    ch = cfg.block_out_channels[0]
    down = []
    for i, out_ch in enumerate(cfg.block_out_channels):
        block: Dict[str, Any] = {
            "resnets": [
                _resnet_init(next(rngs), ch if j == 0 else out_ch, out_ch)
                for j in range(cfg.layers_per_block)
            ]
        }
        ch = out_ch
        if i < n_stages - 1:
            block["downsample"] = conv2d_init(next(rngs), ch, ch, 3)
        down.append(block)
    enc["down_blocks"] = down
    enc["mid"] = {
        "resnet1": _resnet_init(next(rngs), ch, ch),
        "attn": _attn_init(next(rngs), ch),
        "resnet2": _resnet_init(next(rngs), ch, ch),
    }
    enc["norm_out"] = group_norm_init(ch)
    enc["conv_out"] = conv2d_init(next(rngs), ch, 2 * cfg.latent_channels, 3)

    # ----- decoder -----
    ch = cfg.block_out_channels[-1]
    dec: Params = {"conv_in": conv2d_init(next(rngs), cfg.latent_channels, ch, 3)}
    dec["mid"] = {
        "resnet1": _resnet_init(next(rngs), ch, ch),
        "attn": _attn_init(next(rngs), ch),
        "resnet2": _resnet_init(next(rngs), ch, ch),
    }
    up = []
    for i, out_ch in enumerate(reversed(cfg.block_out_channels)):
        block = {
            "resnets": [
                _resnet_init(next(rngs), ch if j == 0 else out_ch, out_ch)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        ch = out_ch
        if i < n_stages - 1:
            block["upsample"] = conv2d_init(next(rngs), ch, ch, 3)
        up.append(block)
    dec["up_blocks"] = up
    dec["norm_out"] = group_norm_init(ch)
    dec["conv_out"] = conv2d_init(next(rngs), ch, cfg.out_channels, 3)

    return {"encoder": enc, "decoder": dec}


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def encode(params: Params, cfg: VaeConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) in [-1, 1] -> latent mean (B, H/8, W/8, C_lat) (argmax mode)."""
    g = cfg.norm_num_groups
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], x)
    for block in enc["down_blocks"]:
        for res in block["resnets"]:
            h = _resnet(res, h, g)
        if "downsample" in block:
            h = _downsample(block["downsample"], h)
    h = _resnet(enc["mid"]["resnet1"], h, g)
    h = _attn(enc["mid"]["attn"], h, g)
    h = _resnet(enc["mid"]["resnet2"], h, g)
    h = conv2d(enc["conv_out"], jax.nn.silu(group_norm(enc["norm_out"], h, num_groups=g)))
    mean, _logvar = jnp.split(h, 2, axis=-1)
    return mean


def decode(params: Params, cfg: VaeConfig, z: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, C_lat) raw latents -> (B, 8h, 8w, 3) in [-1, 1]."""
    g = cfg.norm_num_groups
    dec = params["decoder"]
    h = conv2d(dec["conv_in"], z)
    h = _resnet(dec["mid"]["resnet1"], h, g)
    h = _attn(dec["mid"]["attn"], h, g)
    h = _resnet(dec["mid"]["resnet2"], h, g)
    for block in dec["up_blocks"]:
        for res in block["resnets"]:
            h = _resnet(res, h, g)
        if "upsample" in block:
            h = _upsample(block["upsample"], h)
    h = conv2d(dec["conv_out"], jax.nn.silu(group_norm(dec["norm_out"], h, num_groups=g)))
    return h


def encode_to_scaled_latents(params: Params, cfg: VaeConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> model latent space: (mean - shift) * scale
    (ref:univa/utils/flux_pipeline.py:608-613)."""
    return (encode(params, cfg, x) - cfg.shift_factor) * cfg.scaling_factor


def decode_from_scaled_latents(params: Params, cfg: VaeConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Model latent space -> pixels: decode(z / scale + shift)
    (ref:univa/utils/flux_pipeline.py:1124-1130)."""
    return decode(params, cfg, z / cfg.scaling_factor + cfg.shift_factor)
