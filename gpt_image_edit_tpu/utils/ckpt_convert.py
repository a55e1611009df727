"""Checkpoint translation: torch state dicts / safetensors -> JAX pytrees.

Loads the reference's merged checkpoint format — one HF directory holding
Qwen2.5-VL (visual + LM), the MLP2 denoise projector, and the FLUX
transformer under `denoise_tower.*` (ref:scripts/make_univa_qwen2p5vl_weight.py:35-76)
— plus standalone diffusers FLUX-transformer and VAE checkpoints.

Conventions translated:
- torch Linear (out, in)  -> ours (in, out): transpose
- torch Conv2d (O, I, kh, kw) -> NHWC HWIO: transpose(2, 3, 1, 0)
- ViT patch Conv3d (D, 3, t, p, p) -> (patch_dim, D) matmul kernel
- per-layer torch modules -> stacked (L, ...) pytrees for lax.scan

Handles both legacy merged naming (`visual.*`, `model.layers.*`) and current
transformers naming (`model.visual.*`, `model.language_model.layers.*`).
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, Iterable

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# tensor sources
# --------------------------------------------------------------------------

class TensorSource:
    """Uniform access to a state dict, a safetensors file, or a sharded dir."""

    def __init__(self, get: Callable[[str], np.ndarray], keys: Iterable[str]):
        self._get = get
        self.keys = list(keys)

    def __contains__(self, key):
        return key in set(self.keys)

    def get(self, key: str) -> np.ndarray:
        return self._get(key)

    @classmethod
    def from_state_dict(cls, sd) -> "TensorSource":
        def _get(k):
            t = sd[k]
            if hasattr(t, "detach"):
                t = t.detach().to("cpu").float().numpy()
            return np.asarray(t)

        return cls(_get, sd.keys())

    @classmethod
    def from_dir(cls, path: str) -> "TensorSource":
        """HF dir with model.safetensors or sharded model-*.safetensors + index."""
        from safetensors import safe_open

        index_path = os.path.join(path, "model.safetensors.index.json")
        single = os.path.join(path, "model.safetensors.index.json")
        files: Dict[str, str] = {}
        if os.path.exists(index_path):
            with open(index_path) as f:
                index = json.load(f)
            for k, fname in index["weight_map"].items():
                files[k] = os.path.join(path, fname)
        else:
            single = os.path.join(path, "model.safetensors")
            if not os.path.exists(single):
                # diffusers layout
                single = os.path.join(path, "diffusion_pytorch_model.safetensors")
            with safe_open(single, framework="np") as f:
                for k in f.keys():
                    files[k] = single

        handles: Dict[str, object] = {}

        def _get(k):
            fname = files[k]
            if fname not in handles:
                handles[fname] = safe_open(fname, framework="np")
            t = handles[fname].get_tensor(k)
            if t.dtype == np.dtype("V2"):  # bfloat16 raw view
                import ml_dtypes

                t = np.asarray(t.view(ml_dtypes.bfloat16), dtype=np.float32)
            return np.asarray(t, dtype=np.float32) if t.dtype != np.float32 else t

        return cls(_get, files.keys())


# Optional load placement: while set (via the `placement=` kwarg on the
# public converters), leaves are built as HOST numpy arrays and parked into
# the given sharding (e.g. pinned_host memory for --offload serving) only at
# the end — the device holds ZERO transient copies during conversion. The
# default path (placement=None) commits leaves to the default device as
# before.
_PLACEMENT = None


def _arr(x):
    return np.asarray(x) if _PLACEMENT is not None else jnp.asarray(x)


def with_placement(fn):
    """Adds a `placement=None` kwarg to a converter: build host-side, then
    jax.device_put the finished tree into the sharding in one pass."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, placement=None, **kwargs):
        global _PLACEMENT
        if placement is None:
            return fn(*args, **kwargs)
        prev, _PLACEMENT = _PLACEMENT, placement
        try:
            tree = fn(*args, **kwargs)
        finally:
            _PLACEMENT = prev
        import jax

        return jax.device_put(tree, placement)

    return wrapped


def _lin(src: TensorSource, prefix: str, bias: bool = True):
    p = {"kernel": _arr(src.get(f"{prefix}.weight").T)}
    if bias and f"{prefix}.bias" in src:
        p["bias"] = _arr(src.get(f"{prefix}.bias"))
    return p


def _norm_scale(src: TensorSource, key: str):
    return {"scale": _arr(src.get(f"{key}.weight"))}


def _conv(src: TensorSource, prefix: str):
    p = {"kernel": _arr(src.get(f"{prefix}.weight").transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in src:
        p["bias"] = _arr(src.get(f"{prefix}.bias"))
    return p


def _gn(src: TensorSource, prefix: str):
    return {
        "scale": _arr(src.get(f"{prefix}.weight")),
        "bias": _arr(src.get(f"{prefix}.bias")),
    }


def _stack(trees):
    import jax

    stack = np.stack if _PLACEMENT is not None else jnp.stack
    return jax.tree_util.tree_map(lambda *xs: stack(xs), *trees)


def _detect_prefix(src: TensorSource, candidates) -> str:
    keyset = set(src.keys)
    for cand in candidates:
        if any(k.startswith(cand) for k in keyset):
            return cand
    raise KeyError(f"none of {candidates} found; sample keys: {src.keys[:5]}")


# --------------------------------------------------------------------------
# Qwen2.5-VL
# --------------------------------------------------------------------------

def convert_qwen_vision(src: TensorSource, depth: int, vp: str = "visual."):
    pe = src.get(f"{vp}patch_embed.proj.weight")  # (D, 3, t, p, p)
    d = pe.shape[0]
    params = {"patch_embed": {"kernel": _arr(pe.reshape(d, -1).T)}}
    blocks = []
    for i in range(depth):
        b = f"{vp}blocks.{i}."
        blocks.append(
            {
                "norm1": _norm_scale(src, f"{b}norm1"),
                "attn": {
                    "qkv": _lin(src, f"{b}attn.qkv"),
                    "proj": _lin(src, f"{b}attn.proj"),
                },
                "norm2": _norm_scale(src, f"{b}norm2"),
                "mlp": {
                    "gate": _lin(src, f"{b}mlp.gate_proj"),
                    "up": _lin(src, f"{b}mlp.up_proj"),
                    "down": _lin(src, f"{b}mlp.down_proj"),
                },
            }
        )
    params["blocks"] = _stack(blocks)
    params["merger"] = {
        "ln_q": _norm_scale(src, f"{vp}merger.ln_q"),
        "fc1": _lin(src, f"{vp}merger.mlp.0"),
        "fc2": _lin(src, f"{vp}merger.mlp.2"),
    }
    return params


def convert_qwen_lm(src: TensorSource, num_layers: int, lp: str = "model."):
    params = {"embed_tokens": _arr(src.get(f"{lp}embed_tokens.weight"))}
    layers = []
    for i in range(num_layers):
        b = f"{lp}layers.{i}."
        layers.append(
            {
                "input_ln": _norm_scale(src, f"{b}input_layernorm"),
                "attn": {
                    "q": _lin(src, f"{b}self_attn.q_proj"),
                    "k": _lin(src, f"{b}self_attn.k_proj"),
                    "v": _lin(src, f"{b}self_attn.v_proj"),
                    "o": _lin(src, f"{b}self_attn.o_proj"),
                },
                "post_ln": _norm_scale(src, f"{b}post_attention_layernorm"),
                "mlp": {
                    "gate": _lin(src, f"{b}mlp.gate_proj"),
                    "up": _lin(src, f"{b}mlp.up_proj"),
                    "down": _lin(src, f"{b}mlp.down_proj"),
                },
            }
        )
    params["layers"] = _stack(layers)
    params["final_ln"] = _norm_scale(src, f"{lp}norm")
    if "lm_head.weight" in src:
        params["lm_head"] = _lin(src, "lm_head")
    return params


@with_placement
def convert_qwen(src: TensorSource, cfg) -> dict:
    """Full UniVA Qwen2.5-VL (visual + lm [+ projector if present])."""
    vp = _detect_prefix(src, ["visual.", "model.visual."])
    lp = _detect_prefix(
        src, ["model.language_model.", "model.layers."]
    )
    lp = "model.language_model." if lp == "model.language_model." else "model."
    params = {
        "visual": convert_qwen_vision(src, cfg.vision.depth, vp),
        "lm": convert_qwen_lm(src, cfg.text.num_layers, lp),
    }
    proj_prefix = "denoise_tower.denoise_projector"
    if f"{proj_prefix}.0.weight" in src:
        params["projector"] = {
            "fc1": _lin(src, f"{proj_prefix}.0"),
            "fc2": _lin(src, f"{proj_prefix}.2"),
        }
    return params


# --------------------------------------------------------------------------
# FLUX transformer (diffusers naming)
# --------------------------------------------------------------------------

@with_placement
def convert_flux(src: TensorSource, cfg, prefix: str = "") -> dict:
    p = prefix
    params = {
        "x_embedder": _lin(src, f"{p}x_embedder"),
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
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = {
            "in": _lin(src, f"{p}time_text_embed.guidance_embedder.linear_1"),
            "out": _lin(src, f"{p}time_text_embed.guidance_embedder.linear_2"),
        }
    dual = []
    for i in range(cfg.num_layers):
        b = f"{p}transformer_blocks.{i}."
        dual.append(
            {
                "norm1": {"linear": _lin(src, f"{b}norm1.linear")},
                "norm1_context": {"linear": _lin(src, f"{b}norm1_context.linear")},
                "attn": {
                    "to_q": _lin(src, f"{b}attn.to_q"),
                    "to_k": _lin(src, f"{b}attn.to_k"),
                    "to_v": _lin(src, f"{b}attn.to_v"),
                    "add_q_proj": _lin(src, f"{b}attn.add_q_proj"),
                    "add_k_proj": _lin(src, f"{b}attn.add_k_proj"),
                    "add_v_proj": _lin(src, f"{b}attn.add_v_proj"),
                    "norm_q": _norm_scale(src, f"{b}attn.norm_q"),
                    "norm_k": _norm_scale(src, f"{b}attn.norm_k"),
                    "norm_added_q": _norm_scale(src, f"{b}attn.norm_added_q"),
                    "norm_added_k": _norm_scale(src, f"{b}attn.norm_added_k"),
                    "to_out": _lin(src, f"{b}attn.to_out.0"),
                    "to_add_out": _lin(src, f"{b}attn.to_add_out"),
                },
                "ff": {
                    "in": _lin(src, f"{b}ff.net.0.proj"),
                    "out": _lin(src, f"{b}ff.net.2"),
                },
                "ff_context": {
                    "in": _lin(src, f"{b}ff_context.net.0.proj"),
                    "out": _lin(src, f"{b}ff_context.net.2"),
                },
            }
        )
    params["dual_blocks"] = _stack(dual)
    single = []
    for i in range(cfg.num_single_layers):
        b = f"{p}single_transformer_blocks.{i}."
        single.append(
            {
                "norm": {"linear": _lin(src, f"{b}norm.linear")},
                "proj_mlp": _lin(src, f"{b}proj_mlp"),
                "attn": {
                    "to_q": _lin(src, f"{b}attn.to_q"),
                    "to_k": _lin(src, f"{b}attn.to_k"),
                    "to_v": _lin(src, f"{b}attn.to_v"),
                    "norm_q": _norm_scale(src, f"{b}attn.norm_q"),
                    "norm_k": _norm_scale(src, f"{b}attn.norm_k"),
                },
                "proj_out": _lin(src, f"{b}proj_out"),
            }
        )
    params["single_blocks"] = _stack(single)
    return params


# --------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL naming)
# --------------------------------------------------------------------------

def _resnet_from(src: TensorSource, prefix: str) -> dict:
    p = {
        "norm1": _gn(src, f"{prefix}.norm1"),
        "conv1": _conv(src, f"{prefix}.conv1"),
        "norm2": _gn(src, f"{prefix}.norm2"),
        "conv2": _conv(src, f"{prefix}.conv2"),
    }
    if f"{prefix}.conv_shortcut.weight" in src:
        p["shortcut"] = _conv(src, f"{prefix}.conv_shortcut")
    return p


def _vae_attn_from(src: TensorSource, prefix: str) -> dict:
    return {
        "norm": _gn(src, f"{prefix}.group_norm"),
        "to_q": _lin(src, f"{prefix}.to_q"),
        "to_k": _lin(src, f"{prefix}.to_k"),
        "to_v": _lin(src, f"{prefix}.to_v"),
        "to_out": _lin(src, f"{prefix}.to_out.0"),
    }


@with_placement
def convert_vae(src: TensorSource, cfg, prefix: str = "") -> dict:
    n = len(cfg.block_out_channels)
    enc = {
        "conv_in": _conv(src, f"{prefix}encoder.conv_in"),
        "norm_out": _gn(src, f"{prefix}encoder.conv_norm_out"),
        "conv_out": _conv(src, f"{prefix}encoder.conv_out"),
        "mid": {
            "resnet1": _resnet_from(src, f"{prefix}encoder.mid_block.resnets.0"),
            "attn": _vae_attn_from(src, f"{prefix}encoder.mid_block.attentions.0"),
            "resnet2": _resnet_from(src, f"{prefix}encoder.mid_block.resnets.1"),
        },
        "down_blocks": [],
    }
    for i in range(n):
        blk = {
            "resnets": [
                _resnet_from(src, f"{prefix}encoder.down_blocks.{i}.resnets.{j}")
                for j in range(cfg.layers_per_block)
            ]
        }
        if i < n - 1:
            blk["downsample"] = _conv(
                src, f"{prefix}encoder.down_blocks.{i}.downsamplers.0.conv"
            )
        enc["down_blocks"].append(blk)

    dec = {
        "conv_in": _conv(src, f"{prefix}decoder.conv_in"),
        "norm_out": _gn(src, f"{prefix}decoder.conv_norm_out"),
        "conv_out": _conv(src, f"{prefix}decoder.conv_out"),
        "mid": {
            "resnet1": _resnet_from(src, f"{prefix}decoder.mid_block.resnets.0"),
            "attn": _vae_attn_from(src, f"{prefix}decoder.mid_block.attentions.0"),
            "resnet2": _resnet_from(src, f"{prefix}decoder.mid_block.resnets.1"),
        },
        "up_blocks": [],
    }
    for i in range(n):
        blk = {
            "resnets": [
                _resnet_from(src, f"{prefix}decoder.up_blocks.{i}.resnets.{j}")
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if i < n - 1:
            blk["upsample"] = _conv(
                src, f"{prefix}decoder.up_blocks.{i}.upsamplers.0.conv"
            )
        dec["up_blocks"].append(blk)
    return {"encoder": enc, "decoder": dec}


# --------------------------------------------------------------------------
# merged checkpoint (the reference's single-dir format)
# --------------------------------------------------------------------------

def load_merged_checkpoint(path: str, qwen_cfg, flux_cfg, placement=None):
    """Load the reference's merged UniVA checkpoint directory
    (ref:scripts/make_univa_qwen2p5vl_weight.py:73-76): Qwen2.5-VL + MLP2
    projector + FLUX transformer under `denoise_tower.denoiser.`.

    `placement`: optional jax.sharding.Sharding (e.g. pinned_host for
    --offload) — tensors convert host-side and park straight there, so the
    device never transiently holds the full-precision trees at load time."""
    src = TensorSource.from_dir(path)
    qwen = convert_qwen(src, qwen_cfg, placement=placement)
    flux = convert_flux(
        src, flux_cfg, prefix="denoise_tower.denoiser.", placement=placement
    )
    return qwen, flux
