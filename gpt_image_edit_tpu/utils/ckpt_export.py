"""Export our pytrees back to the reference's merged-checkpoint naming.

Inverse of utils.ckpt_convert: writes safetensors with torch conventions
(Linear (out, in), merged key names `visual.* / model.* / lm_head.* /
denoise_tower.denoiser.* / denoise_tower.denoise_projector.*`) so checkpoints
trained here interoperate with the reference stack and round-trip through our
own loader (ref:scripts/make_univa_qwen2p5vl_weight.py:73-76 format)."""

from __future__ import annotations

import json
import os
from typing import Dict

import jax
import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), dtype=np.float32)


def _put_lin(out: Dict[str, np.ndarray], name: str, p):
    out[f"{name}.weight"] = _np(p["kernel"]).T.copy()
    if "bias" in p:
        out[f"{name}.bias"] = _np(p["bias"])


def _put_norm(out, name, p):
    out[f"{name}.weight"] = _np(p["scale"])


def _unstack(stacked, n):
    return [jax.tree_util.tree_map(lambda a: a[i], stacked) for i in range(n)]


def export_qwen(params, cfg) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    v = params["visual"]
    pe = _np(v["patch_embed"]["kernel"]).T  # (D, patch_dim)
    out["visual.patch_embed.proj.weight"] = pe.reshape(
        cfg.vision.hidden_size, cfg.vision.in_channels,
        cfg.vision.temporal_patch_size, cfg.vision.patch_size, cfg.vision.patch_size,
    ).copy()
    for i, blk in enumerate(_unstack(v["blocks"], cfg.vision.depth)):
        b = f"visual.blocks.{i}."
        _put_norm(out, f"{b}norm1", blk["norm1"])
        _put_lin(out, f"{b}attn.qkv", blk["attn"]["qkv"])
        _put_lin(out, f"{b}attn.proj", blk["attn"]["proj"])
        _put_norm(out, f"{b}norm2", blk["norm2"])
        _put_lin(out, f"{b}mlp.gate_proj", blk["mlp"]["gate"])
        _put_lin(out, f"{b}mlp.up_proj", blk["mlp"]["up"])
        _put_lin(out, f"{b}mlp.down_proj", blk["mlp"]["down"])
    _put_norm(out, "visual.merger.ln_q", v["merger"]["ln_q"])
    _put_lin(out, "visual.merger.mlp.0", v["merger"]["fc1"])
    _put_lin(out, "visual.merger.mlp.2", v["merger"]["fc2"])

    lm = params["lm"]
    out["model.embed_tokens.weight"] = _np(lm["embed_tokens"])
    for i, lay in enumerate(_unstack(lm["layers"], cfg.text.num_layers)):
        b = f"model.layers.{i}."
        _put_norm(out, f"{b}input_layernorm", lay["input_ln"])
        _put_lin(out, f"{b}self_attn.q_proj", lay["attn"]["q"])
        _put_lin(out, f"{b}self_attn.k_proj", lay["attn"]["k"])
        _put_lin(out, f"{b}self_attn.v_proj", lay["attn"]["v"])
        _put_lin(out, f"{b}self_attn.o_proj", lay["attn"]["o"])
        _put_norm(out, f"{b}post_attention_layernorm", lay["post_ln"])
        _put_lin(out, f"{b}mlp.gate_proj", lay["mlp"]["gate"])
        _put_lin(out, f"{b}mlp.up_proj", lay["mlp"]["up"])
        _put_lin(out, f"{b}mlp.down_proj", lay["mlp"]["down"])
    _put_norm(out, "model.norm", lm["final_ln"])
    if "lm_head" in lm:
        _put_lin(out, "lm_head", lm["lm_head"])

    if "projector" in params:
        _put_lin(out, "denoise_tower.denoise_projector.0", params["projector"]["fc1"])
        _put_lin(out, "denoise_tower.denoise_projector.2", params["projector"]["fc2"])
    return out


def export_flux(params, cfg, prefix: str = "denoise_tower.denoiser.") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    p = prefix
    _put_lin(out, f"{p}x_embedder", params["x_embedder"])
    _put_lin(out, f"{p}context_embedder", params["context_embedder"])
    _put_lin(out, f"{p}time_text_embed.timestep_embedder.linear_1", params["time_in"]["in"])
    _put_lin(out, f"{p}time_text_embed.timestep_embedder.linear_2", params["time_in"]["out"])
    _put_lin(out, f"{p}time_text_embed.text_embedder.linear_1", params["pooled_in"]["in"])
    _put_lin(out, f"{p}time_text_embed.text_embedder.linear_2", params["pooled_in"]["out"])
    if "guidance_in" in params:
        _put_lin(out, f"{p}time_text_embed.guidance_embedder.linear_1", params["guidance_in"]["in"])
        _put_lin(out, f"{p}time_text_embed.guidance_embedder.linear_2", params["guidance_in"]["out"])
    _put_lin(out, f"{p}norm_out.linear", params["norm_out"]["linear"])
    _put_lin(out, f"{p}proj_out", params["proj_out"])
    for i, blk in enumerate(_unstack(params["dual_blocks"], cfg.num_layers)):
        b = f"{p}transformer_blocks.{i}."
        _put_lin(out, f"{b}norm1.linear", blk["norm1"]["linear"])
        _put_lin(out, f"{b}norm1_context.linear", blk["norm1_context"]["linear"])
        a = blk["attn"]
        _put_lin(out, f"{b}attn.to_q", a["to_q"])
        _put_lin(out, f"{b}attn.to_k", a["to_k"])
        _put_lin(out, f"{b}attn.to_v", a["to_v"])
        _put_lin(out, f"{b}attn.add_q_proj", a["add_q_proj"])
        _put_lin(out, f"{b}attn.add_k_proj", a["add_k_proj"])
        _put_lin(out, f"{b}attn.add_v_proj", a["add_v_proj"])
        _put_norm(out, f"{b}attn.norm_q", a["norm_q"])
        _put_norm(out, f"{b}attn.norm_k", a["norm_k"])
        _put_norm(out, f"{b}attn.norm_added_q", a["norm_added_q"])
        _put_norm(out, f"{b}attn.norm_added_k", a["norm_added_k"])
        _put_lin(out, f"{b}attn.to_out.0", a["to_out"])
        _put_lin(out, f"{b}attn.to_add_out", a["to_add_out"])
        _put_lin(out, f"{b}ff.net.0.proj", blk["ff"]["in"])
        _put_lin(out, f"{b}ff.net.2", blk["ff"]["out"])
        _put_lin(out, f"{b}ff_context.net.0.proj", blk["ff_context"]["in"])
        _put_lin(out, f"{b}ff_context.net.2", blk["ff_context"]["out"])
    for i, blk in enumerate(_unstack(params["single_blocks"], cfg.num_single_layers)):
        b = f"{p}single_transformer_blocks.{i}."
        _put_lin(out, f"{b}norm.linear", blk["norm"]["linear"])
        _put_lin(out, f"{b}proj_mlp", blk["proj_mlp"])
        _put_lin(out, f"{b}attn.to_q", blk["attn"]["to_q"])
        _put_lin(out, f"{b}attn.to_k", blk["attn"]["to_k"])
        _put_lin(out, f"{b}attn.to_v", blk["attn"]["to_v"])
        _put_norm(out, f"{b}attn.norm_q", blk["attn"]["norm_q"])
        _put_norm(out, f"{b}attn.norm_k", blk["attn"]["norm_k"])
        _put_lin(out, f"{b}proj_out", blk["proj_out"])
    return out


def save_merged_checkpoint(path: str, qwen_params, flux_params, qwen_cfg, flux_cfg,
                           shard_bytes: int = 4 << 30) -> None:
    """Write a merged UniVA checkpoint dir (sharded safetensors + index)."""
    from safetensors.numpy import save_file

    tensors = export_qwen(qwen_params, qwen_cfg)
    tensors.update(export_flux(flux_params, flux_cfg))

    os.makedirs(path, exist_ok=True)
    shards: list[Dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for k, v in tensors.items():
        nbytes = v.nbytes
        if sizes[-1] + nbytes > shard_bytes and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][k] = v
        sizes[-1] += nbytes

    weight_map = {}
    n = len(shards)
    for i, shard in enumerate(shards):
        fname = (
            "model.safetensors"
            if n == 1
            else f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        )
        save_file(shard, os.path.join(path, fname))
        for k in shard:
            weight_map[k] = fname
    if n > 1:
        with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
            json.dump(
                {"metadata": {"total_size": sum(sizes)}, "weight_map": weight_map}, f
            )
