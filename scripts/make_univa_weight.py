#!/usr/bin/env python
"""Checkpoint surgery: Qwen(2/2.5)-VL + FLUX/SD3 transformer -> one merged
UniVA dir.

TPU-native equivalent of ref:scripts/make_univa_qwen2p5vl_weight.py and
ref:scripts/make_univa_qwen2vl_weight.py (which also carries the sd3
denoiser branch) — instead of instantiating torch modules and
save_pretrained, this streams safetensors and remaps names (no 19B of RAM
needed):

  python scripts/make_univa_weight.py \
      --qwen_path <Qwen2.5-VL-7B-Instruct or Qwen2-VL-7B-Instruct dir> \
      --flux_path <FLUX.1-Kontext-dev dir (transformer/ subfolder used)> \
      --output <merged dir> [--mlp2 denoise_projector.bin] \
      [--model_type qwen2p5vl|qwen2vl] [--denoiser flux|sd3]

The key remap is shared: both Qwen generations store visual.*/model.*
(old naming) or model.visual./model.language_model. (new naming), and the
denoiser grafts under denoise_tower.denoiser.* either way.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def remap_qwen_key(k: str) -> str:
    """New-transformers naming -> merged naming (ref wrapper save format)."""
    if k.startswith("model.visual."):
        return k[len("model.") :]
    if k.startswith("model.language_model."):
        return "model." + k[len("model.language_model.") :]
    return k  # visual.* / model.* / lm_head.* already fine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qwen_path", required=True)
    ap.add_argument("--flux_path", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--mlp2", default=None, help="pretrained denoise_projector.bin")
    ap.add_argument("--model_type", default="qwen2p5vl",
                    choices=["qwen2p5vl", "qwen2vl"],
                    help="base VLM family (ref has one surgery script per "
                         "family; the streaming remap is shared)")
    ap.add_argument("--denoiser", default="flux", choices=["flux", "sd3"],
                    help="denoise tower graft (ref:make_univa_qwen2vl_weight"
                         ".py model_type sd3 branch)")
    ap.add_argument("--shard_gb", type=float, default=4.0)
    args = ap.parse_args()

    from safetensors.numpy import save_file

    from gpt_image_edit_tpu.models.flux import FluxConfig
    from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource

    os.makedirs(args.output, exist_ok=True)
    qwen_src = TensorSource.from_dir(args.qwen_path)
    flux_dir = os.path.join(args.flux_path, "transformer")
    if not os.path.isdir(flux_dir):
        flux_dir = args.flux_path
    flux_src = TensorSource.from_dir(flux_dir)

    shard_bytes = int(args.shard_gb * (1 << 30))
    shards, sizes, weight_map = [{}], [0], {}
    total_size = [0]

    def put(name, arr):
        if sizes[-1] + arr.nbytes > shard_bytes and shards[-1]:
            flush()
        shards[-1][name] = arr
        sizes[-1] += arr.nbytes
        total_size[0] += arr.nbytes

    written = []

    def flush():
        idx = len(written) + 1
        fname = f"model-{idx:05d}.safetensors"
        save_file(shards[-1], os.path.join(args.output, fname))
        for k in shards[-1]:
            weight_map[k] = fname
        written.append(fname)
        shards[-1] = {}
        sizes[-1] = 0

    for k in qwen_src.keys:
        put(remap_qwen_key(k), qwen_src.get(k))
    for k in flux_src.keys:
        put(f"denoise_tower.denoiser.{k}", flux_src.get(k))

    # MLP2 projector: pretrained or fresh (ref initializes it inside the
    # wrapper; we mirror diffusers-style init). Input width follows the base
    # VLM's hidden size (read from its config.json).
    fcfg = FluxConfig()
    qwen_cfg_path = os.path.join(args.qwen_path, "config.json")
    hidden = 3584
    if os.path.exists(qwen_cfg_path):
        with open(qwen_cfg_path) as f:
            qcfg_json = json.load(f)
        # newer HF Qwen-VL configs nest the LM under text_config
        hidden = qcfg_json.get(
            "hidden_size", qcfg_json.get("text_config", {}).get("hidden_size", hidden)
        )
    if args.mlp2:
        import torch

        sd = torch.load(args.mlp2, map_location="cpu", weights_only=True)
        for k, v in sd.items():
            name = k if k.startswith("denoise_tower") else f"denoise_tower.denoise_projector.{k}"
            put(name, v.float().numpy())
    else:
        rng = np.random.default_rng(0)
        din, dout = hidden, fcfg.joint_attention_dim
        hid = dout * 3
        put("denoise_tower.denoise_projector.0.weight",
            (rng.standard_normal((hid, din)) * din ** -0.5).astype(np.float32))
        put("denoise_tower.denoise_projector.0.bias", np.zeros(hid, np.float32))
        put("denoise_tower.denoise_projector.2.weight",
            (rng.standard_normal((dout, hid)) * hid ** -0.5).astype(np.float32))
        put("denoise_tower.denoise_projector.2.bias", np.zeros(dout, np.float32))

    flush()
    with open(os.path.join(args.output, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": total_size[0]},
                   "weight_map": weight_map}, f)

    # provenance record of the surgery inputs (which VLM family / denoiser
    # the merged dir was built from) so operators and future loaders can
    # select the matching model classes without sniffing tensor names
    with open(os.path.join(args.output, "univa_config.json"), "w") as f:
        json.dump({"model_type": args.model_type,
                   "denoiser_type": args.denoiser,
                   "input_hidden_size": hidden,
                   "output_hidden_size": fcfg.joint_attention_dim,
                   "denoise_projector_type": "mlp2x_gelu"}, f, indent=1)

    # carry tokenizer/processor files along (ref saves processor too)
    for fname in os.listdir(args.qwen_path):
        if fname.endswith((".json", ".txt")) and "safetensors" not in fname:
            shutil.copy(os.path.join(args.qwen_path, fname), args.output)
    print(f"merged checkpoint written to {args.output} ({len(weight_map)} tensors)")


if __name__ == "__main__":
    main()
