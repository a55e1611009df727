#!/usr/bin/env python
"""Benchmark generation driver (the reference's per-benchmark
step1_gen_samples.py entries, unified):

  python scripts/run_eval.py imgedit --data_json basic_edit.json \
      --image_root <srcs> --output_dir out/ --model_path <merged ckpt> \
      --rank 0 --world_size 8
  python scripts/run_eval.py gedit --prepare_dir gedit_images/ ...
  python scripts/run_eval.py complex_edit --complexity 8 ...
  python scripts/run_eval.py omnicontext --samples_json samples.json ...

Rank-strided sharding (torchrun-style RANK/WORLD_SIZE envs honored) and
skip-existing resumability come from eval.gen_samples.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    from gpt_image_edit_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # honor JAX_PLATFORMS before first jax use
    ap = argparse.ArgumentParser()
    ap.add_argument("benchmark", choices=["imgedit", "gedit", "complex_edit", "omnicontext"])
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--flux_path", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--data_json", default=None)
    ap.add_argument("--image_root", default=None)
    ap.add_argument("--samples_json", default=None)
    ap.add_argument("--prepare_dir", default=None, help="gedit: step0 output dir")
    ap.add_argument("--complexity", type=int, default=8)
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--guidance", type=float, default=3.5)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--quantize", default=None,
                    choices=[None, "int8", "int4", "w8a8", "w8a8-attn", "w8a8-qk8"])
    ap.add_argument("--quantize_vlm", nargs="?", const="int8", default=None,
                    choices=["int8", "w8a8"])
    ap.add_argument("--vae_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--batch_size", type=int, default=1,
                    help=">1: consecutive same-shape samples run as one "
                         "batched denoise scan (identical outputs)")
    ap.add_argument("--rank", type=int, default=int(os.environ.get("RANK", 0)))
    ap.add_argument("--world_size", type=int, default=int(os.environ.get("WORLD_SIZE", 1)))
    args = ap.parse_args()

    from gpt_image_edit_tpu.eval.config import EvalConfig

    cfg = EvalConfig(
        pretrained_lvlm_name_or_path=args.model_path or "",
        pretrained_denoiser_name_or_path=args.flux_path or "",
        tiny=args.tiny,
        output_dir=args.output_dir,
        data_json=args.data_json,
        image_root=args.image_root,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance,
        seed=args.seed,
        quantize=args.quantize,
        quantize_vlm=args.quantize_vlm,
        vae_dtype=args.vae_dtype,
        batch_size=args.batch_size,
        rank=args.rank,
        world_size=args.world_size,
    )

    if args.benchmark == "imgedit":
        from gpt_image_edit_tpu.eval import imgedit

        written = imgedit.step1_generate(cfg)
    elif args.benchmark == "gedit":
        from gpt_image_edit_tpu.eval import gedit, gedit_prepare

        if args.samples_json and os.path.exists(args.samples_json):
            with open(args.samples_json) as f:
                samples = json.load(f)
        else:
            assert args.prepare_dir, "gedit needs --prepare_dir or --samples_json"
            samples = gedit_prepare.prepare(args.prepare_dir)
        written = gedit.step1_generate(cfg, samples)
    elif args.benchmark == "complex_edit":
        from gpt_image_edit_tpu.eval import complex_edit

        samples = complex_edit.load_hf_samples(args.complexity)
        written = complex_edit.step1_generate(cfg, samples)
    else:  # omnicontext
        from gpt_image_edit_tpu.eval import omnicontext

        assert args.samples_json, "omnicontext needs --samples_json"
        with open(args.samples_json) as f:
            samples = json.load(f)
        written = omnicontext.step1_generate(cfg, samples)

    print(f"rank {args.rank}/{args.world_size}: wrote {len(written)} samples")
    return 0


if __name__ == "__main__":
    sys.exit(main())
