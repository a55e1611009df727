"""Interactive REPL / one-shot CLI (ref:univa/serve/cli.py).

Usage:
  python -m gpt_image_edit_tpu.serve.cli --model_path <merged ckpt dir> \
      [--flux_path <FLUX ckpt dir>] [--image in.png] [--prompt "..."] \
      [--output out.png] [--steps 28] [--guidance 3.5]
  python -m gpt_image_edit_tpu.serve.cli --tiny --prompt "demo" --image in.png

Without --prompt it drops into a REPL: lines starting with `?` take the
understanding branch (text answer); anything else edits the current image.
`/load <path>` switches the conditioning image, `/save <path>` saves the last
output, `exit` quits.
"""

from __future__ import annotations

import argparse
import logging
import sys

from PIL import Image

from gpt_image_edit_tpu.parallel.mesh import mesh_from_arg
from gpt_image_edit_tpu.serve.runtime import UnivaRuntime


def build_parser():
    p = argparse.ArgumentParser(description="GPT-Image-Edit TPU serving CLI")
    p.add_argument("--model_path", type=str, default=None, help="merged UniVA checkpoint dir")
    p.add_argument("--flux_path", type=str, default=None, help="FLUX checkpoint dir (for the VAE)")
    p.add_argument("--tiny", action="store_true", help="random tiny weights (plumbing demo)")
    p.add_argument("--image", type=str, default=None)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--output", type=str, default="output.png")
    p.add_argument("--steps", type=int, default=28)
    p.add_argument("--guidance", type=float, default=3.5)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--understand", action="store_true", help="text answer instead of edit")
    p.add_argument("--do_sample", action="store_true",
                   help="sample text answers (HF-parity warpers; greedy default)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=0)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--quantize", type=str, default=None,
                   choices=[None, "int8", "int4", "w8a8", "w8a8-attn", "w8a8-qk8"],
                   help="denoiser quantization: int8 = weight-only (fits 12B "
                        "FLUX on one 16GB chip), w8a8 = int8 MXU matmuls "
                        "(~25%% faster serving), w8a8-qk8 = + int8 QK^T in "
                        "attention, w8a8-attn = experimental full int8 "
                        "attention")
    p.add_argument("--unroll_blocks", action="store_true",
                   help="unrolled FLUX block loops (no scan dynamic slices)")
    p.add_argument("--scan_unroll", type=int, default=1,
                   help="partial block-scan unroll factor (k bodies per scan "
                        "iteration; overlaps param slicing with compute)")
    p.add_argument("--no_joint_with_t5", action="store_true",
                   help="skip the T5 suffix concat (ref cli no_joint_with_t5)")
    p.add_argument("--vae_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="VAE compute dtype (reference serves bf16)")
    p.add_argument("--offload", action="store_true",
                   help="sequential component offload (the reference's "
                        "--offload/enable_model_cpu_offload): params park in "
                        "pinned_host memory, stage into HBM per stage")
    p.add_argument("--quantize_vlm", nargs="?", const="int8", default=None,
                   choices=["int8", "w8a8"],
                   help="int8 VLM trunk (single-chip serving): bare flag or "
                        "'int8' = weight-only, 'w8a8' = int8 MXU matmuls "
                        "(faster prefill)")
    p.add_argument("--mesh", type=str, default=None,
                   help="multi-chip serving: 'auto' (all devices) or "
                        "'dp,fsdp,tp' (e.g. 1,4,2) — params shard over the "
                        "mesh, GSPMD handles the collectives")
    return p


def main(argv=None):
    from gpt_image_edit_tpu.utils.platform import apply_platform_env, enable_compile_cache
    apply_platform_env()  # honor JAX_PLATFORMS before first jax use
    enable_compile_cache()  # warm restarts: persist XLA executables
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = build_parser().parse_args(argv)
    rt = UnivaRuntime(
        args.model_path, args.flux_path, tiny=args.tiny, seed=args.seed,
        quantize=args.quantize, joint_with_t5=not args.no_joint_with_t5,
        unroll_blocks=args.unroll_blocks, scan_unroll=args.scan_unroll,
        vae_dtype=args.vae_dtype, offload=args.offload,
        quantize_vlm=args.quantize_vlm, mesh=mesh_from_arg(args.mesh),
    )
    image = Image.open(args.image) if args.image else None

    text_kw = dict(
        do_sample=args.do_sample, temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p,
    ) if args.do_sample else {}

    if args.prompt is not None:  # one-shot
        if args.understand:
            print(rt.answer(args.prompt, image, seed=args.seed, **text_kw))
        else:
            out = rt.edit(
                args.prompt, image,
                steps=args.steps, guidance=args.guidance,
                height=args.height, width=args.width, seed=args.seed,
            )
            out.save(args.output)
            print(f"saved {args.output} ({out.width}x{out.height})")
        return 0

    # REPL: stateful multi-turn — the FULL conversation is re-encoded each
    # turn and ALL history images (generated ones included) condition the
    # next edit (ref:univa/serve/cli.py:141-254)
    rt.reset_chat()
    last = None
    print("REPL: '?question' answers; 'instruction' edits (multi-turn, "
          "history-conditioned); /load /save /reset, exit")
    while True:
        try:
            line = input(">>> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line in ("exit", "quit"):
            break
        if line.startswith("/load "):
            image = Image.open(line[6:].strip())
            print(f"loaded {image.width}x{image.height}")
            continue
        if line.startswith("/save "):
            if last is None:
                print("nothing to save")
            else:
                last.save(line[6:].strip())
                print("saved")
            continue
        if line.startswith("/reset"):
            rt.reset_chat()
            image = None
            print("chat reset")
            continue
        new_images = [image] if image is not None else []
        image = None  # consumed: it now lives in the chat history
        if line.startswith("?"):
            _, answer = rt.chat_turn(line[1:].strip(), new_images,
                                     force_generate=False, **text_kw)
            print(answer)
        else:
            img, answer = rt.chat_turn(
                line, new_images, steps=args.steps, guidance=args.guidance,
                **text_kw,
            )
            if img is not None:
                last = img
                print(f"edited ({last.width}x{last.height}); /save to write out")
            else:
                print(answer)
    return 0


if __name__ == "__main__":
    sys.exit(main())
