#!/usr/bin/env python
"""Benchmark judging + aggregation driver (the reference's step2/step3
scripts, unified). Needs the host-side `openai` package + OPENAI_API_KEY
(generation itself never does).

  python scripts/run_judge.py imgedit --data_json basic_edit.json \
      --image_root <srcs> --output_dir out/ [--scores_json scores.json]
  python scripts/run_judge.py gedit --samples_json gedit_samples.json \
      --source_path <step0 dir> --save_path out/ --model_name mymodel
  python scripts/run_judge.py complex_edit --output_dir out/ \
      --complexity 8 [--n 20 --m 5]
  python scripts/run_judge.py omnicontext --samples_json samples.json \
      --result_dir out/ --model_name mymodel

All drivers are resumable (CSV / per-sample JSON / jsonl), matching the
reference protocols (ref:univa/eval/*/step2_*, complex-edit/eval.py,
omnicontext/test_omnicontext_score.py).
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
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--data_json", default=None)
    ap.add_argument("--image_root", default=None)
    ap.add_argument("--samples_json", default=None)
    ap.add_argument("--scores_json", default="judge_scores.json")
    ap.add_argument("--source_path", default=None)
    ap.add_argument("--save_path", default=None)
    ap.add_argument("--result_dir", default=None)
    ap.add_argument("--model_name", default="gpt_image_edit_tpu")
    ap.add_argument("--judge_model", default="gpt-4.1")
    ap.add_argument("--base_url", default=None)
    ap.add_argument(
        "--backbone", default="gpt", choices=["gpt", "qwen25vl", "gemini", "hf"],
        help="judge MLLM: OpenAI-protocol API (gpt), the local Qwen2.5-VL "
             "running on this repo's own model, or Gemini "
             "(ref:step2_gedit_bench.py --backbone, viescore/mllm_tools)",
    )
    ap.add_argument(
        "--backbone_path", default=None,
        help="checkpoint dir for --backbone qwen25vl (Qwen2.5-VL) or hf "
             "(any AutoModelForVision2Seq, e.g. idefics2/mantis/minicpmv)",
    )
    ap.add_argument("--complexity", type=int, default=8)
    ap.add_argument("--n", type=int, default=20, help="complex-edit samples per item")
    ap.add_argument("--m", type=int, default=5, help="complex-edit responses per call")
    ap.add_argument("--max_workers", type=int, default=5)
    args = ap.parse_args()

    if args.backbone == "qwen25vl":
        from gpt_image_edit_tpu.eval.qwen_judge import Qwen25VLJudge

        client = Qwen25VLJudge(args.backbone_path)
        backbone_name = "qwen25vl"
    elif args.backbone == "gemini":
        from gpt_image_edit_tpu.eval.gemini_judge import GeminiJudge

        client = GeminiJudge()
        backbone_name = "gemini"
    elif args.backbone == "hf":
        from gpt_image_edit_tpu.eval.hf_judge import HFVision2SeqJudge

        client = HFVision2SeqJudge(
            args.backbone_path or "HuggingFaceM4/idefics2-8b"
        )
        backbone_name = "hf_vision2seq"
    else:
        from gpt_image_edit_tpu.eval.judge import GPTJudge

        client = GPTJudge(model=args.judge_model, base_url=args.base_url)
        backbone_name = "gpt4o"

    if args.benchmark == "imgedit":
        from gpt_image_edit_tpu.eval import imgedit
        from gpt_image_edit_tpu.eval.config import EvalConfig

        cfg = EvalConfig(
            output_dir=args.output_dir, data_json=args.data_json,
            image_root=args.image_root,
        )
        out = os.path.join(args.output_dir, args.scores_json)
        imgedit.step2_judge(cfg, out_json=out, judge=client)
        stats = imgedit.step3_aggregate(out, args.data_json)
        print(json.dumps(stats, indent=1))
    elif args.benchmark == "gedit":
        from gpt_image_edit_tpu.eval import gedit

        with open(args.samples_json) as f:
            samples = json.load(f)
        gedit.step2_judge(
            samples, source_path=args.source_path, save_path=args.save_path,
            model_name=args.model_name, client=client,
            backbone=backbone_name, max_workers=args.max_workers,
        )
        csv_dir = os.path.join(args.save_path, backbone_name, "eval_results_new")
        print(json.dumps(gedit.analyze_scores(csv_dir, args.model_name), indent=1))
    elif args.benchmark == "complex_edit":
        from glob import glob

        from datasets import load_dataset

        from gpt_image_edit_tpu.eval import complex_edit

        outputs = sorted(glob(os.path.join(args.output_dir, "*.png")))
        ds = load_dataset("UCSC-VLAA/Complex-Edit", split="test_real")
        inputs, instructions = [], []
        tmp = os.path.join(args.output_dir, ".inputs")
        os.makedirs(tmp, exist_ok=True)
        for i, item in enumerate(ds):
            p = os.path.join(tmp, f"{i:05d}.png")
            if not os.path.exists(p):
                item["image"].save(p)
            inputs.append(p)
            instructions.append(
                item["edit"]["compound"][args.complexity - 1]["compound_instruction"]
            )
        final = complex_edit.step2_evaluate(
            args.output_dir, inputs[: len(outputs)], outputs,
            instructions[: len(outputs)], client,
            n=args.n, m=args.m, resume=True, max_workers=args.max_workers,
        )
        print(json.dumps(final, indent=1))
    else:  # omnicontext
        from gpt_image_edit_tpu.eval import omnicontext

        with open(args.samples_json) as f:
            samples = json.load(f)
        rows = omnicontext.step2_score(
            samples, result_dir=args.result_dir, model_name=args.model_name,
            client=client, max_workers=args.max_workers,
        )
        print(json.dumps(omnicontext.analyze_scores(rows), indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
