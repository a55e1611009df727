"""ImgEdit benchmark (ref:univa/eval/imgedit/).

step1: generate edited samples from the benchmark json
       (singleturn format: {key: {id: <src image relpath>, prompt, edit_type}}).
step2: GPT-4.1 judge over (original, result) with per-edit-type rubric
       prompts (eval_prompts/prompts.json in the benchmark release).
step3: per-edit-type averages.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

from PIL import Image

from gpt_image_edit_tpu.eval.config import EvalConfig
from gpt_image_edit_tpu.eval.gen_samples import generate_samples
from gpt_image_edit_tpu.eval.judge import GPTJudge, average_by_type, parse_metric_lines


def default_rubric() -> Dict[str, str]:
    """The benchmark's per-edit-type judge rubrics, shipped with the
    framework (PROTOCOL ASSET byte-identical to the ImgEdit release's
    eval_prompts/prompts.json; ref:step2_basic_bench.py:60-67)."""
    from gpt_image_edit_tpu.eval.imgedit_prompts import PROMPTS

    return dict(PROMPTS)


def load_benchmark(data_json: str) -> Dict[str, Dict]:
    with open(data_json) as f:
        return json.load(f)


def step1_generate(cfg: EvalConfig, runtime=None):
    bench = load_benchmark(cfg.data_json)
    samples = [dict(key=k, **v) for k, v in bench.items()]

    def image_fn(s, cfg_):
        return Image.open(os.path.join(cfg_.image_root, s["id"]))

    return generate_samples(
        cfg,
        samples,
        runtime=runtime,
        key_fn=lambda s: s["key"],
        prompt_fn=lambda s: s["prompt"],
        image_fn=image_fn,
    )


def step2_judge(
    cfg: EvalConfig,
    prompts_json: Optional[str] = None,
    out_json: str = "imgedit_scores.json",
    *,
    judge: Optional[GPTJudge] = None,
):
    """Resumable judging: skips keys already present in out_json."""
    bench = load_benchmark(cfg.data_json)
    if prompts_json:
        with open(prompts_json) as f:
            rubric = json.load(f)
    else:
        rubric = default_rubric()
    judge = judge or GPTJudge()

    results: Dict[str, str] = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            results = json.load(f)

    for key, item in bench.items():
        if key in results:
            continue
        result_img = os.path.join(cfg.output_dir, f"{key}.png")
        origin_img = os.path.join(cfg.image_root, item["id"])
        if not os.path.exists(result_img):
            continue
        prompt = rubric[item["edit_type"]].replace("<edit_prompt>", item["prompt"])
        results[key] = judge.score(prompt, [origin_img, result_img])
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)
    return results


def step3_aggregate(scores_json: str, meta_json: str) -> Dict[str, float]:
    with open(scores_json) as f:
        raw = json.load(f)
    with open(meta_json) as f:
        meta = json.load(f)
    per_sample = {
        k: v for k, v in ((k, parse_metric_lines(t)) for k, t in raw.items()) if v is not None
    }
    per_type = average_by_type(per_sample, meta)
    overall = round(sum(per_type.values()) / len(per_type), 2) if per_type else 0.0
    return {"per_type": per_type, "overall": overall}
