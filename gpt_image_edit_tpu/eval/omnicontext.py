"""OmniContext benchmark — multi-reference subject-driven generation
(ref:univa/eval/omnicontext/inference.py:146-290, omnicontext_score.py).

step1: generate with MULTIPLE input images per sample (the pipeline's
multi-ref conditioning path). step2: GPT-4.1 scores PF (prompt following)
and SC (subject consistency), overall = sqrt(PF * SC) per the OmniGen2
protocol; samples with PF or SC = 0 score 0."""

from __future__ import annotations

import json
import math
import os
from collections import defaultdict
from typing import Dict, List, Optional

from gpt_image_edit_tpu.eval.config import EvalConfig


def step1_generate(cfg: EvalConfig, samples: List[Dict], runtime=None):
    """samples: [{key, task_type, instruction, input_images: [paths]}]."""
    from PIL import Image

    from gpt_image_edit_tpu.eval.gen_samples import generate_samples

    def image_fn(s, cfg_):
        imgs = [Image.open(p) for p in s["input_images"]]
        return imgs if len(imgs) > 1 else imgs[0]

    return generate_samples(
        cfg, samples, runtime=runtime,
        key_fn=lambda s: os.path.join(s.get("task_type", "all"), s["key"]),
        prompt_fn=lambda s: s["instruction"],
        image_fn=image_fn,
    )


# --------------------------------------------------------------------------
# step2: PF/SC judging (ref:omnicontext_score.py, prompt_generator.py,
# test_omnicontext_score.py)
# --------------------------------------------------------------------------

class OmniContextScore:
    """PF + SC judge, OmniGen2 protocol (ref:omnicontext_score.py:8-49).

    `client.score(prompt, image_paths) -> str` is the MLLM judge call
    (eval.judge.GPTJudge for the reference's gpt-4.1 backbone). Prompts put
    the instruction inline and send ALL images (refs + output last)."""

    def __init__(self, client, seed: Optional[int] = None):
        import random

        self.client = client
        self.rng = random.Random(seed) if seed is not None else None

    def _prompt(self, instruction: str, task_type: str, with_scene: bool) -> str:
        from gpt_image_edit_tpu.eval import omnicontext_prompts as P

        if task_type == "prompt_following":
            rule = P.PF_RULE_SCENE if with_scene else P.PF_RULE
        elif task_type == "subject_consistency":
            rule = P.SC_RULE_SCENE if with_scene else P.SC_RULE
        else:
            raise ValueError(task_type)
        return (P.CONTEXT + rule).replace("<instruction>", instruction)

    def evaluate(
        self, image_paths: List[str], instruction: str, with_scene: bool = False
    ) -> Dict[str, Dict]:
        import random as _random
        import time

        from gpt_image_edit_tpu.eval.viescore import mllm_output_to_dict

        pf = sc = None
        for try_idx in range(3):  # ref max_tries=3, exponential backoff
            try:
                pf_text = self.client.score(
                    self._prompt(instruction, "prompt_following", with_scene),
                    image_paths,
                )
                sc_text = self.client.score(
                    self._prompt(instruction, "subject_consistency", with_scene),
                    image_paths,
                )
                pf = mllm_output_to_dict(pf_text)
                sc = mllm_output_to_dict(sc_text)
                if pf in (False, "rate_limit_exceeded") or sc in (False, "rate_limit_exceeded"):
                    pf = pf if isinstance(pf, dict) else None
                    sc = sc if isinstance(sc, dict) else None
                    raise ValueError("unparseable or rate-limited")
                break
            except Exception:
                time.sleep(min(2 ** try_idx, 4) * 0.01)
        rng = self.rng or _random
        if not isinstance(pf, dict):
            pf = {"score": rng.randint(0, 10), "reasoning": "guess_if_cannot_parse"}
        if not isinstance(sc, dict):
            sc = {"score": rng.randint(0, 10), "reasoning": "guess_if_cannot_parse"}
        # protocol stores scalar scores (ref result_dict['PF_score'])
        for d in (pf, sc):
            if isinstance(d.get("score"), list):
                d["score"] = min(d["score"])
        return {"PF_scores": pf, "SC_scores": sc}


def step2_score(
    samples: List[Dict],
    *,
    result_dir: str,
    model_name: str,
    client,
    backbone: str = "gpt4dot1",
    max_workers: int = 8,
) -> List[Dict]:
    """Resumable scoring driver (ref:test_omnicontext_score.py:62-129):
    per-task-type score.jsonl (a task type with an existing jsonl is loaded,
    not re-judged) + combined_score.jsonl. samples: [{key, task_type,
    instruction, instruction_language, input_images: [paths]}]; outputs live
    at {result_dir}/{model_name}/fullset/{task_type}/{key}.png."""
    from concurrent.futures import ThreadPoolExecutor

    scorer = OmniContextScore(client)
    by_task: Dict[str, List[Dict]] = defaultdict(list)
    for s in samples:
        by_task[s["task_type"]].append(s)

    all_results: List[Dict] = []
    for task_type, items in by_task.items():
        json_path = os.path.join(
            result_dir, model_name, backbone, task_type, "score.jsonl"
        )
        if os.path.exists(json_path):
            with open(json_path) as f:
                all_results.extend(json.loads(l) for l in f if l.strip())
            continue

        def judge_one(item):
            out_path = os.path.join(
                result_dir, model_name, "fullset", item["task_type"],
                f"{item['key']}.png",
            )
            if not os.path.exists(out_path):
                return None
            with_scene = "scene" in item["task_type"]
            score = scorer.evaluate(
                list(item["input_images"]) + [out_path],
                item["instruction"],
                with_scene=with_scene,
            )
            return {
                "key": item["key"],
                "task_type": item["task_type"],
                "instruction": item["instruction"],
                "instruction_language": item.get("instruction_language", "en"),
                "output_image_path": out_path,
                "PF_score": score["PF_scores"]["score"],
                "PF_score_reason": score["PF_scores"]["reasoning"],
                "SC_score": score["SC_scores"]["score"],
                "SC_score_reason": score["SC_scores"]["reasoning"],
            }

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            results = [r for r in pool.map(judge_one, items) if r is not None]
        os.makedirs(os.path.dirname(json_path), exist_ok=True)
        with open(json_path, "w") as f:
            for r in results:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
        all_results.extend(results)

    combined = os.path.join(result_dir, model_name, backbone, "combined_score.jsonl")
    os.makedirs(os.path.dirname(combined), exist_ok=True)
    with open(combined, "w") as f:
        for r in all_results:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return all_results


def analyze_scores(
    results: List[Dict], language: str = "en"
) -> Dict[str, Dict[str, float]]:
    """jsonl rows -> per-task PF/SC/Overall means
    (ref:calculate_statistics.py:analyze_scores; overall = sqrt(PF*SC))."""
    rows = [
        {"task_type": r["task_type"], "PF": r["PF_score"], "SC": r["SC_score"]}
        for r in results
        if r.get("instruction_language", "en") == language
    ]
    return aggregate(rows)


def sample_overall(pf: float, sc: float) -> float:
    """OmniGen2 scoring: 0 if either is 0, else sqrt(PF * SC)."""
    if pf <= 0 or sc <= 0:
        return 0.0
    return math.sqrt(pf * sc)


def aggregate(rows: List[Dict]) -> Dict[str, Dict[str, float]]:
    """rows: [{task_type, PF, SC}] -> per-task and overall means."""
    by_task = defaultdict(list)
    for r in rows:
        by_task[r.get("task_type", "all")].append(
            (r["PF"], r["SC"], sample_overall(r["PF"], r["SC"]))
        )
    out = {}
    all_rows = []
    for task, vals in by_task.items():
        n = len(vals)
        out[task] = {
            "PF": round(sum(v[0] for v in vals) / n, 3),
            "SC": round(sum(v[1] for v in vals) / n, 3),
            "Overall": round(sum(v[2] for v in vals) / n, 3),
            "n": n,
        }
        all_rows += vals
    n = len(all_rows)
    out["summary"] = {
        "PF": round(sum(v[0] for v in all_rows) / n, 3) if n else 0.0,
        "SC": round(sum(v[1] for v in all_rows) / n, 3) if n else 0.0,
        "Overall": round(sum(v[2] for v in all_rows) / n, 3) if n else 0.0,
        "n": n,
    }
    return out
