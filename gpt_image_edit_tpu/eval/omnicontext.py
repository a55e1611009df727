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
