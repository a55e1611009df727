"""Complex-Edit benchmark (ref:univa/eval/complex-edit/).

step1: generate from the UCSC-VLAA/Complex-Edit HF dataset — compound
instructions at complexity 1-8 (ref:step1_gen_samples.py, eval.py:44-47).
step2: GPT judges for Instruction-Following (IF), Identity-Preservation (IP),
Perceptual Quality (PQ); Overall = mean(IF, IP, PQ) over n-of-m sampled
responses (ref:complex_edit/eval/{alignment,quality}).
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, List, Optional

from gpt_image_edit_tpu.eval.config import EvalConfig
from gpt_image_edit_tpu.eval.gen_samples import generate_samples
from gpt_image_edit_tpu.eval.judge import parse_json_scores


def load_hf_samples(complexity: int = 8, split: str = "test") -> List[Dict]:
    """Load Complex-Edit samples (requires `datasets` + network/cached data)."""
    from datasets import load_dataset

    ds = load_dataset("UCSC-VLAA/Complex-Edit", split=split)
    out = []
    for i, item in enumerate(ds):
        instr = item["compound"][complexity - 1]["compound_instruction"]
        out.append({"key": f"{i:05d}", "prompt": instr, "_item": item})
    return out


def step1_generate(cfg: EvalConfig, samples: List[Dict], runtime=None):
    def image_fn(s, cfg_):
        return s["_item"]["input_image"]

    return generate_samples(
        cfg, samples, runtime=runtime,
        key_fn=lambda s: s["key"], prompt_fn=lambda s: s["prompt"],
        image_fn=image_fn,
    )


ALIGNMENT_KEYS = ("following", "preservation")
QUALITY_KEY = "quality"


def aggregate(score_rows: List[Dict[str, float]]) -> Dict[str, float]:
    """Rows of {IF, IP, PQ} (0-10) -> benchmark table row
    (README 'Complex-Edit' columns IF/IP/PQ/Overall)."""
    if not score_rows:
        return {"IF": 0.0, "IP": 0.0, "PQ": 0.0, "Overall": 0.0}
    n = len(score_rows)
    IF = sum(r["IF"] for r in score_rows) / n
    IP = sum(r["IP"] for r in score_rows) / n
    PQ = sum(r["PQ"] for r in score_rows) / n
    return {
        "IF": round(IF, 2), "IP": round(IP, 2), "PQ": round(PQ, 2),
        "Overall": round((IF + IP + PQ) / 3.0, 2),
    }


def parse_alignment_response(text: str) -> Optional[Dict[str, float]]:
    """Judge answers JSON with instruction-following / identity-preservation
    scores; tolerate key variants."""
    data = parse_json_scores(text)
    if not data:
        return None
    def _find(*names):
        for k, v in data.items():
            lk = k.lower().replace("_", " ")
            if any(n in lk for n in names):
                if isinstance(v, dict) and "score" in v:
                    v = v["score"]
                return float(v)
        return None
    IF = _find("following", "alignment", "if")
    IP = _find("preserv", "identity", "ip")
    if IF is None and IP is None:
        return None
    return {"IF": IF, "IP": IP}
