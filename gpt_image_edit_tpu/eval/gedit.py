"""GEdit-Bench (ref:univa/eval/gedit/).

step1: generate edited samples for the 11 task groups (EN subset).
step2: VIEScore judging — SC (semantics, 0-10) and PQ (quality, 0-10) from a
       GPT backbone, resumable CSV per group.
step3: per-group / overall statistics; overall = sqrt(SC*PQ) per sample.
"""

from __future__ import annotations

import csv
import math
import os
from collections import defaultdict
from typing import Dict, List, Optional

GROUPS = [
    "background_change", "color_alter", "material_alter", "motion_change",
    "ps_human", "style_change", "subject-add", "subject-remove",
    "subject-replace", "text_change", "tone_transfer",
]


def step1_generate(cfg, samples: List[Dict], runtime=None):
    """samples: [{key, task_type, instruction, instruction_language,
    source_image_path}] (prepared by step0 from the HF dataset)."""
    from PIL import Image

    from gpt_image_edit_tpu.eval.gen_samples import generate_samples

    def image_fn(s, cfg_):
        return Image.open(s["source_image_path"])

    return generate_samples(
        cfg,
        samples,
        runtime=runtime,
        key_fn=lambda s: os.path.join(
            "fullset", s["task_type"], s["instruction_language"], s["key"]
        ),
        prompt_fn=lambda s: s["instruction"],
        image_fn=image_fn,
    )


def analyze_scores(
    csv_dir: str, model_name: str, language: str = "en"
) -> Dict[str, Dict[str, float]]:
    """Per-group SC/PQ/Overall means + the GEdit-EN-full average
    (ref:step3_calculate_statistics.py)."""
    per_group: Dict[str, Dict[str, float]] = {}
    all_sc, all_pq, all_ov = [], [], []
    for group in GROUPS:
        path = os.path.join(csv_dir, f"{model_name}_{group}_gpt_score.csv")
        if not os.path.exists(path):
            continue
        sc_list, pq_list, ov_list = [], [], []
        with open(path, newline="") as f:
            for row in csv.DictReader(f):
                if row.get("instruction_language") != language:
                    continue
                sc = float(row["sementics_score"])
                pq = float(row["quality_score"])
                sc_list.append(sc)
                pq_list.append(pq)
                ov_list.append(math.sqrt(sc * pq))
        if sc_list:
            per_group[group] = {
                "SC": sum(sc_list) / len(sc_list),
                "PQ": sum(pq_list) / len(pq_list),
                "Overall": sum(ov_list) / len(ov_list),
                "n": len(sc_list),
            }
            all_sc += sc_list
            all_pq += pq_list
            all_ov += ov_list
    summary = {
        "SC": sum(all_sc) / len(all_sc) if all_sc else 0.0,
        "PQ": sum(all_pq) / len(all_pq) if all_pq else 0.0,
        "Overall": sum(all_ov) / len(all_ov) if all_ov else 0.0,
        "n": len(all_sc),
    }
    return {"per_group": per_group, "summary": summary}


def write_score_row(
    csv_path: str,
    row: Dict[str, object],
    fieldnames: Optional[List[str]] = None,
):
    """Append a VIEScore row, creating the CSV with header if needed
    (resumable protocol, ref:step2_gedit_bench.py:85-97)."""
    fieldnames = fieldnames or [
        "source_image", "edited_image", "instruction", "sementics_score",
        "quality_score", "intersection_exist", "instruction_language",
    ]
    exists = os.path.exists(csv_path)
    os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
    with open(csv_path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        if not exists:
            w.writeheader()
        w.writerow(row)
