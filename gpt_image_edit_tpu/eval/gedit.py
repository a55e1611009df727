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


def step2_judge(
    samples: List[Dict],
    *,
    source_path: str,
    save_path: str,
    model_name: str,
    client,
    backbone: str = "gpt4o",
    max_workers: int = 5,
) -> List[Dict]:
    """VIEScore judging of generated samples, resumable via CSV
    (ref:step2_gedit_bench.py:30-178).

    samples: [{key, task_type, instruction, instruction_language,
    Intersection_exist}] — the GEdit-Bench records (EN subset judged).
    `client` is the MLLM judge (eval.judge.GPTJudge for the reference's
    gpt-4.1 backbone); images live at
      {source_path}/fullset/{group}/{lang}/{key}_SRCIMG.png   (source)
      {save_path}/fullset/{group}/{lang}/{key}.png            (edited)
    Writes {model_name}_{group}_gpt_score.csv per group plus the combined
    CSV under {save_path}/{backbone}/eval_results_new/.
    """
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    from gpt_image_edit_tpu.eval.viescore import VIEScore

    vie = VIEScore(client, task="tie")
    out_dir = os.path.join(save_path, backbone, "eval_results_new")
    os.makedirs(out_dir, exist_ok=True)
    combined_path = os.path.join(out_dir, f"{model_name}_combined_gpt_score.csv")

    processed = set()
    if os.path.exists(combined_path):
        with open(combined_path, newline="") as f:
            for row in csv.DictReader(f):
                processed.add((row["source_image"], row["edited_image"]))

    fieldnames = [
        "source_image", "edited_image", "instruction", "sementics_score",
        "quality_score", "intersection_exist", "instruction_language",
    ]

    def judge_one(item):
        group = item["task_type"]
        lang = item["instruction_language"]
        key = item["key"]
        src = os.path.join(source_path, "fullset", group, lang, f"{key}_SRCIMG.png")
        edited = os.path.join(save_path, "fullset", group, lang, f"{key}.png")
        if not (os.path.exists(src) and os.path.exists(edited)):
            return None
        if (src, edited) in processed:
            return None
        # the protocol resizes the edited image to the source size
        # (ref:step2_gedit_bench.py:35) — cache the resized view
        with Image.open(src) as s, Image.open(edited) as e:
            if e.size != s.size:
                resized_dir = os.path.join(save_path, ".resized", group, lang)
                os.makedirs(resized_dir, exist_ok=True)
                resized = os.path.join(resized_dir, f"{key}.png")
                e.convert("RGB").resize(s.size).save(resized)
                edited_for_judge = resized
            else:
                edited_for_judge = edited
        sc, pq, _overall = vie.evaluate([src, edited_for_judge], item["instruction"])
        return {
            "source_image": src,
            "edited_image": edited,
            "instruction": item["instruction"],
            "sementics_score": sc,
            "quality_score": pq,
            "intersection_exist": item.get(
                "Intersection_exist", item.get("intersection_exist", "")
            ),
            "instruction_language": lang,
        }

    all_rows: List[Dict] = []
    for group in GROUPS:
        group_items = [
            s for s in samples
            if s["task_type"] == group and s["instruction_language"] != "cn"
        ]
        group_csv = os.path.join(out_dir, f"{model_name}_{group}_gpt_score.csv")
        group_rows: List[Dict] = []
        if os.path.exists(group_csv):
            with open(group_csv, newline="") as f:
                group_rows.extend(csv.DictReader(f))
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            for row in pool.map(judge_one, group_items):
                if row is not None:
                    group_rows.append(row)
        with open(group_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            for row in group_rows:
                w.writerow({k: row.get(k, "") for k in fieldnames})
        all_rows.extend(group_rows)

    with open(combined_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        for row in all_rows:
            w.writerow({k: row.get(k, "") for k in fieldnames})
    return all_rows


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
