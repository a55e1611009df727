"""Complex-Edit benchmark (ref:univa/eval/complex-edit/).

step1: generate from the UCSC-VLAA/Complex-Edit HF dataset — compound
instructions at complexity 1-8 (ref:step1_gen_samples.py, eval.py:44-47).
step2: GPT judges for Instruction-Following (IF), Identity-Preservation (IP),
Perceptual Quality (PQ); Overall = mean(IF, IP, PQ) over n-of-m sampled
responses (ref:complex_edit/eval/{alignment,quality}).
"""

from __future__ import annotations

import json
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


# --------------------------------------------------------------------------
# step2: GPT judges (ref:complex_edit/eval/{alignment,quality}.py, eval.py)
# --------------------------------------------------------------------------

def _mean(dicts: List[Dict[str, float]]) -> Dict[str, float]:
    keys = dicts[0].keys()
    return {k: sum(d[k] for d in dicts) / len(dicts) for k in keys}


class _EvaluatorBase:
    """n-of-m sampled judging with per-sample JSON resume
    (ref:alignment.py:eval_one_alignment). `client` needs
    score_multi(prompt, paths, system=, n=, images_first=True) -> List[str]."""

    metric_keys: tuple = ()

    def __init__(self, client, *, if_resume: bool = False, n: int = 20, m: int = 5,
                 max_workers: int = 4):
        self.client = client
        self.if_resume = if_resume
        self.n = n
        self.m = m
        self.max_workers = max_workers

    def _sample_counts(self) -> List[int]:
        counts = [self.m] * (self.n // self.m)
        if self.n % self.m:
            counts.append(self.n % self.m)
        return counts

    def _parse(self, text: str) -> Optional[Dict[str, float]]:
        data = parse_json_scores(text)
        if not data:
            return None
        out = {}
        for key in self.metric_keys:
            if key not in data:
                return None
            v = int(data[key])
            if not 0 <= v <= 10:
                return None
            out[key] = v
        return out

    def _judge(self, image_paths, prompt, system):
        results = []
        for count in self._sample_counts():
            for text in self.client.score_multi(
                prompt, image_paths, system=system, n=count, images_first=True
            ):
                parsed = self._parse(text)
                if parsed is not None:
                    results.append(parsed)
        if not results:
            raise ValueError("judge returned no parseable responses")
        return _mean(results), results

    def _eval_one(self, image_paths, instruction, save_path, prompt, system):
        if self.if_resume and save_path and os.path.exists(save_path):
            with open(save_path) as f:
                saved = json.load(f)
            saved.pop("instruction", None)
            saved.pop("runs", None)
            return saved
        avg, runs = self._judge(image_paths, prompt, system)
        if save_path:
            os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
            with open(save_path, "w") as f:
                json.dump({"instruction": instruction, "runs": runs, **avg}, f,
                          indent="    ")
        return avg


class AlignmentEvaluator(_EvaluatorBase):
    """IF + IP judge: system = rubric (+CoT note), user = [input, output,
    template(instruction)] (ref:alignment.py)."""

    metric_keys = ("instruction_following", "identity_preservation")
    result_folder_name = "alignment_rubric_cot"

    def __init__(self, client, *, if_rubric: bool = True, if_cot: bool = True, **kw):
        super().__init__(client, **kw)
        from gpt_image_edit_tpu.eval import complex_edit_prompts as P

        self.system_prompt = (
            P.ALIGNMENT_PROMPT_W_RUBRIC if if_rubric else P.ALIGNMENT_PROMPT_WO_RUBRIC
        )
        if if_cot:
            self.system_prompt += "\nExplain your reasoning before answering the questions."
        self.template = P.ALIGNMENT_TEMPLATE
        self.result_folder_name = "alignment" + ("_rubric" if if_rubric else "") + (
            "_cot" if if_cot else ""
        )

    def eval_one(self, input_image: str, output_image: str, instruction: str,
                 save_path: Optional[str] = None) -> Dict[str, float]:
        return self._eval_one(
            [input_image, output_image], instruction, save_path,
            self.template.format(instruction=instruction), self.system_prompt,
        )

    def eval(self, input_images, output_images, instructions, save_paths):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            return list(pool.map(
                lambda a: self.eval_one(*a),
                zip(input_images, output_images, instructions, save_paths),
            ))


class QualityEvaluator(_EvaluatorBase):
    """PQ judge over the OUTPUT image only (ref:quality.py); the shipped
    driver uses rubric + instruction, no CoT (ref:eval.py:60-66)."""

    metric_keys = ("perceptual_quality",)

    def __init__(self, client, *, if_rubric: bool = True, if_cot: bool = False,
                 if_inst: bool = True, **kw):
        super().__init__(client, **kw)
        from gpt_image_edit_tpu.eval import complex_edit_prompts as P

        table = {
            (False, False): P.QUALITY_PROMPT_WO_RUBRIC_WO_INST,
            (True, False): P.QUALITY_PROMPT_W_RUBRIC_WO_INST,
            (False, True): P.QUALITY_PROMPT_WO_RUBRIC_W_INST,
            (True, True): P.QUALITY_PROMPT_W_RUBRIC_W_INST,
        }
        self.system_prompt = table[(if_rubric, if_inst)]
        if if_cot:
            self.system_prompt += "\nExplain your reasoning before answering the questions."
        self.if_inst = if_inst
        self.template = P.QUALITY_TEMPLATE
        self.result_folder_name = "quality" + ("_rubric" if if_rubric else "") + (
            "_cot" if if_cot else "") + ("_inst" if if_inst else "")

    def eval_one(self, output_image: str, instruction: str,
                 save_path: Optional[str] = None) -> Dict[str, float]:
        prompt = self.template.format(instruction=instruction) if self.if_inst else ""
        return self._eval_one(
            [output_image], instruction, save_path, prompt, self.system_prompt
        )

    def eval(self, output_images, instructions, save_paths):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            return list(pool.map(
                lambda a: self.eval_one(*a),
                zip(output_images, instructions, save_paths),
            ))


def step2_evaluate(
    out_dir: str,
    input_images: List[str],
    output_images: List[str],
    instructions: List[str],
    client,
    *,
    n: int = 20,
    m: int = 5,
    resume: bool = False,
    max_workers: int = 4,
) -> Dict[str, float]:
    """Full Complex-Edit judging driver (ref:eval.py:36-152): alignment +
    quality + per-sample overall JSONs + final means. Returns the benchmark
    row {IF, IP, PQ, Overall} on the 0-10 scale."""
    align = AlignmentEvaluator(client, if_resume=resume, n=n, m=m,
                               max_workers=max_workers)
    quality = QualityEvaluator(client, if_resume=resume, n=n, m=m,
                               max_workers=max_workers)

    def _paths(folder):
        d = os.path.join(out_dir, folder)
        os.makedirs(d, exist_ok=True)
        return [
            os.path.join(d, os.path.basename(p).split(".")[0] + ".json")
            for p in output_images
        ]

    a_rows = align.eval(input_images, output_images, instructions,
                        _paths(align.result_folder_name))
    q_rows = quality.eval(output_images, instructions,
                          _paths(quality.result_folder_name))

    overall_dir = os.path.join(out_dir, "overall")
    os.makedirs(overall_dir, exist_ok=True)
    rows = []
    for a, q, p, instr in zip(a_rows, q_rows, output_images, instructions):
        merged = {**a, **q}
        merged["overall"] = sum(merged.values()) / len(merged)
        with open(os.path.join(
            overall_dir, os.path.basename(p).split(".")[0] + ".json"
        ), "w") as f:
            json.dump({**merged, "instruction": instr}, f, indent="    ")
        rows.append({
            "IF": merged["instruction_following"],
            "IP": merged["identity_preservation"],
            "PQ": merged["perceptual_quality"],
        })
    final = aggregate(rows)
    with open(os.path.join(overall_dir, "final_result.json"), "w") as f:
        json.dump(final, f, indent="    ")
    return final


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
