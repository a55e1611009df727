"""GPT-judge client + score parsing / aggregation (steps 2-3 of the
benchmarks). The API client is gated on the `openai` package + key (host-side,
network-bound, unchanged from the reference's protocol); parsing and
aggregation are pure and unit-tested.

ImgEdit protocol (ref:univa/eval/imgedit/step2_basic_bench.py,
step3_get_avgscore.py): judge returns "name: N" lines; sample score = mean of
ints; benchmark = per-edit-type means.

VIEScore protocol (ref:univa/eval/gedit/step2_gedit_bench.py + viescore/):
semantics SC in [0,10], quality PQ in [0,10], overall = sqrt(SC * PQ).
"""

from __future__ import annotations

import base64
import json
import math
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional


# --------------------------------------------------------------------------
# pure: parsing + aggregation
# --------------------------------------------------------------------------

def parse_metric_lines(text: str) -> Optional[float]:
    """'metric: N' lines -> mean, matching
    ref:step3_get_avgscore.py extract_scores_and_average."""
    scores = []
    for line in text.splitlines():
        parts = line.strip().split(": ")
        if len(parts) == 2 and parts[1].isdigit():
            scores.append(int(parts[1]))
    if not scores:
        return None
    return round(sum(scores) / len(scores), 2)


def average_by_type(scores: Dict[str, float], meta: Dict[str, Dict]) -> Dict[str, float]:
    """Per-edit-type means (ref:step3_get_avgscore.py compute_edit_type_averages)."""
    by_type: Dict[str, List[float]] = defaultdict(list)
    for key, score in scores.items():
        etype = meta.get(key, {}).get("edit_type")
        if etype is not None:
            by_type[etype].append(score)
    return {
        t: round(sum(v) / len(v), 2) for t, v in by_type.items() if v
    }


def viescore_overall(sc: float, pq: float) -> float:
    """VIEScore: overall = sqrt(SC * PQ)."""
    return math.sqrt(max(sc, 0.0) * max(pq, 0.0))


def parse_json_scores(text: str) -> Optional[dict]:
    """Extract the first JSON object from a judge response (VIEScore judges
    answer in JSON)."""
    start = text.find("{")
    end = text.rfind("}")
    if start < 0 or end <= start:
        return None
    try:
        return json.loads(text[start : end + 1])
    except json.JSONDecodeError:
        return None


# --------------------------------------------------------------------------
# network: OpenAI-protocol judge calls (optional dependency)
# --------------------------------------------------------------------------

def _b64(path: str) -> str:
    with open(path, "rb") as f:
        return base64.b64encode(f.read()).decode()


class GPTJudge:
    """Thin retry-wrapped judge client. Requires `openai` + OPENAI_API_KEY.

    Mirrors the reference's tenacity retry + base64 2-image prompt shape
    (ref:step2_basic_bench.py:22-53)."""

    def __init__(self, model: str = "gpt-4.1", base_url: Optional[str] = None,
                 api_key: Optional[str] = None, max_retries: int = 10):
        try:
            from openai import OpenAI
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "GPT judging needs the `openai` package (host-side, not bundled); "
                "generation outputs are unaffected"
            ) from e
        self.client = OpenAI(
            api_key=api_key or os.environ.get("OPENAI_API_KEY"), base_url=base_url
        )
        self.model = model
        self.max_retries = max_retries

    def score(self, prompt: str, image_paths: List[str]) -> str:
        return self.score_multi(prompt, image_paths)[0]

    def score_multi(
        self,
        prompt: str,
        image_paths: List[str],
        *,
        system: Optional[str] = None,
        n: int = 1,
        images_first: bool = False,
    ) -> List[str]:
        """n sampled responses for one judged item. `images_first` places the
        images before the text in the user turn (the Complex-Edit message
        order, ref:complex_edit/eval/alignment.py:build_msgs)."""
        text_part = [{"type": "text", "text": prompt}]
        image_part = [
            {
                "type": "image_url",
                "image_url": {"url": f"data:image/png;base64,{_b64(p)}"},
            }
            for p in image_paths
        ]
        content = image_part + text_part if images_first else text_part + image_part
        messages = []
        if system is not None:
            messages.append({"role": "system", "content": system})
        messages.append({"role": "user", "content": content})
        delay = 2.0
        for attempt in range(self.max_retries):
            try:
                resp = self.client.chat.completions.create(
                    model=self.model, messages=messages, n=n,
                )
                return [c.message.content for c in resp.choices]
            except Exception:
                if attempt == self.max_retries - 1:
                    raise
                time.sleep(delay)
                delay = min(delay * 2, 30.0)
        raise RuntimeError("unreachable")
