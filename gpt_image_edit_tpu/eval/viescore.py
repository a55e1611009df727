"""VIEScore judge: the SC/PQ two-call protocol that produces GEdit-Bench
scores (ref:univa/eval/gedit/viescore/__init__.py:10-120).

Protocol per sample (task "tie" = text-guided image editing):
- SC (semantic consistency) call: [source, edited] images + context + edit
  rule + SC rubric with <instruction> substituted. Score = min(score list).
- PQ (perceptual quality) call: the EDITED image only + context + PQ rubric.
  Score = min([naturalness, artifacts]).
- Overall = sqrt(SC * PQ).

The judge backbone is injectable: anything with
`score(prompt: str, image_paths: List[str]) -> str` (e.g. eval.judge.GPTJudge
for the gpt-4.1 backbone the reference uses) — tests inject a mock.

Output parsing mirrors ref:viescore/utils.py:mllm_output_to_dict — the MLLM
may answer with the delimited JSON, bare JSON, a bare score list, or a single
number; after the first failed round-trip the reference re-asks once and then
"gives up" by guessing a random score so the pipeline never stalls.
"""

from __future__ import annotations

import json
import math
import random
import re
from typing import List, Optional, Sequence, Union

from gpt_image_edit_tpu.eval import vie_prompts

DELIMITER = "||V^=^V||"


def _fix_json(s: str) -> str:
    """Best-effort repair of near-JSON judge output (unquoted keys, bare
    scalar scores) — ref:viescore/utils.py:fix_json."""
    s = re.sub(r"(\w+)\s*:", r'"\1":', s)

    def _value(m):
        key, value, comma = m.groups()
        value = value.strip()
        if re.match(r"^-?\d+(\.\d+)?$", value):
            value = f"[{value}]"
        elif re.match(r"^(true|false|null)$", value, re.IGNORECASE):
            pass
        else:
            value = json.dumps(value)
        return f"{key}: {value}{comma}"

    return re.sub(r'(".*?"):(.*?)(,|})', _value, s)


def mllm_output_to_dict(
    text: str, give_up_parsing: bool = False, rng: Optional[random.Random] = None
) -> Union[dict, bool, str]:
    """Parse a judge response into {'score': [...], 'reasoning': ...}.

    Returns False when unparseable (caller re-asks), or a guessed score dict
    when give_up_parsing is set (ref:utils.py:154-234)."""
    if text == "rate_limit_exceeded":
        return "rate_limit_exceeded"
    if text.count(DELIMITER) == 2:
        start = text.find(DELIMITER) + len(DELIMITER)
        end = text.rfind(DELIMITER)
    else:
        start = text.find("{")
        end = text.rfind("}") + 1
        if start == -1 or end == 0:
            start = text.find("[")
            end = text.rfind("]") + 1
            frag = text[start:end] if start != -1 and end > 0 else ""
            if give_up_parsing:
                guess = (rng or random).randint(0, 10)
                return {
                    "score": [guess],
                    "reasoning": f"guess_if_cannot_parse | {text}",
                }
            if re.match(r"^\[\d+(, ?\d+)*\]$", frag):
                scores = json.loads(frag)
                return {
                    "score": scores if isinstance(scores, list) else [scores],
                    "reasoning": "System: output is simply a list of scores",
                }
            stripped = text.strip()
            if stripped.isdigit() and 0 <= int(stripped) <= 10:
                return {
                    "score": [int(stripped)],
                    "reasoning": "System: output is simply a number",
                }
            return False
    if start == -1 or end == -1 or start == end:
        return False
    frag = text[start:end].strip().replace("\n", "")
    try:
        out = json.loads(frag)
        if not isinstance(out.get("score"), list):
            out["score"] = [out["score"]]
        return out
    except (json.JSONDecodeError, KeyError, TypeError):
        try:
            out = json.loads(_fix_json(frag))
            if not isinstance(out.get("score"), list):
                out["score"] = [out["score"]]
            return out
        except Exception:
            return False


class VIEScore:
    """SC/PQ judge (ref:viescore/__init__.py). `client.score(prompt, paths)`
    is any MLLM judge call returning the raw text answer."""

    def __init__(self, client, task: str = "tie", seed: Optional[int] = None):
        if task not in ("t2i", "tie"):
            raise ValueError("task must be 't2i' or 'tie'")
        self.client = client
        self.task = task
        self.rng = random.Random(seed) if seed is not None else None
        if task == "tie":
            self.sc_prompt = "\n".join([
                vie_prompts.CONTEXT,
                vie_prompts.TWO_IMAGE_EDIT_RULE,
                vie_prompts.TIE_RULE_SC,
            ])
        else:
            self.sc_prompt = "\n".join([
                vie_prompts.CONTEXT,
                vie_prompts.ONE_IMAGE_GEN_RULE,
                vie_prompts.T2I_RULE_SC,
            ])
        self.pq_prompt = "\n".join([vie_prompts.CONTEXT, vie_prompts.RULE_PQ])

    def evaluate(
        self, image_paths: Sequence[str], text_prompt: str
    ) -> List[float]:
        """-> [SC, PQ, Overall]. For tie: image_paths = [source, edited];
        PQ judges only the edited (last) image (ref:__init__.py:65-68)."""
        image_paths = list(image_paths)
        token = "<instruction>" if self.task == "tie" else "<prompt>"
        sc_prompt = self.sc_prompt.replace(token, text_prompt)
        pq_paths = image_paths[-1:] if self.task == "tie" else image_paths

        sc = pq = False
        tries = 0
        while sc is False or pq is False:
            tries += 1
            give_up = tries > 1  # one clean retry, then guess (ref max_tries=1)
            sc = mllm_output_to_dict(
                self.client.score(sc_prompt, image_paths),
                give_up_parsing=give_up, rng=self.rng,
            )
            pq = mllm_output_to_dict(
                self.client.score(self.pq_prompt, pq_paths),
                give_up_parsing=give_up, rng=self.rng,
            )
        if sc == "rate_limit_exceeded" or pq == "rate_limit_exceeded":
            raise RuntimeError("rate_limit_exceeded")
        sc_score = min(sc["score"])
        pq_score = min(pq["score"])
        return [sc_score, pq_score, math.sqrt(sc_score * pq_score)]
