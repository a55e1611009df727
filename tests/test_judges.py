"""End-to-end tests of the benchmark JUDGE layer with mocked MLLM clients:

- VIEScore SC/PQ protocol + robust output parsing (ref:viescore/__init__.py,
  utils.py:mllm_output_to_dict)
- GEdit step2 resumable CSV driver (ref:step2_gedit_bench.py)
- Complex-Edit alignment/quality evaluators + overall driver (ref:eval.py)
- OmniContext PF/SC scorer + resumable jsonl driver
  (ref:omnicontext_score.py, test_omnicontext_score.py)
- prompt protocol byte-parity vs the reference release
"""

import csv
import json
import os

import numpy as np
import pytest
from PIL import Image

from gpt_image_edit_tpu.eval.viescore import VIEScore, mllm_output_to_dict

REF = "/root/reference/univa/eval"


def _png(path, size=(32, 32), seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(rng.integers(0, 256, (*size, 3), dtype=np.uint8)).save(path)
    return str(path)


class ScriptedClient:
    """Mock judge: returns canned responses keyed by a substring of the
    prompt, records every call."""

    def __init__(self, responses):
        self.responses = responses  # list or callable
        self.calls = []

    def score(self, prompt, image_paths):
        self.calls.append((prompt, list(image_paths)))
        if callable(self.responses):
            return self.responses(prompt, image_paths)
        return self.responses[(len(self.calls) - 1) % len(self.responses)]

    def score_multi(self, prompt, image_paths, *, system=None, n=1, images_first=False):
        out = []
        for _ in range(n):
            self.calls.append((system, prompt, list(image_paths)))
            if callable(self.responses):
                out.append(self.responses(prompt, image_paths))
            else:
                out.append(self.responses[(len(self.calls) - 1) % len(self.responses)])
        return out


class TestOutputParsing:
    def test_delimited(self):
        text = '||V^=^V||\n{"score": [7, 8], "reasoning": "ok"}\n||V^=^V||'
        assert mllm_output_to_dict(text)["score"] == [7, 8]

    def test_bare_json(self):
        assert mllm_output_to_dict('{"score": [5], "reasoning": "x"}')["score"] == [5]

    def test_scalar_score_wrapped(self):
        assert mllm_output_to_dict('{"score": 6, "reasoning": "x"}')["score"] == [6]

    def test_bare_list(self):
        out = mllm_output_to_dict("[6, 9]")
        assert out["score"] == [6, 9]

    def test_bare_number(self):
        assert mllm_output_to_dict("7")["score"] == [7]

    def test_unparseable_returns_false(self):
        assert mllm_output_to_dict("I cannot evaluate this.") is False

    def test_give_up_guesses(self):
        import random

        out = mllm_output_to_dict("garbage", give_up_parsing=True,
                                  rng=random.Random(0))
        assert 0 <= out["score"][0] <= 10
        assert "guess_if_cannot_parse" in out["reasoning"]

    def test_rate_limit_passthrough(self):
        assert mllm_output_to_dict("rate_limit_exceeded") == "rate_limit_exceeded"


class TestVIEScore:
    def test_tie_protocol(self, tmp_path):
        src = _png(tmp_path / "src.png", seed=1)
        edit = _png(tmp_path / "edit.png", seed=2)
        client = ScriptedClient(
            ['{"score": [8, 6], "reasoning": "edit ok"}',
             '{"score": [9, 7], "reasoning": "natural"}']
        )
        vie = VIEScore(client, task="tie")
        sc, pq, overall = vie.evaluate([src, edit], "make the cat blue")
        assert sc == 6 and pq == 7  # min() of each list
        assert overall == pytest.approx((6 * 7) ** 0.5)
        # SC call got both images with the instruction substituted;
        # PQ call got ONLY the edited image
        sc_call, pq_call = client.calls
        assert "make the cat blue" in sc_call[0]
        assert sc_call[1] == [src, edit]
        assert pq_call[1] == [edit]
        assert "naturalness" in pq_call[0]

    def test_retry_then_guess(self, tmp_path):
        img = _png(tmp_path / "a.png")
        client = ScriptedClient(["nonsense"])
        vie = VIEScore(client, task="t2i", seed=0)
        sc, pq, overall = vie.evaluate([img], "a cat")
        assert 0 <= sc <= 10 and 0 <= pq <= 10

    def test_prompt_protocol_matches_reference(self):
        """The assembled SC/PQ prompts must byte-match the reference
        VIEScore protocol."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_vp", f"{REF}/gedit/viescore/vie_prompts.py"
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        vie = VIEScore(ScriptedClient([]), task="tie")
        assert vie.sc_prompt == "\n".join([
            ref._context_no_delimit,
            ref._prompts_0shot_two_image_edit_rule,
            ref._prompts_0shot_tie_rule_SC,
        ])
        assert vie.pq_prompt == "\n".join([
            ref._context_no_delimit, ref._prompts_0shot_rule_PQ,
        ])


class TestGEditStep2:
    def _layout(self, tmp_path, keys=("k1", "k2"), group="color_alter"):
        samples = []
        for i, key in enumerate(keys):
            _png(tmp_path / "src" / "fullset" / group / "en" / f"{key}_SRCIMG.png", seed=i)
            _png(tmp_path / "gen" / "fullset" / group / "en" / f"{key}.png", seed=10 + i)
            samples.append({
                "key": key, "task_type": group, "instruction": f"edit {key}",
                "instruction_language": "en", "Intersection_exist": True,
            })
        return samples

    def test_end_to_end_and_resume(self, tmp_path):
        from gpt_image_edit_tpu.eval.gedit import analyze_scores, step2_judge

        samples = self._layout(tmp_path)
        client = ScriptedClient(['{"score": [8, 8], "reasoning": "r"}'])
        rows = step2_judge(
            samples, source_path=str(tmp_path / "src"),
            save_path=str(tmp_path / "gen"), model_name="m", client=client,
        )
        assert len(rows) == 2
        out_dir = tmp_path / "gen" / "gpt4o" / "eval_results_new"
        assert (out_dir / "m_combined_gpt_score.csv").exists()
        assert (out_dir / "m_color_alter_gpt_score.csv").exists()
        n_calls = len(client.calls)

        # resume: nothing re-judged
        rows2 = step2_judge(
            samples, source_path=str(tmp_path / "src"),
            save_path=str(tmp_path / "gen"), model_name="m", client=client,
        )
        assert len(client.calls) == n_calls
        assert len(rows2) == 2

        stats = analyze_scores(str(out_dir), "m")
        assert stats["summary"]["n"] == 2
        assert stats["summary"]["Overall"] == pytest.approx(8.0)

    def test_cn_skipped(self, tmp_path):
        from gpt_image_edit_tpu.eval.gedit import step2_judge

        samples = self._layout(tmp_path, keys=("k1",))
        samples.append({
            "key": "kcn", "task_type": "color_alter", "instruction": "x",
            "instruction_language": "cn", "Intersection_exist": True,
        })
        client = ScriptedClient(['{"score": [5, 5], "reasoning": "r"}'])
        rows = step2_judge(
            samples, source_path=str(tmp_path / "src"),
            save_path=str(tmp_path / "gen"), model_name="m", client=client,
        )
        assert len(rows) == 1


class TestComplexEditJudges:
    def test_alignment_and_quality(self, tmp_path):
        from gpt_image_edit_tpu.eval.complex_edit import step2_evaluate

        inp = [_png(tmp_path / "in0.png", seed=0)]
        out = [_png(tmp_path / "out0.png", seed=1)]

        def respond(prompt, paths):
            if len(paths) == 2:
                return json.dumps({
                    "reasoning": "...", "instruction_following": "8",
                    "identity_preservation": "6",
                })
            return json.dumps({"perceptual_quality": "9"})

        client = ScriptedClient(respond)
        final = step2_evaluate(
            str(tmp_path / "eval"), inp, out, ["add a hat"], client, n=4, m=2,
        )
        assert final == {"IF": 8.0, "IP": 6.0, "PQ": 9.0,
                         "Overall": round((8 + 6 + 9) / 3, 2)}
        # per-sample jsons written (resumable protocol)
        assert (tmp_path / "eval" / "alignment_rubric_cot" / "out0.json").exists()
        assert (tmp_path / "eval" / "overall" / "final_result.json").exists()
        # n=4 sampled responses per judge, m=2 per call -> 2 calls each
        align_calls = [c for c in client.calls if len(c[2]) == 2]
        assert len(align_calls) == 4  # recorded per-response by the mock

    def test_resume_skips_judged(self, tmp_path):
        from gpt_image_edit_tpu.eval.complex_edit import AlignmentEvaluator

        inp = _png(tmp_path / "i.png", seed=0)
        out = _png(tmp_path / "o.png", seed=1)
        save = str(tmp_path / "a.json")
        client = ScriptedClient([json.dumps({
            "reasoning": "", "instruction_following": "7",
            "identity_preservation": "7"})])
        ev = AlignmentEvaluator(client, if_resume=True, n=2, m=2)
        first = ev.eval_one(inp, out, "x", save)
        n_calls = len(client.calls)
        second = ev.eval_one(inp, out, "x", save)
        assert len(client.calls) == n_calls
        assert second["instruction_following"] == first["instruction_following"]

    def test_prompt_protocol_matches_reference(self):
        import importlib.util

        from gpt_image_edit_tpu.eval import complex_edit_prompts as P

        for mod, pairs in (
            ("prompt_alignment", [
                ("ALIGNMENT_PROMPT_W_RUBRIC", "ALIGNMENT_PROMPT_W_RUBRIC"),
                ("PROMPT_TEMPLATE", "ALIGNMENT_TEMPLATE"),
            ]),
            ("prompt_quality", [
                ("PERCEPTUAL_QUALITY_PROMPT_W_RUBRIC_W_INST", "QUALITY_PROMPT_W_RUBRIC_W_INST"),
                ("PROMPT_TEMPLATE", "QUALITY_TEMPLATE"),
            ]),
        ):
            spec = importlib.util.spec_from_file_location(
                mod, f"{REF}/complex-edit/complex_edit/eval/{mod}.py"
            )
            ref = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(ref)
            for ref_name, ours in pairs:
                assert getattr(ref, ref_name) == getattr(P, ours)


class TestOmniContextJudge:
    def test_scorer(self, tmp_path):
        from gpt_image_edit_tpu.eval.omnicontext import OmniContextScore

        refs = [_png(tmp_path / "r0.png", seed=0), _png(tmp_path / "r1.png", seed=1)]
        out = _png(tmp_path / "o.png", seed=2)

        def respond(prompt, paths):
            assert paths == refs + [out]
            if "regardless of whether subject identities" in prompt:
                return '{"score": 8, "reasoning": "pf"}'
            return '{"score": 6, "reasoning": "sc"}'

        scorer = OmniContextScore(ScriptedClient(respond))
        res = scorer.evaluate(refs + [out], "combine the subjects")
        assert res["PF_scores"]["score"] == 8
        assert res["SC_scores"]["score"] == 6

    def test_step2_driver_resumable(self, tmp_path):
        from gpt_image_edit_tpu.eval.omnicontext import analyze_scores, step2_score

        ref_img = _png(tmp_path / "refs" / "r.png", seed=0)
        _png(tmp_path / "out" / "m" / "fullset" / "single" / "s1.png", seed=1)
        samples = [{
            "key": "s1", "task_type": "single", "instruction": "put the cat on a mat",
            "instruction_language": "en", "input_images": [ref_img],
        }]
        client = ScriptedClient(['{"score": 9, "reasoning": "r"}'])
        rows = step2_score(
            samples, result_dir=str(tmp_path / "out"), model_name="m", client=client,
        )
        assert len(rows) == 1 and rows[0]["PF_score"] == 9
        n = len(client.calls)
        rows2 = step2_score(
            samples, result_dir=str(tmp_path / "out"), model_name="m", client=client,
        )
        assert len(client.calls) == n  # jsonl resume
        stats = analyze_scores(rows2)
        assert stats["single"]["Overall"] == pytest.approx(9.0)

    def test_prompt_protocol_matches_reference(self):
        import importlib.util

        from gpt_image_edit_tpu.eval import omnicontext_prompts as P
        from gpt_image_edit_tpu.eval.omnicontext import OmniContextScore

        spec = importlib.util.spec_from_file_location(
            "ref_pg", f"{REF}/omnicontext/prompt_generator.py"
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        gen = ref.PromptGenerator()
        scorer = OmniContextScore(ScriptedClient([]))
        for task in ("prompt_following", "subject_consistency"):
            for scene in (False, True):
                assert scorer._prompt("INSTR", task, scene) == gen(
                    "INSTR", task_type=task, with_scene=scene
                )


class TestImgEditAsset:
    def test_shipped_rubric_matches_release(self):
        from gpt_image_edit_tpu.eval.imgedit import default_rubric

        ours = default_rubric()
        with open(f"{REF}/imgedit/eval_prompts/prompts.json") as f:
            release = json.load(f)
        assert ours == release
        assert set(ours) >= {"replace", "add", "alter", "remove", "style",
                             "action", "extract", "background", "compose"}


class TestQwen25VLJudgeBackbone:
    """Local Qwen2.5-VL judge (eval.qwen_judge, the reference's
    --backbone qwen25vl path, ref:viescore/mllm_tools/qwen25vl_eval.py)
    running mocked tiny weights end to end."""

    def test_protocol_and_viescore_e2e(self, tmp_path):
        from gpt_image_edit_tpu.eval.qwen_judge import Qwen25VLJudge
        from gpt_image_edit_tpu.eval.viescore import VIEScore

        src = _png(tmp_path / "src.png", seed=1)
        edit = _png(tmp_path / "edit.png", seed=2)
        judge = Qwen25VLJudge(tiny=True, max_new_tokens=4)

        # raw protocol surface (images-then-text user turn, greedy decode)
        out = judge.score("Rate this edit.", [str(src), str(edit)])
        assert isinstance(out, str)
        multi = judge.score_multi("Rate.", [str(src)], n=3, system="Judge.")
        assert len(multi) == 3 and len(set(multi)) == 1  # greedy => identical

        # text-only judging must also work (no vision tower involved)
        out_text = judge.score("Score: answer with a number.", [])
        assert isinstance(out_text, str)

        # full VIEScore loop: tiny random weights answer garbage, so the
        # protocol retries once then deterministically guesses — the judge
        # pipeline must complete rather than stall (ref give-up behavior)
        vie = VIEScore(judge, task="tie", seed=7)
        sc, pq, overall = vie.evaluate([str(src), str(edit)], "make it blue")
        assert 0 <= sc <= 10 and 0 <= pq <= 10
        assert overall == pytest.approx((sc * pq) ** 0.5)

    def test_gedit_step2_with_local_backbone(self, tmp_path):
        """step2_judge writes its CSVs under the qwen25vl backbone dir."""
        from gpt_image_edit_tpu.eval import gedit
        from gpt_image_edit_tpu.eval.qwen_judge import Qwen25VLJudge

        group = "color_alter"
        samples = []
        for i, key in enumerate(("k1",)):
            _png(tmp_path / "src" / "fullset" / group / "en" / f"{key}_SRCIMG.png", seed=i)
            _png(tmp_path / "gen" / "fullset" / group / "en" / f"{key}.png", seed=10 + i)
            samples.append({
                "key": key, "task_type": group, "instruction": "recolor",
                "instruction_language": "en", "Intersection_exist": True,
            })
        judge = Qwen25VLJudge(tiny=True, max_new_tokens=4)
        gedit.step2_judge(
            samples, source_path=str(tmp_path / "src"),
            save_path=str(tmp_path / "gen"), model_name="m", client=judge,
            backbone="qwen25vl", max_workers=1,
        )
        out_dir = tmp_path / "gen" / "qwen25vl" / "eval_results_new"
        assert (out_dir / "m_combined_gpt_score.csv").exists()


def test_gemini_backbone_gated():
    """GeminiJudge needs google-generativeai (not bundled); construction
    must fail with an actionable message, never crash generation paths."""
    import importlib.util

    from gpt_image_edit_tpu.eval.gemini_judge import GeminiJudge

    if importlib.util.find_spec("google.generativeai") is None:
        with pytest.raises(RuntimeError, match="google-generativeai"):
            GeminiJudge()
