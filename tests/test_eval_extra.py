"""complex-edit / omnicontext aggregation + multi-ref generation path."""

import numpy as np
import pytest
from PIL import Image

from gpt_image_edit_tpu.eval.complex_edit import aggregate as ce_aggregate
from gpt_image_edit_tpu.eval.complex_edit import parse_alignment_response
from gpt_image_edit_tpu.eval.config import EvalConfig
from gpt_image_edit_tpu.eval.omnicontext import (
    aggregate as oc_aggregate,
    sample_overall,
    step1_generate,
)


class TestComplexEdit:
    def test_aggregate(self):
        rows = [
            {"IF": 9.0, "IP": 8.0, "PQ": 9.0},
            {"IF": 8.0, "IP": 9.0, "PQ": 8.0},
        ]
        out = ce_aggregate(rows)
        assert out == {"IF": 8.5, "IP": 8.5, "PQ": 8.5, "Overall": 8.5}

    def test_parse_alignment(self):
        txt = 'reasoning... {"instruction_following": {"score": 7}, "identity_preservation": 9}'
        out = parse_alignment_response(txt)
        assert out == {"IF": 7.0, "IP": 9.0}


class TestOmniContext:
    def test_sample_overall(self):
        assert sample_overall(9.0, 4.0) == 6.0
        assert sample_overall(0.0, 9.0) == 0.0

    def test_aggregate(self):
        rows = [
            {"task_type": "single", "PF": 8.0, "SC": 8.0},
            {"task_type": "multi", "PF": 4.0, "SC": 9.0},
        ]
        out = oc_aggregate(rows)
        assert out["single"]["Overall"] == 8.0
        assert out["summary"]["n"] == 2

    def test_multi_ref_generation(self, tmp_path):
        rng = np.random.default_rng(0)
        paths = []
        for i in range(2):
            p = tmp_path / f"ref{i}.png"
            Image.fromarray(rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)).save(p)
            paths.append(str(p))
        samples = [
            {"key": "s0", "task_type": "multi", "instruction": "combine them",
             "input_images": paths}
        ]
        cfg = EvalConfig(tiny=True, output_dir=str(tmp_path / "out"),
                         num_inference_steps=2)
        written = step1_generate(cfg, samples)
        assert len(written) == 1
        out = Image.open(written[0])
        assert out.size[0] > 0


class TestImgEditStep0:
    """step0 original-image extraction (ref:imgedit/step0_original_img.py)."""

    def test_calculate_dimensions_matches_reference(self):
        """Byte-level behavior parity: exec the reference's own
        calculate_dimensions (pure function) and compare over a grid."""
        import ast
        import math

        from gpt_image_edit_tpu.eval.imgedit_prepare import calculate_dimensions

        ref_path = "/root/reference/univa/eval/imgedit/step0_original_img.py"
        tree = ast.parse(open(ref_path).read())
        fn = next(
            n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name == "calculate_dimensions"
        )
        ns = {"math": math}
        exec(compile(ast.Module([fn], []), ref_path, "exec"), ns)
        ref_fn = ns["calculate_dimensions"]

        for ratio in (0.33, 0.5, 0.75, 1.0, 1.334, 1.5, 2.0, 3.1):
            for area in (512 * 512, 1024 * 1024):
                assert calculate_dimensions(area, ratio) == tuple(
                    ref_fn(area, ratio)
                ), (area, ratio)

    def test_prepare_writes_tree_and_json(self, tmp_path):
        import json

        from gpt_image_edit_tpu.eval.imgedit_prepare import prepare

        rng = np.random.default_rng(0)

        def img(w, h):
            return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))

        fake = [
            {
                "task_type": "color_alter", "key": "k1", "instruction": "recolor",
                "instruction_language": "en",
                "input_image": img(128, 128), "input_image_raw": img(777, 513),
            },
            {
                "task_type": "subject-add", "key": "k2", "instruction": "add a cat",
                "instruction_language": "cn",
                "input_image": img(96, 128), "input_image_raw": img(300, 600),
            },
        ]
        dj = tmp_path / "data.json"
        mapping = prepare(str(tmp_path / "imgs"), str(dj), dataset=fake)

        assert set(mapping) == {"k1", "k2"}
        assert mapping["k1"] == {
            "prompt": "recolor", "id": "fullset/color_alter/en/k1.png",
            "edit_type": "color_alter",
        }
        assert json.loads(dj.read_text()) == mapping
        src = tmp_path / "imgs" / "fullset" / "color_alter" / "en" / "k1_SRCIMG.png"
        out = tmp_path / "imgs" / "fullset" / "color_alter" / "en" / "k1.png"
        assert src.exists() and out.exists()
        with Image.open(out) as im:  # 32-aligned 512^2-area resize applied
            assert im.width % 32 == 0 and im.height % 32 == 0
            assert abs(im.width * im.height - 512 * 512) <= 32 * max(im.size)


class TestComplexEditBuild:
    """Instruction-generation tooling (ref:complex-edit/build_dataset/)."""

    def test_protocol_assets_byte_identical(self):
        """Taxonomy + templates must match the reference release exactly."""
        import importlib.util

        from gpt_image_edit_tpu.eval import complex_edit_build as b

        spec = importlib.util.spec_from_file_location(
            "ref_prompt",
            "/root/reference/univa/eval/complex-edit/build_dataset/prompt.py",
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        assert b.EDIT_CATEGORIES == ref.EDIT_CATEGORIES
        assert b.SEQUENCE_TEMPLATE == ref.SEQUENCE_TEMPLATE
        assert b.COMPOUND_TEMPLATE == ref.COMPOUND_TEMPLATE
        assert b.SIMPLIFY_TEMPLATE == ref.SIMPLIFY_TEMPLATE

    def _scripted_client(self, calls):
        import json as _json

        class Client:
            def complete(self, messages, *, max_tokens, temperature=None):
                calls.append((messages, max_tokens, temperature))
                system = messages[0]["content"]
                if "write a sequence of" in system:
                    return _json.dumps({
                        "reasoning": "Build a scene.",
                        "sequence": [
                            {"name": "Add an Object", "instruction": "Add a big red moon to the sky."},
                            {"name": "Change Color", "instruction": "Change the car to blue."},
                            {"name": "Remove an Object", "instruction": "Remove the fence."},
                        ],
                    })
                if "refine the instruction" in system:
                    user = messages[-1]["content"]
                    return _json.dumps({
                        "need_simplication": "Yes" if "big" in user else "No",
                        "instruction": user.replace("big ", ""),
                    })
                return _json.dumps({
                    "reasoning": "Fused steps.",
                    "compound_instruction": "Do the combined edit.",
                })

        return Client()

    def test_generate_for_image_chains_calls(self, tmp_path):
        from gpt_image_edit_tpu.eval.complex_edit_build import generate_for_image

        img = tmp_path / "a.png"
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img)
        calls = []
        out = generate_for_image(str(img), self._scripted_client(calls),
                                 max_complexity=3)
        # 1 sequence + 3 simplify + 2 compound (prefixes 2..3) calls
        assert len(calls) == 6
        assert len(out["original_sequence"]) == 3
        # simplification applied only where need_simplication == Yes
        assert out["sequence"][0]["instruction"] == "Add a red moon to the sky."
        assert out["sequence"][1]["instruction"] == "Change the car to blue."
        # complexity-1 compound = first atomic step verbatim (ref :311-316)
        assert out["compound"][0] == {
            "reasoning": "none",
            "compound_instruction": "Add a red moon to the sky.",
        }
        assert len(out["compound"]) == 3
        assert out["compound"][1]["compound_instruction"] == "Do the combined edit."

    def test_generate_edits_resumable(self, tmp_path):
        import json as _json

        from gpt_image_edit_tpu.eval.complex_edit_build import generate_edits

        for name in ("a", "b"):
            Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(tmp_path / f"{name}.png")
        out_dir = tmp_path / "out"
        calls = []
        paths = generate_edits(str(tmp_path), str(out_dir),
                               self._scripted_client(calls), max_complexity=3)
        assert len(paths) == 2 and all(_json.load(open(p)) for p in paths)
        n_first = len(calls)
        # second run resumes: no new MLLM calls
        paths2 = generate_edits(str(tmp_path), str(out_dir),
                                self._scripted_client(calls), max_complexity=3)
        assert paths2 == paths and len(calls) == n_first

    def test_invalid_output_retries_then_raises(self, tmp_path):
        from gpt_image_edit_tpu.eval.complex_edit_build import generate_for_image

        img = tmp_path / "a.png"
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img)

        class Bad:
            n = 0

            def complete(self, messages, *, max_tokens, temperature=None):
                self.n += 1
                return "not json at all"

        bad = Bad()
        with pytest.raises(ValueError):
            generate_for_image(str(img), bad, max_complexity=2)
        assert bad.n == 5  # bounded retries


class TestComplexEditBuildFewShot:
    """Few-shot example assets + message structure parity
    (ref:generate_edits.py:95-270, if_example=True default)."""

    def test_example_assets_byte_identical(self):
        import ast

        from gpt_image_edit_tpu.eval import complex_edit_build as b

        ref_path = ("/root/reference/univa/eval/complex-edit/build_dataset/"
                    "generate_edits.py")
        tree = ast.parse(open(ref_path).read())
        ref_vals = {}
        for node in tree.body:
            if isinstance(node, ast.Assign) and len(node.targets) == 1:
                name = getattr(node.targets[0], "id", None)
                if name and name.startswith("EXAMPLE_"):
                    ref_vals[name] = ast.literal_eval(node.value)
        assert b.EXAMPLE_CoT_SEQUENCE == ref_vals["EXAMPLE_CoT_SEQUENCE"]
        assert b.EXAMPLE_CoT_COMPOUND == ref_vals["EXAMPLE_CoT_COMPOUND"]
        assert b.EXAMPLE_SIMPLIFIED_POS_INPUT == ref_vals["EXAMPLE_SIMPLIFIED_POS_INPUT"]
        assert b.EXAMPLE_SIMPLIFIED_POS_OUTPUT == ref_vals["EXAMPLE_SIMPLIFIED_POS_OUTPUT"]
        assert b.EXAMPLE_SIMPLIFIED_NEG_INPUT == ref_vals["EXAMPLE_SIMPLIFIED_NEG_INPUT"]
        assert b.EXAMPLE_SIMPLIFIED_NEG_OUTPUT == ref_vals["EXAMPLE_SIMPLIFIED_NEG_OUTPUT"]

    def test_fewshot_message_structure(self, tmp_path):
        import json as _json

        from gpt_image_edit_tpu.eval.complex_edit_build import (
            EXAMPLE_CoT_SEQUENCE,
            build_msgs_compound,
            build_msgs_sequence,
            build_msgs_simplify,
        )

        img = tmp_path / "a.png"
        ex = tmp_path / "ex.png"
        for p in (img, ex):
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)

        # sequence: system, example user image, example assistant, user image
        msgs = build_msgs_sequence(str(img), 8, str(ex))
        assert [m["role"] for m in msgs] == ["system", "user", "assistant", "user"]
        assert _json.loads(msgs[2]["content"]) == EXAMPLE_CoT_SEQUENCE
        # without the example image: 2 turns (the opt-out shape)
        assert len(build_msgs_sequence(str(img), 8)) == 2

        # simplify: pos/neg example pairs always on (text-only)
        msgs = build_msgs_simplify("Remove the big fence from the photo.")
        assert [m["role"] for m in msgs] == [
            "system", "user", "assistant", "user", "assistant", "user"
        ]
        assert msgs[-1]["content"] == "Remove the big fence from the photo."

        # compound: example turn carries the example image + example sequence
        msgs = build_msgs_compound(str(img), [{"name": "Add Text",
                                               "instruction": "Add a title."}],
                                   str(ex))
        assert [m["role"] for m in msgs] == ["system", "user", "assistant", "user"]
