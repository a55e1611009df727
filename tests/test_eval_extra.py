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
