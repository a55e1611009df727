"""Eval harness tests: resumable sharded generation with the tiny runtime,
score parsing, per-type aggregation, VIEScore stats."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from gpt_image_edit_tpu.eval import imgedit
from gpt_image_edit_tpu.eval.config import EvalConfig
from gpt_image_edit_tpu.eval.gedit import analyze_scores, write_score_row
from gpt_image_edit_tpu.eval.judge import (
    average_by_type,
    parse_json_scores,
    parse_metric_lines,
    viescore_overall,
)


class TestJudgeParsing:
    def test_metric_lines(self):
        txt = "Following: 4\nQuality: 3\nsome prose\nExtra: notanumber"
        assert parse_metric_lines(txt) == 3.5

    def test_metric_lines_none(self):
        assert parse_metric_lines("no scores here") is None

    def test_average_by_type(self):
        scores = {"a": 4.0, "b": 2.0, "c": 3.0}
        meta = {"a": {"edit_type": "add"}, "b": {"edit_type": "add"}, "c": {"edit_type": "remove"}}
        out = average_by_type(scores, meta)
        assert out == {"add": 3.0, "remove": 3.0}

    def test_viescore(self):
        assert abs(viescore_overall(9.0, 4.0) - 6.0) < 1e-9

    def test_parse_json(self):
        assert parse_json_scores('bla {"score": [7, 8]} bla') == {"score": [7, 8]}


class TestGeditStats:
    def test_analyze(self, tmp_path):
        for group, rows in {
            "color_alter": [(8, 8, "en"), (6, 6, "en"), (9, 9, "cn")],
            "subject-add": [(10, 5, "en")],
        }.items():
            for sc, pq, lang in rows:
                write_score_row(
                    str(tmp_path / f"m_{group}_gpt_score.csv"),
                    {
                        "source_image": "s", "edited_image": "e", "instruction": "i",
                        "sementics_score": sc, "quality_score": pq,
                        "intersection_exist": True, "instruction_language": lang,
                    },
                )
        out = analyze_scores(str(tmp_path), "m", "en")
        assert out["per_group"]["color_alter"]["SC"] == 7.0
        assert out["per_group"]["color_alter"]["n"] == 2
        assert abs(out["per_group"]["subject-add"]["Overall"] - (50 ** 0.5)) < 1e-9
        assert out["summary"]["n"] == 3


class TestImgEditGeneration:
    def test_step1_resumable_sharded(self, tmp_path):
        rng = np.random.default_rng(0)
        src_root = tmp_path / "src"
        os.makedirs(src_root)
        bench = {}
        for i in range(4):
            name = f"img{i}.png"
            Image.fromarray(
                rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
            ).save(src_root / name)
            bench[f"k{i}"] = {"id": name, "prompt": f"edit {i}", "edit_type": "add"}
        data_json = tmp_path / "bench.json"
        data_json.write_text(json.dumps(bench))

        cfg = EvalConfig(
            tiny=True,
            output_dir=str(tmp_path / "out"),
            data_json=str(data_json),
            image_root=str(src_root),
            num_inference_steps=2,
            rank=0,
            world_size=2,
        )
        written = imgedit.step1_generate(cfg)
        assert len(written) == 2  # rank 0 of 2 -> half the samples
        # resumability: second run writes nothing
        assert imgedit.step1_generate(cfg) == []

        # batched generation (batch_size>1): same-shape consecutive samples
        # run through ONE edit_batch call and match the serial outputs
        import dataclasses as _dc

        from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

        rt = UnivaRuntime(tiny=True, seed=cfg.seed)
        calls = {"batch": 0}
        orig_batch = rt.edit_batch
        rt.edit_batch = lambda reqs: calls.__setitem__(
            "batch", calls["batch"] + 1
        ) or orig_batch(reqs)
        cfg_b = _dc.replace(
            cfg, output_dir=str(tmp_path / "out_b"), batch_size=2
        )
        import os as _os

        written_b = imgedit.step1_generate(cfg_b, runtime=rt)
        assert len(written_b) == 2 and calls["batch"] == 1
        for pb in written_b:
            serial = _os.path.join(
                cfg.output_dir, _os.path.basename(pb)
            )
            a = np.asarray(Image.open(serial), dtype=np.int16)
            b = np.asarray(Image.open(pb), dtype=np.int16)
            # batched (b=2) and serial (b=1) programs are the same code but
            # XLA tiles them differently, so low-order-bit drift amplifies
            # over the denoise steps; a few uint8 counts is equivalence
            # (the adaLN-hoist batched einsum moved this from <=2 to <=3)
            assert np.abs(a - b).max() <= 4

    def test_step3_aggregate(self, tmp_path):
        scores = {"k0": "A: 4\nB: 2", "k1": "A: 3\nB: 3"}
        meta = {"k0": {"edit_type": "add"}, "k1": {"edit_type": "remove"}}
        sj = tmp_path / "scores.json"
        mj = tmp_path / "meta.json"
        sj.write_text(json.dumps(scores))
        mj.write_text(json.dumps(meta))
        out = imgedit.step3_aggregate(str(sj), str(mj))
        assert out["per_type"] == {"add": 3.0, "remove": 3.0}
        assert out["overall"] == 3.0
