"""Data pipeline tests: image processor golden vs HF, dataset synth mode,
collator shapes + rope index integration, region masks."""

import numpy as np
import pytest
from PIL import Image

from gpt_image_edit_tpu.data import constants as C
from gpt_image_edit_tpu.data.collator import Collator
from gpt_image_edit_tpu.data.dataset import EditDataset
from gpt_image_edit_tpu.data.image_processing import (
    preprocess_vit_patches,
    smart_resize,
)
from gpt_image_edit_tpu.data.masks import region_weight_tokens
from gpt_image_edit_tpu.data.tokenizer import FakeTokenizer
from gpt_image_edit_tpu.models.qwen2p5vl.config import VisionConfig


class TestImageProcessing:
    def test_smart_resize_matches_hf(self):
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            smart_resize as hf_smart_resize,
        )

        for h, w in [(480, 640), (1024, 1024), (300, 500), (97, 211)]:
            ours = smart_resize(h, w, 28, 200704, 200704)
            ref = hf_smart_resize(h, w, 28, 200704, 200704)
            assert ours == tuple(ref), (h, w, ours, ref)

    def test_patches_match_hf_processor(self):
        from transformers import Qwen2VLImageProcessor

        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 256, (120, 200, 3), dtype=np.uint8))
        proc = Qwen2VLImageProcessor(min_pixels=56 * 56, max_pixels=200704)
        ref = proc(images=[img], return_tensors="np")
        ours, grid = preprocess_vit_patches(
            img, min_pixels=56 * 56, max_pixels=200704
        )
        np.testing.assert_array_equal(ref["image_grid_thw"][0], np.asarray(grid))
        np.testing.assert_allclose(ours, ref["pixel_values"], atol=2e-3)


class TestDatasetAndCollator:
    def test_synthetic_end_to_end(self):
        ds = EditDataset(
            tokenizer=FakeTokenizer(), random_data=True, height=64, width=64,
            min_pixels=56 * 56, max_pixels=56 * 56,
        )
        sample = ds[0]
        assert sample["target_pixels"].shape == (64, 64, 3)
        assert sample["ref_pixels"].shape == (1, 64, 64, 3)  # (K, H, W, 3)
        # prompt contains expansion: begin + pads + end, plus gen trigger
        ids = sample["input_ids"]
        assert (ids == C.IMAGE_TOKEN_ID).sum() == np.prod(sample["grid_thw"][0]) // 4
        assert ids[-1] == C.VISION_START_ID  # generation trigger
        assert sample["weight_tokens"].shape == (16,)  # (64/16)^2

        coll = Collator(VisionConfig(), padding_side="left")
        batch = coll([ds[0], ds[1]])
        assert batch["input_ids"].shape[0] == 2
        assert batch["input_ids"].shape[1] % 64 == 0
        assert batch["position_ids"].shape == (3, 2, batch["input_ids"].shape[1])
        assert batch["pixel_patches"].shape[1] == 1176
        assert batch["ref_pixels"].shape == (2, 64, 64, 3)
        # left padding: mask is 0 at the left edge
        assert batch["attention_mask"][0, 0] == 0 or (batch["attention_mask"][0] == 1).all()

    def test_real_data_txt(self, tmp_path):
        rng = np.random.default_rng(1)
        src = tmp_path / "src.png"
        tgt = tmp_path / "tgt.png"
        Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)).save(src)
        Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)).save(tgt)
        import json

        items = [
            {
                "conversations": [
                    {"from": "human", "value": "turn the cat blue <image>"},
                    {"from": "gpt", "value": "<gen_image>"},
                ],
                "image": [src.name, tgt.name],
            }
        ]
        jf = tmp_path / "data.json"
        jf.write_text(json.dumps(items))
        dt = tmp_path / "data.txt"
        dt.write_text(f"{tmp_path},{jf},true\n")
        ds = EditDataset(
            tokenizer=FakeTokenizer(), data_txt=str(dt), height=64, width=64,
            min_pixels=56 * 56, max_pixels=56 * 56, notry=True,
        )
        assert len(ds) == 1
        s = ds[0]
        assert s["ref_pixels"] is not None
        assert s["target_pixels"].shape == (64, 64, 3)

    def test_drop_prompt(self):
        ds = EditDataset(
            tokenizer=FakeTokenizer(), random_data=True, height=64, width=64,
            min_pixels=56 * 56, max_pixels=56 * 56, drop_prompt_rate=1.0,
        )
        assert "Generate an image." in ds[0]["prompt"]


class TestMasks:
    def test_changed_region_weighted(self):
        ref = np.zeros((64, 64, 3), np.float32)
        tgt = ref.copy()
        tgt[:32, :32] = 1.0  # quarter changed
        w = region_weight_tokens(ref, tgt, weight_type="log")
        assert w.shape == (16,)
        w2 = w.reshape(4, 4)
        assert (w2[:2, :2] > 1.0).all()   # changed quadrant upweighted
        assert (w2[2:, 2:] == 1.0).all()  # untouched area weight 1
        assert abs(w2[0, 0] - (np.log2(4) + 1)) < 0.5

    def test_no_change_all_ones(self):
        ref = np.zeros((64, 64, 3), np.float32)
        w = region_weight_tokens(ref, ref.copy(), weight_type="log")
        np.testing.assert_array_equal(w, np.ones(16, np.float32))


class TestLlavaDataset:
    def test_llava_protocol(self, tmp_path):
        """Legacy LLaVA dataset: fixed 729-token protocol, labels, gen trigger
        (ref:univa/dataset/llava_dataset.py)."""
        import json

        from gpt_image_edit_tpu.data import get_dataset_cls

        rng = np.random.default_rng(0)
        for name in ("src.png", "tgt.png"):
            Image.fromarray(
                rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            ).save(tmp_path / name)
        items = [{
            "conversations": [
                {"from": "human", "value": "make it blue <image>"},
                {"from": "gpt", "value": "<gen_image>"},
            ],
            "image": ["src.png", "tgt.png"],
        }]
        (tmp_path / "d.json").write_text(json.dumps(items))
        (tmp_path / "data.txt").write_text(f"{tmp_path},{tmp_path / 'd.json'}\n")

        cls = get_dataset_cls("llava")
        ds = cls(
            tokenizer=FakeTokenizer(), data_txt=str(tmp_path / "data.txt"),
            image_size=32, target_size=64, only_generated_task=True, notry=True,
        )
        s = ds[0]
        ids = np.asarray(s["input_ids"])
        assert (ids == C.IMAGE_TOKEN_ID).sum() == 729  # fixed LLaVA grid
        assert ids[-1] == C.VISION_START_ID            # generation trigger
        labels = np.asarray(s["labels"])
        assert labels[-1] == C.VISION_START_ID and (labels == -100).sum() > 0
        assert s["pixel_values"].shape == (1, 32, 32, 3)
        assert s["target_pixels"].shape == (64, 64, 3)


class TestOcrPhraseProtocol:
    """9-grid phrase format parity vs the reference's own pure functions
    (ref:univa/utils/get_ocr.py:33-121), exec'd from the reference source
    (paddleocr itself stays an optional host dependency)."""

    def _ref_fns(self):
        import ast

        path = "/root/reference/univa/utils/get_ocr.py"
        tree = ast.parse(open(path).read())
        wanted = {
            "calculate_position", "process_dataframe",
            "format_for_text_to_image_condensed",
        }
        fns = [n for n in tree.body
               if isinstance(n, ast.FunctionDef) and n.name in wanted]
        assert len(fns) == len(wanted)
        import pandas as pd
        ns = {"pd": pd}
        exec(compile(ast.Module(fns, []), path, "exec"), ns)
        return ns

    def test_position_and_sentence_parity(self):
        import pandas as pd

        from gpt_image_edit_tpu.utils.ocr import (
            filter_and_position,
            format_condensed,
        )

        ref = self._ref_fns()
        w, h = 300, 150
        rows = [
            ([[10, 10], [50, 10], [50, 30], [10, 30]], "STOP", 0.99),
            ([[120, 60], [180, 60], [180, 90], [120, 90]], "GO", 0.95),
            ([[250, 120], [290, 120], [290, 140], [250, 140]], "EXIT", 0.97),
            ([[10, 120], [60, 120], [60, 140], [10, 140]], "low-conf", 0.5),
            ([[15, 12], [52, 12], [52, 28], [15, 28]], "SLOW", 0.92),
        ]
        # reference pipeline: DataFrame -> filter+position -> sentence
        df = pd.DataFrame(rows, columns=["box", "text", "score"])
        df_p = ref["process_dataframe"](df, w, h)
        for n in (1, 3, 20):
            expect = ref["format_for_text_to_image_condensed"](df_p, n)
            got = format_condensed(filter_and_position(rows, w, h), n)
            assert got == expect, (got, expect)

    def test_grid_cells_match_reference(self):
        from gpt_image_edit_tpu.utils.ocr import calculate_position

        ref = self._ref_fns()
        w, h = 99, 99
        for cx in (5, 40, 60, 95):
            for cy in (5, 40, 60, 95):
                box = [[cx - 2, cy - 2], [cx + 2, cy - 2],
                       [cx + 2, cy + 2], [cx - 2, cy + 2]]
                assert calculate_position(box, w, h) == ref["calculate_position"](box, w, h)

    def test_empty_returns_empty(self):
        from gpt_image_edit_tpu.utils.ocr import format_condensed

        assert format_condensed([], 1) == ""
