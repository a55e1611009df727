"""Tests for round-2 dataset/training parity features:

- multi-reference conditioning in TRAINING (ref:train_denoiser.py:1006-1055,
  data_collator.py:6-47): K ref latents concatenated with modality ids 1..K,
  zero-padded refs excluded via attention masking
- CE labels (assistant spans) emitted by the dataset (ref:qwen2vl_dataset.py:585-599)
- Step1X quote-protecting tokenization wiring (ref :556-575)
- multi-resolution bucket selection + per-bucket batching
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from gpt_image_edit_tpu.data import constants as C
from gpt_image_edit_tpu.data.collator import Collator
from gpt_image_edit_tpu.data.dataset import EditDataset, pick_bucket
from gpt_image_edit_tpu.data.tokenizer import FakeTokenizer
from gpt_image_edit_tpu.models.qwen2p5vl.config import VisionConfig


def _write_sample(tmp_path, name, n_refs, h=64, w=64, instruction="turn the cat blue"):
    rng = np.random.default_rng(hash(name) % 2**31)
    paths = []
    for i in range(n_refs + 1):
        p = tmp_path / f"{name}_{i}.png"
        Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8)).save(p)
        paths.append(p.name)
    return {
        "conversations": [
            {"from": "human", "value": f"{instruction} " + "<image>" * n_refs},
            {"from": "gpt", "value": "<gen_image>"},
        ],
        "image": paths,
    }


def _dataset(tmp_path, items, **kw):
    jf = tmp_path / "data.json"
    jf.write_text(json.dumps(items))
    dt = tmp_path / "data.txt"
    dt.write_text(f"{tmp_path},{jf},true\n")
    return EditDataset(
        tokenizer=FakeTokenizer(), data_txt=str(dt), height=64, width=64,
        min_pixels=56 * 56, max_pixels=56 * 56, notry=True, **kw,
    )


class TestMultiRefData:
    def test_all_refs_kept(self, tmp_path):
        ds = _dataset(tmp_path, [_write_sample(tmp_path, "a", n_refs=3)])
        s = ds[0]
        assert s["ref_pixels"].shape == (3, 64, 64, 3)
        assert s["grid_thw"].shape == (3, 3)
        # 3 expansions happened
        n_img_tokens = (np.asarray(s["input_ids"]) == C.IMAGE_TOKEN_ID).sum()
        assert n_img_tokens == np.prod(s["grid_thw"], axis=1).sum() // 4

    def test_collator_pads_ref_counts(self, tmp_path):
        items = [
            _write_sample(tmp_path, "a", n_refs=2),
            _write_sample(tmp_path, "b", n_refs=1),
        ]
        ds = _dataset(tmp_path, items)
        coll = Collator(VisionConfig(), padding_side="left")
        batch = coll([ds[0], ds[1]])
        assert batch["ref_pixels"].shape == (2, 2, 64, 64, 3)
        np.testing.assert_array_equal(batch["ref_valid"], [[True, True], [True, False]])
        # padded slot is zeros
        assert np.all(batch["ref_pixels"][1, 1] == 0)

    def test_single_ref_stays_legacy_4d(self, tmp_path):
        ds = _dataset(tmp_path, [_write_sample(tmp_path, "a", 1),
                                 _write_sample(tmp_path, "b", 1)])
        batch = Collator(VisionConfig())([ds[0], ds[1]])
        assert batch["ref_pixels"].shape == (2, 64, 64, 3)
        assert "ref_valid" not in batch

    def test_labels_mark_assistant_spans(self, tmp_path):
        ds = _dataset(tmp_path, [_write_sample(tmp_path, "a", 1)])
        s = ds[0]
        labels = np.asarray(s["labels"])
        ids = np.asarray(s["input_ids"])
        assert labels.shape == ids.shape
        # the generation trigger (assistant span) is labeled
        assert labels[-1] == ids[-1] == C.VISION_START_ID
        # user/system spans are ignored
        assert (labels == -100).sum() > 0

    def test_instruction_extracted(self, tmp_path):
        ds = _dataset(tmp_path, [_write_sample(tmp_path, "a", 1, instruction="add a hat")])
        assert ds[0]["instruction"].strip() == "add a hat"


class TestMultiRefTrainStep:
    def _loss(self, batch, qcfg, fcfg, vcfg, vae_params, params):
        from gpt_image_edit_tpu.training.train_step import flow_matching_loss

        return float(
            flow_matching_loss(
                params,
                qwen_cfg=qcfg, flux_cfg=fcfg, vae_cfg=vcfg,
                vae_params=vae_params, batch=batch, rng=jax.random.key(7),
                compute_dtype=jnp.float32,
            )
        )

    @pytest.fixture(scope="class")
    def models(self):
        import dataclasses

        from gpt_image_edit_tpu.models.flux import FluxConfig, init_flux
        from gpt_image_edit_tpu.models.qwen2p5vl import Qwen2p5VLConfig, init_qwen
        from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae

        qcfg = Qwen2p5VLConfig.tiny()
        fcfg = dataclasses.replace(FluxConfig.tiny(), joint_attention_dim=qcfg.projector_out)
        vcfg = VaeConfig.tiny()
        params = {
            "qwen": init_qwen(jax.random.key(0), qcfg),
            "flux": init_flux(jax.random.key(1), fcfg),
        }
        vae_params = init_vae(jax.random.key(2), vcfg)
        return qcfg, fcfg, vcfg, params, vae_params

    def _base_batch(self, qcfg, b=2, hw=32):
        from gpt_image_edit_tpu.models.qwen2p5vl.rope_index import get_rope_index

        ids = [101, 102, 103, qcfg.vision_start_token_id]
        input_ids = np.array([ids] * b, dtype=np.int64)
        attn = np.ones_like(input_ids)
        pos, _ = get_rope_index(
            input_ids, None, attn,
            spatial_merge_size=qcfg.vision.spatial_merge_size,
            image_token_id=qcfg.image_token_id,
            video_token_id=qcfg.video_token_id,
            vision_start_token_id=qcfg.vision_start_token_id,
        )
        rng = np.random.default_rng(0)
        return {
            "input_ids": jnp.asarray(input_ids),
            "position_ids": jnp.asarray(pos),
            "attention_mask": jnp.asarray(attn),
            "target_pixels": jnp.asarray(
                rng.uniform(-1, 1, (b, hw, hw, 3)).astype(np.float32)
            ),
        }, rng

    def test_multiref_loss_finite(self, models):
        qcfg, fcfg, vcfg, params, vae_params = models
        batch, rng = self._base_batch(qcfg)
        b, hw = 2, 32
        refs = rng.uniform(-1, 1, (b, 3, hw, hw, 3)).astype(np.float32)
        batch["ref_pixels"] = jnp.asarray(refs)
        batch["ref_valid"] = jnp.asarray([[True, True, True], [True, True, False]])
        loss = self._loss(batch, qcfg, fcfg, vcfg, vae_params, params)
        assert np.isfinite(loss)

    def test_padded_ref_masked_out(self, models):
        """A K=2 batch whose second ref slot is invalid must produce the SAME
        loss as the K=1 batch with just the valid ref — proving zero-padded
        refs are fully masked from attention."""
        qcfg, fcfg, vcfg, params, vae_params = models
        b, hw = 2, 32
        batch1, rng = self._base_batch(qcfg)
        ref = rng.uniform(-1, 1, (b, hw, hw, 3)).astype(np.float32)

        single = dict(batch1)
        single["ref_pixels"] = jnp.asarray(ref[:, None])  # (B, 1, H, W, 3)
        single["ref_valid"] = jnp.ones((b, 1), bool)
        loss_single = self._loss(single, qcfg, fcfg, vcfg, vae_params, params)

        padded = dict(batch1)
        rp = np.zeros((b, 2, hw, hw, 3), np.float32)
        rp[:, 0] = ref
        padded["ref_pixels"] = jnp.asarray(rp)
        padded["ref_valid"] = jnp.asarray([[True, False]] * b)
        loss_padded = self._loss(padded, qcfg, fcfg, vcfg, vae_params, params)

        np.testing.assert_allclose(loss_single, loss_padded, rtol=2e-5)


class TestStep1XWiring:
    def test_quote_protection_in_dataset(self, tmp_path):
        item = _write_sample(tmp_path, "a", 1, instruction='write "STOP" on the sign')
        plain = _dataset(tmp_path, [item], use_step1x=False)[0]
        protected = _dataset(tmp_path, [item], use_step1x=True)[0]
        # glyph protection splits the quoted word into characters -> more tokens
        assert len(protected["input_ids"]) > len(plain["input_ids"])


class TestResolutionBuckets:
    def test_pick_bucket(self):
        buckets = [(64, 64), (48, 96), (96, 48)]
        assert pick_bucket(buckets, 100, 100) == (64, 64)
        assert pick_bucket(buckets, 50, 100) == (48, 96)
        assert pick_bucket(buckets, 100, 50) == (96, 48)

    def test_dataset_multibucket(self, tmp_path):
        items = [
            _write_sample(tmp_path, "sq", 1, h=64, w=64),
            _write_sample(tmp_path, "wide", 1, h=48, w=96),
        ]
        ds = _dataset(tmp_path, items, resolution_buckets=[[64, 64], [48, 96]])
        shapes = {ds[i]["target_pixels"].shape for i in range(2)}
        assert shapes == {(64, 64, 3), (48, 96, 3)}
        # ref is fit to the SAME bucket as its target
        for i in range(2):
            s = ds[i]
            assert s["ref_pixels"].shape[1:] == s["target_pixels"].shape

    def test_loader_batches_are_homogeneous(self, tmp_path):
        from gpt_image_edit_tpu.data.loader import BatchLoader

        items = [
            _write_sample(tmp_path, f"sq{i}", 1, h=64, w=64) for i in range(3)
        ] + [
            _write_sample(tmp_path, f"wide{i}", 1, h=48, w=96) for i in range(3)
        ]
        ds = _dataset(tmp_path, items, resolution_buckets=[[64, 64], [48, 96]])
        loader = BatchLoader(ds, Collator(VisionConfig()), batch_size=2, num_workers=2)
        it = iter(loader)
        seen = set()
        for _ in range(4):
            b = next(it)
            shape = b["target_pixels"].shape
            assert shape[0] == 2
            seen.add(shape[1:3])
        loader.stop()
        assert seen <= {(64, 64), (48, 96)}


class TestOcrInjection:
    def test_phrases_injected_before_eos(self, tmp_path, monkeypatch):
        """OCR phrases are appended before the user turn's eos and the image
        indices advance across images (ref:qwen2vl_dataset.py:531-548).
        paddleocr isn't installed here, so the per-image extractor is
        monkeypatched; the wiring is what's under test."""
        from gpt_image_edit_tpu.utils import ocr as ocr_mod

        calls = []

        def fake_ocr(img, idx):
            calls.append(idx)
            return f'texts "SIGN{idx}" at top-left'

        monkeypatch.setattr(ocr_mod, "ocr_phrases_for_image", fake_ocr)
        item = _write_sample(tmp_path, "a", n_refs=2, instruction="read the signs")
        ds = _dataset(tmp_path, [item], ocr_enhancer=True)
        s = ds[0]
        assert calls == [0, 1]
        assert 'SIGN0' in s["prompt"] and 'SIGN1' in s["prompt"]
        # injected into the user turn (before its <|im_end|>), not after
        user_turn = s["prompt"].split("<|im_start|>assistant")[0]
        assert "SIGN0" in user_turn

    def test_word_budget_truncation(self, tmp_path, monkeypatch):
        from gpt_image_edit_tpu.utils import ocr as ocr_mod

        long_phrase = " ".join(f"w{i}" for i in range(300))
        monkeypatch.setattr(ocr_mod, "ocr_phrases_for_image", lambda i, j: long_phrase)
        item = _write_sample(tmp_path, "a", n_refs=1)
        s = _dataset(tmp_path, [item], ocr_enhancer=True)[0]
        # ref truncates the OCR sentence block at 256 words
        injected = s["prompt"].split("<|im_start|>user\n")[1].split("<|im_end|>")[0]
        assert "w255" in injected and "w256" not in injected
