"""Golden parity: Qwen2-VL variant vs HF transformers (tiny config)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from gpt_image_edit_tpu.models.qwen2vl.model import (  # noqa: E402
    Qwen2VLConfig,
    apply as apply_q2,
    convert_qwen2vl,
    vision_apply,
    vision_rope,
)
from gpt_image_edit_tpu.models.qwen2p5vl.rope_index import get_rope_index  # noqa: E402
from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource  # noqa: E402

IMG, VID, VS, VE = 7, 8, 5, 6


@pytest.fixture(scope="module")
def setup():
    from transformers import Qwen2VLConfig as HFConfig
    from transformers import Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=48, num_heads=2, in_channels=3,
            patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
            mlp_ratio=2,
        ),
        hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=96, vocab_size=1000,
        rope_theta=1000000.0, rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=IMG, video_token_id=VID,
        vision_start_token_id=VS, vision_end_token_id=VE,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    hf = Qwen2VLForConditionalGeneration(hf_cfg).eval().float()
    cfg = Qwen2VLConfig.tiny()
    cfg = __import__("dataclasses").replace(
        cfg,
        vision=__import__("dataclasses").replace(cfg.vision, mlp_hidden=64),
        image_token_id=IMG, video_token_id=VID,
        vision_start_token_id=VS, vision_end_token_id=VE,
    )
    params = convert_qwen2vl(TensorSource.from_state_dict(hf.state_dict()), cfg)
    return hf, cfg, params


class TestQwen2VL:
    def test_vision_matches_hf(self, setup):
        hf, cfg, params = setup
        grid = np.array([(1, 8, 8)], dtype=np.int64)
        px = np.random.default_rng(0).standard_normal(
            (64, cfg.vision.patch_dim)
        ).astype(np.float32)
        with torch.no_grad():
            ref = hf.model.visual(
                torch.tensor(px), grid_thw=torch.tensor(grid)
            ).numpy()
        cos, sin, seg = vision_rope(grid, cfg.vision)
        ours = np.asarray(
            vision_apply(params["visual"], cfg.vision, jnp.asarray(px), cos, sin, seg)
        )
        np.testing.assert_allclose(ours, ref, atol=3e-4)

    def test_logits_match_hf(self, setup):
        hf, cfg, params = setup
        grid = np.array([(1, 8, 8)], dtype=np.int64)
        px = np.random.default_rng(1).standard_normal(
            (64, cfg.vision.patch_dim)
        ).astype(np.float32)
        ids = [VS] + [IMG] * 16 + [VE] + [11, 12, 13]
        input_ids = np.array([ids], dtype=np.int64)
        attn = np.ones_like(input_ids)
        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attn),
                pixel_values=torch.tensor(px),
                image_grid_thw=torch.tensor(grid),
            ).logits.numpy()
        pos, _ = get_rope_index(
            input_ids, grid, attn, spatial_merge_size=2,
            image_token_id=IMG, video_token_id=VID, vision_start_token_id=VS,
        )
        ours = np.asarray(
            apply_q2(
                params, cfg,
                input_ids=jnp.asarray(input_ids),
                position_ids=jnp.asarray(pos),
                attention_mask=jnp.asarray(attn),
                pixel_patches=jnp.asarray(px),
                vision_rope_args=vision_rope(grid, cfg.vision),
                output_type="lvlm",
            )
        )
        np.testing.assert_allclose(ours, ref, atol=1e-3)
