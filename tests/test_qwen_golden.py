"""Golden parity tests: our Qwen2.5-VL vs HF transformers (tiny config).

Builds a randomly-initialized torch Qwen2_5_VLForConditionalGeneration,
translates its weights with utils.ckpt_convert, and compares vision-tower
outputs, LM hidden states, and logits. This simultaneously validates the
model numerics AND the checkpoint converter on real HF naming.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gpt_image_edit_tpu.models.qwen2p5vl import (  # noqa: E402
    Qwen2p5VLConfig,
    TextConfig,
    VisionConfig,
    apply_qwen,
    init_qwen,
)
from gpt_image_edit_tpu.models.qwen2p5vl import vision as vision_mod  # noqa: E402
from gpt_image_edit_tpu.models.qwen2p5vl.rope_index import get_rope_index  # noqa: E402
from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource, convert_qwen  # noqa: E402

IMAGE_TOKEN = 7
VIDEO_TOKEN = 8
VISION_START = 5
VISION_END = 6


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2_5_VLConfig as HFConfig
    from transformers import Qwen2_5_VLForConditionalGeneration

    torch.manual_seed(0)
    cfg = HFConfig(
        vision_config=dict(
            depth=2,
            hidden_size=32,
            intermediate_size=64,
            num_heads=2,
            in_channels=3,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            window_size=16,
            out_hidden_size=48,
            fullatt_block_indexes=[1],
        ),
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        vocab_size=1000,
        rope_theta=1000000.0,
        rms_norm_eps=1e-6,  # the released 7B uses 1e-6; HF tiny default is 1e-5
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        image_token_id=IMAGE_TOKEN,
        video_token_id=VIDEO_TOKEN,
        vision_start_token_id=VISION_START,
        vision_end_token_id=VISION_END,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def our_setup(hf_model):
    cfg = Qwen2p5VLConfig(
        vision=VisionConfig(
            depth=2,
            hidden_size=32,
            intermediate_size=64,
            num_heads=2,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            window_size=16,
            out_hidden_size=48,
            fullatt_block_indexes=(1,),
        ),
        text=TextConfig(
            vocab_size=1000,
            hidden_size=48,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            intermediate_size=96,
            mrope_section=(2, 2, 2),
        ),
        image_token_id=IMAGE_TOKEN,
        video_token_id=VIDEO_TOKEN,
        vision_start_token_id=VISION_START,
        vision_end_token_id=VISION_END,
        projector_in=48,
        projector_out=32,
    )
    src = TensorSource.from_state_dict(hf_model.state_dict())
    params = convert_qwen(src, cfg)
    return cfg, params


def _pixels(grid_thw, patch_dim, seed=0):
    n = int(np.prod(grid_thw, axis=1).sum())
    return np.random.default_rng(seed).standard_normal((n, patch_dim)).astype(np.float32)


class TestVisionTower:
    @pytest.mark.parametrize("grid", [[(1, 8, 8)], [(1, 4, 12)], [(1, 8, 8), (1, 4, 4)]])
    def test_matches_hf(self, hf_model, our_setup, grid):
        cfg, params = our_setup
        grid_thw = np.array(grid, dtype=np.int64)
        px = _pixels(grid_thw, cfg.vision.patch_dim)

        with torch.no_grad():
            ref = hf_model.model.visual(
                torch.tensor(px), grid_thw=torch.tensor(grid_thw)
            ).numpy()

        aux = vision_mod.vision_precompute(grid_thw, cfg.vision)
        ours = np.asarray(
            vision_mod.apply(params["visual"], cfg.vision, jnp.asarray(px), aux)
        )
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestFullModel:
    def _build_inputs(self, cfg):
        # <vision_start> 16x<image_pad> <vision_end> + text
        grid_thw = np.array([(1, 8, 8)], dtype=np.int64)
        n_merged = 64 // 4
        ids = [VISION_START] + [IMAGE_TOKEN] * n_merged + [VISION_END] + [11, 12, 13, 14]
        input_ids = np.array([ids], dtype=np.int64)
        px = _pixels(grid_thw, cfg.vision.patch_dim, seed=3)
        return input_ids, grid_thw, px

    def test_hidden_and_logits_match(self, hf_model, our_setup):
        cfg, params = our_setup
        input_ids, grid_thw, px = self._build_inputs(cfg)
        attn = np.ones_like(input_ids)

        with torch.no_grad():
            out = hf_model(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attn),
                pixel_values=torch.tensor(px),
                image_grid_thw=torch.tensor(grid_thw),
                output_hidden_states=True,
            )
        ref_logits = out.logits.numpy()

        pos_ids, deltas = get_rope_index(
            input_ids,
            grid_thw,
            attn,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=IMAGE_TOKEN,
            video_token_id=VIDEO_TOKEN,
            vision_start_token_id=VISION_START,
        )
        aux = vision_mod.vision_precompute(grid_thw, cfg.vision)
        ours = np.asarray(
            apply_qwen(
                params,
                cfg,
                input_ids=jnp.asarray(input_ids),
                position_ids=jnp.asarray(pos_ids),
                attention_mask=jnp.asarray(attn),
                pixel_patches=jnp.asarray(px),
                vision_aux=aux,
                output_type="lvlm",
            )
        )
        np.testing.assert_allclose(ours, ref_logits, atol=5e-4)

    def test_rope_index_matches_hf(self, hf_model, our_setup):
        cfg, params = our_setup
        input_ids, grid_thw, px = self._build_inputs(cfg)
        attn = np.ones_like(input_ids)
        ref_pos, ref_delta = hf_model.model.get_rope_index(
            torch.tensor(input_ids), torch.tensor(grid_thw), None, None,
            torch.tensor(attn),
        )
        pos, delta = get_rope_index(
            input_ids, grid_thw, attn,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=IMAGE_TOKEN, video_token_id=VIDEO_TOKEN,
            vision_start_token_id=VISION_START,
        )
        np.testing.assert_array_equal(pos, ref_pos.numpy())
        np.testing.assert_array_equal(delta, ref_delta.numpy())

    def test_generate_greedy_matches_hf(self, hf_model, our_setup):
        """KV-cache greedy decode == HF generate(do_sample=False)."""
        from gpt_image_edit_tpu.models.qwen2p5vl.model import generate_greedy

        cfg, params = our_setup
        input_ids, grid_thw, px = self._build_inputs(cfg)
        attn = np.ones_like(input_ids)
        with torch.no_grad():
            ref = hf_model.generate(
                input_ids=torch.tensor(input_ids),
                attention_mask=torch.tensor(attn),
                pixel_values=torch.tensor(px),
                image_grid_thw=torch.tensor(grid_thw),
                max_new_tokens=8,
                do_sample=False,
                eos_token_id=999,
                pad_token_id=0,
            )
        ref_new = ref[0, input_ids.shape[1]:].tolist()

        pos_ids, deltas = get_rope_index(
            input_ids, grid_thw, attn,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=IMAGE_TOKEN, video_token_id=VIDEO_TOKEN,
            vision_start_token_id=VISION_START,
        )
        aux = vision_mod.vision_precompute(grid_thw, cfg.vision)
        ours = generate_greedy(
            params, cfg,
            input_ids=jnp.asarray(input_ids),
            position_ids=jnp.asarray(pos_ids),
            rope_delta=int(deltas[0, 0]),
            attention_mask=jnp.asarray(attn),
            pixel_patches=jnp.asarray(px),
            vision_aux=aux,
            max_new_tokens=8,
            eos_token_id=999,
        )
        assert ours == ref_new[: len(ours)] and len(ours) >= 6, (ours, ref_new)

    def test_shortcut_and_residual_blending(self, our_setup):
        """shortcut_image_embeds / vlm_residual_image_factor change only the
        image-token rows of the denoise embeds (ref :504-519)."""
        import dataclasses

        cfg, params = our_setup
        params = dict(params)
        params["projector"] = init_qwen(jax.random.key(0), cfg)["projector"]
        input_ids, grid_thw, px = self._build_inputs(cfg)
        pos_ids, _ = get_rope_index(
            input_ids, grid_thw, np.ones_like(input_ids),
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=IMAGE_TOKEN, video_token_id=VIDEO_TOKEN,
            vision_start_token_id=VISION_START,
        )
        aux = vision_mod.vision_precompute(grid_thw, cfg.vision)
        kw = dict(
            input_ids=jnp.asarray(input_ids),
            position_ids=jnp.asarray(pos_ids),
            pixel_patches=jnp.asarray(px),
            vision_aux=aux,
            output_type="denoise_embeds",
        )
        base = np.asarray(apply_qwen(params, cfg, **kw))
        resid = np.asarray(
            apply_qwen(params, cfg, vlm_residual_image_factor=0.5, **kw)
        )
        cfg_sc = dataclasses.replace(cfg, shortcut_image_embeds=True)
        short = np.asarray(apply_qwen(params, cfg_sc, **kw))
        img_mask = input_ids[0] == IMAGE_TOKEN
        for variant in (resid, short):
            assert np.abs(variant[0, img_mask] - base[0, img_mask]).max() > 1e-5
            np.testing.assert_allclose(
                variant[0, ~img_mask], base[0, ~img_mask], atol=1e-6
            )

    def test_denoise_embeds_shape(self, our_setup):
        cfg, params = our_setup
        # attach a random projector (merged ckpts carry it; HF one doesn't)
        params = dict(params)
        params["projector"] = init_qwen(jax.random.key(0), cfg)["projector"]
        input_ids, grid_thw, px = self._build_inputs(cfg)
        pos_ids, _ = get_rope_index(
            input_ids, grid_thw, np.ones_like(input_ids),
            spatial_merge_size=cfg.vision.spatial_merge_size,
            image_token_id=IMAGE_TOKEN, video_token_id=VIDEO_TOKEN,
            vision_start_token_id=VISION_START,
        )
        aux = vision_mod.vision_precompute(grid_thw, cfg.vision)
        out = apply_qwen(
            params, cfg,
            input_ids=jnp.asarray(input_ids),
            position_ids=jnp.asarray(pos_ids),
            pixel_patches=jnp.asarray(px),
            vision_aux=aux,
            output_type="denoise_embeds",
        )
        assert out.shape == (1, input_ids.shape[1], cfg.projector_out)
