"""Golden parity: T5 encoder and CLIP text encoder vs HF transformers."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from gpt_image_edit_tpu.models.clip import ClipTextConfig, apply as clip_apply, convert_clip  # noqa: E402
from gpt_image_edit_tpu.models.t5 import T5Config, apply as t5_apply, convert_t5  # noqa: E402
from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource  # noqa: E402


class TestT5:
    def test_matches_hf(self):
        from transformers import T5Config as HFT5Config, T5EncoderModel

        torch.manual_seed(0)
        hf_cfg = HFT5Config(
            vocab_size=512, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_heads=4, feed_forward_proj="gated-gelu", tie_word_embeddings=False,
        )
        hf = T5EncoderModel(hf_cfg).eval().float()
        cfg = T5Config.tiny()
        params = convert_t5(TensorSource.from_state_dict(hf.state_dict()), cfg)

        ids = np.random.default_rng(0).integers(0, 512, (2, 11))
        mask = np.ones_like(ids)
        mask[1, -3:] = 0
        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        ours = np.asarray(
            t5_apply(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        )
        # compare non-padded positions only (HF also computes pads, same way,
        # but keep the check strict on real tokens)
        np.testing.assert_allclose(ours[0], ref[0], atol=3e-4)
        np.testing.assert_allclose(ours[1, :-3], ref[1, :-3], atol=3e-4)

    def test_quantized_t5_close_to_float(self):
        """quantize_t5 serving mode (the 9.4GB -> 4.7/2.4GB offload staging
        lever): int8 weight-only T5 kernels run through linear()'s dict
        dispatch and stay within the frozen-encoder error budget."""
        import jax

        from gpt_image_edit_tpu.models import t5 as t5_mod
        from gpt_image_edit_tpu.utils.quantize import quantize_params

        cfg = T5Config.tiny()
        params = t5_mod.init(jax.random.key(0), cfg)
        qparams = quantize_params(params, mode="weight_only", min_size=0)
        ids = jnp.asarray(
            np.random.default_rng(3).integers(0, 512, (2, 11))
        )
        mask = jnp.ones_like(ids)
        ref = np.asarray(t5_apply(params, cfg, ids, mask))
        q = np.asarray(t5_apply(qparams, cfg, ids, mask))
        rel = np.linalg.norm(q - ref) / (np.linalg.norm(ref) + 1e-9)
        assert rel < 0.05, rel

    def test_flux_text_encoders_rejects_bad_quantize(self):
        import pytest

        from gpt_image_edit_tpu.utils.prompt_embeds import FluxTextEncoders

        with pytest.raises(ValueError):
            FluxTextEncoders("<synthetic>", synthetic=True, quantize_t5="nf4")


class TestClip:
    def test_matches_hf(self):
        from transformers import CLIPTextConfig as HFClipConfig, CLIPTextModel

        torch.manual_seed(0)
        hf_cfg = HFClipConfig(
            vocab_size=512, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=16, eos_token_id=511, bos_token_id=510,
            pad_token_id=509, hidden_act="quick_gelu",
        )
        hf = CLIPTextModel(hf_cfg).eval().float()
        cfg = ClipTextConfig.tiny()
        params = convert_clip(TensorSource.from_state_dict(hf.state_dict()), cfg)

        rng = np.random.default_rng(1)
        ids = rng.integers(0, 509, (2, 10))
        ids[:, -1] = 511  # EOS terminated
        with torch.no_grad():
            out = hf(input_ids=torch.tensor(ids))
        hidden, pooled = clip_apply(params, cfg, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(hidden), out.last_hidden_state.numpy(), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(pooled), out.pooler_output.numpy(), atol=3e-4
        )


class TestClipWithProjection:
    def test_penultimate_and_projection_match_hf(self):
        """SD3 encoder convention: sequence = hidden_states[-2], pooled =
        text_projection(eos hidden) (ref:denoiser_prompt_embedding.py:38-76)."""
        import dataclasses

        from transformers import CLIPTextConfig as HFClipConfig
        from transformers import CLIPTextModelWithProjection

        torch.manual_seed(0)
        hf_cfg = HFClipConfig(
            vocab_size=512, hidden_size=32, num_hidden_layers=3,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=16, eos_token_id=511, bos_token_id=510,
            pad_token_id=509, hidden_act="gelu", projection_dim=24,
        )
        hf = CLIPTextModelWithProjection(hf_cfg).eval().float()
        cfg = dataclasses.replace(
            ClipTextConfig.tiny(), num_layers=3, hidden_act="gelu",
            projection_dim=24,
        )
        params = convert_clip(TensorSource.from_state_dict(hf.state_dict()), cfg)
        assert "text_projection" in params

        rng = np.random.default_rng(2)
        ids = rng.integers(0, 509, (2, 12))
        ids[:, -1] = 511
        with torch.no_grad():
            out = hf(input_ids=torch.tensor(ids), output_hidden_states=True)
        seq, pooled = clip_apply(
            params, cfg, jnp.asarray(ids), output_penultimate=True
        )
        np.testing.assert_allclose(
            np.asarray(seq), out.hidden_states[-2].numpy(), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(pooled), out.text_embeds.numpy(), atol=1e-3
        )


class TestSd3TripleEncoder:
    def test_assembly_shapes(self, tmp_path, monkeypatch):
        """encode_prompt assembly: clip concat + pad to T5 width + seq concat
        + pooled concat (ref:denoiser_prompt_embedding.py:79-128). Uses tiny
        fake encoders injected directly."""
        import dataclasses

        import jax

        from gpt_image_edit_tpu.models import clip as clip_mod
        from gpt_image_edit_tpu.models import t5 as t5_mod
        from gpt_image_edit_tpu.utils.prompt_embeds_sd3 import Sd3TextEncoders

        class FakeTok:
            def __call__(self, prompts, padding=None, max_length=None,
                         truncation=None, return_tensors=None):
                ids = np.full((len(prompts), max_length), 3, np.int64)
                ids[:, -1] = 511 if max_length == 77 else 1
                return {"input_ids": ids}

        enc = Sd3TextEncoders("/nonexistent")
        enc.clip_l_cfg = dataclasses.replace(
            clip_mod.ClipTextConfig.tiny(), max_position_embeddings=77)
        enc.clip_g_cfg = dataclasses.replace(
            clip_mod.ClipTextConfig.tiny(), hidden_size=48, num_heads=2,
            intermediate_size=96, max_position_embeddings=77, hidden_act="gelu")
        enc.t5_cfg = dataclasses.replace(
            t5_mod.T5Config.tiny(), d_model=96, d_ff=128)
        enc._clip_l = (FakeTok(), clip_mod.init(jax.random.key(0), enc.clip_l_cfg))
        enc._clip_g = (FakeTok(), clip_mod.init(jax.random.key(1), enc.clip_g_cfg))
        enc._t5 = (FakeTok(), t5_mod.init(jax.random.key(2), enc.t5_cfg))

        clip_padded, prompt_embeds, pooled = enc.encode_prompt(
            ["a cat", "a dog"], max_sequence_length=8
        )
        t5_dim = enc.t5_cfg.d_model
        assert clip_padded.shape == (2, 77, t5_dim)
        assert prompt_embeds.shape == (2, 77 + 8, t5_dim)
        assert pooled.shape == (2, 32 + 48)
        # padded tail of the clip rows is zero
        assert np.all(np.asarray(clip_padded[..., 32 + 48:]) == 0)
