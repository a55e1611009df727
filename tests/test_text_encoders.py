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
