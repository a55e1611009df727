"""LLaVA legacy path smoke: fixed 729-token protocol, registry, output modes."""

import numpy as np
import jax
import jax.numpy as jnp

from gpt_image_edit_tpu.models import MODEL_TYPE
from gpt_image_edit_tpu.models.llava import (
    IMAGE_TOKEN_COUNT,
    LlavaUnivaConfig,
    apply as apply_llava,
    init as init_llava,
)


def test_registry_complete():
    import gpt_image_edit_tpu.models.qwen2p5vl.model  # noqa: F401
    import gpt_image_edit_tpu.models.qwen2vl.model  # noqa: F401

    assert set(MODEL_TYPE) >= {"llava", "qwen2vl", "qwen2p5vl"}


def test_llava_forward_modes():
    cfg = LlavaUnivaConfig.tiny()
    params = init_llava(jax.random.key(0), cfg)
    n_img = 4  # tiny stand-in for the fixed 729 grid
    ids = np.array([[5] + [cfg.image_token_id] * n_img + [11, 12, 13]], np.int64)
    pos = np.broadcast_to(np.arange(ids.shape[1])[None, None], (3, 1, ids.shape[1]))
    feats = jax.random.normal(jax.random.key(1), (n_img, cfg.vision_feature_dim))
    kw = dict(
        input_ids=jnp.asarray(ids),
        position_ids=jnp.asarray(pos.copy()),
        attention_mask=jnp.ones_like(jnp.asarray(ids)),
        image_features=feats,
    )
    logits = apply_llava(params, cfg, output_type="lvlm", **kw)
    assert logits.shape == (1, ids.shape[1], cfg.text.vocab_size)
    emb = apply_llava(params, cfg, output_type="denoise_embeds", **kw)
    assert emb.shape == (1, ids.shape[1], cfg.projector_out)
    assert np.isfinite(np.asarray(logits)).all()
    assert IMAGE_TOKEN_COUNT == 729
