"""Merged-checkpoint roundtrip: our params -> reference-format safetensors
dir -> loaded back -> identical outputs. Validates both converters and the
merged format the serving runtime consumes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux, init_flux
from gpt_image_edit_tpu.models.qwen2p5vl import Qwen2p5VLConfig, init_qwen
from gpt_image_edit_tpu.ops.packing import latent_image_ids
from gpt_image_edit_tpu.utils.ckpt_convert import load_merged_checkpoint
from gpt_image_edit_tpu.utils.ckpt_export import save_merged_checkpoint


def test_merged_roundtrip(tmp_path):
    qcfg = Qwen2p5VLConfig.tiny()
    fcfg = dataclasses.replace(FluxConfig.tiny(), joint_attention_dim=qcfg.projector_out)
    qwen = init_qwen(jax.random.key(0), qcfg)
    flux = init_flux(jax.random.key(1), fcfg)

    save_merged_checkpoint(str(tmp_path / "merged"), qwen, flux, qcfg, fcfg)
    qwen2, flux2 = load_merged_checkpoint(str(tmp_path / "merged"), qcfg, fcfg)

    # exact leaf equality both ways
    for a, b in zip(jax.tree_util.tree_leaves(qwen), jax.tree_util.tree_leaves(qwen2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # functional equality on flux (covers any missed/renamed leaves)
    hidden = jax.random.normal(jax.random.key(2), (1, 8, fcfg.in_channels))
    txt = jax.random.normal(jax.random.key(3), (1, 4, fcfg.joint_attention_dim))
    pooled = jax.random.normal(jax.random.key(4), (1, fcfg.pooled_projection_dim))
    ids = latent_image_ids(2, 4)
    kw = dict(
        hidden_states=hidden, encoder_hidden_states=txt, pooled_projections=pooled,
        timestep=jnp.full((1,), 0.4), img_ids=ids, guidance=jnp.full((1,), 3.5),
    )
    o1 = apply_flux(flux, fcfg, **kw)
    o2 = apply_flux(flux2, fcfg, **kw)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_make_univa_weight_remap():
    from scripts.make_univa_weight import remap_qwen_key

    assert remap_qwen_key("model.visual.blocks.0.norm1.weight") == "visual.blocks.0.norm1.weight"
    assert remap_qwen_key("model.language_model.layers.3.mlp.up_proj.weight") == "model.layers.3.mlp.up_proj.weight"
    assert remap_qwen_key("lm_head.weight") == "lm_head.weight"
    assert remap_qwen_key("visual.merger.ln_q.weight") == "visual.merger.ln_q.weight"
