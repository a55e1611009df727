"""SD3 MMDiT invariants (no torch golden reference available — diffusers is
not installed; behavioral invariants + converter shape mapping instead)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models.sd3_model import (
    SD3Config,
    apply as apply_sd3,
    init as init_sd3,
    sincos_pos_embed_2d,
)


def _setup(b=2, hw=8, s_txt=5):
    cfg = SD3Config.tiny()
    params = init_sd3(jax.random.key(0), cfg)
    rngs = jax.random.split(jax.random.key(1), 4)
    lat = jax.random.normal(rngs[0], (b, hw, hw, cfg.in_channels))
    txt = jax.random.normal(rngs[1], (b, s_txt, cfg.joint_attention_dim))
    pooled = jax.random.normal(rngs[2], (b, cfg.pooled_projection_dim))
    t = jnp.full((b,), 0.5)
    return cfg, params, lat, txt, pooled, t


class TestSD3:
    def test_shapes_and_finite(self):
        cfg, params, lat, txt, pooled, t = _setup()
        out = apply_sd3(params, cfg, hidden_states=lat, encoder_hidden_states=txt,
                        pooled_projections=pooled, timestep=t)
        assert out.shape == lat.shape[:3] + (cfg.out_channels,)
        assert np.isfinite(np.asarray(out)).all()

    def test_conditioning_sensitivity(self):
        cfg, params, lat, txt, pooled, t = _setup()
        kw = dict(hidden_states=lat, pooled_projections=pooled, timestep=t)
        o1 = apply_sd3(params, cfg, encoder_hidden_states=txt, **kw)
        o2 = apply_sd3(params, cfg, encoder_hidden_states=txt + 1.0, **kw)
        assert np.abs(np.asarray(o1 - o2)).max() > 1e-4
        o3 = apply_sd3(params, cfg, encoder_hidden_states=txt,
                       hidden_states=lat, pooled_projections=pooled, timestep=t * 0.1)
        assert np.abs(np.asarray(o1 - o3)).max() > 1e-4

    def test_pos_embed_crop_varies_by_resolution(self):
        cfg, params, lat, txt, pooled, t = _setup(hw=8)
        o8 = apply_sd3(params, cfg, hidden_states=lat, encoder_hidden_states=txt,
                       pooled_projections=pooled, timestep=t)
        lat12 = jax.random.normal(jax.random.key(9), (2, 12, 12, cfg.in_channels))
        o12 = apply_sd3(params, cfg, hidden_states=lat12, encoder_hidden_states=txt,
                        pooled_projections=pooled, timestep=t)
        assert o12.shape[1:3] == (12, 12) and o8.shape[1:3] == (8, 8)

    def test_sincos_table_properties(self):
        emb = sincos_pos_embed_2d(16, 4, 6)
        assert emb.shape == (24, 16)
        # position (0,0): sin parts 0, cos parts 1
        np.testing.assert_allclose(emb[0, :4], 0.0, atol=1e-7)
        np.testing.assert_allclose(emb[0, 4:8], 1.0, atol=1e-7)

    def test_registry(self):
        from gpt_image_edit_tpu.models.sd3 import DENOISER_TYPE

        assert "flux" in DENOISER_TYPE and "sd3" in DENOISER_TYPE
        assert DENOISER_TYPE["sd3"].SD3Config is SD3Config

    def test_pipeline_end_to_end(self):
        from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae
        from gpt_image_edit_tpu.pipeline.sd3 import SD3Pipeline, sd3_sigmas

        cfg = SD3Config.tiny()
        vcfg = VaeConfig.tiny()
        pipe = SD3Pipeline(
            init_sd3(jax.random.key(0), cfg), cfg,
            init_vae(jax.random.key(1), vcfg), vcfg,
        )
        out = pipe(
            prompt_embeds=jnp.zeros((1, 5, cfg.joint_attention_dim)),
            pooled_prompt_embeds=jnp.zeros((1, cfg.pooled_projection_dim)),
            height=32, width=32, num_inference_steps=2, rng=jax.random.key(2),
            negative_prompt_embeds=[jnp.zeros((1, 5, cfg.joint_attention_dim))],
            negative_pooled_prompt_embeds=[jnp.zeros((1, cfg.pooled_projection_dim))],
            guidance_scales=[3.0],
        )
        assert out.shape == (1, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()
        sig = sd3_sigmas(28)
        assert sig[0] == 1.0 and sig[-1] == 0.0 and (np.diff(sig) < 0).all()

    def test_pipeline_offload_matches(self):
        """SD3Pipeline(offload=True): pinned_host parking + per-stage
        staging, bit-identical output, idle = zero HBM copies."""
        import jax as _jax

        from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae
        from gpt_image_edit_tpu.pipeline.sd3 import SD3Pipeline

        cfg = SD3Config.tiny()
        vcfg = VaeConfig.tiny()
        sd3_p = init_sd3(jax.random.key(0), cfg)
        vae_p = init_vae(jax.random.key(1), vcfg)
        kw = dict(
            prompt_embeds=jnp.zeros((1, 5, cfg.joint_attention_dim)),
            pooled_prompt_embeds=jnp.zeros((1, cfg.pooled_projection_dim)),
            height=32, width=32, num_inference_steps=2,
        )
        ref = SD3Pipeline(sd3_p, cfg, vae_p, vcfg)(rng=jax.random.key(2), **kw)
        off_pipe = SD3Pipeline(sd3_p, cfg, vae_p, vcfg, offload=True)
        leaf = _jax.tree_util.tree_leaves(off_pipe.params)[0]
        assert leaf.sharding.memory_kind == "pinned_host"
        out = off_pipe(rng=jax.random.key(2), **kw)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        assert off_pipe._store.idle

    def test_converter_roundtrip_shapes(self):
        """Build a synthetic diffusers-named state dict and convert."""
        import torch

        from gpt_image_edit_tpu.models.sd3_model import convert_sd3
        from gpt_image_edit_tpu.utils.ckpt_convert import TensorSource

        cfg = SD3Config.tiny()
        d = cfg.inner_dim
        sd = {}

        def lin(name, i, o, bias=True):
            sd[f"{name}.weight"] = torch.randn(o, i)
            if bias:
                sd[f"{name}.bias"] = torch.randn(o)

        sd["pos_embed.proj.weight"] = torch.randn(d, cfg.in_channels, 2, 2)
        sd["pos_embed.proj.bias"] = torch.randn(d)
        sd["pos_embed.pos_embed"] = torch.randn(1, cfg.pos_embed_max_size ** 2, d)
        lin("context_embedder", cfg.joint_attention_dim, cfg.caption_projection_dim)
        lin("time_text_embed.timestep_embedder.linear_1", 256, d)
        lin("time_text_embed.timestep_embedder.linear_2", d, d)
        lin("time_text_embed.text_embedder.linear_1", cfg.pooled_projection_dim, d)
        lin("time_text_embed.text_embedder.linear_2", d, d)
        lin("norm_out.linear", d, 2 * d)
        lin("proj_out", d, 4 * cfg.out_channels)
        for i in range(cfg.num_layers):
            last = i == cfg.num_layers - 1
            b = f"transformer_blocks.{i}."
            lin(f"{b}norm1.linear", d, 6 * d)
            lin(f"{b}norm1_context.linear", d, 2 * d if last else 6 * d)
            for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
                lin(f"{b}attn.{n}", d, d)
            lin(f"{b}attn.to_out.0", d, d)
            lin(f"{b}ff.net.0.proj", d, 4 * d)
            lin(f"{b}ff.net.2", 4 * d, d)
            if not last:
                lin(f"{b}attn.to_add_out", d, d)
                lin(f"{b}ff_context.net.0.proj", d, 4 * d)
                lin(f"{b}ff_context.net.2", 4 * d, d)

        params = convert_sd3(TensorSource.from_state_dict(sd), cfg)
        lat = jax.random.normal(jax.random.key(0), (1, 8, 8, cfg.in_channels)) * 0.02
        out = apply_sd3(
            params, cfg,
            hidden_states=lat,
            encoder_hidden_states=jnp.zeros((1, 4, cfg.joint_attention_dim)),
            pooled_projections=jnp.zeros((1, cfg.pooled_projection_dim)),
            timestep=jnp.full((1,), 0.5),
        )
        assert np.isfinite(np.asarray(out)).all()
