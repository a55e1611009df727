"""Multi-chip serving: KontextPipeline with a sharded mesh on 8 CPU devices
must produce the SAME image as the unsharded single-device run."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpt_image_edit_tpu.models.flux import FluxConfig, init_flux
from gpt_image_edit_tpu.models.vae import VaeConfig, init_vae
from gpt_image_edit_tpu.parallel import build_mesh
from gpt_image_edit_tpu.pipeline.kontext import KontextPipeline


def test_sharded_pipeline_matches_unsharded():
    fcfg = dataclasses.replace(FluxConfig.tiny(), joint_attention_dim=32)
    vcfg = VaeConfig.tiny()
    flux_params = init_flux(jax.random.key(0), fcfg)
    vae_params = init_vae(jax.random.key(1), vcfg)

    prompt = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 6, fcfg.joint_attention_dim)),
        jnp.float32,
    )
    pooled = jnp.zeros((1, fcfg.pooled_projection_dim))
    img = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (1, 32, 32, 3)), jnp.float32
    )

    def run(pipe):
        return np.asarray(
            pipe(
                prompt_embeds=prompt, pooled_prompt_embeds=pooled, image=img,
                height=32, width=32, num_inference_steps=2,
                rng=jax.random.key(2),
            )
        )

    ref = run(KontextPipeline(flux_params, fcfg, vae_params, vcfg))

    mesh = build_mesh(8, shape=(1, 4, 2))  # fsdp x tensor serving mesh
    with mesh:
        sharded = run(
            KontextPipeline(flux_params, fcfg, vae_params, vcfg, mesh=mesh)
        )
    np.testing.assert_allclose(sharded, ref, atol=2e-4)
