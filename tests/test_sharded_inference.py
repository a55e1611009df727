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


class TestShardedRuntime:
    """--mesh serving: the full UnivaRuntime (VLM prefill + scan + decode)
    sharded over a (1,4,2) fsdp x tensor mesh matches single-device."""

    def test_runtime_edit_matches_unsharded(self):
        from PIL import Image

        from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

        img = Image.new("RGB", (32, 32), (90, 160, 40))
        kw = dict(steps=2, seed=5)
        ref = np.asarray(UnivaRuntime(tiny=True).edit("turn it green", img, **kw))
        mesh = build_mesh(8, shape=(1, 4, 2))
        sharded = np.asarray(
            UnivaRuntime(tiny=True, mesh=mesh).edit("turn it green", img, **kw)
        )
        diff = np.abs(ref.astype(np.int16) - sharded.astype(np.int16))
        # sharded matmuls reduce in a different order through the bf16
        # VLM prefill -> a few pixels move by a couple of 8-bit steps
        assert diff.max() <= 4 and diff.mean() <= 0.5

    def test_quantized_mesh_serving(self):
        """--quantize w8a8 + --mesh together: the int8 payloads shard and
        the full edit still runs (the single-chip fidelity suite covers
        numerics; this guards the composition)."""
        from PIL import Image

        from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

        mesh = build_mesh(8, shape=(1, 4, 2))
        rt = UnivaRuntime(tiny=True, mesh=mesh, quantize="w8a8")
        out = rt.edit(
            "quantized sharded edit",
            Image.new("RGB", (32, 32), (10, 20, 200)),
            steps=2, seed=1,
        )
        assert out.size == (32, 32)

    def test_mesh_offload_mutually_exclusive(self):
        import pytest

        from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

        with pytest.raises(ValueError, match="mutually exclusive"):
            UnivaRuntime(tiny=True, mesh=build_mesh(8), offload=True)


class TestMeshFromArg:
    def test_parses(self):
        from gpt_image_edit_tpu.parallel.mesh import mesh_from_arg

        assert mesh_from_arg(None) is None
        assert mesh_from_arg("") is None
        m = mesh_from_arg("1,4,2")
        assert dict(m.shape) == {"data": 1, "fsdp": 4, "tensor": 2, "sequence": 1}
        assert mesh_from_arg("auto").size == 8  # conftest forces 8 devices

    def test_rejects_malformed(self):
        import pytest

        from gpt_image_edit_tpu.parallel.mesh import mesh_from_arg

        with pytest.raises(ValueError, match="dp,fsdp,tp"):
            mesh_from_arg("abc")
        with pytest.raises(ValueError, match="3 axes"):
            mesh_from_arg("2,4")
        with pytest.raises(ValueError, match="positive"):
            mesh_from_arg("1,-1,2")  # numpy would treat -1 as a wildcard
        with pytest.raises(ValueError, match="positive"):
            mesh_from_arg("0,4,2")
        with pytest.raises(ValueError, match="devices"):
            mesh_from_arg("1,8,2")  # 16 > the 8 visible CPU devices
