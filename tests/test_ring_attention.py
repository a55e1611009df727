"""Ring (context-parallel) attention over the `sequence` mesh axis vs the
single-device reference — forward and gradients, with masks and GQA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_image_edit_tpu.ops.attention import dot_product_attention
from gpt_image_edit_tpu.ops.ring_attention import context_parallel_attention
from gpt_image_edit_tpu.parallel.mesh import build_mesh


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


@pytest.fixture(scope="module")
def seq_mesh():
    return build_mesh(shape=(1, 1, 1, 8))


class TestRingAttention:
    def test_forward_matches_reference(self, seq_mesh):
        b, s, h, d = 2, 128, 2, 16
        q, k, v = (_rand((b, s, h, d), i) for i in range(3))
        ref = dot_product_attention(q, k, v, impl="xla")
        out = context_parallel_attention(q, k, v, mesh=seq_mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_pad_mask_rotates_with_kv(self, seq_mesh):
        b, s, h, d = 2, 128, 2, 16
        q, k, v = (_rand((b, s, h, d), i + 3) for i in range(3))
        pad = np.ones((b, s), bool)
        pad[0, -40:] = False   # crosses shard boundaries (16-token shards)
        pad[1, 5:60] = False
        pad = jnp.asarray(pad)
        ref = dot_product_attention(q, k, v, pad_mask=pad, impl="xla")
        out = context_parallel_attention(q, k, v, mesh=seq_mesh, pad_mask=pad)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_causal_global_positions(self, seq_mesh):
        b, s, h, d = 1, 128, 2, 16
        q, k, v = (_rand((b, s, h, d), i + 6) for i in range(3))
        ref = dot_product_attention(q, k, v, causal=True, impl="xla")
        out = context_parallel_attention(q, k, v, mesh=seq_mesh, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gqa(self, seq_mesh):
        b, s, hq, hkv, d = 1, 128, 4, 2, 16
        q = _rand((b, s, hq, d), 9)
        k = _rand((b, s, hkv, d), 10)
        v = _rand((b, s, hkv, d), 11)
        ref = dot_product_attention(q, k, v, impl="xla")
        out = context_parallel_attention(q, k, v, mesh=seq_mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gradients_match_reference(self, seq_mesh):
        """jax.grad differentiates through scan + ppermute (the backward
        pass is the reverse ring); must match single-device autodiff."""
        b, s, h, d = 1, 64, 2, 16
        q, k, v = (_rand((b, s, h, d), i + 12) for i in range(3))
        pad = jnp.asarray(np.ones((b, s), bool)).at[:, -24:].set(False)
        g = _rand((b, s, h, d), 15)

        def ref_loss(q, k, v):
            return jnp.sum(
                dot_product_attention(q, k, v, pad_mask=pad, impl="xla") * g
            )

        def ring_loss(q, k, v):
            return jnp.sum(
                context_parallel_attention(
                    q, k, v, mesh=seq_mesh, pad_mask=pad
                ) * g
            )

        ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        ring_grads = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
        for rg, gg in zip(ref_grads, ring_grads):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(rg), atol=3e-5)

    def test_jit_under_mesh(self, seq_mesh):
        """Compiles and runs under jit with sharded inputs (the training
        entry shape: activations already laid out on the mesh)."""
        b, s, h, d = 1, 128, 2, 16
        q, k, v = (_rand((b, s, h, d), i + 16) for i in range(3))
        fn = jax.jit(
            lambda q, k, v: context_parallel_attention(q, k, v, mesh=seq_mesh)
        )
        out = fn(q, k, v)
        ref = dot_product_attention(q, k, v, impl="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestContextParallelFlux:
    """`FluxConfig.attention_impl='ring'`: the flagship model runs with its
    joint sequence sharded over the `sequence` mesh axis — attention goes
    through the partial-manual shard_map ring; everything else stays GSPMD."""

    def _kw(self, cfg, s_img=24, s_txt=8):
        from gpt_image_edit_tpu.ops.packing import latent_image_ids

        return dict(
            hidden_states=_rand((1, s_img, cfg.in_channels), 10),
            encoder_hidden_states=_rand((1, s_txt, cfg.joint_attention_dim), 11),
            pooled_projections=jnp.zeros((1, cfg.pooled_projection_dim)),
            timestep=jnp.full((1,), 0.4),
            img_ids=latent_image_ids(4, 6),
            guidance=jnp.full((1,), 3.5),
        )

    def test_forward_matches_xla(self, seq_mesh):
        import dataclasses

        from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux, init_flux

        cfg = FluxConfig.tiny()
        params = init_flux(jax.random.key(0), cfg)
        kw = self._kw(cfg)
        ref = apply_flux(params, cfg, **kw)
        cfg_ring = dataclasses.replace(cfg, attention_impl="ring")
        with jax.sharding.set_mesh(seq_mesh):
            out = jax.jit(
                lambda p, **k: apply_flux(p, cfg_ring, **k)
            )(params, **kw)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-4
        )

    def test_grads_flow_through_ring(self, seq_mesh):
        """Training viability: grads of a scalar loss w.r.t. params match the
        single-device xla-attention grads."""
        import dataclasses

        from gpt_image_edit_tpu.models.flux import FluxConfig, apply_flux, init_flux

        cfg = FluxConfig.tiny()
        params = init_flux(jax.random.key(1), cfg)
        kw = self._kw(cfg)

        def loss(p, impl):
            c = dataclasses.replace(cfg, attention_impl=impl)
            out = apply_flux(p, c, **kw)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
        with jax.sharding.set_mesh(seq_mesh):
            g_ring = jax.jit(jax.grad(lambda p: loss(p, "ring")))(params)
        flat_ref = jax.tree_util.tree_leaves(g_ref)
        flat_ring = jax.tree_util.tree_leaves(g_ring)
        for a, b in zip(flat_ref, flat_ring):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-3
            )


class TestBlockedHop:
    """The per-hop computation is a blocked online softmax (VERDICT r2 #6):
    scores materialize one (Sq_local, block_kv) tile at a time. Small
    block_kv values force multiple inner blocks AND the ragged-tail padding
    path; results must be identical to the unblocked reference."""

    @pytest.mark.parametrize("block_kv", [8, 12, 16, 512])
    def test_block_sizes_match_reference(self, seq_mesh, block_kv):
        b, s, h, d = 1, 128, 2, 16  # 16 tokens/shard; block 12 -> pad 8
        q, k, v = (_rand((b, s, h, d), 20 + i) for i in range(3))
        ref = dot_product_attention(q, k, v, impl="xla")
        out = context_parallel_attention(
            q, k, v, mesh=seq_mesh, block_kv=block_kv
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_blocked_with_pad_mask_and_causal(self, seq_mesh):
        b, s, h, d = 1, 64, 2, 16  # 8 tokens/shard, block 5 -> ragged pad
        q, k, v = (_rand((b, s, h, d), 30 + i) for i in range(3))
        pm = jnp.asarray(
            np.random.default_rng(9).integers(0, 2, (b, s)).astype(bool)
        )
        pm = pm.at[:, :2].set(True)  # every query keeps >= 1 visible key
        ref = dot_product_attention(q, k, v, pad_mask=pm, causal=True, impl="xla")
        out = context_parallel_attention(
            q, k, v, mesh=seq_mesh, pad_mask=pm, causal=True, block_kv=5
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_blocked_gradients(self, seq_mesh):
        b, s, h, d = 1, 64, 2, 8
        q, k, v = (_rand((b, s, h, d), 40 + i) for i in range(3))

        def loss_ring(q, k, v):
            return jnp.sum(
                context_parallel_attention(
                    q, k, v, mesh=seq_mesh, block_kv=6
                ) ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, impl="xla") ** 2)

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_ring, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)
