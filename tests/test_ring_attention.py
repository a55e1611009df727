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
